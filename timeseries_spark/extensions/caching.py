"""Registered ``persist()`` lifecycle shared by the engine's
multi-consumer cache points (the dedup pair generators' posting /
signature / band blocks, the search family's matched-postings probe).

The cached entries are part of the RETURNED DataFrame's lineage, so the
operator that registers them can never unpersist them itself — but in a
long-lived serving session the dead caches accumulate (correctness
survives via LRU eviction; executor memory does not). This registry is
the release mechanism, with two round-14-advice hardenings over the
dedup-local list it replaces:

- **per-SparkSession scoping**: entries key on the OWNING SparkSession,
  so releasing one pipeline's caches can never unpersist a concurrent
  session's still-feeding blocks (the cloned-session isolation the
  point-query serving path already relies on). The map is weak-keyed —
  a torn-down session's bookkeeping disappears with the session.
- **a lock guards registry mutation**: ``DataFrame.unpersist`` is
  JVM-side thread-safe; the Python ``list.append``/``pop`` around it
  was not.

Lifecycle contract (unchanged from the dedup-local registry): one-shot
pipelines let session teardown collect the blocks; serving sessions
either call the family release between queries or wrap the terminal
DataFrame in ``dedup.materialize_release`` — never mid-query (a
registered cache may still be feeding an unmaterialized plan). Within
ONE SparkSession a family release drops every cache of that family,
including blocks a concurrently-building query in another thread just
registered — concurrent pipelines that must not interfere get their own
``spark.newSession()`` clones, which this registry keeps separate.
"""

from __future__ import annotations

import threading
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.Lock()
# session -> family -> registered (still-persisted) DataFrames
_REGISTRY: WeakKeyDictionary[SparkSession, dict[str, list[DataFrame]]] = (
    WeakKeyDictionary()
)


def register_cache(df: DataFrame, family: str) -> DataFrame:
    """Persist ``df`` and record it under (owning session, ``family``)
    so a later :func:`release_caches` can free the block."""
    out = df.persist()
    with _LOCK:
        _REGISTRY.setdefault(out.sparkSession, {}).setdefault(
            family, []
        ).append(out)
    return out


def live_caches(
    spark: SparkSession | None = None, family: str | None = None
) -> list[DataFrame]:
    """Snapshot of the registered caches matching the filters —
    diagnostics/tests only; the list is a copy, mutating it releases
    nothing."""
    with _LOCK:
        out: list[DataFrame] = []
        for sess, fams in _REGISTRY.items():
            if spark is not None and sess is not spark:
                continue
            for fam, dfs in fams.items():
                if family is not None and fam != family:
                    continue
                out.extend(dfs)
        return out


def release_caches(
    spark: SparkSession | None = None, family: str | None = None
) -> int:
    """Unpersist every registered cache matching the filters; returns
    how many were freed. ``spark=None`` spans all sessions (the legacy
    single-session behavior), ``family=None`` all families. Async
    (non-blocking) — executors drop the blocks in the background. The
    unpersist calls run OUTSIDE the lock (they go to the JVM) so a slow
    release never blocks a concurrent register."""
    with _LOCK:
        victims: list[DataFrame] = []
        for sess, fams in list(_REGISTRY.items()):
            if spark is not None and sess is not spark:
                continue
            for fam in list(fams):
                if family is not None and fam != family:
                    continue
                victims.extend(fams.pop(fam))
    for df in victims:
        df.unpersist()
    return len(victims)
