"""Parallelism guard for compute-bound operators.

Spark sizes scan partitions by input BYTES (``files.maxPartitionBytes``),
which is the wrong currency for operators whose cost is per-row compute
(minhash signatures, simhash sketches, per-shingle hashing): a corpus that
fits in one 100 MB parquet file arrives as ONE partition and the whole
sketch computation serializes onto a single core — measured 102 s for the
sf0.1 MinHash pipeline vs 12 s with 32 partitions. At real scale inputs
already carry thousands of partitions and the guard is a no-op, so this
never adds a shuffle where one isn't needed.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame


def ensure_parallelism(
    df: DataFrame, min_partitions: int | None = None
) -> DataFrame:
    """Round-robin repartition iff the plan currently has fewer partitions
    than the cluster's default parallelism (batch-only: inspecting
    partitioning forces plan analysis, which streaming plans disallow)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df



@contextlib.contextmanager
def bytes_sized_shuffles(spark):
    """Scope AQE's bytes-proportional shuffle coalescing over a
    driver-sequential loop whose per-round shuffles carry tiny,
    NON-compute-dense state (CC labels, Lloyd centroid means, gradient
    aggregates, pagerank ranks).

    AQE's coalescer defaults to ``parallelismFirst=true``: it refuses to
    coalesce below the cluster's default parallelism, so a 2 k-row label
    hop still runs 32 reduce tasks per round and the loop pays pure
    scheduler/task overhead (the r16 profile charged the CC rounds 38 %
    of semantic-dedup task time at ~0.1 s of overhead per task-wave).
    Flipping ``parallelismFirst`` to false INSIDE the loop lets AQE size
    each reduce stage by bytes (advisoryPartitionSizeInBytes) — one task
    for a kB-scale hop here, thousands of tasks for a TB-scale hop on a
    cluster: scale-adaptive by construction, no hard-coded counts.

    Scoped, not global: compute-dense-but-byte-small reduce stages
    elsewhere (the banded simhash/minhash self-joins, block-cosine
    stages) must NOT be coalesced; inside these loops the only
    compute-dense stages sit behind AQE-exempt explicit repartitions
    (REPARTITION_BY_NUM) or checkpointed leaves, so bytes are the right
    currency. Runtime confs apply at ACTION time, so only the loop's own
    materializations (the per-round checkpoints) see the flag; the
    DataFrame a wrapped function returns executes under the caller's
    conf again.
    """
    conf = spark.conf
    keys = {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        # round-16 follow-up: cached relations inside these loops (the CC
        # edge cache) otherwise build with AQE partition-count changes
        # DISABLED (Spark's default keeps a cached plan's output
        # partitioning stable so downstream reuse isn't surprised), which
        # pins the kB-scale edge cache at the static shuffle partition
        # count — and then EVERY per-round scan of it is a full task wave
        # (32 tasks × fixed overhead at local defaults). Letting AQE
        # re-size the cached build inside the scope stores the cache at
        # its bytes-proportional width: 1 partition for a kB edge set
        # here, thousands for a TB one on a cluster — same adaptivity
        # contract as parallelismFirst above, row set unchanged.
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    }
    old = {k: conf.get(k, None) for k in keys}
    for k, v in keys.items():
        conf.set(k, v)
    try:
        yield
    finally:
        for k, prev in old.items():
            if prev is None:
                conf.unset(k)
            else:
                conf.set(k, prev)


# NOTE (round 10): a `fan_out_oversized` helper lived here briefly — a
# stats-guarded repartition for oversized low-split inputs. REVERTED:
# logical-plan stats sizeInBytes is a multiplicative overestimate on
# join subtrees, and the guard requested a multi-million-partition
# shuffle from the domain pipeline (livelocked the staged build). Scans
# are already split at maxPartitionBytes; oversized single-partition
# inputs can only be produced by a caller, who knows the real size.
