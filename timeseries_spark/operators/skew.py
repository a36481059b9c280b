"""Skew mitigation: salted two-stage aggregation and salted broadcast-side
replication joins.

The reference acknowledges skew once (``repartition(400, "year")`` after the
crossJoin, timeseries.py:450-454 — year has ~27 distinct values, so 400
partitions mostly sit empty while hot years overflow). These helpers are
the general fix for 100 TB: spread a hot key over ``buckets`` sub-keys,
aggregate partially per sub-key, then combine — the classic map-side-combine
shape made explicit for aggregates Catalyst cannot partially push (e.g.
``collect_list`` feeding an array kernel).

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``) handles *join*
skew at runtime; salting remains the tool for *aggregation* skew and for
joins where one key dominates so heavily that even a split partition
overwhelms a task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(
    df: DataFrame, buckets: int, deterministic_from: str | None = None
) -> DataFrame:
    """Add a salt column in ``[0, buckets)``.

    ``deterministic_from`` derives the salt from an existing high-cardinality
    column (hash mod buckets) so reruns — and correctness oracles — are
    reproducible; default is a uniform random salt."""
    if deterministic_from is not None:
        salt = F.pmod(F.hash(F.col(deterministic_from)), F.lit(buckets))
    else:
        salt = (F.rand() * buckets).cast("int")
    return df.withColumn(SALT_COL, salt)


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    buckets: int = 16,
    deterministic_from: str | None = None,
) -> DataFrame:
    """Two-stage sum/count over skewed ``keys``.

    Stage 1 aggregates at (keys, salt) — at most ``buckets`` rows per hot
    key per partial — so no single task sees a whole hot key; stage 2
    combines the tiny salted partials. Output columns:
    ``*keys, <col>_sum ... , n``."""
    keys = list(keys)
    salted = with_salt(df, buckets, deterministic_from)
    partial = salted.groupBy(*keys, SALT_COL).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c).alias(f"__s_{c}") for c in value_cols],
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n"),
        *[F.sum(f"__s_{c}").alias(f"{c}_sum") for c in value_cols],
    )


def salted_collect_list(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    buckets: int = 16,
    deterministic_from: str | None = None,
) -> DataFrame:
    """Skew-safe ``collect_list`` (the harmonic kernel's input shape, A1):
    collect per (keys, salt), then flatten the per-salt arrays. Order within
    the result array is unspecified, exactly like plain ``collect_list``.
    Output: ``*keys, values: array``."""
    keys = list(keys)
    salted = with_salt(df, buckets, deterministic_from)
    partial = salted.groupBy(*keys, SALT_COL).agg(
        F.collect_list(value_col).alias("__part")
    )
    return partial.groupBy(*keys).agg(
        F.flatten(F.collect_list("__part")).alias("values")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
    deterministic_from: str | None = None,
) -> DataFrame:
    """Equi join resilient to hot keys on the big side.

    The big side gets a salt; the small side is replicated ``buckets``
    times (explode of a salt array) so every (key, salt) combination finds
    its match. Join keys become (on..., salt): a hot key's rows now spread
    over ``buckets`` tasks instead of one.

    Only use when the small side is too big to broadcast outright but small
    enough to replicate ``buckets``× — otherwise ``F.broadcast`` (small) or
    AQE skew-join (both big) are the better tools."""
    on = list(on)
    b = with_salt(big, buckets, deterministic_from)
    s = small.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))),
    )
    out = b.join(s, [*on, SALT_COL], how)
    return out.drop(SALT_COL)
