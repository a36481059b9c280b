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


def fan_out_oversized(
    df: DataFrame, target_bytes: int | None = None
) -> DataFrame:
    """Round-robin repartition iff the plan's AVERAGE partition exceeds
    the parquet split target (``spark.sql.files.maxPartitionBytes``) —
    the size-guarded sibling of :func:`ensure_parallelism` for operators
    whose input is usually a well-split scan but occasionally a
    single-file extract or a checkpointed upstream with 1-3 oversized
    partitions (which would serialize the next map side onto them).

    Unlike the partition-count guard, this is a no-op on small inputs:
    a 10 MB single-split table stays single-split — repartitioning it
    costs more than the serialized scan it avoids. Batch-only (plan
    stats + partitioning introspection)."""
    spark = df.sparkSession
    if target_bytes is None:
        target_bytes = int(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
            .lower()
            .rstrip("b")
        )
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001 — stats unavailable: leave the plan alone
        return df
    n = df.rdd.getNumPartitions()
    if n > 0 and size // n > target_bytes:
        # at least one task per core AND one per split-target of bytes —
        # the repartition is REPARTITION_BY_NUM (AQE cannot widen a
        # pinned count later), so undershooting here would re-serialize
        # the downstream compute it exists to parallelize
        want = max(
            spark.sparkContext.defaultParallelism, size // target_bytes
        )
        if want > n:
            return df.repartition(want)
    return df
