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



# NOTE (round 10): a `fan_out_oversized` helper lived here briefly — a
# stats-guarded repartition for oversized low-split inputs. REVERTED:
# logical-plan stats sizeInBytes is a multiplicative overestimate on
# join subtrees, and the guard requested a multi-million-partition
# shuffle from the domain pipeline (livelocked the staged build). Scans
# are already split at maxPartitionBytes; oversized single-partition
# inputs can only be produced by a caller, who knows the real size.
