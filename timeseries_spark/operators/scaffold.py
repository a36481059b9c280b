"""Dense year scaffolds (reference: timeseries.py:441-470).

The reference builds ``distinct(datasourceId) × year-range`` with a
crossJoin and then hand-repartitions (``repartition(400, "year")``,
timeseries.py:454). Here the year spine is generated with
``sequence``+``explode`` (no driver-side list), the spine side is
broadcast (it is at most ~30 rows), and shuffle sizing is left to AQE —
the scale-safe version of the same plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def year_spine(
    spark: SparkSession,
    first_year: int,
    last_year: int,
    include_sentinel: bool = True,
) -> DataFrame:
    """One-column ``year`` DataFrame covering ``first_year..last_year``
    (+1 sentinel row for undated evidence when ``include_sentinel``)."""
    stop = last_year + 1 if include_sentinel else last_year
    return spark.range(1).select(
        F.explode(F.sequence(F.lit(first_year), F.lit(stop))).alias("year")
    )


def dense_scaffold(
    df: DataFrame,
    key_cols: Sequence[str],
    spine: DataFrame,
    spine_col: str = "year",
) -> DataFrame:
    """Distinct keys × spine, left-joined back onto ``df``.

    Densifies a sparse fact table so every key combination carries every
    spine value (missing cells yield NULLs for the fact columns). The spine
    is broadcast; the distinct+join shuffles hash on the key columns, which
    is the partitioning the downstream cumulative window wants.
    """
    keys = df.select(*key_cols).distinct()
    grid = keys.crossJoin(F.broadcast(spine))
    return grid.join(df, [*key_cols, spine_col], "left")


def shuffled_null_years(
    evidence: DataFrame,
    id_col: str = "id",
    year_col: str = "year",
    seed: int = 42,
    n_buckets: int = 64,
) -> DataFrame:
    """Statistical null model (O5): permute the year column across the
    evidence set — the reference's commented-out shuffle machinery
    (timeseries.py:415-433) used by the notebook's correlation control
    (analysis.ipynb cells 2-6).

    Scale design: rows land in ``n_buckets`` deterministic hash buckets
    (``md5_long(id) % n_buckets``); within each bucket two row_number
    orderings — 'original' (by ``md5(id)``) and 'shuffled' (by
    ``md5(id || seed)``) — are joined on (bucket, rn), moving each year
    to a different row of the same bucket. Every window PARTITIONS BY the
    bucket, so the permutation is embarrassingly parallel — no global
    single-task Window (the previous design funneled the whole table
    through one task). The year multiset is conserved per bucket, hence
    globally: a true permutation, not a resample.

    Fully deterministic given (id values, seed) and engine-portable (md5
    ordering, no ``rand``): a DuckDB oracle can replay the identical
    permutation — see the ``novelty_null_correlation`` query. ``id_col``
    values must be unique (md5 ties would make ranks ambiguous)."""
    from timeseries_spark.extensions.hashing import md5_long

    bucket = F.pmod(md5_long(F.col(id_col)), F.lit(n_buckets))
    w_orig = Window.partitionBy("__b").orderBy(F.md5(F.col(id_col)))
    w_perm = Window.partitionBy("__b").orderBy(
        F.md5(F.concat(F.col(id_col), F.lit(f":{seed}")))
    )
    base = evidence.withColumn("__b", bucket).withColumn(
        "__rn", F.row_number().over(w_orig)
    )
    shuffled_years = (
        evidence.select(F.col(id_col), F.col(year_col).alias("__shuffled_year"))
        .withColumn("__b", bucket)
        .withColumn("__rn", F.row_number().over(w_perm))
        .drop(id_col)
    )
    return (
        base.join(shuffled_years, ["__b", "__rn"])
        .drop("__b", "__rn", year_col)
        .withColumnRenamed("__shuffled_year", year_col)
    )
