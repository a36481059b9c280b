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
    key_cols: Sequence[str] = ("diseaseId", "targetId", "datasourceId"),
    year_col: str = "year",
    seed: int = 42,
) -> DataFrame:
    """Statistical null model (O5): permute the year column within the
    whole evidence set — the reference's commented-out shuffle machinery
    (timeseries.py:415-433) used by the notebook's correlation control
    (analysis.ipynb cells 2-6).

    Seeded ``rand`` keeps a given run reproducible; the permutation joins
    two row_number orderings (original vs shuffled) so years are exactly
    conserved as a multiset — a true permutation, not a resample."""
    w_orig = Window.orderBy(F.monotonically_increasing_id())
    w_rand = Window.orderBy(F.rand(seed), F.monotonically_increasing_id())
    base = evidence.withColumn("__rn", F.row_number().over(w_orig))
    shuffled_years = evidence.select(year_col).withColumn(
        "__rn", F.row_number().over(w_rand)
    ).withColumnRenamed(year_col, "__shuffled_year")
    return (
        base.join(shuffled_years, "__rn")
        .drop("__rn", year_col)
        .withColumnRenamed("__shuffled_year", year_col)
    )
