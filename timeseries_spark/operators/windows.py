"""Window-function idioms the reference leans on (SURVEY.md §2.5).

- W3: top-1 row per group via ``row_number`` (novelty_distribution.py:93-96);
- W4/W5: arg-max/arg-min rows *with ties kept* via ``max()/min()`` over an
  unbounded partition plus an equality filter (novelty_distribution.py:720-726;
  novelty_approval.py:368-376). The tie-keeping equality filter is
  load-bearing (SURVEY.md §7) — do not "fix" it into row_number.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top1_per_group(
    df: DataFrame, partition_cols: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """Exactly one row per group: lowest by ``order_by`` (W3)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def argmax_rows(
    df: DataFrame, partition_cols: Sequence[str], value_col: str
) -> DataFrame:
    """All rows achieving the group maximum of ``value_col`` (ties kept, W4)."""
    w = Window.partitionBy(*partition_cols)
    return (
        df.withColumn("__mx", F.max(value_col).over(w))
        .filter(F.col(value_col) == F.col("__mx"))
        .drop("__mx")
    )


def argmin_rows(
    df: DataFrame, partition_cols: Sequence[str], value_col: str
) -> DataFrame:
    """All rows achieving the group minimum of ``value_col`` (ties kept, W5)."""
    w = Window.partitionBy(*partition_cols)
    return (
        df.withColumn("__mn", F.min(value_col).over(w))
        .filter(F.col(value_col) == F.col("__mn"))
        .drop("__mn")
    )
