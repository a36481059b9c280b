"""Novelty detection over dense yearly score series.

Semantics from the reference (timeseries.py:530-635, 735-833):

1. ``peak(keys, y) = score(y) - lag(score)(y)`` over the year-ordered series
   (undated bucket mapped to the sentinel year, NaN/NULL scores as 0);
   keep positive peaks only.
2. Each peak radiates a logistic decay over ``pos = 0..window`` years:
   ``peak / (1 + exp(scale * (pos - shift)))``.
3. ``novelty(keys, y) = round(max over radiating peaks, 3)``, re-attached to
   the full score table with a right join (preserving every score row),
   NULL novelty filled with 0, sentinel year restored to NULL.

The decay fan-out (posexplode of an 11-element sequence) happens *after*
the ``peak > 0`` filter, so the exploded row count is bounded by the number
of actual score jumps, not the dense grid — this is the property that keeps
the operator cheap at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseries_spark.config import EngineConfig


def add_novelty(
    scores: DataFrame,
    cfg: EngineConfig,
    key_cols: Sequence[str] = ("diseaseId", "targetId", "datasourceId"),
    year_col: str = "year",
    score_col: str = "score",
) -> DataFrame:
    """Append a ``novelty`` column to a dense yearly score table.

    Input/output grain: one row per (*key_cols, year); ``year`` may be NULL
    for the undated bucket (it participates as the sentinel year).
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(year_col)

    dense = scores.withColumn(
        year_col,
        F.coalesce(F.col(year_col), F.lit(cfg.sentinel_year)).cast("int"),
    )

    filled = F.coalesce(F.nanvl(F.col(score_col), F.lit(0.0)), F.lit(0.0))
    peaks = (
        dense.select(
            *keys,
            F.col(year_col).alias("peakYear"),
            (filled - F.lag(filled, offset=1).over(w)).alias("peak"),
        )
        .filter(F.col("peak") > 0)
        .select(
            "*",
            F.posexplode(
                F.sequence(F.col("peakYear"), F.col("peakYear") + cfg.novelty_window)
            ).alias("pos", year_col),
        )
        .groupBy(*keys, year_col)
        .agg(
            F.round(
                F.max(
                    F.col("peak")
                    / (1 + F.exp(cfg.novelty_scale * (F.col("pos") - cfg.novelty_shift)))
                ),
                3,
            ).alias("novelty")
        )
    )

    merged = peaks.join(dense, [*keys, year_col], "right")

    return merged.select(
        *keys,
        F.when(F.col(year_col) == cfg.sentinel_year, F.lit(None))
        .otherwise(F.col(year_col))
        .cast("int")
        .alias(year_col),
        score_col,
        F.coalesce(F.col("novelty"), F.lit(0.0)).alias("novelty"),
    )
