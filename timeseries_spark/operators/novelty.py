"""Novelty detection over dense yearly score series.

Semantics from the reference (timeseries.py:530-635, 735-833):

1. ``peak(keys, y) = score(y) - lag(score)(y)`` over the year-ordered series
   (undated bucket mapped to the sentinel year, NaN/NULL scores as 0);
   keep positive peaks only.
2. Each peak radiates a logistic decay over ``pos = 0..window`` years:
   ``peak / (1 + exp(scale * (pos - shift)))``.
3. ``novelty(keys, y) = round(max over radiating peaks, 3)`` on every score
   row, NULL novelty as 0, sentinel year restored to NULL.

Physical design — deliberately NOT the reference's plan. The reference
runs lag-window → filter → posexplode → groupBy → right-join back onto the
score table, which (a) shuffles three more times and (b) evaluates the
whole upstream scoring subtree twice unless it is persisted
(timeseries.py:766-768). A dense yearly series is tiny per key (~30
elements), so this operator instead collects each key's series into ONE
array and computes peaks + decay + per-year max entirely with higher-order
functions: a single groupBy that reuses the scoring window's hash
partitioning (zero additional Exchange in the combined plan), no second
subtree, no persist needed. Verified equivalent to the reference plan by
the DuckDB oracle, which implements the reference's own formulation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from timeseries_spark.config import EngineConfig


def _peaks(series: Column) -> Column:
    """Positive year-over-year jumps of a year-sorted series:
    ``array<struct<py:int, pk:double>>``. NaN/NULL scores count as 0
    (the reference's fillna before the lag, timeseries.py:584-586)."""
    filled = F.transform(
        series,
        lambda s: F.coalesce(F.nanvl(s["score"], F.lit(0.0)), F.lit(0.0)),
    )
    n = F.size(series)
    return F.when(
        n >= 2,
        F.filter(
            F.transform(
                F.sequence(F.lit(2), F.greatest(n, F.lit(2))),
                lambda i: F.struct(
                    F.element_at(series, i)["year"].alias("py"),
                    (
                        F.element_at(filled, i) - F.element_at(filled, i - 1)
                    ).alias("pk"),
                ),
            ),
            lambda p: p["pk"] > 0,
        ),
    ).otherwise(F.array().cast("array<struct<py:int,pk:double>>"))


def _novelty_series(
    series: Column, peaks: Column, cfg: EngineConfig
) -> Column:
    """Given ``array<struct<year:int, score:double>>`` sorted by year and
    its precomputed ``peaks`` (materialized as a column so codegen does not
    re-inline the peak scan per element), return
    ``array<struct<year, score, novelty>>`` (same order)."""
    years = F.transform(series, lambda s: s["year"])

    def novelty_at(j: Column) -> Column:
        yj = F.element_at(years, j)
        cands = F.filter(
            peaks,
            lambda p: (yj - p["py"] >= 0) & (yj - p["py"] <= cfg.novelty_window),
        )
        return F.round(
            F.coalesce(
                F.array_max(
                    F.transform(
                        cands,
                        lambda p: p["pk"]
                        / (
                            1
                            + F.exp(
                                cfg.novelty_scale
                                * (yj - p["py"] - cfg.novelty_shift)
                            )
                        ),
                    )
                ),
                F.lit(0.0),
            ),
            3,
        )

    return F.transform(
        F.sequence(F.lit(1), F.size(series)),
        lambda j: F.struct(
            F.element_at(years, j).alias("year"),
            F.element_at(F.transform(series, lambda s: s["score"]), j).alias(
                "score"
            ),
            novelty_at(j).alias("novelty"),
        ),
    )


def add_novelty(
    scores: DataFrame,
    cfg: EngineConfig,
    key_cols: Sequence[str] = ("diseaseId", "targetId", "datasourceId"),
    year_col: str = "year",
    score_col: str = "score",
) -> DataFrame:
    """Append a ``novelty`` column to a dense yearly score table.

    Input/output grain: one row per (*key_cols, year); ``year`` may be NULL
    for the undated bucket (it participates as the sentinel year and is
    restored to NULL on output).
    """
    keys = list(key_cols)

    dense = scores.withColumn(
        year_col,
        F.coalesce(F.col(year_col), F.lit(cfg.sentinel_year)).cast("int"),
    )

    # one series array per key; array_sort on struct orders by year (first
    # field; years are unique within a key)
    grouped = dense.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(year_col).alias("year"),
                    F.col(score_col).cast("double").alias("score"),
                )
            )
        ).alias("series")
    )

    out = grouped.withColumn("peaks", _peaks(F.col("series"))).select(
        *keys,
        F.explode(
            _novelty_series(F.col("series"), F.col("peaks"), cfg)
        ).alias("e"),
    )
    return out.select(
        *keys,
        F.when(F.col("e.year") == cfg.sentinel_year, F.lit(None))
        .otherwise(F.col("e.year"))
        .cast("int")
        .alias(year_col),
        F.col("e.score").alias(score_col),
        F.col("e.novelty").alias("novelty"),
    )
