"""Yearly cumulative harmonic-sum association scores.

Semantics from the reference (timeseries.py:369-527, 638-732): for each key
group (disease, target[, datasource]) and each year in a dense spine
``first_year..last_year+1``:

    score(keys, y) = sum_{i=1..k} top_i({score(e) : e dated <= y}) / i^2
                     / max_score

with NaN evidence scores dropped, undated evidence mapped to the sentinel
year ``last_year + 1`` (so the sentinel row is the all-time score) and
restored to NULL on output, and NULL (not 0) score for years before the
first evidence.

Scale design (SURVEY.md §7 risks / §4): the reference accumulates *all*
scores per group before top-k slicing — the cumulative array is the memory
hot spot. Because top-k of a union equals top-k of the union of per-part
top-ks, we pre-truncate each year's scores to the top-k *before* the
cumulative window, bounding the window state to ``k × |years|`` elements per
group regardless of evidence volume. Verified equivalent by the DuckDB
oracle and property tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseries_spark.config import EngineConfig
from timeseries_spark.functions.arrays import harmonic_sum, top_k_desc
from timeseries_spark.operators.scaffold import dense_scaffold, year_spine


def association_score(
    evidence_dated: DataFrame,
    cfg: EngineConfig,
    key_cols: Sequence[str] = ("diseaseId", "targetId", "datasourceId"),
    year_col: str = "year",
    score_col: str = "score",
    weights: dict[str, float] | None = None,
    weight_key: str = "datasourceId",
) -> DataFrame:
    """Dense yearly harmonic scores per key group.

    ``weights`` (overall grain, timeseries.py:689-691): evidence scores are
    scaled by their datasource weight before aggregation; the weight map is
    tiny (23 sources) and joined broadcast.

    Output columns: ``*key_cols, year (int, NULL = undated bucket), score``.
    """
    spark = evidence_dated.sparkSession
    keys = list(key_cols)

    data = evidence_dated.withColumn(
        year_col,
        F.coalesce(F.col(year_col), F.lit(cfg.sentinel_year)).cast("int"),
    )
    if weights is not None:
        wdf = spark.createDataFrame(
            [(k, float(v)) for k, v in weights.items()],
            schema=f"{weight_key} string, weight double",
        )
        # unknown sources default to weight 1.0 (the reference's registry
        # always covers its sources; NULL-ing their scores would silently
        # drop evidence)
        data = data.join(F.broadcast(wdf), weight_key, "left").withColumn(
            score_col, F.col(score_col) * F.coalesce(F.col("weight"), F.lit(1.0))
        )

    # 1 shuffle at evidence grain: per-(keys, year) score arrays, truncated
    # to top-k immediately (see module docstring).
    per_year = (
        data.groupBy(*keys, year_col)
        .agg(F.collect_list(score_col).alias("year_scores"))
        .withColumn("year_scores", top_k_desc(F.col("year_scores"), cfg.top_k))
    )

    # densify post-aggregation (cheaper than the reference's pre-group
    # scaffold: empty cells never enter the groupBy).
    spine = year_spine(spark, cfg.first_year, cfg.last_year, include_sentinel=True)
    dense = dense_scaffold(per_year, keys, spine, year_col).withColumn(
        "year_scores", F.coalesce(F.col("year_scores"), F.array().cast("array<double>"))
    )

    # cumulative window: all top-k arrays up to each year (timeseries.py:473-487)
    w = (
        Window.partitionBy(*keys)
        .orderBy(year_col)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    # NOTE on AQE coalescing (round-7 event log): the window's input is
    # top-k arrays — few BYTES per key but real flatten/harmonic
    # compute — and AQE may coalesce the cumulative stage aggressively.
    # An explicit keyed repartition here does NOT help: when its
    # partitioning matches the window's requirement Catalyst replaces
    # it with a plain ENSURE_REQUIREMENTS exchange (verified on the
    # executed plan), and when the session's shuffle-partition count
    # differs it survives as a REDUNDANT extra shuffle. The honest
    # lever at deployment scale is advisoryPartitionSizeInBytes /
    # coalescePartitions.minPartitionNum, not a plan-level pin.
    cum = dense.withColumn(
        "cum_scores", F.flatten(F.collect_list("year_scores").over(w))
    )

    scored = cum.withColumn(
        "score",
        harmonic_sum(top_k_desc(F.col("cum_scores"), cfg.top_k))
        / F.lit(cfg.max_score),
    )

    # sentinel restore (timeseries.py:519-523)
    return scored.select(
        *keys,
        F.when(F.col(year_col) == cfg.sentinel_year, F.lit(None))
        .otherwise(F.col(year_col))
        .cast("int")
        .alias(year_col),
        "score",
    )


def overall_score(
    per_source: DataFrame,
    cfg: EngineConfig,
    key_cols: Sequence[str] = ("diseaseId", "targetId"),
    source_col: str = "datasourceId",
    year_col: str = "year",
    score_col: str = "score",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Overall association score from the per-datasource score table — the
    reference's two-level harmonic (timeseries.py:638-732).

    Each per-source score is already a cumulative top-k harmonic sum
    normalized by ``max_score``; the overall grain weights those scores by
    datasource, collects them per (*key_cols, year), and applies the
    harmonic sum AGAIN with a second ``/max_score`` normalization
    (timeseries.py:687-718 — the double normalization is deliberate
    reference behavior, not a bug here). No cumulative window: the
    per-source series are already cumulative, so one groupBy per year
    suffices — a single shuffle at (keys, year) grain.

    The per-source input is dense over the full year spine for every key
    group, so the output is dense too; years with no scored source fold to
    NULL score (empty-array harmonic), matching the reference's
    NULL-propagating fold. Unknown sources default to weight 1.0
    (documented departure: the reference's LEFT weight join NULLs their
    scores out, silently dropping the source — its registry always covers
    its sources, so the cases never diverge in practice).
    """
    spark = per_source.sparkSession
    keys = list(key_cols)

    data = per_source.withColumn(
        year_col,
        F.coalesce(F.col(year_col), F.lit(cfg.sentinel_year)).cast("int"),
    )
    if weights is not None:
        wdf = spark.createDataFrame(
            [(k, float(v)) for k, v in weights.items()],
            schema=f"{source_col} string, weight double",
        )
        data = data.join(F.broadcast(wdf), source_col, "left").withColumn(
            score_col, F.col(score_col) * F.coalesce(F.col("weight"), F.lit(1.0))
        )

    pooled = data.groupBy(*keys, year_col).agg(
        F.collect_list(score_col).alias("source_scores")
    )
    scored = pooled.withColumn(
        score_col,
        harmonic_sum(top_k_desc(F.col("source_scores"), cfg.top_k))
        / F.lit(cfg.max_score),
    )
    return scored.select(
        *keys,
        F.when(F.col(year_col) == cfg.sentinel_year, F.lit(None))
        .otherwise(F.col(year_col))
        .cast("int")
        .alias(year_col),
        score_col,
    )
