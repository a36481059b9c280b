"""Novelty-distribution analytics (reference novelty_distribution.py).

Given the engine's association tables (score + novelty at (d,t[,ds],year)
grain), these operators answer "how many novel associations / targets per
year, per datasource, per therapeutic area?" — the reference's stage-3a.

Scale notes: the disease→TA dimension is tiny and broadcast; peak
detection is a window over the dense series (already partitioned by the
association keys); the final counts aggregate the *peak rows only* (one
row per association), so the big dense table is reduced before the count
shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from timeseries_spark.functions.inline import inline_rows


def top_therapeutic_area(
    disease: DataFrame, ta_ranking: Sequence[str]
) -> DataFrame:
    """One therapeutic area per disease: explode ``therapeuticAreas``,
    rank by the caller's priority list (earlier = higher priority,
    unlisted areas last), keep the row_number()==1 row
    (novelty_distribution.py:60-108, W3).

    Output: (diseaseId, therapeuticArea)."""
    spark = disease.sparkSession
    rank_df = inline_rows(
        spark,
        [(ta, i) for i, ta in enumerate(ta_ranking)],
        "therapeuticArea string, ranking int",
    )
    exploded = disease.select(
        F.col("id").alias("diseaseId"),
        F.explode("therapeuticAreas").alias("therapeuticArea"),
    ).join(F.broadcast(rank_df), "therapeuticArea", "left")
    w = Window.partitionBy("diseaseId").orderBy(
        F.coalesce(F.col("ranking"), F.lit(2**31 - 1)), "therapeuticArea"
    )
    return (
        exploded.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("diseaseId", "therapeuticArea")
    )


def peak_novelty_rows(
    assoc: DataFrame,
    key_cols: Sequence[str] = ("diseaseId", "targetId", "datasourceId"),
) -> DataFrame:
    """Rows where novelty equals the group's maximum — the argmax-with-ties
    idiom; the float-equality filter is load-bearing: ties stay, never
    'fix' into row_number (novelty_distribution.py:720-726, W4;
    SURVEY.md §7)."""
    w = Window.partitionBy(*key_cols)
    return (
        assoc.withColumn("max_novelty", F.max("novelty").over(w))
        .filter(F.col("novelty") == F.col("max_novelty"))
        .drop("max_novelty")
    )


def novelty_distribution(
    assoc: DataFrame,
    disease_ta: DataFrame,
    cutoff: float = 0.1,
    year_min: int = 2000,
    year_max: int = 2025,
    key_cols: Sequence[str] = ("diseaseId", "targetId", "datasourceId"),
) -> DataFrame:
    """Counts of novel associations and novel targets per
    (year, datasourceId, therapeuticArea), densified over the full
    ``year_min..year_max`` year spine × the sources and TAs PRESENT IN
    THE PEAK ROWS, zero-filled (novelty_distribution.py:640-809). A
    source or TA with zero surviving peaks does not appear at all — the
    reference builds its scaffold from the post-filter data
    (novelty_distribution.py:744-745), and this matches it exactly.

    Reference-order semantics (novelty_distribution.py:649-726): the year
    bounds and ``novelty >= cutoff`` filters and the TA join run BEFORE
    the per-group max-novelty window, so a group whose global max lands
    on the NULL-year undated bucket (or outside the bounds) still counts
    its best surviving dated peak — filter-then-argmax, not the reverse.

    Counting (novelty_distribution.py:746-764): ``association`` counts
    distinct (disease,target) pairs peaking in each (year, ds, TA) cell;
    ``target`` counts each target only at its FIRST peak year per
    datasource — min(year) per (datasourceId, targetId), NOT split by TA
    — so a target with tied peaks across years/TAs is counted once. The
    target counts join the grid on (datasourceId, year) alone and repeat
    across that cell's TAs, exactly as the reference's second join does.

    ``disease_ta`` is (diseaseId, therapeuticArea) — typically
    ``top_therapeutic_area`` output — and is broadcast."""
    peaks = distribution_peaks(
        assoc, disease_ta, cutoff, year_min, year_max, key_cols
    )
    return _dense_counts(peaks, "datasourceId", year_min, year_max)


def distribution_peaks(
    assoc: DataFrame,
    disease_ta: DataFrame,
    cutoff: float = 0.1,
    year_min: int = 2000,
    year_max: int = 2025,
    key_cols: Sequence[str] = ("diseaseId", "targetId", "datasourceId"),
) -> DataFrame:
    """Filter-then-argmax peak rows shared by the per-datasource and
    per-datatype distribution variants (novelty_distribution.py:647-735)."""
    filtered = (
        assoc.filter(
            (F.col("year") >= year_min)
            & (F.col("year") <= year_max)
            & (F.col("novelty") >= cutoff)
        )
        .join(F.broadcast(disease_ta), "diseaseId")
    )
    return peak_novelty_rows(filtered, key_cols)


def _dense_counts(
    peaks: DataFrame, grain: str, year_min: int, year_max: int
) -> DataFrame:
    """Distinct association counts per (year, grain, TA) + first-peak-year
    target counts per (year, grain), densified and zero-filled — the
    counting block the reference runs once per grain
    (novelty_distribution.py:737-809)."""
    assoc_counts = peaks.groupBy("year", grain, "therapeuticArea").agg(
        F.countDistinct(
            F.concat(F.col("targetId"), F.col("diseaseId"))
        ).alias("association")
    )
    # first peak year per (grain, target) — then count per (year, grain)
    # (novelty_distribution.py:755-760)
    target_counts = (
        peaks.groupBy(grain, "targetId")
        .agg(F.min("year").alias("year"))
        .groupBy("year", grain)
        .agg(F.countDistinct("targetId").alias("target"))
    )
    # dense scaffold: every (year, grain, TA) cell exists, zero-filled
    # (J7 — each distinct side is tiny, the cross join is broadcast)
    spark = peaks.sparkSession
    years = spark.range(1).select(
        F.explode(F.sequence(F.lit(year_min), F.lit(year_max))).alias("year")
    )
    # broadcast the distinct sides: each is O(10) rows, and without the
    # hint the planner falls back to CartesianProduct — a full shuffle of
    # both sides that would serialize the spine build at scale
    spine = (
        years.crossJoin(F.broadcast(peaks.select(grain).distinct()))
        .crossJoin(F.broadcast(peaks.select("therapeuticArea").distinct()))
    )
    return (
        spine.join(assoc_counts, ["year", grain, "therapeuticArea"], "left")
        .join(target_counts, ["year", grain], "left")
        .na.fill(0, ["association", "target"])
    )


def by_datatype(
    assoc: DataFrame,
    disease_ta: DataFrame,
    cfg,
    cutoff: float = 0.1,
    year_min: int = 2000,
    year_max: int = 2025,
) -> DataFrame:
    """The datatype-grain distribution (novelty_distribution.py:775-809):
    the SAME peak rows re-counted at datatypeId grain — distinct pairs and
    first-peak-year targets computed per datatype, NOT by summing the
    per-source counts (a pair peaking in two sources of one datatype
    counts once, as the reference's collect_set does). Sources map to
    their registry ``aggregation_id`` (broadcast); unregistered sources
    keep their own id."""
    reg = inline_rows(
        assoc.sparkSession,
        [(ds.id, ds.aggregation_id) for ds in cfg.datasources],
        "datasourceId string, datatypeId string",
    )
    peaks = (
        distribution_peaks(assoc, disease_ta, cutoff, year_min, year_max)
        .join(F.broadcast(reg), "datasourceId", "left")
        .withColumn("datatypeId", F.coalesce("datatypeId", F.col("datasourceId")))
    )
    return _dense_counts(peaks, "datatypeId", year_min, year_max)


def novel_pairs_at(
    assoc: DataFrame,
    disease_ta: DataFrame,
    year: int,
    cutoff: float = 0.1,
    exclude: Sequence[str] = (),
) -> DataFrame:
    """'Novels in <year>' (novelty_distribution.py:404-509): distinct
    (disease, target) pairs whose novelty is >= ``cutoff`` AT the given
    year, inner-joined to their therapeutic area, with the reference's
    exclusion list applied to BOTH the TA and the disease id (the
    catch-all ontology roots). Pass ``year=None``-like usage via the
    ``all_pairs_at`` helper for the denominator set."""
    out = (
        assoc.filter((F.col("novelty") >= cutoff) & (F.col("year") == year))
        .select("targetId", "diseaseId")
        .distinct()
        .join(F.broadcast(disease_ta), "diseaseId")
    )
    if exclude:
        out = out.filter(~F.col("therapeuticArea").isin(*exclude)).filter(
            ~F.col("diseaseId").isin(*exclude)
        )
    return out


def all_pairs_at(
    assoc: DataFrame, disease_ta: DataFrame, exclude: Sequence[str] = ()
) -> DataFrame:
    """The denominator set: every distinct (disease, target) pair in the
    association table, TA-joined with the same exclusions
    (novelty_distribution.py:406-437)."""
    out = (
        assoc.select("targetId", "diseaseId")
        .distinct()
        .join(F.broadcast(disease_ta), "diseaseId")
    )
    if exclude:
        out = out.filter(~F.col("therapeuticArea").isin(*exclude)).filter(
            ~F.col("diseaseId").isin(*exclude)
        )
    return out


def biotype_breakdown(pairs: DataFrame, target: DataFrame) -> DataFrame:
    """Novel-target counts by biotype (novelty_distribution.py:488-509):
    distinct targets of the pair set, left-joined to the broadcast target
    dimension, counted per biotype."""
    return (
        pairs.select("targetId")
        .distinct()
        .join(
            F.broadcast(
                target.select(F.col("id").alias("targetId"), "biotype")
            ),
            "targetId",
            "left",
        )
        .groupBy("biotype")
        .agg(F.countDistinct("targetId").alias("n_targets"))
    )


def target_facet_counts(
    novel_targets: DataFrame, prioritisation: DataFrame
) -> DataFrame:
    """Target-prioritisation facets over novel targets
    (novelty_distribution.py:492-556): left-join the per-target
    prioritisation flags (broadcast dimension) and count novel targets
    per (year, datasourceId) split by tractability/safety facets, one
    conditional aggregation per facet in a single pass."""
    flags = prioritisation.select(
        "targetId",
        F.coalesce(F.col("hasLigand").cast("int"), F.lit(0)).alias("lig"),
        F.coalesce(F.col("hasSafetyEvent").cast("int"), F.lit(0)).alias("saf"),
    )
    return (
        novel_targets.join(F.broadcast(flags), "targetId", "left")
        .na.fill(0, ["lig", "saf"])
        .groupBy("year", "datasourceId")
        .agg(
            F.countDistinct("targetId").alias("n_targets"),
            F.countDistinct(
                F.when(F.col("lig") == 1, F.col("targetId"))
            ).alias("n_with_ligand"),
            F.countDistinct(
                F.when(F.col("saf") == 1, F.col("targetId"))
            ).alias("n_with_safety_event"),
        )
    )
