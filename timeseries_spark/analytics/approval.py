"""Novelty-vs-drug-approval analytics (reference novelty_approval.py).

Stage-3b: align each target's novelty-peak years against its first drug
approval year and accumulate the 'bell' matrix — how often novelty peaks
N years before/after approval.

Scale notes: the drugs table is dimension-sized (broadcast); the flag
matrix aggregates per target first (tiny) before the final sum, so the
expensive side is reduced before any wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseries_spark.analytics.distribution import peak_novelty_rows
from timeseries_spark.functions.inline import inline_rows


def novel_drug_targets(drugs: DataFrame, chembl_evidence: DataFrame) -> DataFrame:
    """Approved drug→target(→disease) links with first approval per target
    (novelty_approval.py:354-385): drugs joined to phase-4 clinical
    evidence links (distinct drugId/targetId/diseaseId), rows without a
    target or approval year dropped, then the per-target min-approval
    window with ties kept.

    Output: (drugId, drug, targetId, diseaseId, approvalYear), distinct.
    The links side is dimension-sized — broadcast."""
    links = (
        chembl_evidence.filter(F.col("clinicalPhase").cast("double") == 4.0)
        .select("drugId", "targetId", "diseaseId")
        .distinct()
    )
    w = Window.partitionBy("targetId")
    return (
        drugs.join(F.broadcast(links), "drugId", "left")
        .filter(
            F.col("targetId").isNotNull() & F.col("firstApprovalYear").isNotNull()
        )
        .withColumn("minApprovalYear", F.min("firstApprovalYear").over(w))
        .filter(F.col("minApprovalYear") == F.col("firstApprovalYear"))
        .select(
            "drugId",
            "drug",
            "targetId",
            "diseaseId",
            F.col("firstApprovalYear").alias("approvalYear"),
        )
        .distinct()
    )


def early_phase_targets(
    drugs: DataFrame,
    chembl_evidence: DataFrame,
    year_min: int = 2000,
    year_max: int = 2025,
) -> DataFrame:
    """The early-clinical-anchor variant (novelty_approval.py:1513-1550):
    instead of the approval year, each target is anchored on its FIRST
    early-phase (clinicalPhase <= 2) trial year, parsed from the ISO
    studyStartDate; per-target min window with ties kept, anchor bounded
    to [year_min, year_max].

    Output: (drugId, drug, targetId, diseaseId, clinicalYear), distinct —
    feed to ``approval_timeline(..., anchor_col='clinicalYear')``."""
    from timeseries_spark.operators.dating import year_from_iso

    links = (
        chembl_evidence.filter(F.col("clinicalPhase").cast("double") <= 2.0)
        .select(
            "drugId",
            "targetId",
            "diseaseId",
            year_from_iso("studyStartDate").alias("clinicalYear"),
        )
        .distinct()
    )
    w = Window.partitionBy("targetId")
    return (
        drugs.join(F.broadcast(links), "drugId", "left")
        .filter(
            F.col("targetId").isNotNull() & F.col("firstApprovalYear").isNotNull()
        )
        .withColumn("minClinicalYear", F.min("clinicalYear").over(w))
        .filter(F.col("minClinicalYear") == F.col("clinicalYear"))
        .filter(
            (F.col("clinicalYear") >= year_min)
            & (F.col("clinicalYear") <= year_max)
        )
        .select(
            "drugId",
            "drug",
            "targetId",
            "diseaseId",
            F.col("minClinicalYear").alias("clinicalYear"),
        )
        .distinct()
    )


def novel_drug_target_table(novel: DataFrame) -> DataFrame:
    """The novel_drug_target publication table (novelty_approval.py:
    387-390): distinct (targetId, diseaseId) pairs of approved drugs."""
    return novel.select("targetId", "diseaseId").distinct()


def phase_peaks(novel: DataFrame, chembl_dated: DataFrame) -> DataFrame:
    """Clinical-phase peak rows (novelty_approval.py:432-452): phases
    1.0/2.0 merged, first (min) dated year per (target, phase, drug),
    inner-joined to the approved set on (targetId, drugId); each phase
    becomes a pseudo-datasource with novelty pinned to 1.

    ``chembl_dated``: dated clinical evidence rows with (targetId,
    drugId, clinicalPhase, year) — callers pre-filter to the clinical
    source, as the reference filters datasourceId == 'chembl'."""
    merged = (
        chembl_dated.withColumn(
            "clinicalPhase",
            F.when(
                F.col("clinicalPhase").cast("string").isin("1.0", "2.0"),
                F.lit("1.0/2.0"),
            ).otherwise(F.col("clinicalPhase").cast("string")),
        )
        .groupBy("targetId", "clinicalPhase", "drugId")
        .agg(F.min("year").alias("year"))
    )
    return (
        novel.join(merged, ["targetId", "drugId"], "inner")
        .withColumn("novelty", F.lit(1.0))
        .withColumnRenamed("clinicalPhase", "datasourceId")
    )


def approval_timeline(
    novel: DataFrame,
    assoc: DataFrame,
    chembl_dated: DataFrame,
    datasources=(),
    anchor_col: str = "approvalYear",
) -> DataFrame:
    """The reference's full approval `results` table
    (novelty_approval.py:392-478): per-source novelty peaks of approved
    (disease, target) pairs — filter novelty > 0 and dated BEFORE the
    (targetId, datasourceId) argmax — unioned with the clinical-phase
    peaks, then the offset window, the `discard` flag (early-phase peaks
    AFTER approval are artifacts and are dropped), and the datatype
    rollup id (registry sources map to their aggregation_id; phase
    pseudo-sources pass through).

    Output columns: drugId, drug, targetId, diseaseId, approvalYear,
    datasourceId, year, novelty, window, discard, datatypeId."""
    sp = (
        novel.join(
            assoc.select(
                "targetId", "diseaseId", "year", "novelty", "datasourceId"
            ),
            ["diseaseId", "targetId"],
            "left",
        )
        .filter((F.col("novelty") > 0.0) & F.col("year").isNotNull())
        .withColumn(
            "maxNovelty",
            F.max("novelty").over(Window.partitionBy("targetId", "datasourceId")),
        )
        .filter(F.col("novelty") == F.col("maxNovelty"))
        .drop("maxNovelty")
    )
    results = (
        sp.unionByName(phase_peaks(novel, chembl_dated))
        .withColumn("window", F.col("year") - F.col(anchor_col))
        .withColumn(
            "discard",
            F.when(
                (F.col(anchor_col) < F.col("year"))
                & F.col("datasourceId").isin("1.0/2.0", "3.0"),
                F.lit(True),
            ).otherwise(F.lit(False)),
        )
        .filter(F.col("discard") == False)  # noqa: E712 — reference idiom
    )
    spark = novel.sparkSession
    reg = inline_rows(
        spark,
        [(ds.id, ds.aggregation_id) for ds in datasources]
        or [("__none__", "__none__")],
        "datasourceId string, datatypeId string",
    )
    return (
        results.join(F.broadcast(reg), "datasourceId", "left")
        .withColumn("datatypeId", F.coalesce("datatypeId", F.col("datasourceId")))
        .select(
            "drugId",
            "drug",
            "targetId",
            "diseaseId",
            anchor_col,
            "datasourceId",
            "year",
            "novelty",
            "window",
            "discard",
            "datatypeId",
        )
    )


def first_approval_year(drugs: DataFrame) -> DataFrame:
    """Earliest approval per target, ties kept: group-min window + equality
    filter (novelty_approval.py:368-376, W5). Input columns:
    (targetId, drugId, firstApprovalYear); output keeps the drug rows that
    achieved the minimum."""
    w = Window.partitionBy("targetId")
    return (
        drugs.filter(F.col("firstApprovalYear").isNotNull())
        .withColumn("minYear", F.min("firstApprovalYear").over(w))
        .filter(F.col("firstApprovalYear") == F.col("minYear"))
        .drop("minYear")
    )


def approval_peaks(
    assoc: DataFrame,
    cutoff: float = 0.1,
) -> DataFrame:
    """Per-(target, datasource) novelty-peak rows for the approval
    analyses, in the reference's filter-then-argmax order
    (novelty_approval.py:402-407): drop sub-cutoff and NULL-year rows
    FIRST, then keep rows at the group max — so a group whose global max
    sits on the undated bucket still surfaces its best dated peak. The
    argmax partition is (targetId, datasourceId) — disease is pooled,
    matching the reference window."""
    filtered = assoc.filter(
        (F.col("novelty") >= cutoff) & F.col("year").isNotNull()
    )
    return peak_novelty_rows(filtered, ("targetId", "datasourceId"))


def approval_bell_matrix(
    assoc: DataFrame,
    approvals: DataFrame,
    window: int = 5,
    cutoff: float = 0.1,
) -> DataFrame:
    """The 'bell' analysis (novelty_approval.py:392-407, 576-694): for
    each target with an approved drug, flag which offsets
    (peakYear − approvalYear, clamped to ±``window``) carry a novelty
    peak ≥ ``cutoff``, one flag row per target (A5 max-flag matrix), then
    sum flags across targets.

    ``assoc``: association rows with (targetId, datasourceId, year,
    novelty) — filtering and the per-(target, datasource) argmax run
    inside, filter-first (see ``approval_peaks``); ``approvals``:
    (targetId, firstApprovalYear). Output: one row per offset in
    [-window, window] with ``n_targets`` — how many targets peaked at
    that offset."""
    joined = approval_peaks(assoc, cutoff).join(
        F.broadcast(
            approvals.select(
                "targetId",
                F.col("firstApprovalYear").alias("approvalYear"),
            ).distinct()
        ),
        "targetId",
    )
    return offset_matrix(joined, window)


def offset_matrix(
    rows: DataFrame, window: int = 5, slice_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Shared offset-flag kernel (novelty_approval.py:576-694): per row
    compute offset = clamp(year − approvalYear, ±window); per
    (*slice_cols, target) keep a max-flag row per offset in ONE
    aggregation (A5 flag matrix — the expensive side reduces to one row
    per target before any wide operation); sum flags per slice; unpivot
    to long (offset, n_targets) form.

    ``rows`` needs (targetId, year, approvalYear) — either the
    peaks⋈approvals join or the full approval_timeline (which already
    carries phase-union rows), so the same kernel serves the bell, the
    per-approval-year cascade, and the timeline-driven variants."""
    joined = rows.withColumn(
        "offset",
        F.greatest(
            F.lit(-window),
            F.least(F.lit(window), F.col("year") - F.col("approvalYear")),
        ),
    )
    slices = list(slice_cols)
    flags = joined.groupBy(*slices, "targetId").agg(
        *[
            F.max(
                F.when(F.col("offset") == o, 1).otherwise(0)
            ).alias(f"off_{o + window}")
            for o in range(-window, window + 1)
        ]
    )
    summed = flags.groupBy(*slices).agg(
        *[
            F.sum(f"off_{o + window}").alias(f"off_{o + window}")
            for o in range(-window, window + 1)
        ]
    )
    # unpivot to (offset, n_targets) — presentation-friendly long form
    pairs = F.array(
        *[
            F.struct(
                F.lit(o).alias("offset"),
                F.col(f"off_{o + window}").alias("n_targets"),
            )
            for o in range(-window, window + 1)
        ]
    )
    return (
        summed.select(*slices, F.explode(pairs).alias("e"))
        .select(*slices, "e.offset", "e.n_targets")
        .orderBy(*slices, "offset")
    )


BELL_BINS: tuple[tuple[str, int | None, int | None], ...] = (
    # (label, lo, hi): lo <= offset < hi for negatives, lo < offset <= hi
    # for positives, exact 0 its own bucket — the reference's irregular
    # 4-year binning (novelty_approval.py:576-674)
    ("<-20", None, -20),
    ("[-20,-16)", -20, -16),
    ("[-16,-12)", -16, -12),
    ("[-12,-8)", -12, -8),
    ("[-8,-4)", -8, -4),
    ("[-4,0)", -4, 0),
    ("0", 0, 0),
    ("(0,4]", 0, 4),
    ("(4,8]", 4, 8),
    ("(8,12]", 8, 12),
    ("(12,16]", 12, 16),
    ("(16,20]", 16, 20),
    (">20", 20, None),
)


def _bin_condition(off, label: str, lo, hi):
    if label == "0":
        return off == 0
    if lo is None:
        return off < hi
    if hi is None:
        return off > lo
    if label.startswith("["):
        return (off >= lo) & (off < hi)
    return (off > lo) & (off <= hi)


def approval_bucket_bell(
    timeline: DataFrame,
    novel: DataFrame,
    year_min: int = 2000,
    year_max: int = 2025,
    datatype_groups: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """The reference's full bell analysis (novelty_approval.py:518-715):
    for approvals in [year_min, year_max], the percentage of approved
    targets whose timeline has >= 1 peak in each irregular offset bucket
    (4-year bins, exact-0 its own bucket, open tails), per datatype.

    ``datatype_groups`` remaps datatypes before bucketing (the reference
    collapses somatic_mutation+genetic_association -> somatic_genetic
    etc.); unmapped rows fall back to their datasourceId — NOT their
    datatypeId — exactly as the reference's ``otherwise(datasourceId)``
    does (novelty_approval.py:570), so passing ANY remap splits every
    unmapped datatype back out per source. Include an identity group
    (e.g. ``{"literature": ("literature",)}``) to keep a datatype
    aggregated. With no groups, datatypeId is kept as-is. The denominator — distinct approved
    targets in the window — joins in as a broadcast 1-row count, keeping
    the whole computation distributed (the reference divides a pandas
    frame by a driver-side count). Output: (datatypeId, years [bucket
    label], pct_with_peak) in long form."""
    rows = timeline.filter(
        (F.col("approvalYear") >= year_min) & (F.col("approvalYear") <= year_max)
    )
    if datatype_groups:
        expr = None
        for new, olds in datatype_groups.items():
            cond = F.col("datatypeId").isin(*olds)
            expr = F.when(cond, F.lit(new)) if expr is None else expr.when(
                cond, F.lit(new)
            )
        rows = rows.withColumn(
            "datatypeId", expr.otherwise(F.col("datasourceId"))
        )
    off = F.col("year") - F.col("approvalYear")
    flagged = rows.select(
        "targetId",
        "datatypeId",
        *[
            F.when(_bin_condition(off, label, lo, hi), 1)
            .otherwise(0)
            .alias(f"b{i}")
            for i, (label, lo, hi) in enumerate(BELL_BINS)
        ],
    )
    per_target = flagged.groupBy("targetId", "datatypeId").agg(
        *[F.max(f"b{i}").alias(f"b{i}") for i in range(len(BELL_BINS))]
    )
    summed = per_target.groupBy("datatypeId").agg(
        *[F.sum(f"b{i}").alias(f"b{i}") for i in range(len(BELL_BINS))]
    )
    denom = (
        novel.filter(
            (F.col("approvalYear") >= year_min)
            & (F.col("approvalYear") <= year_max)
        )
        .agg(F.countDistinct("targetId").alias("__n_targets"))
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(label).alias("years"),
                F.col(f"b{i}").alias("n"),
            )
            for i, (label, _, _) in enumerate(BELL_BINS)
        ]
    )
    return (
        summed.crossJoin(F.broadcast(denom))
        .select("datatypeId", "__n_targets", F.explode(pairs).alias("e"))
        .select(
            "datatypeId",
            F.col("e.years").alias("years"),
            F.round(
                F.col("e.n") * 100.0 / F.col("__n_targets"), 4
            ).alias("pct_with_peak"),
        )
    )


def approval_bell_from_timeline(
    timeline: DataFrame, window: int = 5
) -> DataFrame:
    """The bell over the FULL approval `results` table — source peaks AND
    clinical-phase rows, discard already applied (the reference's actual
    bell input, novelty_approval.py:552-694). No extra novelty filter:
    the timeline rows already carry their own."""
    return offset_matrix(
        timeline.select("targetId", "year", "approvalYear"), window
    )


def approval_cascade_from_timeline(
    timeline: DataFrame, window: int = 5
) -> DataFrame:
    """The cascade over the full `results` table, sliced per approval year
    (novelty_approval.py:897-949)."""
    return offset_matrix(
        timeline.select("targetId", "year", "approvalYear"),
        window,
        slice_cols=("approvalYear",),
    )


def approval_cascade(
    assoc: DataFrame,
    approvals: DataFrame,
    window: int = 5,
    cutoff: float = 0.1,
) -> DataFrame:
    """The 'cascade' analysis (novelty_approval.py:897-931, 2060-2068):
    the bell matrix sliced per approval year — for each
    (approvalYear, offset) cell, how many targets had a novelty peak at
    that offset from that year's approvals. The reference writes one
    output partition per approval year; here the partition column is in
    the result (callers ``write_parquet(partition_by='approvalYear')``).

    Filtering + argmax run inside, filter-first (``approval_peaks``).
    Shares the per-target flag aggregation with the bell: flags first
    (one row per target × approval year — tiny), sums after."""
    joined = approval_peaks(assoc, cutoff).join(
        F.broadcast(
            approvals.select(
                "targetId",
                F.col("firstApprovalYear").alias("approvalYear"),
            ).distinct()
        ),
        "targetId",
    )
    return offset_matrix(joined, window, slice_cols=("approvalYear",))
