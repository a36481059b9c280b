"""Stage-3 long-tail analytics, oracle-gated (SURVEY.md §2; reference
novelty_distribution.py + novelty_approval.py compositions).

These queries close the last pytest-only gap: the datatype-grain novelty
distribution, the irregular-bin approval "bell", the per-approval-year
cascade, the early-clinical-anchor timeline, and the target-prioritisation
facets — each run through the REAL analytics operators over the composed
domain pipeline (the same staged tables as queries/domain.py), with a
DuckDB oracle that rebuilds the identical result from the raw TPC-H views.

Scale notes: every query reduces the dense association table to peak rows
(one row per association) before any counting shuffle; dimensions
(therapeutic areas, drugs, prioritisation flags) are broadcast; the bell /
cascade aggregate per-target flag rows (tiny) before the final sums.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_spark.analytics.approval import BELL_BINS
from timeseries_spark.functions.inline import inline_rows
from timeseries_spark.queries import load, query
from timeseries_spark.queries.domain import (
    DOMAIN_CFG,
    DOMAIN_SOURCES,
    _DS_DENSE_SQL,
    _DS_NOVELTY_SQL,
    _NDT_SQL,
    _domain_chembl,
    _domain_drugs,
    _pipeline_tables,
)

YEAR_MIN, YEAR_MAX = 1995, 2001
CUTOFF = 0.1

# per-source association series with sentinel year restored to NULL and
# novelty zero-filled — the table every stage-3 analysis consumes
_ASSOC_SQL = """
    , assoc AS (
      SELECT d.diseaseId, d.targetId, d.datasourceId,
             CASE WHEN d.year = 2002 THEN NULL ELSE d.year END AS year,
             coalesce(n.novelty, 0.0) AS novelty
      FROM dense d
      LEFT JOIN nov n USING (diseaseId, targetId, datasourceId, year)
    )
"""

# nation → region therapeutic-area dimension (novels_in_year's mapping):
# every expanded disease (N*, R*, ROOT) carries exactly one TA
_TA_SQL = """
    , ta AS (
      SELECT 'N' || n_nationkey AS diseaseId,
             'R' || n_regionkey AS therapeuticArea FROM nation
      UNION ALL
      SELECT DISTINCT 'R' || n_regionkey, 'R' || n_regionkey FROM nation
      UNION ALL SELECT 'ROOT', 'ROOT'
    )
"""

# registry datasource → datatype rollup (DOMAIN_SOURCES aggregation ids)
_DT_CASE = """CASE datasourceId
             WHEN '1-URGENT' THEN 'fast' WHEN '2-HIGH' THEN 'fast'
             WHEN '3-MEDIUM' THEN 'mid' WHEN '4-NOT SPECIFIED' THEN 'slow'
             WHEN '5-LOW' THEN 'slow' ELSE datasourceId END"""

# filter-then-argmax peak rows at (d, t, ds) grain with the TA joined —
# the shared input of the distribution and facet queries
# (novelty_distribution.py:647-735 order: bounds + cutoff BEFORE the max)
_DSPEAKS_SQL = f"""
    , dspeaks AS (
      SELECT diseaseId, targetId, datasourceId, year, novelty,
             therapeuticArea
      FROM (
        SELECT a.diseaseId, a.targetId, a.datasourceId, a.year, a.novelty,
               t.therapeuticArea,
               max(a.novelty) OVER (
                 PARTITION BY a.diseaseId, a.targetId, a.datasourceId
               ) AS mx
        FROM assoc a JOIN ta t USING (diseaseId)
        WHERE a.year BETWEEN {YEAR_MIN} AND {YEAR_MAX}
          AND a.novelty >= {CUTOFF}
      ) WHERE novelty = mx
    )
"""


def _domain_ta(spark, sf_dir):
    """(diseaseId, therapeuticArea) over the expanded disease ids —
    nations map to their region, regions and ROOT to themselves (the
    reference's top_therapeutic_area output shape,
    novelty_distribution.py:60-108)."""
    nation = load(spark, sf_dir, "nation")
    return (
        nation.select(
            F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias(
                "diseaseId"
            ),
            F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias(
                "therapeuticArea"
            ),
        )
        .unionByName(
            nation.select(
                F.concat(
                    F.lit("R"), F.col("n_regionkey").cast("string")
                ).alias("diseaseId"),
                F.concat(
                    F.lit("R"), F.col("n_regionkey").cast("string")
                ).alias("therapeuticArea"),
            ).distinct()
        )
        .unionByName(
            inline_rows(
                nation.sparkSession,
                [("ROOT", "ROOT")],
                "diseaseId string, therapeuticArea string",
            )
        )
    )


@query(
    "datatype_distribution",
    oracle=_DS_DENSE_SQL
    + _DS_NOVELTY_SQL
    + _ASSOC_SQL
    + _TA_SQL
    + _DSPEAKS_SQL
    + f"""
    , dtpeaks AS (
      SELECT diseaseId, targetId, {_DT_CASE} AS datatypeId, year,
             therapeuticArea
      FROM dspeaks
    ),
    acounts AS (
      SELECT year, datatypeId, therapeuticArea,
             CAST(count(DISTINCT targetId || diseaseId) AS BIGINT)
               AS association
      FROM dtpeaks GROUP BY year, datatypeId, therapeuticArea
    ),
    tcounts AS (
      SELECT year, datatypeId,
             CAST(count(DISTINCT targetId) AS BIGINT) AS target
      FROM (
        SELECT datatypeId, targetId, min(year) AS year
        FROM dtpeaks GROUP BY datatypeId, targetId
      ) GROUP BY year, datatypeId
    ),
    dyears AS (
      SELECT unnest(generate_series({YEAR_MIN}, {YEAR_MAX})) AS year
    ),
    dspine AS (
      SELECT * FROM dyears
      CROSS JOIN (SELECT DISTINCT datatypeId FROM dtpeaks)
      CROSS JOIN (SELECT DISTINCT therapeuticArea FROM dtpeaks)
    )
    SELECT s.year, s.datatypeId, s.therapeuticArea,
           CAST(coalesce(a.association, 0) AS BIGINT) AS association,
           CAST(coalesce(t.target, 0) AS BIGINT) AS target
    FROM dspine s
    LEFT JOIN acounts a USING (year, datatypeId, therapeuticArea)
    LEFT JOIN tcounts t USING (year, datatypeId)
    """,
)
def datatype_distribution(spark, sf_dir):
    """The datatype-grain novelty distribution (novelty_distribution.py:
    775-809): peak rows re-counted at datatypeId grain — distinct
    (target, disease) pairs per (year, datatype, TA) plus first-peak-year
    target counts per (year, datatype), densified over the year spine ×
    the datatypes and TAs present in the peaks, zero-filled. Sources map
    to their registry aggregation_id via a broadcast dimension."""
    from timeseries_spark.analytics.distribution import by_datatype

    _, by_ds = _pipeline_tables(spark, sf_dir)
    ta = _domain_ta(spark, sf_dir)
    return by_datatype(
        by_ds, ta, DOMAIN_CFG, cutoff=CUTOFF,
        year_min=YEAR_MIN, year_max=YEAR_MAX,
    )


@query(
    "facet_target_counts",
    oracle=_DS_DENSE_SQL
    + _DS_NOVELTY_SQL
    + _ASSOC_SQL
    + _TA_SQL
    + _DSPEAKS_SQL
    + """
    , prior AS (
      SELECT 'T' || i AS targetId,
             CASE WHEN i % 7 != 0
                  THEN CAST(i % 3 = 0 AS INT) END AS lig,
             CAST(i % 5 = 0 AS INT) AS saf
      FROM (SELECT unnest(generate_series(0, 39)) AS i)
    )
    SELECT p.year, p.datasourceId,
           CAST(count(DISTINCT p.targetId) AS BIGINT) AS n_targets,
           CAST(count(DISTINCT CASE WHEN coalesce(pr.lig, 0) = 1
                                    THEN p.targetId END) AS BIGINT)
             AS n_with_ligand,
           CAST(count(DISTINCT CASE WHEN pr.saf = 1
                                    THEN p.targetId END) AS BIGINT)
             AS n_with_safety_event
    FROM dspeaks p LEFT JOIN prior pr USING (targetId)
    GROUP BY p.year, p.datasourceId
    """,
)
def facet_target_counts(spark, sf_dir):
    """Target-prioritisation facets over novel targets
    (novelty_distribution.py:492-556): the peak rows left-join a
    broadcast per-target flag dimension (hasLigand nullable — NULL means
    unknown and counts as 0, exactly the reference's fillna) and one pass
    counts novel targets per (year, datasource) split by
    tractability/safety facets."""
    from timeseries_spark.analytics.distribution import (
        distribution_peaks,
        target_facet_counts,
    )

    _, by_ds = _pipeline_tables(spark, sf_dir)
    ta = _domain_ta(spark, sf_dir)
    peaks = distribution_peaks(
        by_ds, ta, cutoff=CUTOFF, year_min=YEAR_MIN, year_max=YEAR_MAX
    )
    prior = spark.range(40).select(
        F.concat(F.lit("T"), F.col("id").cast("string")).alias("targetId"),
        F.when(
            F.pmod("id", F.lit(7)) != 0, F.pmod("id", F.lit(3)) == 0
        ).alias("hasLigand"),
        (F.pmod("id", F.lit(5)) == 0).alias("hasSafetyEvent"),
    )
    return target_facet_counts(peaks, prior)


def _timeline_sql(novel_cte: str, anchor: str) -> str:
    """The approval `results`-table CTE (novelty_approval.py:392-478),
    parametrized by the anchor column: per-source novelty peaks of the
    anchored targets (filter novelty>0 + dated BEFORE the
    (target, source) argmax), unioned with the merged clinical-phase
    first-year rows (novelty=1), post-anchor early-phase artifacts
    discarded, datasources rolled up to datatypes."""
    return f"""
    , sp AS (
      SELECT drugId, drug, targetId, diseaseId, {anchor},
             datasourceId, year, novelty
      FROM (
        SELECT t.drugId, t.drug, t.targetId, t.diseaseId, t.{anchor},
               a.datasourceId, a.year, a.novelty,
               max(a.novelty) OVER (
                 PARTITION BY t.targetId, a.datasourceId
               ) AS mx
        FROM {novel_cte} t
        JOIN assoc a
          ON a.diseaseId = t.diseaseId AND a.targetId = t.targetId
        WHERE a.novelty > 0 AND a.year IS NOT NULL
      ) WHERE novelty = mx
    ),
    pp AS (
      SELECT t.drugId, t.drug, t.targetId, t.diseaseId, t.{anchor},
             m.clinicalPhase AS datasourceId, m.year, 1.0 AS novelty
      FROM {novel_cte} t
      JOIN (
        SELECT targetId, drugId, clinicalPhase, min(year) AS year
        FROM (
          SELECT targetId, drugId,
                 CASE WHEN clinicalPhase IN ('1.0', '2.0') THEN '1.0/2.0'
                      ELSE clinicalPhase END AS clinicalPhase,
                 year
          FROM chembl_ev
        )
        GROUP BY targetId, drugId, clinicalPhase
      ) m USING (targetId, drugId)
    ),
    timeline AS (
      SELECT *, {_DT_CASE} AS datatypeId
      FROM (SELECT * FROM sp UNION ALL SELECT * FROM pp)
      WHERE CASE WHEN {anchor} < year
                  AND datasourceId IN ('1.0/2.0', '3.0')
                 THEN true ELSE false END = false
    )
    """


def _bin_sql(off: str, label: str, lo, hi) -> str:
    if label == "0":
        return f"{off} = 0"
    if lo is None:
        return f"{off} < {hi}"
    if hi is None:
        return f"{off} > {lo}"
    if label.startswith("["):
        return f"{off} >= {lo} AND {off} < {hi}"
    return f"{off} > {lo} AND {off} <= {hi}"


# the bell's datatype remap exercises the reference's otherwise(datasource)
# fallback: unmapped datatypes ('slow') split back out per source
BELL_GROUPS = {
    "fastmid": ("fast", "mid"),
    "clinical": ("1.0/2.0", "3.0", "4.0"),
}
_BELL_REMAP = """CASE WHEN datatypeId IN ('fast', 'mid') THEN 'fastmid'
           WHEN datatypeId IN ('1.0/2.0', '3.0', '4.0') THEN 'clinical'
           ELSE datasourceId END"""


def _bell_oracle() -> str:
    flags = ",\n             ".join(
        f"max(CASE WHEN {_bin_sql('off', label, lo, hi)} THEN 1 ELSE 0 END)"
        f" AS b{i}"
        for i, (label, lo, hi) in enumerate(BELL_BINS)
    )
    sums = ", ".join(f"sum(b{i}) AS b{i}" for i in range(len(BELL_BINS)))
    unpivot = "\n    UNION ALL ".join(
        f"SELECT datatypeId, '{label}' AS years, "
        f"round(b{i} * 100.0 / n, 4) AS pct_with_peak "
        f"FROM bellsm CROSS JOIN belldenom"
        for i, (label, _, _) in enumerate(BELL_BINS)
    )
    return (
        _DS_DENSE_SQL
        + _DS_NOVELTY_SQL
        + _ASSOC_SQL
        + ",\n"
        + _NDT_SQL
        + _timeline_sql("ndt", "approvalYear")
        + f"""
    , bellrows AS (
      SELECT targetId, {_BELL_REMAP} AS datatypeId,
             year - approvalYear AS off
      FROM timeline
      WHERE approvalYear BETWEEN 1995 AND 2002
    ),
    bellpt AS (
      SELECT targetId, datatypeId,
             {flags}
      FROM bellrows GROUP BY targetId, datatypeId
    ),
    bellsm AS (
      SELECT datatypeId, {sums} FROM bellpt GROUP BY datatypeId
    ),
    belldenom AS (
      SELECT count(DISTINCT targetId) AS n FROM ndt
      WHERE approvalYear BETWEEN 1995 AND 2002
    )
    {unpivot}
    """
    )


@query("approval_bucket_bell", oracle=_bell_oracle())
def approval_bucket_bell_q(spark, sf_dir):
    """The irregular-bin bell (novelty_approval.py:518-715): percentage
    of approved targets whose timeline peaks in each 4-year offset bucket
    (exact-0 its own bucket, open tails), per remapped datatype — the
    remap collapses fast+mid and the clinical phases, leaving 'slow' to
    fall back to its datasourceId exactly as the reference's
    otherwise(datasourceId) does. Denominator joins in as a broadcast
    1-row count, keeping the division distributed."""
    from timeseries_spark.analytics.approval import (
        approval_bucket_bell,
        approval_timeline,
        novel_drug_targets,
    )

    _, by_ds = _pipeline_tables(spark, sf_dir)
    chembl = _domain_chembl(spark, sf_dir)
    novel = novel_drug_targets(_domain_drugs(spark), chembl)
    timeline = approval_timeline(
        novel, by_ds, chembl, datasources=DOMAIN_SOURCES
    )
    return approval_bucket_bell(
        timeline, novel, year_min=1995, year_max=2002,
        datatype_groups=BELL_GROUPS,
    )


@query(
    "approval_cascade",
    oracle=_DS_DENSE_SQL
    + _DS_NOVELTY_SQL
    + _ASSOC_SQL
    + ",\n"
    + _NDT_SQL
    + _timeline_sql("ndt", "approvalYear")
    + """
    , cay AS (SELECT DISTINCT approvalYear FROM timeline),
    coffs AS (SELECT unnest(generate_series(-5, 5)) AS "offset"),
    cgrid AS (SELECT * FROM cay CROSS JOIN coffs),
    chits AS (
      SELECT approvalYear,
             greatest(-5, least(5, year - approvalYear)) AS "offset",
             CAST(count(DISTINCT targetId) AS BIGINT) AS n_targets
      FROM timeline
      GROUP BY approvalYear, greatest(-5, least(5, year - approvalYear))
    )
    SELECT g.approvalYear, g."offset",
           CAST(coalesce(h.n_targets, 0) AS BIGINT) AS n_targets
    FROM cgrid g LEFT JOIN chits h USING (approvalYear, "offset")
    """,
)
def approval_cascade_q(spark, sf_dir):
    """The per-approval-year cascade (novelty_approval.py:897-949): the
    offset flag matrix sliced by approval year — for each
    (approvalYear, offset∈[-5,5]) cell, how many targets had a timeline
    row at that clamped offset. Per-target flags aggregate first (one
    tiny row per target × approval year) before the final sums."""
    from timeseries_spark.analytics.approval import (
        approval_cascade_from_timeline,
        approval_timeline,
        novel_drug_targets,
    )

    _, by_ds = _pipeline_tables(spark, sf_dir)
    chembl = _domain_chembl(spark, sf_dir)
    novel = novel_drug_targets(_domain_drugs(spark), chembl)
    timeline = approval_timeline(
        novel, by_ds, chembl, datasources=DOMAIN_SOURCES
    )
    return approval_cascade_from_timeline(timeline, window=5)


@query(
    "approval_early_anchor",
    oracle=_DS_DENSE_SQL
    + _DS_NOVELTY_SQL
    + _ASSOC_SQL
    + ",\n"
    + _NDT_SQL
    + f"""
    , elinks AS (
      SELECT DISTINCT drugId, targetId, diseaseId, year AS clinicalYear
      FROM chembl_ev WHERE CAST(clinicalPhase AS DOUBLE) <= 2.0
    ),
    early AS (
      SELECT DISTINCT drugId, drug, targetId, diseaseId,
             mn AS clinicalYear
      FROM (
        SELECT d.drugId, d.drug, l.targetId, l.diseaseId, l.clinicalYear,
               min(l.clinicalYear) OVER (PARTITION BY l.targetId) AS mn
        FROM drugs d JOIN elinks l USING (drugId)
        WHERE d.firstApprovalYear IS NOT NULL AND l.targetId IS NOT NULL
      ) WHERE clinicalYear = mn AND mn BETWEEN {YEAR_MIN} AND {YEAR_MAX}
    )
    """
    + _timeline_sql("early", "clinicalYear")
    + """
    SELECT drugId, drug, targetId, diseaseId, clinicalYear, datasourceId,
           year, novelty, year - clinicalYear AS "window",
           false AS discard, datatypeId
    FROM timeline
    """,
)
def approval_early_anchor(spark, sf_dir):
    """The early-clinical-anchor timeline (novelty_approval.py:1513-1550):
    targets anchored on their FIRST early-phase (clinicalPhase <= 2)
    trial year parsed from the ISO studyStartDate (per-target min window,
    ties kept, anchor bounded), then the full approval `results` table
    rebuilt against that anchor — offsets, discard of post-anchor
    early-phase artifacts, datatype rollup."""
    from timeseries_spark.analytics.approval import (
        approval_timeline,
        early_phase_targets,
    )

    _, by_ds = _pipeline_tables(spark, sf_dir)
    chembl = _domain_chembl(spark, sf_dir)
    early = early_phase_targets(
        _domain_drugs(spark), chembl, year_min=YEAR_MIN, year_max=YEAR_MAX
    )
    return approval_timeline(
        early, by_ds, chembl,
        datasources=DOMAIN_SOURCES, anchor_col="clinicalYear",
    )
