"""Composed DOMAIN pipeline, oracle-gated end-to-end (SURVEY.md §3; the
reference's full run timeseries.py:836-855).

The other query modules prove each kernel on TPC-H proxies; these queries
run the ACTUAL staged pipeline — dating (ISO parse + priority coalesce +
per-evidence regroup) → ontology expansion → per-datasource score+novelty
→ two-level weighted overall → point query — over a domain-shaped
evidence table derived deterministically from the TPC-H views, so the
DuckDB oracle can rebuild the identical input without any fixture files:

  evidence   : orders ⋈ customer — diseaseId = customer's nation,
               targetId = o_orderkey % 40, datasourceId = o_orderpriority,
               score = o_totalprice/600000; dated via
               coalesce(curationYear [ISO studyStartDate, urgent rows
               only], publicationYear [absent for 25% of rows and for ALL
               '5-LOW' rows — a permanently undated source, which makes
               the point query's non-dated drop observable])
  ontology   : nation → region → ROOT as the 2-level ancestor DAG
  weights    : per-priority (1.0 / 1.0 / 0.5 / 0.2 / 0.2)

Stage chain is the real code: select_best_date (operators/dating.py),
expand_ontology (operators/ontology.py), TimeseriesPipeline
(plans/pipeline.py), point_query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_spark.config import DataSource, EngineConfig
from timeseries_spark.functions.inline import inline_rows
from timeseries_spark.operators.dating import select_best_date, with_curation_year
from timeseries_spark.operators.ontology import expand_ontology
from timeseries_spark.plans.pipeline import (
    TimeseriesPipeline,
    point_evidence,
    point_query,
)
from timeseries_spark.queries import load, query

DOMAIN_SOURCES = (
    DataSource("1-URGENT", "urgent", "fast", 1.0),
    DataSource("2-HIGH", "high", "fast", 1.0),
    DataSource("3-MEDIUM", "medium", "mid", 0.5),
    DataSource("4-NOT SPECIFIED", "unspecified", "slow", 0.2),
    DataSource("5-LOW", "low", "slow", 0.2),
)
DOMAIN_CFG = EngineConfig(
    first_year=1995, last_year=2001, datasources=DOMAIN_SOURCES
)

POINT_DISEASE, POINT_TARGET = "R1", "T7"


def _domain_evidence(spark, sf_dir):
    """Dated domain evidence via the real dating operators: ISO-string
    curation year (urgent rows), publicationYear (25% missing; never for
    '5-LOW'), DATE_PRIORITY coalesce + per-evidence regroup."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    raw = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    ).select(
        F.concat(F.lit("ev-"), F.col("o_orderkey").cast("string")).alias("id"),
        F.concat(F.lit("N"), F.col("c_nationkey").cast("string")).alias(
            "diseaseId"
        ),
        F.concat(
            F.lit("T"), F.pmod("o_orderkey", F.lit(40)).cast("string")
        ).alias("targetId"),
        F.col("o_orderpriority").alias("datasourceId"),
        (F.col("o_totalprice") / 600000).alias("score"),
        F.when(
            F.col("o_orderpriority") == "1-URGENT",
            F.concat(F.year("o_orderdate").cast("string"), F.lit("-06-01")),
        ).alias("studyStartDate"),
        F.when(
            (F.pmod("o_orderkey", F.lit(4)) != 0)
            & (F.col("o_orderpriority") != "5-LOW"),
            (F.lit(1995) + F.pmod("o_orderkey", F.lit(7))).cast("int"),
        ).alias("publicationYear"),
        F.lit(None).cast("string").alias("pmid"),
    )
    dated = with_curation_year(raw)
    best = select_best_date(
        dated, group_cols=("id", "targetId", "diseaseId", "datasourceId", "score")
    )
    return best.select(
        "id", "diseaseId", "targetId", "datasourceId", "score", "year"
    )


def _domain_disease(spark, sf_dir):
    nation = load(spark, sf_dir, "nation")
    return nation.select(
        F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("id"),
        F.array(
            F.concat(F.lit("R"), F.col("n_regionkey").cast("string")),
            F.lit("ROOT"),
        ).alias("ancestors"),
    )


def _pipeline_tables(spark, sf_dir):
    ev = _domain_evidence(spark, sf_dir)
    disease = _domain_disease(spark, sf_dir)
    pipe = TimeseriesPipeline(DOMAIN_CFG)
    indirect = pipe.indirect_evidence(ev, disease)
    by_ds = pipe.association_by_datasource(indirect)
    return pipe, by_ds


# ---------------------------------------------------------------- oracles

_EV_SQL = """
      SELECT 'N' || c_nationkey AS diseaseId,
             'T' || (o_orderkey % 40) AS targetId,
             o_orderpriority AS datasourceId,
             o_totalprice / 600000 AS score,
             coalesce(
               CASE WHEN o_orderpriority = '1-URGENT'
                    THEN year(o_orderdate) END,
               CASE WHEN o_orderkey % 4 != 0 AND o_orderpriority != '5-LOW'
                    THEN 1995 + (o_orderkey % 7) END) AS year
      FROM orders JOIN customer ON o_custkey = c_custkey
"""

# self ∪ region ∪ ROOT ancestor fan-out, sentinel-filled years
_EXPANDED_SQL = f"""
    ev AS ({_EV_SQL}),
    anc AS (
      SELECT 'N' || n_nationkey AS diseaseId,
             'N' || n_nationkey AS adisease FROM nation
      UNION ALL
      SELECT 'N' || n_nationkey, 'R' || n_regionkey FROM nation
      UNION ALL
      SELECT 'N' || n_nationkey, 'ROOT' FROM nation
    ),
    expanded AS (
      SELECT a.adisease AS diseaseId, e.targetId, e.datasourceId, e.score,
             coalesce(e.year, 2002) AS year
      FROM ev e JOIN anc a USING (diseaseId)
    )
"""

# per-datasource dense cumulative harmonic score (keys d,t,ds)
_DS_DENSE_SQL = f"""
    WITH {_EXPANDED_SQL},
    keys AS (SELECT DISTINCT diseaseId, targetId, datasourceId FROM expanded),
    years AS (SELECT unnest(generate_series(1995, 2002)) AS year),
    grid AS (SELECT * FROM keys CROSS JOIN years),
    pool AS (
      SELECT g.diseaseId, g.targetId, g.datasourceId, g.year, e.score,
             row_number() OVER (
               PARTITION BY g.diseaseId, g.targetId, g.datasourceId, g.year
               ORDER BY e.score DESC
             ) AS rn
      FROM grid g
      JOIN expanded e
        ON e.diseaseId = g.diseaseId AND e.targetId = g.targetId
       AND e.datasourceId = g.datasourceId AND e.year <= g.year
    ),
    hs AS (
      SELECT diseaseId, targetId, datasourceId, year,
             sum(score / (rn * rn)) / 1.64 AS score
      FROM pool WHERE rn <= 50
      GROUP BY diseaseId, targetId, datasourceId, year
    ),
    dense AS (
      SELECT g.diseaseId, g.targetId, g.datasourceId, g.year, hs.score
      FROM grid g
      LEFT JOIN hs USING (diseaseId, targetId, datasourceId, year)
    )
"""

_DS_NOVELTY_SQL = """
    , peaks AS (
      SELECT diseaseId, targetId, datasourceId, year AS peakYear,
             coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
               PARTITION BY diseaseId, targetId, datasourceId ORDER BY year
             ) AS peak
      FROM dense
    ),
    decays AS (
      SELECT diseaseId, targetId, datasourceId, peak, peakYear,
             unnest(generate_series(0, 10)) AS pos
      FROM peaks WHERE peak > 0
    ),
    nov AS (
      SELECT diseaseId, targetId, datasourceId, peakYear + pos AS year,
             round(max(peak / (1 + exp(2.0 * (pos - 2.0)))), 3) AS novelty
      FROM decays
      GROUP BY diseaseId, targetId, datasourceId, peakYear + pos
    )
"""

_WEIGHT_CASE = """CASE datasourceId
             WHEN '1-URGENT' THEN 1.0 WHEN '2-HIGH' THEN 1.0
             WHEN '3-MEDIUM' THEN 0.5 ELSE 0.2 END"""

# two-level overall: weighted per-source scores pooled per (d,t,year)
_OVERALL_DENSE_SQL = f"""
    , weighted AS (
      SELECT diseaseId, targetId, year,
             score * {_WEIGHT_CASE} AS wscore,
             row_number() OVER (
               PARTITION BY diseaseId, targetId, year
               ORDER BY score * {_WEIGHT_CASE} DESC
             ) AS rn
      FROM hs
    ),
    ov AS (
      SELECT diseaseId, targetId, year,
             sum(wscore / (rn * rn)) / 1.64 AS score
      FROM weighted WHERE rn <= 50 GROUP BY diseaseId, targetId, year
    ),
    okeys AS (SELECT DISTINCT diseaseId, targetId FROM expanded),
    ogrid AS (SELECT * FROM okeys CROSS JOIN years),
    odense AS (
      SELECT g.diseaseId, g.targetId, g.year, ov.score
      FROM ogrid g LEFT JOIN ov USING (diseaseId, targetId, year)
    )
"""

_OVERALL_NOVELTY_SQL = """
    , opeaks AS (
      SELECT diseaseId, targetId, year AS peakYear,
             coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
               PARTITION BY diseaseId, targetId ORDER BY year
             ) AS peak
      FROM odense
    ),
    odecays AS (
      SELECT diseaseId, targetId, peak, peakYear,
             unnest(generate_series(0, 10)) AS pos
      FROM opeaks WHERE peak > 0
    ),
    onov AS (
      SELECT diseaseId, targetId, peakYear + pos AS year,
             round(max(peak / (1 + exp(2.0 * (pos - 2.0)))), 3) AS novelty
      FROM odecays
      GROUP BY diseaseId, targetId, peakYear + pos
    )
"""


@query(
    "assoc_domain_datasource",
    oracle=_DS_DENSE_SQL
    + _DS_NOVELTY_SQL
    + """
    SELECT d.diseaseId, d.targetId, d.datasourceId,
           CASE WHEN d.year = 2002 THEN NULL ELSE d.year END AS year,
           round(d.score, 4) AS score,
           coalesce(n.novelty, 0.0) AS novelty
    FROM dense d
    LEFT JOIN nov n USING (diseaseId, targetId, datasourceId, year)
    """,
)
def assoc_domain_datasource(spark, sf_dir):
    """E2E stage chain at (disease, target, datasource) grain over
    ontology-expanded, operator-dated evidence — the composed pipeline
    the reference runs (timeseries.py:836-855), not a kernel proxy."""
    _, by_ds = _pipeline_tables(spark, sf_dir)
    return by_ds.select(
        "diseaseId",
        "targetId",
        "datasourceId",
        "year",
        F.round("score", 4).alias("score"),
        "novelty",
    )


@query(
    "assoc_domain_overall",
    oracle=_DS_DENSE_SQL
    + _OVERALL_DENSE_SQL
    + _OVERALL_NOVELTY_SQL
    + """
    SELECT d.diseaseId, d.targetId,
           CASE WHEN d.year = 2002 THEN NULL ELSE d.year END AS year,
           round(d.score, 4) AS score,
           coalesce(n.novelty, 0.0) AS novelty
    FROM odense d
    LEFT JOIN onov n USING (diseaseId, targetId, year)
    """,
)
def assoc_domain_overall(spark, sf_dir):
    """E2E overall grain: per-source scores weighted 1.0/1.0/0.5/0.2/0.2
    and pooled by the two-level harmonic (timeseries.py:638-833), then
    overall novelty — chained from the by-datasource stage exactly as the
    reference reads it back."""
    pipe, by_ds = _pipeline_tables(spark, sf_dir)
    out = pipe.association_overall(by_ds)
    return out.select(
        "diseaseId",
        "targetId",
        "year",
        F.round("score", 4).alias("score"),
        "novelty",
    )


def _domain_chembl(spark, sf_dir):
    """Clinical-trial-shaped evidence on the '2-HIGH' source: drug ids,
    clinical phases (phase from o_orderkey%4 — '1.0' rows are also the
    undated ones, exercising the NULL-window path), dated like the main
    evidence (publicationYear only; curation is urgent-only)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .filter(F.col("o_orderpriority") == "2-HIGH")
        .select(
            F.concat(
                F.lit("CH"), F.pmod("o_orderkey", F.lit(50)).cast("string")
            ).alias("drugId"),
            F.concat(
                F.lit("T"), F.pmod("o_orderkey", F.lit(40)).cast("string")
            ).alias("targetId"),
            F.concat(F.lit("N"), F.col("c_nationkey").cast("string")).alias(
                "diseaseId"
            ),
            F.element_at(
                F.array(F.lit("1.0"), F.lit("2.0"), F.lit("3.0"), F.lit("4.0")),
                (F.pmod("o_orderkey", F.lit(4)) + 1).cast("int"),
            ).alias("clinicalPhase"),
            F.when(
                F.pmod("o_orderkey", F.lit(4)) != 0,
                F.lit(1995) + F.pmod("o_orderkey", F.lit(7)),
            ).alias("year"),
        )
        # ISO trial-start date for the early-clinical-anchor analytics
        # (NULL when undated — concat propagates the NULL)
        .withColumn(
            "studyStartDate",
            F.concat(F.col("year").cast("string"), F.lit("-03-15")),
        )
    )


def _domain_drugs(spark):
    """ChEMBL-style drugs table: 50 drugs, 20% never approved."""
    return spark.range(50).select(
        F.concat(F.lit("CH"), F.col("id").cast("string")).alias("drugId"),
        F.concat(F.lit("drug-"), F.col("id").cast("string")).alias("drug"),
        F.when(
            F.pmod("id", F.lit(5)) != 0, F.lit(1995) + F.pmod("id", F.lit(8))
        ).alias("firstApprovalYear"),
    )


# chembl-shaped evidence + drugs + approved-link CTE block (shared by the
# approval timeline and the novel_drug_target table)
_NDT_SQL = """
    chembl_ev AS (
      SELECT 'CH' || (o_orderkey % 50) AS drugId,
             'T' || (o_orderkey % 40) AS targetId,
             'N' || c_nationkey AS diseaseId,
             CASE o_orderkey % 4 WHEN 0 THEN '1.0' WHEN 1 THEN '2.0'
                  WHEN 2 THEN '3.0' ELSE '4.0' END AS clinicalPhase,
             CASE WHEN o_orderkey % 4 != 0
                  THEN 1995 + (o_orderkey % 7) END AS year
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderpriority = '2-HIGH'
    ),
    drugs AS (
      SELECT 'CH' || i AS drugId, 'drug-' || i AS drug,
             CASE WHEN i % 5 != 0 THEN 1995 + (i % 8) END AS firstApprovalYear
      FROM (SELECT unnest(generate_series(0, 49)) AS i)
    ),
    links AS (
      SELECT DISTINCT drugId, targetId, diseaseId FROM chembl_ev
      WHERE clinicalPhase = '4.0'
    ),
    ndt AS (
      SELECT DISTINCT drugId, drug, targetId, diseaseId,
             firstApprovalYear AS approvalYear
      FROM (
        SELECT d.drugId, d.drug, l.targetId, l.diseaseId, d.firstApprovalYear,
               min(d.firstApprovalYear) OVER (PARTITION BY l.targetId) AS mn
        FROM drugs d JOIN links l USING (drugId)
        WHERE d.firstApprovalYear IS NOT NULL
      ) WHERE firstApprovalYear = mn
    )
"""


@query(
    "novel_drug_target",
    oracle="WITH "
    + _NDT_SQL
    + """
    SELECT DISTINCT targetId, diseaseId FROM ndt
    """,
)
def novel_drug_target(spark, sf_dir):
    """The novel_drug_target publication table (novelty_approval.py:
    387-390): distinct (targetId, diseaseId) pairs carrying an approved
    drug."""
    from timeseries_spark.analytics.approval import (
        novel_drug_target_table,
        novel_drug_targets,
    )

    chembl = _domain_chembl(spark, sf_dir)
    novel = novel_drug_targets(_domain_drugs(spark), chembl)
    return novel_drug_target_table(novel)


@query(
    "approval_phase_peaks",
    oracle=_DS_DENSE_SQL
    + _DS_NOVELTY_SQL
    + """
    , assoc AS (
      SELECT d.diseaseId, d.targetId, d.datasourceId,
             CASE WHEN d.year = 2002 THEN NULL ELSE d.year END AS year,
             coalesce(n.novelty, 0.0) AS novelty
      FROM dense d
      LEFT JOIN nov n USING (diseaseId, targetId, datasourceId, year)
    ),
    """
    + _NDT_SQL
    + """
    , sp AS (
      SELECT drugId, drug, targetId, diseaseId, approvalYear,
             datasourceId, year, novelty
      FROM (
        SELECT t.drugId, t.drug, t.targetId, t.diseaseId, t.approvalYear,
               a.datasourceId, a.year, a.novelty,
               max(a.novelty) OVER (
                 PARTITION BY t.targetId, a.datasourceId
               ) AS mx
        FROM ndt t
        JOIN assoc a
          ON a.diseaseId = t.diseaseId AND a.targetId = t.targetId
        WHERE a.novelty > 0 AND a.year IS NOT NULL
      ) WHERE novelty = mx
    ),
    pp AS (
      SELECT t.drugId, t.drug, t.targetId, t.diseaseId, t.approvalYear,
             m.clinicalPhase AS datasourceId, m.year, 1.0 AS novelty
      FROM ndt t
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
    un AS (
      SELECT * FROM sp UNION ALL SELECT * FROM pp
    ),
    flagged AS (
      SELECT *, year - approvalYear AS w_off,
             CASE WHEN approvalYear < year
                   AND datasourceId IN ('1.0/2.0', '3.0')
                  THEN true ELSE false END AS discard
      FROM un
    )
    SELECT drugId, drug, targetId, diseaseId, approvalYear, datasourceId,
           year, novelty, w_off AS "window", discard,
           CASE datasourceId
             WHEN '1-URGENT' THEN 'fast' WHEN '2-HIGH' THEN 'fast'
             WHEN '3-MEDIUM' THEN 'mid' WHEN '4-NOT SPECIFIED' THEN 'slow'
             WHEN '5-LOW' THEN 'slow' ELSE datasourceId END AS datatypeId
    FROM flagged WHERE discard = false
    """,
)
def approval_phase_peaks(spark, sf_dir):
    """The reference's full approval `results` table (novelty_approval.py:
    354-478) over the domain tables: approved drug→target links with
    first-approval ties, per-source novelty peaks (filter-then-argmax,
    pooled over the target's diseases), clinical-phase peak union
    (1.0/2.0 merged, min dated year per target/phase/drug, novelty=1),
    offset window, discard of post-approval early-phase artifacts, and
    the datatype rollup id."""
    from timeseries_spark.analytics.approval import (
        approval_timeline,
        novel_drug_targets,
    )

    _, by_ds = _pipeline_tables(spark, sf_dir)
    chembl = _domain_chembl(spark, sf_dir)
    novel = novel_drug_targets(_domain_drugs(spark), chembl)
    return approval_timeline(novel, by_ds, chembl, datasources=DOMAIN_SOURCES)


@query(
    "point_target_disease",
    oracle=_DS_DENSE_SQL
    + _DS_NOVELTY_SQL
    + _OVERALL_DENSE_SQL
    + _OVERALL_NOVELTY_SQL
    + f"""
    , ds_series AS (
      SELECT d.diseaseId, d.targetId, d.datasourceId,
             CASE WHEN d.year = 2002 THEN NULL ELSE d.year END AS year,
             round(d.score, 4) AS score,
             coalesce(n.novelty, 0.0) AS novelty
      FROM dense d
      LEFT JOIN nov n USING (diseaseId, targetId, datasourceId, year)
      WHERE d.diseaseId = '{POINT_DISEASE}' AND d.targetId = '{POINT_TARGET}'
    ),
    ov_series AS (
      SELECT d.diseaseId, d.targetId, 'overall' AS datasourceId,
             CASE WHEN d.year = 2002 THEN NULL ELSE d.year END AS year,
             round(d.score, 4) AS score,
             coalesce(n.novelty, 0.0) AS novelty
      FROM odense d
      LEFT JOIN onov n USING (diseaseId, targetId, year)
      WHERE d.diseaseId = '{POINT_DISEASE}' AND d.targetId = '{POINT_TARGET}'
    ),
    -- non-dated drop (plot_timeseries.py:773-794): keep only sources
    -- (and the overall series) with >= 1 dated positive row
    dated_sources AS (
      SELECT DISTINCT datasourceId FROM ds_series
      WHERE year IS NOT NULL AND score > 0
    ),
    kept AS (
      SELECT * FROM ds_series
      WHERE datasourceId IN (SELECT datasourceId FROM dated_sources)
      UNION ALL
      SELECT * FROM ov_series
      WHERE EXISTS (SELECT 1 FROM ov_series
                    WHERE year IS NOT NULL AND score > 0)
    )
    SELECT * FROM kept
    """,
)
def point_target_disease(spark, sf_dir):
    """The plotTargetDisease point query over the staged domain tables:
    one (disease, target) timeline across overall + per-source series,
    all-undated series dropped ('5-LOW' is never dated by construction,
    so the drop BINDS — its series must be absent)."""
    pipe, by_ds = _pipeline_tables(spark, sf_dir)
    overall = pipe.association_overall(by_ds)
    out = point_query(
        overall.withColumn("score", F.round("score", 4)),
        by_ds.withColumn("score", F.round("score", 4)),
        POINT_DISEASE,
        POINT_TARGET,
    )
    return out.select(
        "diseaseId", "targetId", "datasourceId", "year", "score", "novelty"
    )


def _staged_assoc_tables(spark, sf_dir):
    """Materialize-once serving tables for interactive point queries:
    the full association pipeline runs ONCE per source fingerprint
    (extensions/staging.staged_table), Hive-partitioned by diseaseId so
    a (disease, target) point filter prunes to a single partition
    directory + one pushed targetId predicate — the reference's own
    serving split (plot_timeseries.py:667-700 reads the precomputed
    association parquet per plot; it never re-runs the pipeline)."""

    def build_by_ds():
        _, by_ds = _pipeline_tables(spark, sf_dir)
        return by_ds.withColumn("score", F.round("score", 4))

    def build_overall():
        pipe, by_ds = _pipeline_tables(spark, sf_dir)
        return pipe.association_overall(by_ds).withColumn(
            "score", F.round("score", 4)
        )

    from timeseries_spark.extensions.staging import staged_table

    by_ds = staged_table(
        spark, build_by_ds, sf_dir, "assoc_by_ds", partition_by=("diseaseId",)
    )
    overall = staged_table(
        spark, build_overall, sf_dir, "assoc_overall",
        partition_by=("diseaseId",),
    )
    return overall, by_ds


from timeseries_spark.queries import REGISTRY  # noqa: E402


@query(
    "point_target_disease_staged",
    oracle=REGISTRY["point_target_disease"].oracle,
)
def point_target_disease_staged(spark, sf_dir):
    """The SERVING path of the point query: identical output to
    point_target_disease (same oracle — sharing it IS the equivalence
    claim) but computed from the staged association tables, so the
    interactive plan is two pruned parquet point-reads + the keep-flag
    window + a broadcast-free union — no pipeline subtree, sub-second
    at any corpus size. This is the entry the headline bench times."""
    overall, by_ds = _staged_assoc_tables(spark, sf_dir)
    out = point_query(overall, by_ds, POINT_DISEASE, POINT_TARGET)
    return out.select(
        "diseaseId", "targetId", "datasourceId", "year", "score", "novelty"
    )


@query(
    "point_evidence_series",
    oracle="WITH "
    + _EXPANDED_SQL.strip().lstrip()
    + f"""
    , pair AS (
      SELECT diseaseId, targetId, datasourceId,
             CASE WHEN year = 2002 THEN NULL ELSE year END AS year,
             round(score, 4) AS score
      FROM expanded
      WHERE diseaseId = '{POINT_DISEASE}' AND targetId = '{POINT_TARGET}'
    ),
    dated_sources AS (
      SELECT DISTINCT datasourceId FROM pair
      WHERE year IS NOT NULL AND score > 0
    )
    SELECT * FROM pair
    WHERE datasourceId IN (SELECT datasourceId FROM dated_sources)
    """,
)
def point_evidence_series(spark, sf_dir):
    """The plot's raw-evidence panel (plot_timeseries.py:762-794): every
    dated evidence score behind one (disease, target) pair across its
    expanded diseases, with the non-dated drop — '5-LOW' (never dated)
    must be absent here exactly as in the series panels."""
    ev = _domain_evidence(spark, sf_dir)
    disease = _domain_disease(spark, sf_dir)
    expanded = expand_ontology(ev, disease)
    out = point_evidence(expanded, POINT_DISEASE, POINT_TARGET)
    return out.withColumn("score", F.round("score", 4))


@query(
    "novels_in_year",
    oracle=_DS_DENSE_SQL
    + _DS_NOVELTY_SQL
    + """
    , assoc AS (
      SELECT d.diseaseId, d.targetId,
             CASE WHEN d.year = 2002 THEN NULL ELSE d.year END AS year,
             coalesce(n.novelty, 0.0) AS novelty
      FROM dense d
      LEFT JOIN nov n USING (diseaseId, targetId, datasourceId, year)
    ),
    ta AS (
      SELECT 'N' || n_nationkey AS diseaseId,
             'R' || n_regionkey AS therapeuticArea FROM nation
      UNION ALL
      SELECT DISTINCT 'R' || n_regionkey, 'R' || n_regionkey FROM nation
      UNION ALL SELECT 'ROOT', 'ROOT'
    ),
    all_pairs AS (
      SELECT DISTINCT a.targetId, a.diseaseId, t.therapeuticArea
      FROM assoc a JOIN ta t USING (diseaseId)
      WHERE t.therapeuticArea != 'ROOT' AND a.diseaseId != 'ROOT'
    ),
    novel AS (
      SELECT DISTINCT a.targetId, a.diseaseId, t.therapeuticArea
      FROM assoc a JOIN ta t USING (diseaseId)
      WHERE a.novelty >= 0.1 AND a.year = 1999
        AND t.therapeuticArea != 'ROOT' AND a.diseaseId != 'ROOT'
    )
    SELECT
      (SELECT CAST(count(DISTINCT diseaseId || '|' || targetId) AS BIGINT)
       FROM all_pairs) AS n_associations,
      (SELECT CAST(count(DISTINCT targetId) AS BIGINT)
       FROM all_pairs) AS n_targets,
      (SELECT CAST(count(DISTINCT diseaseId || '|' || targetId) AS BIGINT)
       FROM novel) AS n_novel_associations,
      (SELECT CAST(count(DISTINCT targetId) AS BIGINT)
       FROM novel) AS n_novel_targets
    """,
)
def novels_in_year(spark, sf_dir):
    """The 'Novels in <year>' summary (novelty_distribution.py:404-509)
    over the domain tables: distinct association pairs and targets whose
    novelty clears the cutoff AT year 1999, against the full denominator
    set — TA inner join with the catch-all exclusion ('ROOT' here plays
    the reference's GO_0008150-style roots) applied to both columns."""
    from timeseries_spark.analytics.distribution import (
        all_pairs_at,
        novel_pairs_at,
    )

    _, by_ds = _pipeline_tables(spark, sf_dir)
    nation = load(spark, sf_dir, "nation")
    ta = (
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
                F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias(
                    "diseaseId"
                ),
                F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias(
                    "therapeuticArea"
                ),
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
    # one pass over the association table: the novel set is a conditional
    # subset of the denominator set, so all four distinct counts fuse into
    # a single aggregation (the library novel_pairs_at / all_pairs_at
    # builders compute the same sets when the row sets themselves are
    # wanted) — one subtree evaluation instead of two, one shuffle
    base = (
        by_ds.select("diseaseId", "targetId", "year", "novelty")
        .join(F.broadcast(ta), "diseaseId")
        .filter(
            (~F.col("therapeuticArea").isin("ROOT"))
            & (~F.col("diseaseId").isin("ROOT"))
        )
    )
    pair = F.concat(F.col("diseaseId"), F.lit("|"), F.col("targetId"))
    novel = (F.col("novelty") >= 0.1) & (F.col("year") == 1999)
    return base.agg(
        F.countDistinct(pair).alias("n_associations"),
        F.countDistinct("targetId").alias("n_targets"),
        F.countDistinct(F.when(novel, pair)).alias("n_novel_associations"),
        F.countDistinct(F.when(novel, F.col("targetId"))).alias(
            "n_novel_targets"
        ),
    )


@query(
    "messy_date_years",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE o_orderkey % 4
               WHEN 0 THEN strftime(o_orderdate, '%d.%m.%Y')
               WHEN 1 THEN strftime(o_orderdate, '%m/%d/') ||
                           substring(CAST(year(o_orderdate) AS VARCHAR), 3, 2)
               WHEN 2 THEN CAST(year(o_orderdate) AS VARCHAR)
               ELSE '++'
             END AS curation_date
      FROM orders
    )
    SELECT o_orderkey, curation_date,
           CASE
             WHEN regexp_matches(string_split(trim(curation_date), '.')[-1],
                                 '^[0-9]{4}$')
               THEN CAST(string_split(trim(curation_date), '.')[-1] AS INT)
             WHEN regexp_matches(string_split(trim(curation_date), '/')[-1],
                                 '^[0-9]{2}$')
               THEN CAST('20' || string_split(trim(curation_date), '/')[-1]
                         AS INT)
           END AS year
    FROM raw
    """,
)
def messy_date_years(spark, sf_dir):
    """Stage-0 date normalization (parse_timestamp.py:267-287) as a
    distributed operator: deterministic messy date strings in four
    formats (dot date, slash date with 2-digit year, plain year, junk)
    are built from o_orderdate and parsed with the reference's try-order;
    junk rows yield NULL. The DuckDB oracle builds and parses the
    identical strings."""
    from timeseries_spark.operators.dating import year_from_messy_date

    orders = load(spark, sf_dir, "orders")
    fmt = F.pmod("o_orderkey", F.lit(4))
    two_digit = F.substring(F.year("o_orderdate").cast("string"), 3, 2)
    raw = orders.select(
        "o_orderkey",
        F.when(fmt == 0, F.date_format("o_orderdate", "dd.MM.yyyy"))
        .when(
            fmt == 1,
            F.concat(F.date_format("o_orderdate", "MM/dd/"), two_digit),
        )
        .when(fmt == 2, F.year("o_orderdate").cast("string"))
        .otherwise(F.lit("++"))
        .alias("curation_date"),
    )
    return raw.select(
        "o_orderkey",
        "curation_date",
        year_from_messy_date(F.col("curation_date")).alias("year"),
    )


@query(
    "dating_coverage_report",
    oracle="WITH "
    + _EXPANDED_SQL.strip().lstrip()
    + """
    SELECT datasourceId,
           CAST(count(*) AS BIGINT) AS n_evidence,
           CAST(count(year) AS BIGINT) AS n_dated,
           round(count(year) / greatest(count(*), 1), 4) AS dated_fraction
    FROM ev
    GROUP BY datasourceId
    """,
)
def dating_coverage_report(spark, sf_dir):
    """The stage-1 coverage report (timestamp_evidence.py:333-357): total
    vs dated evidence per source with the dated fraction, computed in ONE
    union pass (J9 rewrite of the reference's join-of-two-aggregates).
    '5-LOW' must report fraction 0.0 (never dated by construction);
    '1-URGENT' reports 1.0 (curation always present)."""
    from timeseries_spark.operators.dating import dating_coverage

    ev = _domain_evidence(spark, sf_dir)
    return dating_coverage(ev, ev)
