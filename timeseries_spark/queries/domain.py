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
from timeseries_spark.operators.dating import select_best_date, with_curation_year
from timeseries_spark.plans.pipeline import TimeseriesPipeline, point_query
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
