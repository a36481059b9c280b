"""Data-quality / governance queries: the Deequ-style constraint suite
and an SCD Type-2 history build. Both are beyond-reference surface (the
reference trusts its inputs and rewrites outputs wholesale) but are the
first two operators a production warehouse bolts onto any ingest.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timeseries_spark.extensions.dataquality import (
    completeness,
    in_set,
    matches_regex,
    max_value,
    min_value,
    referential_check,
    row_count,
    run_checks,
    uniqueness,
)
from timeseries_spark.queries import load, query
from timeseries_spark.queries.timeseries import _epoch_us


@query(
    "dq_constraints",
    oracle="""
    WITH base AS (
      SELECT
        avg(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END) AS comp,
        CASE WHEN count(o_orderkey) = 0 THEN 0.0
             ELSE CAST(count(DISTINCT o_orderkey) AS DOUBLE)
                  / count(o_orderkey) END AS uniq,
        CAST(min(o_totalprice) AS DOUBLE) AS mn,
        CAST(max(o_totalprice) AS DOUBLE) AS mx,
        avg(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1.0
                 ELSE 0.0 END) AS inset,
        avg(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                 THEN 1.0 ELSE 0.0 END) AS rx,
        CAST(count(*) AS DOUBLE) AS n
      FROM orders
    ),
    orph AS (
      SELECT CAST(count(*) AS DOUBLE) AS v FROM orders o
      WHERE o.o_custkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
    )
    SELECT 'completeness(o_custkey)' AS check_name, round(comp, 6) AS metric,
           CAST(1.0 AS DOUBLE) AS threshold, comp >= 1.0 AS passed FROM base
    UNION ALL
    SELECT 'uniqueness(o_orderkey)', round(uniq, 6), CAST(1.0 AS DOUBLE), uniq >= 1.0
    FROM base
    UNION ALL
    SELECT 'min(o_totalprice)', round(mn, 6), CAST(0.0 AS DOUBLE), mn >= 0.0 FROM base
    UNION ALL
    SELECT 'max(o_totalprice)', round(mx, 6), CAST(1000000.0 AS DOUBLE), mx <= 1000000.0
    FROM base
    UNION ALL
    SELECT 'in_set(o_orderstatus)', round(inset, 6), CAST(1.0 AS DOUBLE), inset >= 1.0
    FROM base
    UNION ALL
    SELECT 'matches(o_orderpriority)', round(rx, 6), CAST(1.0 AS DOUBLE), rx >= 1.0 FROM base
    UNION ALL
    SELECT 'row_count', round(n, 6), CAST(1.0 AS DOUBLE), n >= 1.0 FROM base
    UNION ALL
    SELECT 'referential(o_custkey)', round(v, 6), CAST(0.0 AS DOUBLE), v <= 0.0 FROM orph
    """,
)
def dq_constraints(spark, sf_dir):
    """Declarative validation suite over ``orders``: seven constraints
    compiled into ONE aggregate scan (extensions/dataquality.run_checks)
    plus a referential-integrity anti-join against ``customer``, all
    surfaced as one long-form report. The reference has no validation
    layer (SURVEY §2.1/S9 documents it trusting ``os.path.exists`` on
    gs://) — this is the guard a 100 TB ingest runs before anything
    else, at the cost of one read of the fact table."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    report = run_checks(
        orders,
        [
            completeness("o_custkey"),
            uniqueness("o_orderkey"),
            min_value("o_totalprice", 0.0),
            max_value("o_totalprice", 1_000_000.0),
            in_set("o_orderstatus", ["O", "F", "P"]),
            matches_regex("o_orderpriority", "^[1-5]-"),
            row_count(1),
        ],
    )
    ref = referential_check(orders, "o_custkey", customer, "c_custkey")
    return report.unionByName(ref)


@query(
    "scd2_user_status",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, epoch_us(ts) AS tus,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type, tus AS valid_from_us
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY valid_from_us)
             AS valid_to_us,
           (lead(valid_from_us) OVER (PARTITION BY user_id
                                      ORDER BY valid_from_us) IS NULL)
             AS is_current
    FROM changes
    """,
)
def scd2_user_status(spark, sf_dir):
    """Slowly-changing-dimension Type 2 build: collapse each user's
    event stream into validity intervals of its ``event_type`` state —
    ``(user_id, event_type, valid_from_us, valid_to_us, is_current)``
    with half-open intervals chained by lead(). One shuffle total: both
    windows and the change-point filter share the user_id partitioning,
    so at 100 TB the plan is scan → exchange(user_id) → two sorted
    window passes with no second exchange. This is the standard CDC →
    dimension-history materialization the reference's overwrite-only
    sinks (SURVEY §2.1/S8) cannot express."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select(
            "user_id",
            "event_type",
            _epoch_us("ts").alias("valid_from_us"),
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us")
    nxt = F.lead("valid_from_us").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        "valid_from_us",
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                            1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    t AS (SELECT sum(n) AS total FROM c)
    SELECT digit, CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE) / total, 6) AS observed,
           round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS expected,
           round(pow(CAST(n AS DOUBLE) / total
                     - ln(1.0 + 1.0 / digit) / ln(10.0), 2)
                 / (ln(1.0 + 1.0 / digit) / ln(10.0)), 6) AS chi2_term
    FROM c, t
    """,
)
def benford_first_digit(spark, sf_dir):
    """Benford's-law first-digit audit of o_totalprice — the classic
    fabricated-numbers screen (public: Benford 1938; widely used in
    fraud detection): observed vs expected log10(1 + 1/d) frequency per
    leading digit, with the per-digit χ² contribution. One integer
    projection + one 9-row aggregate; the total rides a one-row
    broadcast. (TPC-H-style synthetic prices are roughly uniform, so
    this corpus legitimately FAILS Benford — the diagnostic working as
    intended.)"""
    orders = load(spark, sf_dir, "orders")
    d = orders.where(F.col("o_totalprice") >= 1).select(
        # explicit floor: DuckDB's double->BIGINT cast ROUNDS half-even
        # while Spark's truncates — a price near x999.5 would land its
        # leading digit in different buckets (caught at sf0.01)
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    expected = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    observed = F.col("n").cast("double") / F.col("total")
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(observed, 6).alias("observed"),
        F.round(expected, 6).alias("expected"),
        F.round(F.pow(observed - expected, 2) / expected, 6).alias(
            "chi2_term"
        ),
    )


@query(
    "lang_source_chi2",
    oracle="""
    WITH o AS (
      SELECT lang, source, count(*) AS n FROM documents
      GROUP BY lang, source
    ),
    m AS (
      SELECT o.lang, o.source, o.n,
             sum(n) OVER (PARTITION BY lang) AS rl,
             sum(n) OVER (PARTITION BY source) AS cs,
             sum(n) OVER () AS t
      FROM o
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           round(sum(pow(n - rl * cs / CAST(t AS DOUBLE), 2)
                     / (rl * cs / CAST(t AS DOUBLE))), 4) AS chi2,
           CAST((count(DISTINCT lang) - 1)
                * (count(DISTINCT source) - 1) AS BIGINT) AS dof
    FROM m
    """,
)
def lang_source_chi2(spark, sf_dir):
    """χ² independence test of the (lang × source) contingency table —
    the corpus-mix diagnostic that flags when one crawl source skews
    toward a language (expected cell = row·col/total under
    independence). One (lang, source) aggregate; marginals are window
    sums over the contingency cells themselves (never a corpus
    re-scan), then a single reduce. NOTE: observed cells only — absent
    (lang, source) combinations contribute their expected mass to dof
    but not to the sum, the standard sparse-table convention."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    o = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    m = (
        o.withColumn("rl", F.sum("n").over(Window.partitionBy("lang")))
        .withColumn("cs", F.sum("n").over(Window.partitionBy("source")))
        .withColumn(
            "t", F.sum("n").over(Window.partitionBy())
        )
    )
    exp = F.col("rl") * F.col("cs") / F.col("t").cast("double")
    return m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.round(F.sum(F.pow(F.col("n") - exp, 2) / exp), 4).alias("chi2"),
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
        ).cast("bigint").alias("dof"),
    )


@query(
    "key_skew_report",
    oracle="""
    WITH cols AS (
      SELECT 'l_orderkey' AS key_col, CAST(l_orderkey AS VARCHAR) AS k
      FROM lineitem
      UNION ALL
      SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
      UNION ALL
      SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
    ),
    per_key AS (
      SELECT key_col, k, CAST(count(*) AS BIGINT) AS n
      FROM cols WHERE k IS NOT NULL GROUP BY key_col, k
    ),
    top AS (
      SELECT key_col, k AS top_key, n AS top_count FROM (
        SELECT *, row_number() OVER (
          PARTITION BY key_col ORDER BY n DESC, k DESC) AS rn
        FROM per_key
      ) WHERE rn = 1
    ),
    stats AS (
      SELECT key_col, CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(n) AS BIGINT) AS n_rows
      FROM per_key GROUP BY key_col
    )
    SELECT s.key_col, s.n_rows, s.n_distinct, t.top_key,
           CAST(t.top_count AS BIGINT) AS top_count,
           round(t.top_count * s.n_distinct / CAST(s.n_rows AS DOUBLE), 4)
             AS skew_ratio
    FROM stats s JOIN top t USING (key_col)
    """,
)
def key_skew_report_q(spark, sf_dir):
    """Shuffle-key skew audit over lineitem's three join keys: rows,
    distinct keys, the heaviest key and its count, and top/mean ratio —
    the pre-flight that decides whether a key needs salting
    (extensions/dataquality.py:key_skew_report; operators/skew.py is
    the mitigation it gates)."""
    from timeseries_spark.extensions.dataquality import key_skew_report

    li = load(spark, sf_dir, "lineitem")
    return key_skew_report(li, ["l_orderkey", "l_partkey", "l_suppkey"])


@query(
    "event_transitions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type AS src_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS dst_type
      FROM events
    ),
    c AS (
      SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n
      FROM s WHERE dst_type IS NOT NULL GROUP BY src_type, dst_type
    ),
    t AS (SELECT src_type, CAST(sum(n) AS BIGINT) AS tot FROM c
          GROUP BY src_type)
    SELECT c.src_type, c.dst_type, c.n,
           round(c.n / CAST(t.tot AS DOUBLE), 6) AS prob
    FROM c JOIN t USING (src_type)
    """,
)
def event_transitions_q(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    streams (row-normalized next-event probabilities) — one user-keyed
    lag window (order made total by the trailing event_id) + a tiny
    (src, dst) count with broadcast row totals
    (operators/behavior.py:event_transitions)."""
    from timeseries_spark.operators.behavior import event_transitions

    ev = load(spark, sf_dir, "events")
    return event_transitions(ev)


@query(
    "welch_ttest_click_view",
    oracle="""
    WITH stats AS (
      SELECT event_type AS g, CAST(count(*) AS DOUBLE) AS n,
             sum(CAST(value AS DOUBLE)) AS s,
             sum(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)) AS ss
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY event_type
    ),
    one AS (
      SELECT
        max(CASE WHEN g = 'click' THEN n END) AS na,
        max(CASE WHEN g = 'click' THEN s END) AS sa,
        max(CASE WHEN g = 'click' THEN ss END) AS ssa,
        max(CASE WHEN g = 'view' THEN n END) AS nb,
        max(CASE WHEN g = 'view' THEN s END) AS sb,
        max(CASE WHEN g = 'view' THEN ss END) AS ssb
      FROM stats
    ),
    d AS (
      SELECT na, nb, sa / na AS ma, sb / nb AS mb,
             ((ssa - na * (sa / na) * (sa / na)) / (na - 1)) / na AS sea,
             ((ssb - nb * (sb / nb) * (sb / nb)) / (nb - 1)) / nb AS seb
      FROM one
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           floor(ma * 1e6 + 0.5) / 1e6 AS mean_a,
           floor(mb * 1e6 + 0.5) / 1e6 AS mean_b,
           floor((ma - mb) * 1e6 + 0.5) / 1e6 AS mean_diff,
           floor((ma - mb) / sqrt(sea + seb) * 1e6 + 0.5) / 1e6 AS t_stat,
           floor((sea + seb) * (sea + seb)
                 / (sea * sea / (na - 1) + seb * seb / (nb - 1))
                 * 1e6 + 0.5) / 1e6 AS dof
    FROM d
    """,
)
def welch_ttest_click_view(spark, sf_dir):
    """Welch's unequal-variance t between click and view event values —
    one filtered scan, one two-row moment aggregate, one single-row
    expression; degenerate inputs raise loudly
    (extensions/dataquality.py:welch_ttest)."""
    from timeseries_spark.extensions.dataquality import welch_ttest

    events = load(spark, sf_dir, "events")
    return welch_ttest(events, "event_type", "value", "click", "view")


@query(
    "mann_whitney_click_view",
    oracle="""
    WITH pooled AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v
      FROM events WHERE event_type IN ('click', 'view')
    ),
    per_val AS (
      SELECT v,
             count(*) FILTER (g = 'click') AS ca,
             count(*) FILTER (g = 'view') AS cb
      FROM pooled GROUP BY v
    ),
    ranked AS (
      SELECT ca, cb,
             CAST(coalesce(sum(ca + cb) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS DECIMAL(20,1))
             + (CAST(ca + cb AS DECIMAL(20,1)) + 1) / 2 AS mr
      FROM per_val
    ),
    agg AS (
      SELECT sum(CAST(ca AS DECIMAL(20,1)) * mr) AS ra,
             CAST(sum(ca) AS DOUBLE) AS na,
             CAST(sum(cb) AS DOUBLE) AS nb
      FROM ranked
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(ra AS DOUBLE) - na * (na + 1) / 2 AS u_a,
           na * nb - (CAST(ra AS DOUBLE) - na * (na + 1) / 2) AS u_b,
           floor((CAST(ra AS DOUBLE) - na * (na + 1) / 2 - na * nb / 2)
                 / sqrt(na * nb * (na + nb + 1) / 12) * 1e6 + 0.5) / 1e6
             AS z_stat
    FROM agg
    """,
)
def mann_whitney_click_view(spark, sf_dir):
    """Mann–Whitney U between click and view event values — the
    distribution-free A/B twin of the Welch test: tie-averaged
    midranks from per-distinct-value counts (one hash aggregate, then
    DISTRIBUTED value-axis cumulation — quantile-bucketed local
    windows + broadcast bucket offsets, one scan, no partition-less
    window), exact decimal rank sums, normal z without tie correction
    (extensions/dataquality.py:mann_whitney_u)."""
    from timeseries_spark.extensions.dataquality import mann_whitney_u

    events = load(spark, sf_dir, "events")
    return mann_whitney_u(events, "event_type", "value", "click", "view")


@query(
    "ks_two_sample_click_view",
    oracle="""
    WITH pooled AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v
      FROM events WHERE event_type IN ('click', 'view')
    ),
    per_val AS (
      SELECT v,
             count(*) FILTER (g = 'click') AS ca,
             count(*) FILTER (g = 'view') AS cb
      FROM pooled GROUP BY v
    ),
    cum AS (
      SELECT v,
             sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cca,
             sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS ccb
      FROM per_val
    ),
    totals AS (
      SELECT CAST(sum(ca) AS DOUBLE) AS na,
             CAST(sum(cb) AS DOUBLE) AS nb
      FROM per_val
    ),
    gaps AS (
      SELECT v, na, nb, abs(cca / na - ccb / nb) AS gap
      FROM cum, totals
    )
    SELECT CAST(first(na) AS BIGINT) AS n_a,
           CAST(first(nb) AS BIGINT) AS n_b,
           floor((SELECT max(gap) FROM gaps) * 1e6 + 0.5) / 1e6
             AS ks_stat,
           (SELECT min(v) FROM gaps
            WHERE gap = (SELECT max(gap) FROM gaps)) AS ks_at
    FROM gaps
    """,
)
def ks_two_sample_click_view(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov D between click and view values —
    the ECDF max-gap statistic from exact integer cumulative counts at
    value grain (distributed quantile-bucketed cumulation, one scan,
    no partition-less window), with a deterministic smallest-witness
    tiebreak (extensions/dataquality.py:ks_two_sample)."""
    from timeseries_spark.extensions.dataquality import ks_two_sample

    events = load(spark, sf_dir, "events")
    return ks_two_sample(events, "event_type", "value", "click", "view")
