"""Time-series operators (SURVEY.md §2.4-2.6, §3.1) on the driver tables.

The flagship pipeline — dense scaffold → cumulative harmonic top-k score →
logistic novelty — runs at (o_orderpriority, o_orderstatus) grain over
``orders`` with ``year(o_orderdate)`` as event time, exactly the shape the
reference computes per (disease, target, datasource) (timeseries.py:441-635).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from timeseries_spark.config import EngineConfig
from timeseries_spark.functions.arrays import harmonic_score
from timeseries_spark.operators.novelty import add_novelty
from timeseries_spark.operators.scaffold import dense_scaffold, year_spine
from timeseries_spark.operators.scoring import association_score
from timeseries_spark.queries import load, query

# orders span 1995..2001; sentinel (undated bucket) = 2002
ORDERS_CFG = EngineConfig(first_year=1995, last_year=2001)
KEYS = ("o_orderpriority", "o_orderstatus")

# every order is dated, so the NULL-restored sentinel row is the all-time
# score; scores normalized into ~[0,1] like the reference's evidence scores
_EVIDENCE_SQL = """
  SELECT o_orderpriority, o_orderstatus,
         year(o_orderdate) AS year,
         o_totalprice / 600000 AS score
  FROM orders
"""


def _orders_evidence(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderpriority",
        "o_orderstatus",
        F.year("o_orderdate").cast("int").alias("year"),
        (F.col("o_totalprice") / 600000).alias("score"),
    )


_ASSOC_ORACLE = """
    WITH ev AS (%s),
    keys AS (SELECT DISTINCT o_orderpriority, o_orderstatus FROM ev),
    years AS (SELECT unnest(generate_series(1995, 2002)) AS year),
    grid AS (SELECT * FROM keys CROSS JOIN years),
    pool AS (
      SELECT g.o_orderpriority, g.o_orderstatus, g.year, e.score,
             row_number() OVER (
               PARTITION BY g.o_orderpriority, g.o_orderstatus, g.year
               ORDER BY e.score DESC
             ) AS rn
      FROM grid g
      JOIN ev e ON e.o_orderpriority = g.o_orderpriority
               AND e.o_orderstatus = g.o_orderstatus
               AND e.year <= g.year
    ),
    hs AS (
      SELECT o_orderpriority, o_orderstatus, year,
             sum(score / (rn * rn)) / 1.64 AS score
      FROM pool WHERE rn <= 50
      GROUP BY o_orderpriority, o_orderstatus, year
    ),
    dense AS (
      SELECT g.o_orderpriority, g.o_orderstatus, g.year, hs.score
      FROM grid g
      LEFT JOIN hs USING (o_orderpriority, o_orderstatus, year)
    )
""" % _EVIDENCE_SQL


@query(
    "assoc_score_yearly",
    oracle=_ASSOC_ORACLE
    + """
    SELECT o_orderpriority, o_orderstatus,
           CASE WHEN year = 2002 THEN NULL ELSE year END AS year,
           round(score, 4) AS score
    FROM dense
    """,
)
def assoc_score_yearly(spark, sf_dir):
    """The engine's heart (timeseries.py:441-527): dense yearly cumulative
    top-50 harmonic score per key group, sentinel year restored to NULL."""
    ev = _orders_evidence(spark, sf_dir)
    out = association_score(ev, ORDERS_CFG, KEYS)
    return out.withColumn("score", F.round("score", 4))


@query(
    "assoc_novelty_yearly",
    oracle=_ASSOC_ORACLE
    + """
    , peaks AS (
      SELECT o_orderpriority, o_orderstatus, year AS peakYear,
             coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
               PARTITION BY o_orderpriority, o_orderstatus ORDER BY year
             ) AS peak
      FROM dense
    ),
    decays AS (
      SELECT o_orderpriority, o_orderstatus, peak, peakYear,
             unnest(generate_series(0, 10)) AS pos
      FROM peaks WHERE peak > 0
    ),
    nov AS (
      SELECT o_orderpriority, o_orderstatus, peakYear + pos AS year,
             round(max(peak / (1 + exp(2.0 * (pos - 2.0)))), 3) AS novelty
      FROM decays
      GROUP BY o_orderpriority, o_orderstatus, peakYear + pos
    )
    SELECT d.o_orderpriority, d.o_orderstatus,
           CASE WHEN d.year = 2002 THEN NULL ELSE d.year END AS year,
           round(d.score, 4) AS score,
           coalesce(n.novelty, 0.0) AS novelty
    FROM dense d
    LEFT JOIN nov n USING (o_orderpriority, o_orderstatus, year)
    """,
)
def assoc_novelty_yearly(spark, sf_dir):
    """Score + logistic novelty (timeseries.py:530-635): lag-peak →
    posexplode decay window → max per year → right-join merge → zero fill."""
    ev = _orders_evidence(spark, sf_dir)
    scores = association_score(ev, ORDERS_CFG, KEYS)
    out = add_novelty(scores, ORDERS_CFG, KEYS)
    return out.withColumn("score", F.round("score", 4))


@query(
    "dense_daily_events",
    oracle="""
    WITH spine AS (SELECT unnest(generate_series(1, 31)) AS day),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT * FROM types CROSS JOIN spine),
    facts AS (
      SELECT event_type, day(ts) AS day, count(*) AS n,
             round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    )
    SELECT g.event_type, g.day,
           coalesce(f.n, 0) AS n,
           coalesce(f.total, 0.0) AS total
    FROM grid g LEFT JOIN facts f USING (event_type, day)
    """,
)
def dense_daily_events(spark, sf_dir):
    """J7 cross-join scaffold + zero fill (timeseries.py:441-470) at day
    grain over the events table."""
    events = load(spark, sf_dir, "events")
    facts = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )
    spine = year_spine(
        events.sparkSession, 1, 31, include_sentinel=False
    ).withColumnRenamed("year", "day")
    return dense_scaffold(facts, ["event_type"], spine, "day").select(
        "event_type",
        "day",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("total"), F.lit(0.0)).alias("total"),
    )


@query(
    "cumulative_daily_value",
    oracle="""
    WITH daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    )
    SELECT event_type, day, total,
           round(sum(total) OVER (
             PARTITION BY event_type ORDER BY day
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total
    FROM daily
    """,
)
def cumulative_daily_value(spark, sf_dir):
    """W1 cumulative window (rangeBetween unboundedPreceding→current,
    timeseries.py:473-477) as a running per-type total."""
    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    return daily.withColumn(
        "running_total", F.round(F.sum("total").over(w), 2)
    )


@query(
    "day_over_day_delta",
    oracle="""
    WITH daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    )
    SELECT event_type, day, total,
           round(total - lag(total) OVER (
             PARTITION BY event_type ORDER BY day
           ), 2) AS delta
    FROM daily
    """,
)
def day_over_day_delta(spark, sf_dir):
    """W2 lag delta — the novelty 'peak' precursor (timeseries.py:588-594)."""
    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return daily.withColumn(
        "delta", F.round(F.col("total") - F.lag("total").over(w), 2)
    )


@query(
    "windowed_event_counts",
    oracle="""
    SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT)
             AS window_start_s,
           event_type, count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def windowed_event_counts(spark, sf_dir):
    """Tumbling event-time window aggregation — the SAME transformation the
    streaming surface runs with a watermark (timeseries_spark.streaming);
    batch mode here makes it oracle-checkable."""
    from timeseries_spark.streaming.incremental import windowed_type_counts

    events = load(spark, sf_dir, "events")
    return windowed_type_counts(events, "1 hour", streaming=False)


@query(
    "sessionization",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 2 HOUR
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM marked
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionization(spark, sf_dir):
    """Gap-based sessionization via native session_window (the stateful
    streaming operator, here in batch mode); oracle reproduces it with
    gaps-and-islands SQL."""
    from timeseries_spark.streaming.incremental import sessionize

    events = load(spark, sf_dir, "events")
    return sessionize(events, "2 hours", streaming=False)


@query(
    "harmonic_topk_per_order",
    oracle="""
    SELECT l_orderkey,
           round(sum(p / (rn * rn)) / 1.64, 4) AS harmonic_score,
           CAST(count(*) AS BIGINT) AS n_parts
    FROM (
      SELECT l_orderkey, l_extendedprice / 100000 AS p,
             row_number() OVER (
               PARTITION BY l_orderkey ORDER BY l_extendedprice DESC
             ) AS rn
      FROM lineitem
    ) WHERE rn <= 50
    GROUP BY l_orderkey
    """,
)
def harmonic_topk_per_order(spark, sf_dir):
    """A1+O3+F7-F11: collect_list → NaN-filter → sort desc → slice top-50 →
    positional 1/i² weighting → fold — the exact reference kernel idiom
    (timeseries.py:481-510) at order grain."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", (F.col("l_extendedprice") / 100000).alias("p"))
        .groupBy("l_orderkey")
        .agg(F.collect_list("p").alias("scores"))
        .select(
            "l_orderkey",
            F.round(harmonic_score(F.col("scores"), k=50), 4).alias(
                "harmonic_score"
            ),
            F.size("scores").cast("bigint").alias("n_parts"),
        )
    )


@query(
    "running_record_events",
    oracle="""
    WITH prev AS (
      SELECT user_id, event_id, ts, value,
             max(value) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_peak
      FROM events
    )
    SELECT user_id, event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value, prev_peak
    FROM prev WHERE prev_peak IS NULL OR value > prev_peak
    """,
)
def running_record_events(spark, sf_dir):
    """Per-user record detector — batch mode of the engine's custom
    stateful streaming operator (applyInPandasWithState holding one double
    per user; timeseries_spark.streaming.running_peaks). Batch is a
    running-max window, so the oracle checks the exact semantics the
    stateful path must reproduce (asserted equal in tests/test_streaming)."""
    from timeseries_spark.streaming.incremental import running_peaks

    events = load(spark, sf_dir, "events")
    return running_peaks(events, streaming=False).select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("ts_s"),
        "value",
        "prev_peak",
    )


_WEIGHT_CASE = """CASE src
               WHEN '1-URGENT' THEN 1.0 WHEN '2-HIGH' THEN 1.0
               WHEN '3-MEDIUM' THEN 0.5 ELSE 0.2 END"""


@query(
    "assoc_weighted_overall",
    oracle=f"""
    WITH ev AS (
      SELECT o_orderstatus, o_orderpriority AS src,
             year(o_orderdate) AS year,
             o_totalprice / 600000 AS score
      FROM orders
    ),
    keys AS (SELECT DISTINCT o_orderstatus, src FROM ev),
    years AS (SELECT unnest(generate_series(1995, 2002)) AS year),
    grid AS (SELECT * FROM keys CROSS JOIN years),
    pool AS (
      SELECT g.o_orderstatus, g.src, g.year, e.score,
             row_number() OVER (
               PARTITION BY g.o_orderstatus, g.src, g.year
               ORDER BY e.score DESC
             ) AS rn
      FROM grid g
      JOIN ev e ON e.o_orderstatus = g.o_orderstatus
               AND e.src = g.src AND e.year <= g.year
    ),
    src_scores AS (
      SELECT o_orderstatus, src, year,
             sum(score / (rn * rn)) / 1.64 AS sscore
      FROM pool WHERE rn <= 50 GROUP BY o_orderstatus, src, year
    ),
    weighted AS (
      SELECT o_orderstatus, year,
             sscore * {_WEIGHT_CASE} AS wscore,
             row_number() OVER (
               PARTITION BY o_orderstatus, year
               ORDER BY sscore * {_WEIGHT_CASE} DESC
             ) AS rn
      FROM src_scores
    ),
    overall AS (
      SELECT o_orderstatus, year, sum(wscore / (rn * rn)) / 1.64 AS score
      FROM weighted WHERE rn <= 50 GROUP BY o_orderstatus, year
    ),
    statuses AS (SELECT DISTINCT o_orderstatus FROM ev),
    sgrid AS (SELECT * FROM statuses CROSS JOIN years)
    SELECT g.o_orderstatus,
           CASE WHEN g.year = 2002 THEN NULL ELSE g.year END AS year,
           round(o.score, 4) AS score
    FROM sgrid g LEFT JOIN overall o USING (o_orderstatus, year)
    """,
)
def assoc_weighted_overall(spark, sf_dir):
    """The overall grain's two-level harmonic (timeseries.py:638-732):
    per-source cumulative scores are computed first (each already top-50
    harmonic-summed and /1.64-normalized), then weighted by datasource
    (broadcast 5-row map, unknown sources default 1.0), pooled per
    (key, year), and harmonic-summed AGAIN with a second /1.64
    normalization — the reference's deliberate double normalization. No
    second cumulative window: the per-source series are already
    cumulative."""
    from timeseries_spark.operators.scoring import overall_score

    ev = load(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.col("o_orderpriority").alias("src"),
        F.year("o_orderdate").cast("int").alias("year"),
        (F.col("o_totalprice") / 600000).alias("score"),
    )
    weights = {
        "1-URGENT": 1.0,
        "2-HIGH": 1.0,
        "3-MEDIUM": 0.5,
        "4-NOT SPECIFIED": 0.2,
        "5-LOW": 0.2,
    }
    per_source = association_score(ev, ORDERS_CFG, ("o_orderstatus", "src"))
    out = overall_score(
        per_source,
        ORDERS_CFG,
        ("o_orderstatus",),
        source_col="src",
        weights=weights,
    )
    return out.withColumn("score", F.round("score", 4))


_CUST_ASSOC_ORACLE = """
    WITH ev AS (
      SELECT o_custkey, year(o_orderdate) AS year,
             o_totalprice / 600000 AS score
      FROM orders
    ),
    keys AS (SELECT DISTINCT o_custkey FROM ev),
    years AS (SELECT unnest(generate_series(1995, 2002)) AS year),
    grid AS (SELECT * FROM keys CROSS JOIN years),
    pool AS (
      SELECT g.o_custkey, g.year, e.score,
             row_number() OVER (
               PARTITION BY g.o_custkey, g.year ORDER BY e.score DESC
             ) AS rn
      FROM grid g
      JOIN ev e ON e.o_custkey = g.o_custkey AND e.year <= g.year
    ),
    hs AS (
      SELECT o_custkey, year, sum(score / (rn * rn)) / 1.64 AS score
      FROM pool WHERE rn <= 50 GROUP BY o_custkey, year
    ),
    dense AS (
      SELECT g.o_custkey, g.year, hs.score
      FROM grid g LEFT JOIN hs USING (o_custkey, year)
    ),
    peaks AS (
      SELECT o_custkey, year AS peakYear,
             coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
               PARTITION BY o_custkey ORDER BY year
             ) AS peak
      FROM dense
    ),
    decays AS (
      SELECT o_custkey, peak, peakYear,
             unnest(generate_series(0, 10)) AS pos
      FROM peaks WHERE peak > 0
    ),
    nov AS (
      SELECT o_custkey, peakYear + pos AS year,
             round(max(peak / (1 + exp(2.0 * (pos - 2.0)))), 3) AS novelty
      FROM decays GROUP BY o_custkey, peakYear + pos
    )
    SELECT d.o_custkey,
           CASE WHEN d.year = 2002 THEN NULL ELSE d.year END AS year,
           round(d.score, 4) AS score,
           coalesce(n.novelty, 0.0) AS novelty
    FROM dense d LEFT JOIN nov n USING (o_custkey, year)
"""


@query("assoc_custkey_novelty", oracle=_CUST_ASSOC_ORACLE)
def assoc_custkey_novelty(spark, sf_dir):
    """The flagship pipeline at HIGH key cardinality: one series per
    customer (15k groups at sf0.1 — three orders of magnitude more than
    the priority×status grain), so the cumulative window and the novelty
    kernel are actually stressed at the shuffle level the real
    (disease, target, datasource) workload exhibits. A regression that
    only bites at high key cardinality (e.g. losing the partial aggregate
    before the exchange) moves THIS query's bench number."""
    ev = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").cast("int").alias("year"),
        (F.col("o_totalprice") / 600000).alias("score"),
    )
    scores = association_score(ev, ORDERS_CFG, ("o_custkey",))
    out = add_novelty(scores, ORDERS_CFG, ("o_custkey",))
    return out.withColumn("score", F.round("score", 4))


@query(
    "novelty_null_correlation",
    oracle="""
    WITH ev AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS id,
             o_orderpriority AS src,
             o_custkey % 100 AS grp,
             year(o_orderdate) AS year
      FROM orders
    ),
    bucketed AS (
      SELECT *, ('0x' || substring(md5(id), 1, 15))::BIGINT % 16 AS b
      FROM ev
    ),
    orig AS (
      SELECT *, row_number() OVER (PARTITION BY b ORDER BY md5(id)) AS rn
      FROM bucketed
    ),
    perm AS (
      SELECT b, year AS shuffled_year,
             row_number() OVER (PARTITION BY b ORDER BY md5(id || ':7')) AS rn
      FROM bucketed
    ),
    null_ev AS (
      SELECT o.src, o.grp, p.shuffled_year AS year
      FROM orig o JOIN perm p USING (b, rn)
    ),
    real_peak AS (
      SELECT src, grp, year AS real_peak FROM (
        SELECT src, grp, year,
               row_number() OVER (
                 PARTITION BY src, grp ORDER BY count(*) DESC, year
               ) AS rn
        FROM ev GROUP BY src, grp, year
      ) WHERE rn = 1
    ),
    null_peak AS (
      SELECT src, grp, year AS null_peak FROM (
        SELECT src, grp, year,
               row_number() OVER (
                 PARTITION BY src, grp ORDER BY count(*) DESC, year
               ) AS rn
        FROM null_ev GROUP BY src, grp, year
      ) WHERE rn = 1
    )
    SELECT src, round(corr(real_peak, null_peak), 4) AS corr_real_null,
           CAST(count(*) AS BIGINT) AS n_groups
    FROM real_peak JOIN null_peak USING (src, grp)
    GROUP BY src
    """,
)
def novelty_null_correlation(spark, sf_dir):
    """The notebook's correlation control (analysis.ipynb cells 2-6):
    Pearson correlation between each group's real peak-activity year and
    its peak year under the permutation null model
    (``shuffled_null_years``), one coefficient per source. A real dating
    signal shows corr ≈ 0 against the null — the analytic the reference
    uses to argue the timeseries carry information. The permutation is
    md5-deterministic (no rand), so DuckDB replays it EXACTLY: this
    oracle row also pins the null model itself."""
    from timeseries_spark.operators.scaffold import shuffled_null_years

    orders = load(spark, sf_dir, "orders")
    ev = orders.select(
        F.col("o_orderkey").cast("string").alias("id"),
        F.col("o_orderpriority").alias("src"),
        F.pmod(F.col("o_custkey"), F.lit(100)).alias("grp"),
        F.year("o_orderdate").cast("int").alias("year"),
    )
    null_ev = shuffled_null_years(ev, id_col="id", seed=7, n_buckets=16)

    def peak(df, out_name):
        counts = df.groupBy("src", "grp", "year").agg(
            F.count(F.lit(1)).alias("n")
        )
        w = Window.partitionBy("src", "grp").orderBy(
            F.col("n").desc(), F.col("year")
        )
        return (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("src", "grp", F.col("year").alias(out_name))
        )

    joined = peak(ev, "real_peak").join(peak(null_ev, "null_peak"), ["src", "grp"])
    return joined.groupBy("src").agg(
        F.round(F.corr("real_peak", "null_peak"), 4).alias("corr_real_null"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
    )


@query(
    "asof_last_purchase",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, value AS last_purchase_value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT e.event_id, e.user_id,
           CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_s,
           e.event_type, e.value, p.last_purchase_value
    FROM events e
    ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def asof_last_purchase(spark, sf_dir):
    """As-of join — the canonical operator Spark lacks natively: every
    event carries the value of the user's most recent purchase at or
    before it. Implemented as union + carry-forward window (one shuffle,
    operators/asof.py); the oracle uses DuckDB's native ASOF JOIN, so the
    engines must agree on the full semantics including >= ties."""
    from timeseries_spark.operators.asof import asof_join

    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("last_purchase_value")
    )
    out = asof_join(
        events.select("event_id", "user_id", "ts", "event_type", "value"),
        purchases,
        ["user_id"],
        "ts",
        "ts",
        ["last_purchase_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_s"),
        "event_type",
        "value",
        "last_purchase_value",
    )


@query(
    "click_attribution",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           p.value,
           epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def click_attribution(spark, sf_dir):
    """Conversion attribution: every purchase joined to the same user's
    clicks in the hour before it — the batch twin of the stream-stream
    interval join (streaming/incremental.py:attribute_conversions),
    whose time-bounded condition is what lets streaming state expire."""
    from timeseries_spark.streaming.incremental import attribute_conversions

    events = load(spark, sf_dir, "events")
    return attribute_conversions(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
        max_delay="1 hour",
        streaming=False,
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH s1 AS (
      SELECT user_id AS u, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id AS u, min(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.u
      WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id AS u, min(e.ts) AS t
      FROM events e JOIN s2 ON e.user_id = s2.u
      WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id
    ),
    c AS (
      SELECT (SELECT count(*) FROM s1) AS n_view,
             (SELECT count(*) FROM s2) AS n_click,
             (SELECT count(*) FROM s3) AS n_purchase
    )
    SELECT n_view, n_click, n_purchase,
           CASE WHEN n_view > 0 THEN
             round(CAST(n_click AS DOUBLE) / CAST(n_view AS DOUBLE), 6)
           END AS rate_click,
           CASE WHEN n_click > 0 THEN
             round(CAST(n_purchase AS DOUBLE) / CAST(n_click AS DOUBLE), 6)
           END AS rate_purchase
    FROM c
    """,
)
def funnel_view_click_purchase(spark, sf_dir):
    """Strict-order first-touch funnel view -> click -> purchase: a
    user converts at stage k only if a step-k event strictly follows
    their stage-(k-1) anchor — chained conditional-min aggregations
    equi-joined on the user key
    (operators/behavior.py:funnel_counts)."""
    from timeseries_spark.operators.behavior import funnel_counts

    events = load(spark, sf_dir, "events")
    return funnel_counts(
        events, "user_id", "event_type", "ts",
        steps=["view", "click", "purchase"],
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH acts AS (
      SELECT DISTINCT user_id AS u, day(ts) AS day FROM events
    ),
    coh AS (SELECT u, min(day) AS cohort FROM acts GROUP BY u)
    SELECT coh.cohort AS cohort_day,
           CAST(acts.day - coh.cohort AS INT) AS day_offset,
           count(*) AS n_users
    FROM acts JOIN coh USING (u)
    WHERE acts.day - coh.cohort <= 7
    GROUP BY cohort_day, day_offset
    """,
)
def retention_cohorts_q(spark, sf_dir):
    """Retention triangle: users cohorted by first active day, counted
    on each return day up to offset 7 — distinct activity, per-user min
    day, one user-keyed join back
    (operators/behavior.py:retention_cohorts)."""
    from timeseries_spark.operators.behavior import retention_cohorts

    events = load(spark, sf_dir, "events")
    return retention_cohorts(
        events, "user_id", F.dayofmonth("ts"), max_offset=7
    )
