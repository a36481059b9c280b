"""Downstream analytics idioms (novelty_distribution.py /
novelty_approval.py — SURVEY.md §2.4 A3/A5, §2.2 P4, §2.3 J9).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_spark.operators.skew import salted_sum
from timeseries_spark.queries import load, query


@query(
    "distinct_count_matrix",
    oracle="""
    SELECT year(o_orderdate) AS year, o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT o_custkey || '#' || o_orderstatus) AS n_cust_status,
           count(*) AS n_orders
    FROM orders
    GROUP BY year(o_orderdate), o_orderpriority
    """,
)
def distinct_count_matrix(spark, sf_dir):
    """A3: exact distinct counts per cell, incl. the composite-key
    ``concat`` idiom (novelty_distribution.py:547-556). The reference never
    approximates; ``approx_count_distinct`` stays opt-in."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("year"), "o_orderpriority"
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct(
                F.concat(
                    F.col("o_custkey").cast("string"),
                    F.lit("#"),
                    F.col("o_orderstatus"),
                )
            ).alias("n_cust_status"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "flag_matrix_rollup",
    oracle="""
    WITH flags AS (
      SELECT o_custkey,
             max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS has_urgent,
             max(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END)
               AS has_jumbo,
             max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS has_finished,
             max(CASE WHEN year(o_orderdate) <= 1996 THEN 1 ELSE 0 END)
               AS has_early
      FROM orders GROUP BY o_custkey
    )
    SELECT c_mktsegment,
           CAST(sum(has_urgent) AS BIGINT) AS n_urgent,
           CAST(sum(has_jumbo) AS BIGINT) AS n_jumbo,
           CAST(sum(has_finished) AS BIGINT) AS n_finished,
           CAST(sum(has_early) AS BIGINT) AS n_early
    FROM flags JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def flag_matrix_rollup(spark, sf_dir):
    """A5: the bell/cascade bucket-matrix shape — many max(flag) columns in
    one agg, then a second groupBy summing them
    (novelty_approval.py:676-694)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    flags = orders.groupBy("o_custkey").agg(
        F.max(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("has_urgent"),
        F.max(F.when(F.col("o_totalprice") > 300000, 1).otherwise(0)).alias(
            "has_jumbo"
        ),
        F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
            "has_finished"
        ),
        F.max(
            F.when(F.year("o_orderdate") <= 1996, 1).otherwise(0)
        ).alias("has_early"),
    )
    return (
        flags.join(customer, flags.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("has_urgent").alias("n_urgent"),
            F.sum("has_jumbo").alias("n_jumbo"),
            F.sum("has_finished").alias("n_finished"),
            F.sum("has_early").alias("n_early"),
        )
    )


@query(
    "excluded_sources_rollup",
    oracle="""
    SELECT source, lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE source NOT IN ('src1', 'src7', 'src13')
      AND lang IN ('en', 'es', 'fr')
    GROUP BY source, lang
    """,
)
def excluded_sources_rollup(spark, sf_dir):
    """P4 isin / NOT-isin exclusion lists (the excludeDatasource /
    therapeutic-area filters, timeseries.py:402-408,
    novelty_distribution.py:426-436)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.filter(
            ~F.col("source").isin("src1", "src7", "src13")
            & F.col("lang").isin("en", "es", "fr")
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "coverage_report",
    oracle="""
    SELECT event_type,
           count(*) AS n_total,
           CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_high,
           round(CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS frac_high
    FROM events
    GROUP BY event_type
    """,
)
def coverage_report(spark, sf_dir):
    """J9 rewritten single-pass: the reference self-joins two aggregates of
    the same table (timestamp_evidence.py:344-356); conditional aggregation
    computes both sides in one scan, no join (SURVEY.md §2.3 J9)."""
    events = load(spark, sf_dir, "events")
    high = F.sum(F.when(F.col("value") > 100, 1).otherwise(0))
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        high.alias("n_high"),
        F.round(high.cast("double") / F.count(F.lit(1)), 4).alias("frac_high"),
    )


@query(
    "skew_salted_agg",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           round(sum(l_quantity), 2) AS l_quantity_sum,
           round(sum(l_extendedprice), 2) AS l_extendedprice_sum
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def skew_salted_agg(spark, sf_dir):
    """Salted two-stage aggregation over a 3-value (maximally skewed) key:
    partials at (key, salt) spread each hot key over 16 sub-keys, the final
    combine sees only tiny salted rows. Result is exactly the plain
    groupBy (the oracle); the salt is derived from l_orderkey so the
    pipeline stays deterministic."""
    li = load(spark, sf_dir, "lineitem")
    out = salted_sum(
        li,
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice"],
        buckets=16,
        deterministic_from="l_orderkey",
    )
    return out.select(
        "l_returnflag",
        "n",
        F.round("l_quantity_sum", 2).alias("l_quantity_sum"),
        F.round("l_extendedprice_sum", 2).alias("l_extendedprice_sum"),
    )


@query(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def value_percentiles(spark, sf_dir):
    """Exact linear-interpolated percentiles per group (Spark
    ``percentile`` == DuckDB ``quantile_cont``). At 100 TB swap for
    ``approx_percentile`` (t-digest, mergeable partials) — exact
    percentile shuffles every value to its group like the reference's
    exact distinct counts; the approx form is the opt-in, same as A3."""
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


@query(
    "revenue_rollup",
    oracle="""
    SELECT coalesce(n_name, 'ALL') AS nation,
           coalesce(CAST(o_year AS VARCHAR), 'ALL') AS year,
           round(sum(rev), 2) AS revenue
    FROM (
      SELECT n_name, year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    )
    GROUP BY ROLLUP (n_name, o_year)
    """,
)
def revenue_rollup(spark, sf_dir):
    """Hierarchical subtotal ROLLUP (nation → nation+year → grand total) —
    beyond the reference (it never uses grouping sets) but table stakes
    for a log-analytics engine; Catalyst expands the rollup into one
    Expand + single aggregation, no multi-pass union."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    return (
        joined.rollup("n_name", "o_year")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .select(
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("o_year").cast("string"), F.lit("ALL")).alias(
                "year"
            ),
            "revenue",
        )
    )


@query(
    "interval_band_counts",
    oracle="""
    WITH bands AS (
      SELECT band * 10 AS band_id,
             band * band * 2.0 AS lo,
             band * band * 2.0 + 40 + band AS hi
      FROM (SELECT unnest(generate_series(0, 9)) AS band)
    )
    SELECT band_id, count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events JOIN bands ON value >= lo AND value <= hi
    GROUP BY band_id
    """,
)
def interval_band_counts(spark, sf_dir):
    """Interval join via the bucketized equi-join plan (operators/
    ranges.py): overlapping non-uniform value bands, each event matched to
    every containing band — the oracle runs the raw inequality join, the
    engine never does (no nested loop at scale)."""
    from timeseries_spark.operators.ranges import interval_join

    events = load(spark, sf_dir, "events")
    bands = spark.range(10).select(
        (F.col("id") * 10).alias("band_id"),
        (F.col("id") * F.col("id") * 2.0).alias("lo"),
        (F.col("id") * F.col("id") * 2.0 + 40 + F.col("id")).alias("hi"),
    )
    out = interval_join(
        events.select("event_id", "value"),
        bands,
        "value",
        "lo",
        "hi",
        bucket_width=25.0,
    )
    return out.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "event_type_pivot",
    oracle="""
    SELECT day(ts) AS day,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM events GROUP BY day(ts)
    """,
)
def event_type_pivot(spark, sf_dir):
    """Pivot (long -> wide): one column per event type, counts per day.
    The value list is EXPLICIT — an unpinned pivot runs a distinct scan
    first and produces nondeterministic column order, both wrong at
    scale."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.dayofmonth("ts").alias("day"))
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@query(
    "sliding_window_avg",
    oracle="""
    WITH daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    )
    SELECT event_type, day, total,
           round(avg(total) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ), 4) AS avg_7d
    FROM daily
    """,
)
def sliding_window_avg(spark, sf_dir):
    """Sliding rowsBetween frame (the one frame spec the reference never
    needed — SURVEY.md §2.5 note): trailing 7-day moving average per
    type."""
    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return daily.withColumn("avg_7d", F.round(F.avg("total").over(w), 4))


@query(
    "unpivot_flags_long",
    oracle="""
    WITH flags AS (
      SELECT o_custkey,
             max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS has_urgent,
             max(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END)
               AS has_jumbo
      FROM orders GROUP BY o_custkey
    )
    SELECT flag, CAST(sum(v) AS BIGINT) AS n_customers FROM (
      SELECT 'has_urgent' AS flag, has_urgent AS v FROM flags
      UNION ALL
      SELECT 'has_jumbo', has_jumbo FROM flags
    ) GROUP BY flag
    """,
)
def unpivot_flags_long(spark, sf_dir):
    """Unpivot (wide -> long, the inverse of pivot) via the native
    ``unpivot``/melt — one pass, no per-column union re-scan."""
    orders = load(spark, sf_dir, "orders")
    flags = orders.groupBy("o_custkey").agg(
        F.max(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("has_urgent"),
        F.max(F.when(F.col("o_totalprice") > 300000, 1).otherwise(0)).alias(
            "has_jumbo"
        ),
    )
    return (
        flags.unpivot("o_custkey", ["has_urgent", "has_jumbo"], "flag", "v")
        .groupBy("flag")
        .agg(F.sum("v").alias("n_customers"))
    )


@query(
    "string_normalize",
    oracle="""
    SELECT doc_id,
           array_to_string(list_transform(
             string_split(trim(regexp_replace(substring(text, 1, 40),
                                              '[^A-Za-z ]', '', 'g')), ' '),
             w -> CASE WHEN len(w) = 0 THEN w
                       ELSE upper(substring(w, 1, 1)) || lower(substring(w, 2))
                  END), ' ') AS headline,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
             AS n_digits
    FROM documents
    """,
)
def string_normalize(spark, sf_dir):
    """The reference's stage-0 driver-pandas string cleanup (.title(),
    regex strip — parse_timestamp.py:160-163, 229-255) as on-cluster
    Column expressions (SURVEY.md §2.8): regexp_replace + trim + initcap
    stay in codegen, run where the data is. (DuckDB has no initcap; the
    oracle spells it with a word-wise list transform.)"""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.initcap(
            F.trim(
                F.regexp_replace(
                    F.substring("text", 1, 40), "[^A-Za-z ]", ""
                )
            )
        ).alias("headline"),
        F.length(F.regexp_replace("text", "[^0-9]", ""))
        .cast("bigint")
        .alias("n_digits"),
    )


def _hll_oracle() -> str:
    from timeseries_spark.extensions.sketches import hll_sql

    inner = hll_sql("user_id", "event_type", "events", p=8)
    return f"""
    SELECT grp AS event_type, hll_est FROM ({inner})
    """


@query("approx_distinct_hll", oracle=_hll_oracle())
def approx_distinct_hll(spark, sf_dir):
    """Engine-reproducible HyperLogLog (p=8, ~6.5% expected error):
    approximate distinct users per event type from md5-derived registers
    — unlike approx_count_distinct's engine-private HLL++, the sketch
    (registers AND estimate) is bit-reproducible, so the DuckDB oracle
    matches it EXACTLY, and shard sketches merge by register-max. The
    scale path for A3's exact distinct counts: per-group state is 2^p
    registers instead of every distinct value."""
    from timeseries_spark.extensions.sketches import hll_distinct

    events = load(spark, sf_dir, "events")
    return hll_distinct(events, "user_id", ("event_type",), p=8)


def _profile_oracle() -> str:
    # float/double columns render via DECIMAL(30,6) in BOTH engines —
    # raw double-to-string formatting differs (Spark scientific vs
    # DuckDB plain) once |v| leaves [1e-3, 1e7)
    cols = {
        "o_orderkey": False,
        "o_custkey": False,
        "o_orderstatus": False,
        "o_totalprice": True,
    }
    parts = [
        f"""
    SELECT '{c}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST({f'CAST(min({c}) AS DECIMAL(30,6))' if is_f else f'min({c})'}
                AS VARCHAR) AS min_value,
           CAST({f'CAST(max({c}) AS DECIMAL(30,6))' if is_f else f'max({c})'}
                AS VARCHAR) AS max_value
    FROM orders"""
        for c, is_f in cols.items()
    ]
    return " UNION ALL ".join(parts)


@query("profile_orders", oracle=_profile_oracle())
def profile_orders(spark, sf_dir):
    """Single-pass column profiling of the orders table (row/null/
    distinct counts, min/max) — the pre-trust data-quality report,
    computed for ALL profiled columns in one aggregate pass so cost
    never scales with column count."""
    from timeseries_spark.extensions.sketches import profile_columns

    orders = load(spark, sf_dir, "orders")
    return profile_columns(
        orders, ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


def _histq_oracle() -> str:
    return """
    WITH h AS (
      SELECT CASE WHEN b < 0 THEN 0 WHEN b > 49 THEN 49 ELSE b END AS bin,
             count(*) AS n
      FROM (SELECT CAST(floor((CAST(value AS DOUBLE) - 0.0) / 10.0) AS INT)
              AS b FROM events WHERE value IS NOT NULL AND NOT isnan(value))
      GROUP BY 1
    ),
    c AS (
      SELECT bin, n,
             sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
      FROM h
    ),
    t AS (SELECT sum(n) AS total FROM h),
    qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                          CAST(0.99 AS DOUBLE)]) AS q),
    hit AS (
      SELECT q, bin, n, cum - n AS cum_prev, total
      FROM c CROSS JOIN t CROSS JOIN qs
      WHERE cum >= q * total
    ),
    first_hit AS (SELECT q, min(bin) AS bin FROM hit GROUP BY q)
    SELECT h2.q, h2.bin,
           floor((0.0 + 10.0 * (h2.bin + (h2.q * h2.total - h2.cum_prev)
                                / h2.n)) * 10000 + 0.5) / 10000 AS est
    FROM hit h2 JOIN first_hit f ON h2.q = f.q AND h2.bin = f.bin
    """


@query("quantile_histogram_sketch", oracle=_histq_oracle())
def quantile_histogram_sketch(spark, sf_dir):
    """Mergeable fixed-grid histogram quantiles (50 bins over [0, 500))
    for p50/p90/p99 of events.value: one map-side-combined groupBy to
    ≤ 50 sketch rows, then within-bin interpolation — error bounded by
    one bin width, shards merge by adding counts, and the estimate is
    integer-count arithmetic the oracle replays exactly
    (extensions/sketches.py:histogram_counts/histogram_quantiles)."""
    from timeseries_spark.extensions.sketches import (
        histogram_counts,
        histogram_quantiles,
    )

    events = load(spark, sf_dir, "events")
    bins = histogram_counts(events, "value", 0.0, 500.0, 50)
    return histogram_quantiles(bins, [0.5, 0.9, 0.99], 0.0, 500.0, 50)


def _histq_keyed_oracle() -> str:
    return """
    WITH h AS (
      SELECT event_type,
             CASE WHEN b < 0 THEN 0 WHEN b > 49 THEN 49 ELSE b END AS bin,
             count(*) AS n
      FROM (SELECT event_type,
                   CAST(floor((CAST(value AS DOUBLE) - 0.0) / 10.0) AS INT)
                     AS b FROM events WHERE value IS NOT NULL AND NOT isnan(value))
      GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, bin, n,
             sum(n) OVER (PARTITION BY event_type ORDER BY bin
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM h
    ),
    t AS (SELECT event_type, sum(n) AS total FROM h GROUP BY event_type),
    qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS q),
    hit AS (
      SELECT c.event_type, q, bin, n, cum - n AS cum_prev, total
      FROM c JOIN t USING (event_type) CROSS JOIN qs
      WHERE cum >= q * total
    ),
    first_hit AS (
      SELECT event_type, q, min(bin) AS bin FROM hit GROUP BY event_type, q
    )
    SELECT h2.event_type, h2.q, h2.bin,
           floor((0.0 + 10.0 * (h2.bin + (h2.q * h2.total - h2.cum_prev)
                                / h2.n)) * 10000 + 0.5) / 10000 AS est
    FROM hit h2
    JOIN first_hit f
      ON h2.event_type = f.event_type AND h2.q = f.q AND h2.bin = f.bin
    """


@query("quantile_histogram_by_type", oracle=_histq_keyed_oracle())
def quantile_histogram_by_type(spark, sf_dir):
    """Per-key histogram quantiles: p50/p90 of value per event_type
    from the same mergeable 50-bin sketch, with the cumulative window
    partitioned per key — fully parallel, no SinglePartition anywhere
    (extensions/sketches.py keyed variants)."""
    from timeseries_spark.extensions.sketches import (
        histogram_counts,
        histogram_quantiles,
    )

    events = load(spark, sf_dir, "events")
    bins = histogram_counts(
        events, "value", 0.0, 500.0, 50, keys=("event_type",)
    )
    return histogram_quantiles(
        bins, [0.5, 0.9], 0.0, 500.0, 50, keys=("event_type",)
    )


@query(
    "customer_order_features",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sy,
             CAST(sum(year(o_orderdate)) AS BIGINT) AS sx,
             CAST(sum(year(o_orderdate) * year(o_orderdate)) AS BIGINT)
               AS sxx,
             sum(CAST(o_totalprice AS DECIMAL(18,2))
                 * CAST(year(o_orderdate) AS DECIMAL(18,2))) AS sxy,
             CAST(min(year(o_orderdate)) AS INT) AS x_first,
             CAST(max(year(o_orderdate)) AS INT) AS x_last
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, n,
           CAST(sy AS DOUBLE) AS y_total,
           CAST(sy AS DOUBLE) / n AS y_avg,
           x_first, x_last,
           CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                ELSE (n * CAST(sxy AS DOUBLE)
                      - sx * CAST(sy AS DOUBLE))
                     / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope
    FROM g
    """,
)
def customer_order_features(spark, sf_dir):
    """Per-customer feature-matrix row for downstream ML: order count,
    exact spend totals, first/last active year, and the closed-form
    least-squares spend trend — with every moment sum in DECIMAL so the
    matrix is bit-identical on any partitioning (a double sum's value
    depends on partial-agg order; no rounding fully masks that)
    (extensions/features.py:trend_features)."""
    from timeseries_spark.extensions.features import trend_features

    orders = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    return trend_features(
        orders, key_col="o_custkey", x_col="o_year", y_col="o_totalprice"
    )


@query(
    "revenue_gini_by_nation",
    oracle="""
    WITH per_unit AS (
      SELECT n.n_name AS nation, c.c_custkey AS unit,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name, c.c_custkey
    ),
    ranked AS (
      SELECT nation, y,
             row_number() OVER (PARTITION BY nation ORDER BY y, unit) AS i
      FROM per_unit
    ),
    agg AS (
      SELECT nation, CAST(count(*) AS BIGINT) AS n_units,
             sum(y) AS sy, sum(CAST(i AS DECIMAL(20,0)) * y) AS siy
      FROM ranked GROUP BY nation
    )
    SELECT nation, n_units, CAST(sy AS DOUBLE) AS total_value,
           round(2.0 * CAST(siy AS DOUBLE)
                 / (CAST(n_units AS DOUBLE) * CAST(sy AS DOUBLE))
                 - (CAST(n_units AS DOUBLE) + 1.0)
                   / CAST(n_units AS DOUBLE), 6) AS gini
    FROM agg
    """,
)
def revenue_gini_by_nation(spark, sf_dir):
    """Per-nation Gini concentration of customer order revenue — the
    inequality audit over exact decimal unit totals with a (value,
    unit) total order, rank windows partitioned by nation (never
    global) (extensions/dataquality.py:gini_by_group)."""
    from timeseries_spark.extensions.dataquality import gini_by_group

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    joined = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .select(F.col("n_name").alias("nation"), "o_custkey", "o_totalprice")
    )
    return gini_by_group(
        joined, ["nation"], "o_custkey", "o_totalprice"
    )


@query(
    "weighted_median_price",
    oracle="""
    WITH cum AS (
      SELECT o_orderpriority AS priority,
             o_totalprice AS v,
             CAST(l.cnt AS DECIMAL(18,4)) AS wt,
             sum(CAST(l.cnt AS DECIMAL(18,4))) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, CAST(l.cnt AS DECIMAL(18,4))
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             sum(CAST(l.cnt AS DECIMAL(18,4))) OVER (
               PARTITION BY o_orderpriority) AS tw
      FROM orders o
      JOIN (SELECT l_orderkey, count(*) AS cnt
            FROM lineitem GROUP BY l_orderkey) l
        ON l.l_orderkey = o.o_orderkey
    )
    SELECT priority,
           min(CASE WHEN tw > 0 AND cw * 2 >= tw THEN v END)
             AS weighted_median,
           CAST(count(*) AS BIGINT) AS n,
           CAST(first(tw) AS DOUBLE) AS total_weight
    FROM cum GROUP BY priority
    """,
)
def weighted_median_price(spark, sf_dir):
    """Per-priority lower weighted median of order price, weighted by
    line count — exact and interpolation-free (the smallest value
    whose cumulative decimal weight reaches half the total); one
    key-grain sort window plus one aggregate
    (operators/timeseries.py:weighted_median)."""
    from timeseries_spark.operators.timeseries import weighted_median

    orders = load(spark, sf_dir, "orders")
    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    joined = orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"]
    ).select(
        F.col("o_orderpriority").alias("priority"),
        "o_totalprice",
        "cnt",
    )
    return weighted_median(joined, ["priority"], "o_totalprice", "cnt")


@query(
    "conversion_latency_view_purchase",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_type,
             max(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id
               ORDER BY ts,
                        CASE WHEN event_type = 'view' THEN 0 ELSE 1 END,
                        event_type
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS from_ts
      FROM events
    ),
    deltas AS (
      -- whole-second deltas: Spark's unix_timestamp truncates to
      -- seconds while epoch() keeps the nano fraction
      SELECT CAST(floor(epoch(ts)) - floor(epoch(from_ts)) AS DOUBLE)
        AS delta_s
      FROM marked
      WHERE event_type = 'purchase' AND from_ts IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_conversions,
           floor(quantile_cont(delta_s, 0.5) * 1e6 + 0.5) / 1e6 AS p50_s,
           floor(quantile_cont(delta_s, 0.9) * 1e6 + 0.5) / 1e6 AS p90_s,
           max(delta_s) AS max_s
    FROM deltas
    """,
)
def conversion_latency_view_purchase(spark, sf_dir):
    """Time-to-convert distribution from each user's most recent view
    to each purchase: one user-keyed running-max window + one
    percentile aggregate over the deltas; zero-latency same-timestamp
    conversions included, trigger-less purchases excluded
    (operators/behavior.py:conversion_latency)."""
    from timeseries_spark.operators.behavior import conversion_latency

    events = load(spark, sf_dir, "events")
    return conversion_latency(
        events, "user_id", "ts", "event_type", "view", "purchase"
    )
