"""Core relational operators (SURVEY.md §2.2-2.8) over the TPC-H-ish tables.

Each query exercises one inventory row (P/J/A/W/O/U/F ids cited) and ships a
DuckDB oracle. Operator→fixture mapping follows FIXTURES.md §B.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from timeseries_spark.operators.ontology import expand_ontology
from timeseries_spark.operators.windows import argmax_rows, argmin_rows, top1_per_group
from timeseries_spark.queries import load, query


# --- A-series aggregations + P3 filters (pricing summary à la TPC-H Q1) ----

@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """A4/A6/A7 multi-agg + P3 range filter; filter pushes to parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- J2 snowflake join chain with broadcast dims ----------------------------

@query(
    "revenue_by_nation",
    oracle="""
    SELECT n_name, r_name,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
)
def revenue_by_nation(spark, sf_dir):
    """J2 chained equi joins; nation/region are broadcast (SURVEY.md §4)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --- J4 two-hop + J3 multi-key -----------------------------------------------

@query(
    "supplier_part_revenue",
    oracle="""
    SELECT p_brand, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_size <= 25
    GROUP BY p_brand, n_name
    """,
)
def supplier_part_revenue(spark, sf_dir):
    """J4 snowflake (lineitem→part, lineitem→supplier→nation) with a
    pushed-down dimension predicate."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("p_brand", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- J6 anti / J8 semi -------------------------------------------------------

@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def customers_without_orders(spark, sf_dir):
    """J6 left-anti join ('rows not yet processed' idiom,
    timestamp_evidence.py:259-265)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
)
def customers_with_urgent_orders(spark, sf_dir):
    """J8 left-semi join (cleaner form of the reference's inner-to-distinct
    idiom, plot_timeseries.py:773-794)."""
    customer = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


# --- W3/W4/W5 window idioms --------------------------------------------------

@query(
    "top_nation_per_region",
    oracle="""
    WITH rev AS (
      SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    )
    SELECT r_name, n_name, revenue FROM (
      SELECT *, row_number() OVER (
        PARTITION BY r_name ORDER BY revenue DESC, n_name
      ) AS rn FROM rev
    ) WHERE rn = 1
    """,
)
def top_nation_per_region(spark, sf_dir):
    """W3 row_number top-1 per group (novelty_distribution.py:93-96)."""
    rev = revenue_by_nation(spark, sf_dir)
    return top1_per_group(
        rev.select("r_name", "n_name", "revenue"),
        ["r_name"],
        [F.col("revenue").desc(), F.col("n_name")],
    )


@query(
    "largest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             max(o_totalprice) OVER (PARTITION BY o_custkey) AS mx
      FROM orders
    ) WHERE o_totalprice = mx
    """,
)
def largest_order_per_customer(spark, sf_dir):
    """W4 arg-max rows with ties kept — float-equality filter is
    load-bearing (novelty_distribution.py:720-726; SURVEY.md §7)."""
    orders = load(spark, sf_dir, "orders")
    return argmax_rows(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        "o_totalprice",
    )


@query(
    "first_order_year_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, oy AS order_year
    FROM (
      SELECT o_custkey, o_orderkey, year(o_orderdate) AS oy,
             min(year(o_orderdate)) OVER (PARTITION BY o_custkey) AS mn
      FROM orders
    )
    WHERE oy = mn
    """,
)
def first_order_year_per_customer(spark, sf_dir):
    """W5 arg-min rows (first-approval idiom, novelty_approval.py:368-376)."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.year("o_orderdate").alias("order_year")
    )
    return argmin_rows(orders, ["o_custkey"], "order_year")


# --- J1/F1/F5 ontology expansion ---------------------------------------------

@query(
    "ontology_rollup",
    oracle="""
    WITH dim AS (
      SELECT n_name AS id, r_name AS ancestor
      FROM nation JOIN region ON n_regionkey = r_regionkey
    ),
    exploded AS (
      SELECT id, unnest([id, ancestor]) AS label FROM dim
    )
    SELECT e.label, count(*) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation ON c.c_nationkey = n_nationkey
    JOIN exploded e ON n_name = e.id
    GROUP BY e.label
    """,
)
def ontology_rollup(spark, sf_dir):
    """J1 fan-out join over an exploded self∪ancestors array
    (timeseries.py:350-364) — nation→region as a 2-level ontology."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    dim = (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("n_name").alias("id"),
            F.array(F.col("r_name")).alias("ancestors"),
        )
    )
    ev = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select(F.col("n_name").alias("diseaseId"), "c_acctbal")
    return (
        expand_ontology(ev, dim, disease_id_col="diseaseId")
        .groupBy(F.col("diseaseId").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


# --- U1 unionByName with missing columns ------------------------------------

@query(
    "union_missing_columns",
    oracle="""
    SELECT okey, round(sum(amount), 2) AS total, count(*) AS n
    FROM (
      SELECT o_orderkey AS okey, o_totalprice AS amount,
             o_orderpriority AS priority
      FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL BY NAME
      SELECT l_orderkey AS okey, l_extendedprice AS amount
      FROM lineitem WHERE l_returnflag = 'R'
    )
    GROUP BY okey
    """,
)
def union_missing_columns(spark, sf_dir):
    """U1 unionByName(allowMissingColumns=True)
    (timestamp_evidence.py:259-266)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderpriority").alias("priority"),
    )
    b = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_extendedprice").alias("amount"),
    )
    return (
        a.unionByName(b, allowMissingColumns=True)
        .groupBy("okey")
        .agg(
            F.round(F.sum("amount"), 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- P6 conditional bucketing / P7 cast / P10 distinct -----------------------

@query(
    "order_price_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                WHEN o_totalprice < 300000 THEN 'large'
                ELSE 'jumbo' END AS bucket,
           o_orderstatus,
           count(*) AS n,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY bucket, o_orderstatus
    """,
)
def order_price_buckets(spark, sf_dir):
    """P6 when/when/otherwise bucketing (phase-bucket idiom,
    novelty_approval.py:496-511)."""
    orders = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("bucket", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


@query(
    "distinct_customer_years",
    oracle="""
    SELECT count(*) AS n FROM (
      SELECT DISTINCT o_custkey, year(o_orderdate) AS y FROM orders
    )
    """,
)
def distinct_customer_years(spark, sf_dir):
    """P10 distinct on a key projection (47 uses in the reference)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_custkey", F.year("o_orderdate").alias("y"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- P9 coalesce priority + F16-adjacent JSON --------------------------------

@query(
    "json_props_rollup",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
             AS k_sum,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def json_props_rollup(spark, sf_dir):
    """JSON property extraction (extension beyond the reference, which has
    no JSON columns — SURVEY.md §2.8 F16)."""
    events = load(spark, sf_dir, "events")
    return (
        events.withColumn(
            "k", F.get_json_object("props", "$.k").cast("int")
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "coalesce_date_priority",
    oracle="""
    SELECT o_orderkey,
           coalesce(
             CASE WHEN o_orderstatus = 'F' THEN year(o_orderdate) END,
             CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                  THEN year(o_orderdate) + 1 END,
             9999
           ) AS best_year
    FROM orders
    """,
)
def coalesce_date_priority(spark, sf_dir):
    """P9 first-non-null priority rule (the best-date idiom,
    timestamp_evidence.py:304-307) over derived nullable columns."""
    orders = load(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.coalesce(
            F.when(F.col("o_orderstatus") == "F", y),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), y + 1
            ),
            F.lit(9999),
        ).alias("best_year"),
    )


@query(
    "right_join_fill",
    oracle="""
    SELECT c_custkey, c_mktsegment, coalesce(n_urgent, 0) AS n_urgent
    FROM (
      SELECT o_custkey, count(*) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT'
      GROUP BY o_custkey
    ) u
    RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)
def right_join_fill(spark, sf_dir):
    """J5 right join: a sparse aggregate re-attached to the full dimension
    preserving every row, missing values filled with 0 (the novelty-merge
    idiom, timeseries.py:621-626). The aggregate side is small after
    groupBy, so AQE broadcasts it and no row of the big side shuffles."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    return urgent.join(
        customer, urgent.o_custkey == customer.c_custkey, "right"
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce(F.col("n_urgent"), F.lit(0)).alias("n_urgent"),
    )


# --- P3 point query (pushdown) ----------------------------------------------

@query(
    "point_customer_orders",
    oracle="""
    SELECT o_orderkey, year(o_orderdate) AS order_year, o_totalprice,
           o_orderstatus
    FROM orders WHERE o_custkey = 371
    """,
)
def point_customer_orders(spark, sf_dir):
    """P3 point filter — the plotTargetDisease-style lookup
    (plot_timeseries.py:722-724); predicate pushes to the parquet scan."""
    orders = load(spark, sf_dir, "orders")
    return orders.filter(F.col("o_custkey") == 371).select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        "o_totalprice",
        "o_orderstatus",
    )


# --- W6/O6 rank-based windows + pivot (beyond ref) --------------------------

@query(
    "order_price_deciles",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           ntile(10) OVER w AS decile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def order_price_deciles(spark, sf_dir):
    """Rank-family windows per priority class: ntile deciles,
    percent_rank, cume_dist. The (price, orderkey) ordering is a total
    order, so every rank — and therefore every derived double — is a
    deterministic rational both engines compute identically (no
    rounding needed)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "event_type_pivot",
    oracle=f"""
    SELECT day(ts) AS day,
           {", ".join(
               f"round(coalesce(sum(CASE WHEN event_type = '{t}' "
               f"THEN value END), 0.0), 2) AS {t}"
               for t in _EVENT_TYPES
           )}
    FROM events
    GROUP BY day(ts)
    """,
)
def event_type_pivot(spark, sf_dir):
    """Wide daily matrix via pivot with an EXPLICIT column-value list —
    the implicit form runs a distinct-scan job first and can produce
    schema drift between runs; pinning the values keeps the plan a
    single pass (one shuffle, map-side partials)."""
    events = load(spark, sf_dir, "events")
    return (
        events.select(F.dayofmonth("ts").alias("day"), "event_type", "value")
        .groupBy("day")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2))
    )


@query(
    "event_type_melt",
    oracle=f"""
    WITH wide AS (
      SELECT day(ts) AS day,
             {", ".join(
                 f"round(coalesce(sum(CASE WHEN event_type = '{t}' "
                 f"THEN value END), 0.0), 2) AS {t}"
                 for t in _EVENT_TYPES
             )}
      FROM events GROUP BY day(ts)
    )
    {" UNION ALL ".join(
        f"SELECT day, '{t}' AS event_type, {t} AS total FROM wide"
        for t in _EVENT_TYPES
    )}
    """,
)
def event_type_melt(spark, sf_dir):
    """Unpivot back to long form via the native melt/unpivot — the
    inverse of event_type_pivot, so the pivot pair round-trips. melt is
    a per-row explode (zero extra shuffles beyond the wide agg)."""
    wide = event_type_pivot(spark, sf_dir)
    return wide.unpivot(
        ["day"], list(_EVENT_TYPES), "event_type", "total"
    )


@query(
    "nation_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT n.n_regionkey AS regionkey, n.n_name AS nation,
             round(sum(o.o_totalprice), 2) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_regionkey, n.n_name
    )
    SELECT regionkey, nation, revenue,
           floor(revenue / sum(revenue) OVER (PARTITION BY regionkey)
                 * 1e6 + 0.5) / 1e6 AS region_share
    FROM rev
    """,
)
def nation_revenue_share(spark, sf_dir):
    """Ratio-to-report: each nation's share of its region's revenue —
    an aggregate re-read through an unbounded partition window instead
    of a self-join of aggregates (the J9 fusion lesson applied to
    shares). Share snapped at 1e-6 for engine-exact hashing."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                nation.select("n_nationkey", "n_regionkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_regionkey").alias("regionkey"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("regionkey")
    share = F.col("revenue") / F.sum("revenue").over(w)
    return rev.withColumn(
        "region_share",
        F.floor(share * 1e6 + F.lit(0.5)).cast("double") / 1e6,
    )


@query(
    "revenue_cube",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders,
           grouping(o_orderpriority) AS g_priority,
           grouping(o_orderstatus) AS g_status
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def revenue_cube(spark, sf_dir):
    """CUBE grouping sets: all four aggregation grains of
    (priority, status) in one pass, with grouping() flags
    disambiguating roll-up NULLs from (absent-here) data NULLs —
    completes the grouping-sets family next to revenue_rollup."""
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
    )


@query(
    "fuzzy_name_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND abs(len(a.p_name) - len(b.p_name)) <= 3
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def fuzzy_name_pairs(spark, sf_dir):
    """Fuzzy string-match join: distinct part names within edit
    distance 3, candidates blocked by a length band (a pair at distance
    d differs by at most d in length) so the expensive levenshtein only
    runs on band-mates — the verify stage of fuzzy entity resolution.
    For corpora where same-length tails are fat, swap the band key for
    the dedup layer's shingle/LSH candidate generators; the verify
    shape stays identical."""
    part = load(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.explode(
            F.sequence(
                F.length("p_name") - 3, F.length("p_name") + 3
            )
        ).alias("band"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.length("p_name").alias("band"),
    )
    return (
        a.join(b, "band")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 3)
        .select("name_a", "name_b", "dist")
    )


@query(
    "entity_resolution_parts",
    oracle="""
    WITH RECURSIVE names AS (
      SELECT p_name,
             ('0x' || substring(md5(p_name), 1, 15))::BIGINT AS nid
      FROM (SELECT DISTINCT p_name FROM part)
    ),
    pairs AS (
      SELECT a.nid AS id_a, b.nid AS id_b
      FROM names a JOIN names b
        ON a.p_name < b.p_name
       AND abs(len(a.p_name) - len(b.p_name)) <= 3
      WHERE levenshtein(a.p_name, b.p_name) <= 3
    ),
    undirected AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT src, dst FROM undirected
      UNION
      SELECT r.src, u.dst FROM reach r JOIN undirected u ON r.dst = u.src
    ),
    comp AS (
      SELECT n.p_name, n.nid,
             least(n.nid, coalesce(min(r.dst), n.nid)) AS component
      FROM names n LEFT JOIN reach r ON r.src = n.nid
      GROUP BY n.p_name, n.nid
    )
    SELECT c.p_name, canon.p_name AS canonical_name,
           CAST(count(*) OVER (PARTITION BY c.component) AS BIGINT)
             AS cluster_size
    FROM comp c JOIN names canon ON canon.nid = c.component
    """,
)
def entity_resolution_parts(spark, sf_dir):
    """End-to-end fuzzy entity resolution over part names — the
    capstone composition record-linkage pipelines run: length-band
    blocking → levenshtein verify (fuzzy_name_pairs) → connected
    components over the match graph (pointer-jumping min-label, the
    dedup CC kernel) → canonical per cluster. Names are keyed by the
    engine-portable 60-bit md5 surrogate so the CC label algebra (and
    its decimal-sum convergence check) stays numeric; the canonical
    member is the min-hash name, replayed exactly by the oracle's
    recursive-CTE closure. Returns (p_name, canonical_name,
    cluster_size) for every distinct name."""
    from timeseries_spark.extensions.dedup import connected_components
    from timeseries_spark.extensions.hashing import md5_long

    part = load(spark, sf_dir, "part")
    names = part.select("p_name").distinct().select(
        "p_name", md5_long(F.col("p_name")).alias("nid")
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("nid").alias("id_a"),
        F.explode(
            F.sequence(F.length("p_name") - 3, F.length("p_name") + 3)
        ).alias("band"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("nid").alias("id_b"),
        F.length("p_name").alias("band"),
    )
    pairs = (
        a.join(b, "band")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.levenshtein("name_a", "name_b") <= 3)
        .select("id_a", "id_b")
    )
    comps = connected_components(pairs, names, id_col="nid")
    resolved = names.join(comps, "nid")
    canon = names.select(
        F.col("nid").alias("component"), F.col("p_name").alias("canonical_name")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("component")
    return (
        resolved.join(canon, "component")
        .withColumn("cluster_size", F.count(F.lit(1)).over(w).cast("bigint"))
        .select("p_name", "canonical_name", "cluster_size")
    )
