"""Graph queries: fixed-iteration PageRank over the part↔supplier
co-occurrence graph from lineitem (extensions/graph.py). The oracle
unrolls the same three power-method rounds as chained CTEs, with the
identical per-round 1e-10 half-up snap, so the replay is exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_spark.extensions.graph import bipartite_edges, pagerank
from timeseries_spark.queries import load, query

_N_ITER = 3
_D = 0.85


def _pr_oracle(n_iter: int, d: float) -> str:
    ctes = [
        """pairs AS (
      SELECT DISTINCT 'P' || CAST(l_partkey AS VARCHAR) AS a,
                      'S' || CAST(l_suppkey AS VARCHAR) AS b
      FROM lineitem
    )""",
        """edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION SELECT b, a FROM pairs
    )""",
        """deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)""",
        """e AS (SELECT edges.src, edges.dst, deg.outdeg
             FROM edges JOIN deg USING (src))""",
        """nodes AS (SELECT src AS node FROM edges
                 UNION SELECT dst FROM edges)""",
        """n AS (SELECT count(*) AS n_nodes FROM nodes)""",
        """r0 AS (
      SELECT node,
             floor(CAST(1.0 AS DOUBLE) / n_nodes * 1e10 + 0.5) / 1e10
               AS rank
      FROM nodes, n
    )""",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""c{i} AS (
      SELECT e.dst, sum(r.rank / e.outdeg) AS c
      FROM e JOIN r{i - 1} r ON e.src = r.node
      GROUP BY e.dst
    )"""
        )
        ctes.append(
            f"""r{i} AS (
      SELECT node,
             floor((CAST({1.0 - d} AS DOUBLE) / n_nodes
                    + {d} * coalesce(c, 0.0)) * 1e10 + 0.5) / 1e10 AS rank
      FROM (nodes CROSS JOIN n) LEFT JOIN c{i} ON c{i}.dst = node
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT node, rank FROM r{n_iter}
    """


@query("pagerank_parts_suppliers", oracle=_pr_oracle(_N_ITER, _D))
def pagerank_parts_suppliers(spark, sf_dir):
    """PageRank (3 rounds, d = 0.85) over the symmetric bipartite
    part↔supplier graph induced by lineitem: per round one |E|-grain
    equi-join plus a node-grain hash agg — work linear in edges, ranks
    snapped to 1e-10 per round for engine-exact replay."""
    li = load(spark, sf_dir, "lineitem")
    edges = bipartite_edges(li, "l_partkey", "l_suppkey", "P", "S")
    return pagerank(edges, n_iter=_N_ITER, damping=_D)


def _lpa_oracle(n_iter: int) -> str:
    ctes = [
        """pairs AS (
      SELECT DISTINCT 'P' || CAST(l_partkey AS VARCHAR) AS a,
                      'S' || CAST(l_suppkey AS VARCHAR) AS b
      FROM lineitem
    )""",
        """edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION SELECT b, a FROM pairs
    )""",
        """l0 AS (
      SELECT node, node AS label FROM (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges)
    )""",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""p{i} AS (
      SELECT node, label FROM (
        SELECT e.src AS node, l.label,
               row_number() OVER (PARTITION BY e.src
                                  ORDER BY count(*) DESC, l.label) AS rn
        FROM edges e JOIN l{i - 1} l ON l.node = e.dst
        GROUP BY e.src, l.label
      ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""l{i} AS (
      SELECT o.node, coalesce(p.label, o.label) AS label
      FROM l{i - 1} o LEFT JOIN p{i} p USING (node)
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT node, label AS community FROM l{n_iter}
    """


@query("label_propagation_communities", oracle=_lpa_oracle(_N_ITER))
def label_propagation_communities(spark, sf_dir):
    """Deterministic synchronous label propagation (3 rounds, ties to
    the smallest label) over the same part↔supplier graph as PageRank —
    community detection as a bounded iterative operator; per round one
    |E|-grain join + (node, label) count + node-grain pick
    (extensions/graph.py:label_propagation)."""
    from timeseries_spark.extensions.graph import label_propagation

    li = load(spark, sf_dir, "lineitem")
    edges = bipartite_edges(li, "l_partkey", "l_suppkey", "P", "S")
    return label_propagation(edges, n_iter=_N_ITER)


@query(
    "triangle_counts_parts",
    oracle="""
    WITH und AS (
      SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    deg AS MATERIALIZED (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und
      ) GROUP BY node
    ),
    ornt AS MATERIALIZED (
      SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END
               AS src,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END
               AS dst,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END
               AS dst_d
      FROM und e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ),
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM ornt e1
      JOIN ornt e2
        ON e1.src = e2.src AND (e1.dst_d, e1.dst) < (e2.dst_d, e2.dst)
      JOIN ornt e3 ON e3.src = e1.dst AND e3.dst = e2.dst
    ),
    per_node AS (
      SELECT node, count(*) AS triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT d.node, CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles
    FROM deg d LEFT JOIN per_node p ON p.node = d.node
    """,
)
def triangle_counts_parts(spark, sf_dir):
    """Per-part triangle counts of the co-order graph (parts are
    adjacent when some order contains both): degree-oriented wedge
    counting — each edge points from its lower-(degree, id) endpoint,
    so wedge fan-out is bounded by the oriented out-degree O(√|E|) and
    hub parts cannot square their degree; two |E|-grain equi joins plus
    an explode/aggregate, no cartesian
    (extensions/graph.py:triangle_counts)."""
    from timeseries_spark.extensions.graph import triangle_counts

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )
    return triangle_counts(pairs)


_PARTS_UND = """
    und AS (
      SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    deg AS MATERIALIZED (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und
      ) GROUP BY node
    )"""

_PARTS_TRI = """
    ornt AS MATERIALIZED (
      SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END
               AS src,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END
               AS dst,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END
               AS dst_d
      FROM und e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ),
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM ornt e1
      JOIN ornt e2
        ON e1.src = e2.src AND (e1.dst_d, e1.dst) < (e2.dst_d, e2.dst)
      JOIN ornt e3 ON e3.src = e1.dst AND e3.dst = e2.dst
    ),
    per_node AS (
      SELECT node, count(*) AS triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )"""


@query(
    "clustering_coefficient_parts",
    oracle=f"""
    WITH {_PARTS_UND},
    {_PARTS_TRI}
    SELECT d.node, CAST(d.d AS BIGINT) AS degree,
           CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles,
           round(CASE WHEN d.d >= 2
                 THEN 2.0 * coalesce(p.triangles, 0)
                      / (CAST(d.d AS DOUBLE) * (d.d - 1.0))
                 ELSE 0.0 END, 6) AS clustering
    FROM deg d LEFT JOIN per_node p ON p.node = d.node
    """,
)
def clustering_coefficient_parts(spark, sf_dir):
    """Per-part local clustering coefficient of the co-order graph —
    2T/(d(d−1)) from the degree-oriented triangle counts; how
    clique-like each part's co-purchase neighborhood is
    (extensions/graph.py:local_clustering)."""
    from timeseries_spark.extensions.graph import local_clustering

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )
    return local_clustering(pairs)


@query(
    "parts_graph_assortativity",
    oracle=f"""
    WITH {_PARTS_UND},
    both_dir AS (
      SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
    )
    SELECT CAST(count(DISTINCT b.u) AS BIGINT) AS n_nodes,
           CAST(count(*) / 2 AS BIGINT) AS n_edges,
           floor(corr(CAST(du.d AS DOUBLE), CAST(dv.d AS DOUBLE)) * 1e6
                 + 0.5) / 1e6 AS assortativity
    FROM both_dir b
    JOIN deg du ON du.node = b.u
    JOIN deg dv ON dv.node = b.v
    """,
)
def parts_graph_assortativity(spark, sf_dir):
    """Degree assortativity (Newman r) of the parts co-order graph:
    Pearson correlation of endpoint degrees over both edge
    orientations — one scalar corr aggregate after two degree joins,
    snapped at 1e-6 (extensions/graph.py:degree_assortativity)."""
    from timeseries_spark.extensions.graph import degree_assortativity

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )
    return degree_assortativity(pairs)


def _kcore_oracle(k: int, n_rounds: int) -> str:
    """Unrolled peeling replay: per round, keep edges whose endpoints
    both survived, recompute degrees, keep nodes with degree >= k.
    State CTEs are MATERIALIZED (re-referenced across rounds)."""
    ctes = [
        """e0 AS MATERIALIZED (
      SELECT DISTINCT 's' || l_suppkey AS u, 'p' || l_partkey AS v
      FROM lineitem
    )""",
        f"""alive0 AS MATERIALIZED (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM e0 UNION ALL SELECT v AS node FROM e0
      ) GROUP BY node HAVING count(*) >= {k}
    )""",
    ]
    for t in range(1, n_rounds + 1):
        ctes.append(
            f"""e{t} AS MATERIALIZED (
      SELECT e.u, e.v FROM e{t - 1} e
      WHERE EXISTS (SELECT 1 FROM alive{t - 1} a WHERE a.node = e.u)
        AND EXISTS (SELECT 1 FROM alive{t - 1} a WHERE a.node = e.v)
    )"""
        )
        ctes.append(
            f"""alive{t} AS MATERIALIZED (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM e{t} UNION ALL SELECT v AS node FROM e{t}
      ) GROUP BY node HAVING count(*) >= {k}
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT a.node, CAST(a.d AS BIGINT) AS core_degree,
           (SELECT count(*) FROM alive{n_rounds})
             = (SELECT count(*) FROM alive{n_rounds - 1}) AS converged
    FROM alive{n_rounds} a
    """


@query("k_core_supplier_part", oracle=_kcore_oracle(30, 4))
def k_core_supplier_part(spark, sf_dir):
    """30-core of the supplier↔part bipartite graph by bounded-round
    peeling (4 rounds, convergence flag emitted): per round an
    |E|-grain semi-join pair plus a degree aggregate — work shrinks
    with the surviving subgraph (extensions/graph.py:k_core)."""
    from timeseries_spark.extensions.graph import k_core

    li = load(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    return k_core(edges, k=30, n_rounds=4)
