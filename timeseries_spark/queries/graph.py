"""Graph queries: fixed-iteration PageRank over the part↔supplier
co-occurrence graph from lineitem (extensions/graph.py). The oracle
unrolls the same three power-method rounds as chained CTEs, with the
identical per-round 1e-10 half-up snap, so the replay is exact."""

from __future__ import annotations

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
