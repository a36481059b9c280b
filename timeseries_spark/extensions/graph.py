"""Graph analytics over edge relations: fixed-iteration PageRank.

Complements the dedup layer's connected components (extensions/dedup.py
:460) with the other classic link-analysis kernel. The iteration is the
standard power method,

    r_{k+1}(v) = (1-d)/N + d · Σ_{u→v} r_k(u) / outdeg(u)

run a FIXED number of rounds from the uniform vector — fixed so the
result is a deterministic function of the graph (an oracle can replay
it exactly), and because the per-round contraction factor d makes a
handful of rounds the production choice anyway.

Scale shape: each round is one equi-join of the edge relation with the
(node-grain) rank vector plus one hash aggregation on dst — shuffle
work proportional to |E| per round, never quadratic. The edge relation
is persisted once (every round re-reads it); the rank lineage grows
linearly with rounds (each round references the previous vector once),
so a lazy chain is safe for small fixed round counts — unlike the
doubling lineage of pointer-jumping CC, which needs per-round
checkpoints. Ranks are half-up rounded to 1e-10 after every round in
BOTH engines, so cross-engine float drift cannot accumulate.

Dangling nodes (outdeg 0) contribute no mass; with symmetric edge sets
(the bipartite co-occurrence graphs built here) they cannot occur.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DAMPING = 0.85


def _snap(col):
    """Half-up at 1e-10 via plain double ops — engine-portable."""
    return F.floor(col * 1e10 + F.lit(0.5)).cast("double") / 1e10


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = DAMPING,
    persist: bool = True,
) -> DataFrame:
    """(node, rank) after ``n_iter`` power-method rounds over directed
    ``edges`` (src, dst). Edges are deduplicated; node set = src ∪ dst.

    ``persist=True`` caches the edge/node relations (each round re-reads
    them). Spark keys cache entries by logical plan, so repeated calls
    on the SAME input reuse one entry — but callers looping over many
    DIFFERENT inputs should pass persist=False (or clearCache between
    runs): nothing here can unpersist, because the returned plan still
    needs the cache when it finally executes."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    e = edges.select("src", "dst").distinct()
    out = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = e.join(out, "src")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if persist:
        e = e.persist()
        nodes = nodes.persist()
    n_row = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(n_row)).withColumn(
        "rank", _snap(F.lit(1.0) / F.col("n_nodes"))
    )
    for _ in range(n_iter):
        contrib = (
            e.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_row))
            .join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .withColumn(
                "rank",
                _snap(
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.coalesce(F.col("c"), F.lit(0.0))
                ),
            )
            .drop("c")
        )
    return ranks.select("node", "rank")


def bipartite_edges(
    rel: DataFrame, left_col: str, right_col: str, left_tag: str, right_tag: str
) -> DataFrame:
    """Symmetric directed edges from a co-occurrence relation: each
    distinct (left, right) pair yields both directions, with ids
    tag-prefixed into a shared string node space."""
    lid = F.concat(F.lit(left_tag), F.col(left_col).cast("string"))
    rid = F.concat(F.lit(right_tag), F.col(right_col).cast("string"))
    fwd = rel.select(lid.alias("src"), rid.alias("dst"))
    return fwd.unionByName(
        rel.select(rid.alias("src"), lid.alias("dst"))
    ).distinct()
