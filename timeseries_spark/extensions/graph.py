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

from pyspark.sql import DataFrame, Window, functions as F

from timeseries_spark.extensions.caching import register_cache
from timeseries_spark.functions.parallelism import bytes_sized_shuffles

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
    needs the cache when it finally executes. Both blocks register
    under the ``graph`` cache family (VERDICT r15 item 1), so a
    long-lived serving session can free them after materializing —
    ``caching.release_caches(spark, "graph")`` — instead of waiting on
    LRU eviction."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    e = edges.select("src", "dst").distinct()
    out = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = e.join(out, "src")
    nodes = e.select(
        F.explode(F.array("src", "dst")).alias("node")
    ).distinct()
    if persist:
        e = register_cache(e, "graph")
        nodes = register_cache(nodes, "graph")
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


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over the undirected
    simple graph given as (src, dst) pairs (either or both directions;
    loops and duplicates dropped). Returns (node, triangles) for every
    node of the graph, 0 included.

    Algorithm: degree-based edge orientation (the standard compact-
    forward / Latapy 2008 trick, public): orient every edge from its
    lower-(degree, id) endpoint to the higher one under that total
    order. Each triangle then has exactly ONE node with two outgoing
    oriented edges, so counting (a→b, a→c) wedges with ord(b) < ord(c)
    closed by the oriented edge b→c counts every triangle exactly once
    — and the wedge fan-out per node is bounded by its ORIENTED
    out-degree, which is O(√|E|) for any graph. That bound is the
    100 TB story: a hub with millions of undirected neighbors emits
    almost no wedges because nearly all its edges point INTO it; the
    naive unoriented wedge join would square the hub degree.

    Plan shape: two |E|-grain equi joins (wedge build + closure probe)
    and one explode + hash aggregate — no cartesian, no windows, all
    shuffles keyed on node/edge ids."""
    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ornt = (
        und.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            F.when(
                F.struct(F.col("du"), F.col("u"))
                < F.struct(F.col("dv"), F.col("v")),
                F.col("u"),
            ).otherwise(F.col("v")).alias("src"),
            F.when(
                F.struct(F.col("du"), F.col("u"))
                < F.struct(F.col("dv"), F.col("v")),
                F.col("v"),
            ).otherwise(F.col("u")).alias("dst"),
            F.when(
                F.struct(F.col("du"), F.col("u"))
                < F.struct(F.col("dv"), F.col("v")),
                F.col("dv"),
            ).otherwise(F.col("du")).alias("dst_d"),
        )
    )
    e1 = ornt.select(
        F.col("src").alias("a"),
        F.col("dst").alias("b"),
        F.col("dst_d").alias("bd"),
    )
    e2 = ornt.select(
        F.col("src").alias("a"),
        F.col("dst").alias("c"),
        F.col("dst_d").alias("cd"),
    )
    wedges = e1.join(e2, "a").where(
        F.struct(F.col("bd"), F.col("b")) < F.struct(F.col("cd"), F.col("c"))
    )
    closer = ornt.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tris = wedges.join(closer, ["b", "c"]).select("a", "b", "c")
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.select("node")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce("triangles", F.lit(0)).cast("bigint").alias("triangles"),
        )
    )


def bipartite_edges(
    rel: DataFrame, left_col: str, right_col: str, left_tag: str, right_tag: str
) -> DataFrame:
    """Symmetric directed edges from a co-occurrence relation: each
    distinct (left, right) pair yields both directions, with ids
    tag-prefixed into a shared string node space."""
    lid = F.concat(F.lit(left_tag), F.col(left_col).cast("string"))
    rid = F.concat(F.lit(right_tag), F.col(right_col).cast("string"))
    # round-16 session 2: one explode pass instead of fwd.union(swap) —
    # the union planned (and executed) the upstream co-occurrence
    # relation once per branch (same finding as connected_components'
    # edge set); the exploded struct pair emits both directions from a
    # single traversal, identical row multiset
    return (
        rel.select(
            F.explode(
                F.array(
                    F.struct(lid.alias("src"), rid.alias("dst")),
                    F.struct(rid.alias("src"), lid.alias("dst")),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        .distinct()
    )


def label_propagation(
    edges: DataFrame, n_iter: int = 3, persist: bool = True
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al.
    2007, public) over directed ``edges`` (src, dst): every node starts
    as its own community (label = node id) and each round adopts the
    most frequent label among its in-neighbors, ties broken to the
    LEXICOGRAPHICALLY SMALLEST label — the determinism twist that makes
    the algorithm engine-replayable (the published version breaks ties
    randomly, which no oracle could reproduce). Isolated / sink nodes
    keep their current label via the left join.

    Per round: one |E|-grain equi join (neighbor labels) + one
    (node, label)-grain count + one node-grain row_number pick — work
    linear in edges, state linear in nodes, lineage truncated per round
    with the same eager ``localCheckpoint`` discipline as ``pagerank``/
    ``kmeans_fit``. Returns (node, community) after ``n_iter`` rounds.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    e = edges.select("src", "dst").distinct()
    nodes = e.select(
        F.explode(F.array("src", "dst")).alias("node")
    ).distinct()
    if persist:
        e = e.persist()
    # round-16: per-round label shuffles are tiny and non-compute-dense
    # — run the loop under bytes-proportional AQE coalescing (see
    # bytes_sized_shuffles; same rationale as connected_components)
    with bytes_sized_shuffles(edges.sparkSession):
        labels = nodes.withColumn("label", F.col("node")).localCheckpoint(
            eager=True
        )
        w = Window.partitionBy("node").orderBy(F.desc("c"), F.col("label"))
        try:
            for _ in range(n_iter):
                picks = (
                    e.join(
                        labels.select(
                            F.col("node").alias("dst"),
                            F.col("label").alias("nbr_label"),
                        ),
                        "dst",
                    )
                    .groupBy(F.col("src").alias("node"), F.col("nbr_label"))
                    .agg(F.count(F.lit(1)).alias("c"))
                    .withColumnRenamed("nbr_label", "label")
                    .withColumn("rn", F.row_number().over(w))
                    .where(F.col("rn") == 1)
                    .select("node", F.col("label").alias("new_label"))
                )
                labels = (
                    labels.join(picks, "node", "left")
                    .select(
                        "node",
                        F.coalesce("new_label", "label").alias("label"),
                    )
                    .localCheckpoint(eager=True)
                )
        finally:
            # the final labels are an EAGER checkpoint, so the edge cache is
            # dead weight the moment the loop ends — unpersisting here (not
            # at the caller) keeps long-lived sessions from leaking a block
            # per invocation (pagerank can't do this: its returned plan is
            # lazy and still reads the cache when it finally executes)
            if persist:
                e.unpersist()
    return labels.select("node", F.col("label").alias("community"))


def local_clustering(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient over the undirected simple
    graph: C(v) = 2·T(v) / (d(v)·(d(v)−1)) — how close the node's
    neighborhood is to a clique (Watts & Strogatz 1998, public); 0.0
    for degree < 2. Returns (node, degree, triangles, clustering 6dp).

    Reuses the degree-oriented triangle counts (same O(√|E|) wedge
    bound); the degree table is one extra |E|-grain aggregate and the
    division is a per-row expression over exact bigints."""
    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    tri = triangle_counts(edges)
    return deg.join(tri, "node").select(
        "node",
        "degree",
        "triangles",
        F.round(
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.col("triangles").cast("double")
                / (
                    F.col("degree").cast("double")
                    * (F.col("degree").cast("double") - 1.0)
                ),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("clustering"),
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity of the undirected simple graph: the Pearson
    correlation of endpoint degrees over every edge counted in BOTH
    orientations (Newman 2002, public) — positive when hubs attach to
    hubs, negative for hub-and-spoke. Returns ONE row (n_nodes,
    n_edges, assortativity) snapped at 1e-6 (corr's double sums are
    partial-agg-order dependent; the snap absorbs the last-ulp drift,
    the acf_daily idiom).

    Two |E|-grain joins to attach degrees, one scalar corr aggregate —
    map-side combined, the only single-row exchange carries the corr
    moments."""
    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    both = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    snap6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("double") / 1e6  # noqa: E731
    paired = (
        both.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
    )
    return paired.agg(
        F.countDistinct("u").cast("bigint").alias("n_nodes"),
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"),
        snap6(
            F.corr(F.col("du").cast("double"), F.col("dv").cast("double"))
        ).alias("assortativity"),
    )


def k_core(edges: DataFrame, k: int, n_rounds: int = 8) -> DataFrame:
    """Bounded-round k-core peeling: repeatedly drop nodes whose degree
    in the surviving subgraph is < k, ``n_rounds`` times. Equal to the
    exact k-core whenever the peeling converges within the budget
    (typical for real graphs — each round removes a full frontier);
    the ``converged`` flag reports whether the last round was a no-op,
    so an unconverged result is visible, never silent. Returns
    (node, core_degree, converged).

    Per round: one |E|-grain semi-join pair (keep edges with both
    endpoints alive) + one degree aggregate — work proportional to the
    SURVIVING subgraph, with the same bounded-driver-loop + eager
    localCheckpoint discipline as pagerank/label_propagation."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def degrees(e):
        return (
            e.select(F.explode(F.array("u", "v")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        )

    # round-16: same bytes-proportional coalescing for the peel rounds
    with bytes_sized_shuffles(edges.sparkSession):
        alive = degrees(und).where(F.col("d") >= k).localCheckpoint(eager=True)
        e = und
        # one count per EXECUTED round, and it is load-bearing: alive only
        # ever shrinks (degrees are monotone non-increasing under peeling),
        # so an unchanged count means an unchanged set — converged — and
        # the remaining rounds' semi-joins are skipped entirely
        cur_n = alive.count()
        converged = False
        for _ in range(n_rounds):
            keep = alive.select("node")
            e = (
                e.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
                .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
                .localCheckpoint(eager=True)
            )
            alive = degrees(e).where(F.col("d") >= k).localCheckpoint(
                eager=True
            )
            new_n = alive.count()
            if new_n == cur_n:
                converged = True
                break
            cur_n = new_n
    return alive.select(
        "node",
        F.col("d").alias("core_degree"),
        F.lit(bool(converged)).alias("converged"),
    )
