"""Product-quantization (PQ) ANN with exact re-ranking.

The third compression tier beside SQ8 (extensions/similarity.py) and IVF
(extensions/kmeans.py): the vector space is split into ``m`` contiguous
subspaces; each subspace gets its own small k-means codebook; every
corpus vector is represented by ``m`` code ids (one byte each at k<=256 —
a 64-dim float vector compresses to m bytes) and approximated by the
concatenation of its per-subspace codebook centroids. Queries rank the
corpus on the approximate (reconstructed) cosine, then the top
``k * rerank_factor`` pool per query is re-scored with exact
full-precision cosine — the same recall contract as SQ8 but with a
trained codebook, which adapts to the data distribution instead of a
per-dim affine grid.

Determinism discipline: the per-subspace quantizer is the deterministic
Lloyd loop from extensions/kmeans.py (min-id init, tie-broken argmin);
the CODEBOOK used for reconstruction is recomputed from the FINAL
assignment as per-cluster per-dimension means — a pure function of the
assignment, so a DuckDB oracle can replay assign rounds and codebook
exactly without tracking which centroid table the early-exit loop
stopped on. Similarities are left-fold doubles rounded to 6dp, ranks
tie-break on neighbor id.

Plan shape at 100 TB: each subspace's training reduces the corpus
through dim-keyed aggregates (never collects it); codebooks are k rows,
broadcast; encoding is m broadcast joins on the corpus id; the
approximate phase reuses the salted two-phase top-k (no per-query
single-task sort); the exact phase touches k * rerank_factor rows per
query. Code ids ride along in the output of ``pq_encode`` so a sink can
persist the m-byte codes instead of the raw vectors.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseries_spark.extensions.kmeans import kmeans_fit
from timeseries_spark.functions.parallelism import ensure_parallelism
from timeseries_spark.functions.vectors import (
    as_double,
    checked_dims,
    cosine_from_norms,
    cosine_similarity,
    l2_norm,
)


def _pool_and_rerank(
    scored: DataFrame, k: int, rerank_factor: int
) -> DataFrame:
    """Shared approximate-pool + exact-re-rank tail: ``scored`` carries
    (query_id, neighbor_id, v, q, nq, approx_sim, __salt) — ``nq`` is
    the query norm, folded once per query; the salted local top-pool
    bounds every window partition, the global pool caps at
    ``k * rerank_factor`` rows per query, and the exact cosine re-ranks
    the winners (ties broken by neighbor id throughout)."""
    pool_n = k * rerank_factor
    w_local = Window.partitionBy("query_id", "__salt").orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id")
    )
    w_pool = Window.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id")
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    pool = (
        scored.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= pool_n)
        .withColumn("__pr", F.row_number().over(w_pool))
        .filter(F.col("__pr") <= pool_n)
        .drop("__lr", "__pr", "__salt")
    )
    return (
        pool.withColumn(
            "cos_sim",
            F.round(
                cosine_from_norms(
                    F.col("q"), F.col("v"), F.col("nq"), l2_norm(F.col("v"))
                ),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def pq_fit_books(
    vectors: DataFrame,
    m: int = 2,
    dims: int = 64,
    n_clusters: int = 4,
    kmeans_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train the PQ artifact for staging: one row per (subspace,
    cluster) carrying BOTH tables the probe path needs — ``cent``, the
    Lloyd centroid the final assignment ranked against (re-assigning
    new/old vectors by argmin against it reproduces the training
    assignment exactly, see kmeans.assign_to_centroids), and ``mean``,
    the per-cluster per-dim mean codebook entry used for
    reconstruction. m*k tiny rows — the persistable fit/serve split for
    PQ, exactly as staged_centroids is for IVF."""
    if dims % m != 0:
        raise ValueError(
            f"dims must divide evenly into m subspaces, got dims={dims}"
            f" m={m}"
        )
    sub_dims = dims // m
    pts = ensure_parallelism(
        vectors.select(
            F.col(id_col).alias("__id"),
            checked_dims(F.col(vec_col), dims, "pq_fit_books").alias("v"),
        )
    )
    parts = []
    for s in range(m):
        sub = pts.select(
            "__id",
            F.slice(F.col("v"), s * sub_dims + 1, sub_dims).alias("__sub"),
        )
        assigned, cents = kmeans_fit(
            sub, k=n_clusters, max_iter=kmeans_iter,
            id_col="__id", vec_col="__sub",
            # subspace fits are k·sub_dims-small: the JVM fold beats the
            # Arrow kernel's fixed round-trip latency here (interleaved
            # A/B, OPTIMIZATION_r16.md session 2)
            assign_kernel="jvm",
        )
        book = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm")
            )
            .select(
                F.col("cluster").alias("cid"),
                F.transform(F.col("dm"), lambda t: t["m"]).alias("mean"),
            )
        )
        parts.append(
            cents.join(book, "cid", "left")
            .select(
                F.lit(s).alias("sub"),
                F.col("cid").cast("int").alias("cid"),
                F.col("c").alias("cent"),
                # a cluster that received no points keeps its centroid
                # as the reconstruction entry (it can never be assigned
                # anyway; the coalesce only keeps the schema total)
                F.coalesce("mean", "c").alias("mean"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def pq_encode(
    vectors: DataFrame,
    m: int = 2,
    dims: int = 64,
    n_clusters: int = 4,
    kmeans_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: DataFrame | None = None,
) -> DataFrame:
    """Train ``m`` per-subspace codebooks and encode the corpus.

    Output: (id, v full-precision double vector, dq reconstructed
    vector, codes array<int> of m codebook ids). Each subspace trains
    the deterministic Lloyd quantizer on its slice; the codebook entry
    is the per-cluster per-dimension mean of the FINAL assignment, and
    ``dq`` concatenates the m entries back to a full-width vector.

    Assembly avoids an m-way corpus self-join: the m per-subspace
    assignment tables (each already joined to its broadcast k-row
    codebook) UNION into one stream and fold back to one row per vector
    with a single id-keyed groupBy — two corpus exchanges total
    (union-fold + the join back to the full vectors) no matter how many
    subspaces, where a join chain would pay m + 1."""
    if dims % m != 0:
        raise ValueError(
            f"dims must divide evenly into m subspaces, got dims={dims}"
            f" m={m}"
        )
    sub_dims = dims // m
    pts = ensure_parallelism(
        vectors.select(
            F.col(id_col).alias("__id"),
            checked_dims(F.col(vec_col), dims, "pq_encode").alias("v"),
        )
    )
    if books is not None:
        # Staged path (round-16 rework): the m*k book is PARAMETER-
        # sized, so the WHOLE encode collapses into one zero-shuffle
        # projection — broadcast the book as a single bounded array
        # row, and per corpus row fold the per-subspace argmin + mean
        # lookup inside the expression. The previous shape assembled m
        # assign_to_centroids parts (m corpus scans) through a
        # union-fold + id join-back (2 corpus exchanges); at 100 TB
        # with m=8 that is 8 scans and 2 shuffles the serving plan
        # doesn't need. Exactness is the assign_to_centroids contract
        # verbatim: same _sq_dist fold on doubles, same (d, lowest-cid)
        # struct-min tie-break per subspace.
        books_arr = books.groupBy().agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("sub").cast("int").alias("sub"),
                        F.col("cid").cast("int").alias("cid"),
                        F.transform(
                            F.col("cent"), lambda x: x.cast("double")
                        ).alias("cent"),
                        F.transform(
                            F.col("mean"), lambda x: x.cast("double")
                        ).alias("mean"),
                    )
                )
            ).alias("books")
        )
        # loud-fail on an empty/truncated artifact, inside the consumed
        # expression so Catalyst can't prune it (the
        # assign_to_centroids guard idiom). Authored as SQL expr strings
        # (round-17, guide §7.3): the F-API built ~4 HOF lambdas per
        # subspace at ~16 ms of py4j each — m=8 (hires) paid ~0.5 s of
        # plan build here; the strings are the identical _sq_dist fold,
        # (d, lowest-cid, mean) struct-min tie-break, guard and casts.
        checked = (
            f"CASE WHEN size(books) = {m * n_clusters} THEN books "
            "ELSE CAST(raise_error('pq_encode: staged book must carry "
            f"exactly {m * n_clusters} (sub, cid) rows') AS "
            "ARRAY<STRUCT<sub: INT, cid: INT, "
            "cent: ARRAY<DOUBLE>, mean: ARRAY<DOUBLE>>>) END"
        )
        vd = "transform(v, x -> CAST(x AS DOUBLE))"

        def best_sql(s: int) -> str:
            sub_v = f"slice({vd}, {s * sub_dims + 1}, {sub_dims})"
            entries = f"filter({checked}, b -> b.sub = {s})"
            return (
                f"array_min(transform({entries}, b -> named_struct("
                f"'d', aggregate(zip_with({sub_v}, b.cent, "
                "(x, y) -> (x - y) * (x - y)), 0.0D, "
                "(acc, t) -> acc + t), "
                "'cid', b.cid, 'mean', b.mean)))"
            )

        return pts.crossJoin(F.broadcast(books_arr)).select(
            F.col("__id").alias(id_col),
            "v",
            F.expr(
                "concat("
                + ",".join(f"{best_sql(s)}.mean" for s in range(m))
                + ")"
            ).alias("dq"),
            F.expr(
                "array("
                + ",".join(
                    f"CAST({best_sql(s)}.cid AS INT)" for s in range(m)
                )
                + ")"
            ).alias("codes"),
        )
    parts = []
    for s in range(m):
        sub = pts.select(
            "__id",
            F.slice(F.col("v"), s * sub_dims + 1, sub_dims).alias("__sub"),
        )
        assigned, _ = kmeans_fit(
            sub, k=n_clusters, max_iter=kmeans_iter,
            id_col="__id", vec_col="__sub",
            # see fit_books: small-k·d subspace fits keep the JVM fold
            assign_kernel="jvm",
        )
        # codebook = per-cluster per-dim means of the final assignment
        # (pure function of the assignment -> oracle-replayable)
        book = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm")
            )
            .select(
                "cluster",
                F.transform(F.col("dm"), lambda t: t["m"]).alias(f"__p{s}"),
            )
        )
        parts.append(
            assigned.select(F.col("vid").alias("__id"), "cluster")
            .join(F.broadcast(book), "cluster")
            .select(
                "__id",
                F.lit(s).alias("__sub"),
                F.col("cluster").cast("int").alias("__code"),
                F.col(f"__p{s}").alias("__p"),
            )
        )
    recon = (
        reduce(lambda a, b: a.unionByName(b), parts)
        .groupBy("__id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__sub", "__code", "__p"))
            ).alias("__sp")
        )
        .select(
            "__id",
            F.flatten(F.transform("__sp", lambda t: t["__p"])).alias("dq"),
            F.transform("__sp", lambda t: t["__code"]).alias("codes"),
        )
    )
    return pts.join(recon, "__id").select(
        F.col("__id").alias(id_col), "v", "dq", "codes"
    )


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 2,
    dims: int = 64,
    n_clusters: int = 4,
    kmeans_iter: int = 2,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    num_salts: int = 32,
    books: DataFrame | None = None,
) -> DataFrame:
    """PQ ANN: rank on reconstructed-vector cosine, re-rank the top
    ``k * rerank_factor`` pool per query with exact cosine. Output:
    (query_id, neighbor_id, cos_sim, rank) — exact cosine on the
    re-ranked winners, rank tie-broken by neighbor id."""
    if num_salts < 1:
        raise ValueError(f"num_salts must be >= 1, got {num_salts}")
    if rerank_factor < 1:
        raise ValueError(f"rerank_factor must be >= 1, got {rerank_factor}")
    enc = pq_encode(
        vectors, m=m, dims=dims, n_clusters=n_clusters,
        kmeans_iter=kmeans_iter, id_col=id_col, vec_col=vec_col,
        books=books,
    ).select(F.col(id_col).alias("neighbor_id"), "v", "dq")
    # reconstruction norms fold once per corpus row, query norms once
    # per query: the full-corpus approx phase is one dot fold per pair
    scored = (
        enc.withColumn("ndq", l2_norm(F.col("dq")))
        .crossJoin(
            F.broadcast(
                queries.select(
                    F.col(query_id_col).alias("query_id"),
                    checked_dims(
                        F.col(query_vec_col), dims, "pq_topk"
                    ).alias("q"),
                    l2_norm(
                        checked_dims(F.col(query_vec_col), dims, "pq_topk")
                    ).alias("nq"),
                )
            )
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "v",
            "q",
            "nq",
            F.round(
                cosine_from_norms(
                    F.col("q"), F.col("dq"), F.col("nq"), F.col("ndq")
                ),
                6,
            ).alias("approx_sim"),
            F.pmod(F.hash(F.col("neighbor_id")), F.lit(num_salts)).alias(
                "__salt"
            ),
        )
    )
    return _pool_and_rerank(scored, k, rerank_factor)


def ivf_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    n_clusters: int = 4,
    kmeans_iter: int = 3,
    m: int = 2,
    dims: int = 64,
    pq_clusters: int = 4,
    pq_iter: int = 2,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    num_salts: int = 32,
    centroids: DataFrame | None = None,
    books: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: the production ANN composition — a coarse k-means
    quantizer routes each query to its ``nprobe`` nearest clusters
    (bounding WHICH vectors are touched), and inside the probed
    clusters candidates rank on the PQ-reconstructed approximation
    (bounding the BYTES each touch costs: m code bytes instead of the
    full vector), with exact-cosine re-ranking of the top
    ``k * rerank_factor`` pool. The two quantizers are independent —
    coarse routing trains on full vectors, PQ codebooks on subspaces —
    exactly the IVF-PQ layout of a disk-resident vector index.

    Plan shape: representative table broadcast (routing), probe list
    broadcast (tiny), corpus touched once via cluster-key equi join,
    salted two-phase pool so no query funnels one task. Every stage is
    the already-oracle-gated building block (kmeans_assign, pq_encode,
    the SQ8 pool/re-rank idiom)."""
    if num_salts < 1:
        raise ValueError(f"num_salts must be >= 1, got {num_salts}")
    if rerank_factor < 1:
        raise ValueError(f"rerank_factor must be >= 1, got {rerank_factor}")
    from timeseries_spark.extensions.kmeans import (
        assign_to_centroids,
        kmeans_assign,
    )

    if centroids is not None:
        # staged coarse quantizer (see extensions/staging.py): the
        # routing/blocking assignment is a broadcast argmin against the
        # persisted centroid table — identical clusters, no Lloyd
        # subtree. `books` stages the PQ half the same way below.
        # Materialized ONCE (eager checkpoint): vecs_cl/reps and the
        # encoded-corpus branch all consume it, and without the
        # checkpoint the corpus-wide argmin projection re-executes per
        # consumer (the kmeans_assign path below is already
        # materialized by kmeans_fit's per-round checkpoints).
        clusters = assign_to_centroids(
            vectors, centroids, id_col=id_col, vec_col=vec_col
        ).localCheckpoint(eager=True)
    else:
        clusters = kmeans_assign(
            vectors, k=n_clusters, max_iter=kmeans_iter,
            id_col=id_col, vec_col=vec_col,
        )
    vecs_cl = vectors.join(clusters.select(id_col, "cluster"), id_col)
    reps = (
        vecs_cl.groupBy("cluster")
        .agg(F.min(id_col).alias("rep_id"))
        .join(
            vecs_cl.select(
                F.col(id_col).alias("rep_id"),
                as_double(F.col(vec_col)).alias("rep_vec"),
            ),
            "rep_id",
        )
        .select("cluster", "rep_vec")
    )
    qs = queries.select(
        F.col(query_id_col).alias("query_id"),
        checked_dims(F.col(query_vec_col), dims, "ivf_pq_topk").alias("q"),
        l2_norm(
            checked_dims(F.col(query_vec_col), dims, "ivf_pq_topk")
        ).alias("nq"),
    )
    routed = qs.crossJoin(F.broadcast(reps)).withColumn(
        "rep_sim", F.round(cosine_similarity(F.col("q"), F.col("rep_vec")), 6)
    )
    w_route = Window.partitionBy("query_id").orderBy(
        F.col("rep_sim").desc(), F.col("cluster")
    )
    probe = (
        routed.withColumn("rr", F.row_number().over(w_route))
        .filter(F.col("rr") <= nprobe)
        .select("query_id", "q", "nq", "cluster")
    )
    enc = pq_encode(
        vectors, m=m, dims=dims, n_clusters=pq_clusters,
        kmeans_iter=pq_iter, id_col=id_col, vec_col=vec_col,
        books=books,
    ).select(F.col(id_col), "v", "dq")
    encc = enc.join(clusters.select(id_col, "cluster"), id_col)
    scored = (
        encc.withColumn("ndq", l2_norm(F.col("dq")))
        .join(F.broadcast(probe), "cluster")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "v",
            "q",
            "nq",
            F.round(
                cosine_from_norms(
                    F.col("q"), F.col("dq"), F.col("nq"), F.col("ndq")
                ),
                6,
            ).alias("approx_sim"),
            F.pmod(F.hash(F.col(id_col)), F.lit(num_salts)).alias("__salt"),
        )
    )
    return _pool_and_rerank(scored, k, rerank_factor)
