"""Deterministic k-means (Lloyd) over embedding columns — the coarse
quantizer that feeds the IVF index and the embedding-dedup blocker in
production (their tests use the dataset's ``label`` column for
reproducibility; this provides the same thing when no label exists).

Design mirrors ``connected_components``: a bounded driver loop where each
round is pure DataFrame ops ending in an eager ``localCheckpoint`` (the
lineage-truncation lesson — persist alone lets Catalyst re-analyze an
ever-growing plan). Per round:

1. assign: points × broadcast centroids (k rows) → argmin squared
   euclidean, ties to the lowest centroid id — one map stage, no shuffle
   of the points beyond the final aggregation;
2. update: per-dimension means via posexplode + groupBy (cluster, dim) —
   |points| × dim rows shuffled, the standard distributed Lloyd update.

Determinism: init = the k lowest-id vectors, tie-broken argmin, fixed
iteration count or exact-assignment convergence — same input, same
clusters, any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from timeseries_spark.functions.parallelism import (
    bytes_sized_shuffles,
    ensure_parallelism,
)


def _sq_dist(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _argmin_assign_np(pts: DataFrame, cent_rows) -> DataFrame:
    """Fit-loop argmin assignment as a NumPy kernel behind one Arrow
    map (guide §4.2) — bit-identical to ``_argmin_assign``'s JVM fold:

    - per-centroid distance accumulates SEQUENTIALLY over dims
      (``acc = acc + (x-c)*(x-c)``), the exact op order of the
      ``_sq_dist`` fold, in float64 — bit-identical doubles;
    - centroids are visited in ascending cid with a strict ``<`` update,
      the same (distance, lowest-cid) tie-break as ``array_min`` over
      (d, cid) structs; a NaN distance never displaces a real one and a
      real one always displaces NaN, matching Spark's NaN-greatest
      double ordering;
    - the kernel is a narrow map: same partitions, same row order, so
      every downstream aggregate (the observe() convergence sum, the
      posexplode centroid update) reduces the same values in the same
      groupings as before.

    ``cent_rows`` are COLLECTED (cid, c) rows — k rows, vocab-grain, the
    same k×d doubles the JVM path folded into one broadcast array row
    (the beyond-broadcast regime keeps the routed assignment path).

    Non-null precondition (round-17 advice): bit-identity is guaranteed
    for fully non-null double arrays only. A NULL vector ELEMENT reaches
    this kernel as NaN (Arrow maps null list elements to NaN in the
    pandas block), so its distance goes NaN and the NaN-greatest rule
    applies — whereas the JVM fold yields a null sq_dist, whose
    null-first struct ordering picks differently. Fit inputs here are
    cast projections of the caller's embedding column; a corpus with
    null elements is malformed for every fixed-width operator in this
    engine (checked_dims raises on width, not element nulls).
    Motivation (r16 session-2 profile): the interpreted n×k×d lambda
    fold was ~5 CPU-seconds per Lloyd round at sf0.1 — the dominant
    task-time of every in-plan fit — and the r16 microbench showed no
    JVM expression form beats the fold; the pair kernel's NumPy move is
    the proven alternative."""
    import numpy as np

    ordered = sorted(cent_rows, key=lambda r: int(r["cid"]))
    cids = [int(r["cid"]) for r in ordered]
    cmat = np.array([[float(x) for x in r["c"]] for r in ordered])
    vid_field = pts.schema["vid"]
    out_schema = (
        f"vid {vid_field.dataType.simpleString()}, v array<double>, "
        "cluster int, sq_dist double"
    )

    def _assign_kernel(batches):
        import numpy as np
        import pandas as pd

        k, d = cmat.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            va = np.stack(pdf["v"].to_numpy()).astype(np.float64, copy=False)
            best_d = None
            best_c = None
            for j in range(k):
                acc = np.zeros(len(va))
                for dd in range(d):
                    diff = va[:, dd] - cmat[j, dd]
                    acc = acc + diff * diff
                if best_d is None:
                    best_d = acc
                    best_c = np.full(len(va), cids[j], dtype=np.int32)
                else:
                    # strict < keeps the lower cid on ties; the isnan
                    # clause reproduces Spark's NaN-greatest ordering
                    upd = (acc < best_d) | (
                        np.isnan(best_d) & ~np.isnan(acc)
                    )
                    best_d = np.where(upd, acc, best_d)
                    best_c = np.where(upd, cids[j], best_c)
            yield pd.DataFrame(
                {
                    "vid": pdf["vid"],
                    "v": pdf["v"],
                    "cluster": best_c,
                    "sq_dist": best_d,
                }
            )

    return pts.mapInPandas(_assign_kernel, schema=out_schema)


def _argmin_assign(pts: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vid, v) × (cid, c) → (vid, v, cluster, sq_dist raw double): the
    zero-shuffle argmin projection — centroids fold to ONE broadcast
    array row and the per-row ``array_min`` over (sq_dist, cid) structs
    is the same (distance, lowest-cid) tie-break as a
    ``Window.orderBy(sq_dist, cid)`` row_number()=1, on the same
    ``_sq_dist`` fold doubles, so the assignment is column-for-column
    identical to the crossJoin+window shape it replaces (round-16: that
    shape paid an n×k exchange + sort PER LLOYD ROUND; this is a pure
    map stage — the assign_to_centroids idiom moved inside the fit
    loop)."""
    cent_arr = centroids.groupBy().agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("cid").cast("int").alias("cid"), F.col("c").alias("c"))
            )
        ).alias("cents")
    )
    # expr string (round-17, guide §7.3): the F-API lambda construction
    # of this argmin cost ~0.1 s of py4j per call, rebuilt every Lloyd
    # round of every JVM-path fit; the SQL spelling is the identical
    # _sq_dist fold and (d, lowest-cid) struct tie-break
    best = F.expr(
        "array_min(transform(cents, cen -> named_struct("
        "'d', aggregate(zip_with(v, cen.c, (x, y) -> (x - y) * (x - y)), "
        "0.0D, (acc, t) -> acc + t), "
        "'cid', cen.cid)))"
    )
    return (
        pts.crossJoin(F.broadcast(cent_arr))
        .withColumn("__best", best)
        .select(
            "vid",
            "v",
            F.col("__best.cid").alias("cluster"),
            F.col("__best.d").alias("sq_dist"),
        )
    )


def kmeans_fit(
    vectors: DataFrame,
    k: int = 10,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_kernel: str = "np",
) -> tuple[DataFrame, DataFrame]:
    """Run Lloyd and return ``(assignments, centroids)`` — assignments as
    (vid, v, cluster, sq_dist), centroids as (cid, c). The centroid table
    always has exactly ``k`` rows: clusters that receive no points in a
    round keep their previous centroid (left join + coalesce in the
    update).

    ``assign_kernel`` picks the in-loop assignment implementation — both
    are bit-identical (test-pinned), the choice trades constants only:
    "np" (default) runs the NumPy Arrow kernel (_argmin_assign_np),
    which vectorizes the n×k×d distance work and wins whenever the
    per-row fold is non-trivial; "jvm" keeps the broadcast-array fold
    projection, which avoids the fixed Arrow round-trip latency that
    dominates when k·d is small (PQ subspace fits: d=32/8, k≤16 — the
    interleaved A/B showed the boundary costing more than it saved
    there)."""
    if assign_kernel not in ("np", "jvm"):
        # a typo ("NP", "numpy") must not silently fall through to the
        # JVM path — the knob is bit-identical on both sides, but a
        # caller asking for a specific kernel should get it or an error
        raise ValueError(
            f"assign_kernel must be 'np' or 'jvm', got {assign_kernel!r}"
        )
    pts = ensure_parallelism(
        vectors.select(
            F.col(id_col).alias("vid"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        )
    ).localCheckpoint()

    # init = the k lowest-id vectors. orderBy().limit(k) compiles to
    # TakeOrderedAndProject — parallel per-partition top-k with a tiny
    # driver-side merge — whereas a global Window.orderBy would funnel
    # EVERY vector through one SinglePartition exchange (the round-2
    # verdict's scale-killer #1). The cid is assigned after the take, on
    # k rows only. NOT checkpointed (round-16): the k-row subtree hangs
    # off the checkpointed pts leaf and re-evaluates in O(k) inside the
    # first round's job — one driver job fewer per fit.
    seed_w = Window.orderBy("vid")
    centroids = (
        pts.orderBy("vid")
        .limit(k)
        .withColumn("__rn", F.row_number().over(seed_w))
        .select((F.col("__rn") - 1).alias("cid"), F.col("v").alias("c"))
    )

    # Round-16 job-count rewrite (guide §1.2 step 1 — the r16 profile
    # charged the fit-heavy ANN/dedup queries 40-100 driver jobs each,
    # with task-seconds far below wall × cores: orchestration, not
    # data). Three structural changes, all answer-preserving:
    #   1. assignment is the zero-shuffle argmin projection
    #      (_argmin_assign, bit-identical to the old crossJoin+window —
    #      see its docstring), so the per-round n×k exchange + sort is
    #      gone;
    #   2. the convergence total rides the round's OWN materialization
    #      as an observe() metric (the connected_components idiom)
    #      instead of a standalone agg job;
    #   3. intermediate assignments are no longer checkpointed: each
    #      round's assignment is one projection over the checkpointed
    #      pts leaf, so the centroid-update job recomputes it in a
    #      single pass and the plan still stays O(1) per round (only
    #      centroids checkpoint). Net: a 3-iter fit runs ~4 driver jobs
    #      instead of ~9.
    # Convergence semantics are unchanged (same per-row raw-double
    # sq_dist summed and rounded at 9dp, compared to the previous
    # round), with one cost-only difference: the update for the final
    # converged round is computed before the break and discarded —
    # assignments and returned centroids are identical because the
    # break decision itself is identical.
    assigned = None
    prev_total = None
    # round-16: the per-round update shuffles (the (cluster, dim)
    # partial-mean aggregate and the k-row centroid join) carry tiny,
    # non-compute-dense state — run the loop under bytes-proportional
    # AQE coalescing (bytes_sized_shuffles; the compute-dense argmin is
    # a MAP stage over the checkpointed pts leaf, untouched by
    # reduce-side coalescing)
    with bytes_sized_shuffles(vectors.sparkSession):
        for it in range(max_iter):
            # round-16 session 2: the in-loop assignment defaults to the
            # NumPy Arrow kernel (bit-identical — see _argmin_assign_np).
            # The k-row centroid table is collected per round: rounds ≥1
            # read a localCheckpointed k-row leaf, round 0 evaluates the
            # O(k) init subtree — vocab-grain driver traffic, the same
            # bounded class as the broadcast array row it replaces.
            if assign_kernel == "np":
                assigned = _argmin_assign_np(pts, centroids.collect())
            else:
                assigned = _argmin_assign(pts, centroids)
            if it == max_iter - 1:
                # the final round's convergence aggregate and centroid
                # update feed nothing — assignments are final either way.
                # Returned centroids are the ones the FINAL assignment
                # ranked against (both callers ignore them; the oracles
                # replay assignments, which are unchanged).
                assigned = assigned.localCheckpoint()
                break
            obs = Observation()
            assigned_obs = assigned.observe(
                obs, F.round(F.sum("sq_dist"), 9).alias("t")
            )
            # Lloyd update: per-dimension means. A cluster with no assigned
            # points produces no mean row; the left join + coalesce keeps its
            # OLD centroid so k never shrinks mid-run (deterministic because
            # assignment is)
            dims = assigned_obs.select(
                "cluster", F.posexplode("v").alias("dim", "x")
            )
            means = (
                dims.groupBy("cluster", "dim")
                .agg(F.avg("x").alias("m"))
                .groupBy("cluster")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("dim", "m"))
                    ).alias("dm")
                )
                .select(
                    F.col("cluster").alias("cid"),
                    F.transform(F.col("dm"), lambda s: s["m"]).alias("c_new"),
                )
            )
            updated = (
                centroids.join(means, "cid", "left")
                .select("cid", F.coalesce("c_new", "c").alias("c"))
                .localCheckpoint()
            )
            total = obs.get["t"]
            if total == prev_total:
                # converged BEFORE this update: the assignment (and the
                # centroids it ranked against) are final; the just-computed
                # `updated` table is discarded. Materialize the returned
                # assignment once — its plan is a single argmin pass over
                # the pts leaf.
                assigned = assigned.localCheckpoint()
                break
            prev_total = total
            centroids = updated
    return assigned, centroids


def kmeans_assign(
    vectors: DataFrame,
    k: int = 10,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster assignment (vec_id, cluster, sq_dist) after at most
    ``max_iter`` Lloyd rounds (early exit when assignments stop moving,
    detected by the total-distance aggregate strictly decreasing)."""
    assigned, _ = kmeans_fit(vectors, k, max_iter, id_col, vec_col)
    return assigned.select(
        F.col("vid").alias(id_col), "cluster", F.round("sq_dist", 6).alias("sq_dist")
    )


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = 6,
) -> DataFrame:
    """Quantize ``vectors`` against a GIVEN centroid table (cid, c) —
    the probe-time half of the fit/assign split a 100 TB deployment
    actually runs: the quantizer is trained ONCE (``kmeans_fit``),
    staged as a tiny parquet artifact, and every subsequent query is a
    pure map stage — broadcast the k centroids, argmin per row — with
    no Lloyd subtree anywhere in the plan.

    Exactness contract: ``kmeans_fit`` returns the centroids its FINAL
    assignment ranked against (the last round skips the update), the
    distance fold and the (sq_dist, cid) tie-break here are the same
    expressions, and doubles round-trip parquet bit-exactly — so
    assigning staged centroids reproduces ``kmeans_assign``'s output
    column-for-column. Output: (id_col, cluster, sq_dist 6dp).

    Plan shape: the k centroids fold to ONE broadcast array row (a
    bounded k-row SinglePartition aggregate, the sq8-stats idiom), so
    the assignment itself is a ZERO-shuffle projection — per row,
    ``array_min`` over (sq_dist, cid) structs, whose lexicographic
    struct ordering IS the (distance, lowest-cid) tie-break the Lloyd
    assignment window uses. Compare with ``kmeans_assign``: same
    output, but no |corpus|-grain shuffle at all.

    ``round_dp=None`` returns the RAW double distance — internal
    consumers that derive bounds from the distance (the router's
    per-cell radii) must not inherit the presentation rounding: a
    6dp-rounded sq_dist can understate a radius by up to 5e-7, which
    after the sqrt shrinks small radii by ~7e-4 — enough to defeat a
    1e-4 pruning cushion (round-14 advice)."""
    pts = ensure_parallelism(
        vectors.select(
            F.col(id_col).alias("vid"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        )
    )
    cent_arr = centroids.groupBy().agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("cid").cast("int").alias("cid"),
                    F.transform(
                        F.col("c"), lambda x: x.cast("double")
                    ).alias("c"),
                )
            )
        ).alias("cents")
    )
    # loud-fail on an empty/corrupt artifact: groupBy().collect_list over
    # zero centroid rows still yields one row (empty array), and the
    # argmin would then quietly emit NULL clusters corpus-wide. The
    # guard lives INSIDE the consumed expression (a dropped assert
    # column would be pruned away by Catalyst), costing one size()
    # check per row against the broadcast array.
    cents_checked = F.when(F.size("cents") > 0, F.col("cents")).otherwise(
        F.raise_error(
            F.lit("assign_to_centroids: empty centroid table")
        ).cast("array<struct<cid:int,c:array<double>>>")
    )
    best = F.array_min(
        F.transform(
            cents_checked,
            lambda cen: F.struct(
                _sq_dist(F.col("v"), cen["c"]).alias("d"),
                cen["cid"].alias("cid"),
            ),
        )
    )
    d_out = (
        F.col("__best.d")
        if round_dp is None
        else F.round(F.col("__best.d"), round_dp)
    )
    return (
        pts.crossJoin(F.broadcast(cent_arr))
        .withColumn("__best", best)
        .select(
            F.col("vid").alias(id_col),
            F.col("__best.cid").alias("cluster"),
            d_out.alias("sq_dist"),
        )
    )


def build_centroid_router(
    centroids: DataFrame,
    cell_target: int = 4096,
    router_iter: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Offline half of the routed assignment: fit the small router on
    the centroid table and key every fine centroid by its cell. Returns
    (cells, router_arr) — ``cells`` is (cid, cell), ``router_arr`` the
    single bounded row of non-empty cells with radii that broadcasts
    into the probe projection. In production this pair stages alongside
    the centroids (the staged_centroids discipline: fit once per
    artifact fingerprint, every query is a parquet read), so the
    per-shard cost is ONLY the probe join — pass the pair back through
    ``assign_to_centroids_routed(router=...)``."""
    k = centroids.count()
    k_r = max(2, -(-k // cell_target))
    _, routers = kmeans_fit(
        centroids.select(
            F.col("cid").alias("vec_id"),
            F.transform(F.col("c"), lambda x: x.cast("double")).alias(
                "embedding"
            ),
        ),
        k=k_r,
        max_iter=router_iter,
    )
    routers = routers.select(
        F.col("cid").alias("cell"), F.col("c").alias("rc")
    )
    # round_dp=None: radii must come from UNROUNDED distances — the 6dp
    # presentation round truncates toward zero by up to 5e-7 in sq_dist
    # (~7e-4 in the radius near zero), which would let the lb <= min_ub
    # + eps prune drop the true argmin's cell when members sit within
    # ~1e-3 of the router center (round-14 advice). With raw doubles the
    # radius is the exact max member distance and eps only ADDS cells.
    cells = assign_to_centroids(
        centroids.select(F.col("cid").alias("vec_id"), F.col("c")),
        routers.select(F.col("cell").alias("cid"), F.col("rc").alias("c")),
        vec_col="c",
        round_dp=None,
    ).select(
        F.col("vec_id").alias("cid"),
        F.col("cluster").alias("cell"),
        F.sqrt(F.col("sq_dist")).alias("__r"),
    )
    router_arr = (
        cells.groupBy("cell")
        .agg(F.max("__r").alias("radius"))
        .join(routers, "cell")
        .groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct("cell", "radius", "rc"))
            ).alias("cells")
        )
    )
    return cells.select("cid", "cell"), router_arr


def assign_to_centroids_routed(
    vectors: DataFrame,
    centroids: DataFrame,
    cell_target: int = 4096,
    router_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1e-4,
    router: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Exact argmin assignment WITHOUT broadcasting the centroid table —
    the scale path for extreme k (SCALING.md lever (b)): past ~10^7
    centroids the single collect_list array row of
    ``assign_to_centroids`` outgrows both the broadcast limit and the
    per-row O(k) fold. Two-level routing keeps the answer EXACT:

    1. fit a small ROUTER (k_r = ceil(k / cell_target) Lloyd centers)
       on the centroid table itself — the only thing broadcast is the
       k_r-row router (plus per-cell radii), bounded by construction;
    2. key each fine centroid by its router cell; per-cell radius =
       max distance from the router center to a member;
    3. per vector, one projection over the broadcast router computes
       every cell's triangle-inequality bounds: lb_r = d(v, router_r)
       - radius_r is a LOWER bound on the distance to any member of
       cell r, ub_r = d(v, router_r) + radius_r an UPPER bound on the
       distance to at least one member. Probing exactly the cells with
       lb_r <= min_r'(ub_r') therefore always includes the cell of the
       true nearest centroid — single-phase exact pruning, typically
       1-3 cells per vector;
    4. the probe list explodes to (vid, cell, v) and meets the
       cell-keyed fine centroids in a CO-PARTITIONED equi join on the
       cell id (both sides repartitioned by cell — no broadcast of the
       fine table, no nested loop), followed by a per-vid min(struct(
       sq_dist, cid)) — the same (distance, lowest-cid) tie-break as
       the flat path, so output is column-for-column identical to
       ``assign_to_centroids``.

    Radii are computed from UNROUNDED distances (round-14 advice: the
    6dp presentation round could shrink a small radius by ~7e-4,
    exceeding the cushion), so ``eps`` guards only against last-ULP
    float noise in the bound arithmetic — it can only ADD probe cells,
    never drop the true argmin's cell. Distances are the same
    ``_sq_dist`` fold as the flat path, so the doubles — and hence
    ties — are bit-identical.

    ``router`` accepts a prebuilt (cells, router_arr) pair from
    ``build_centroid_router`` — the staged production shape: the router
    fits once alongside the centroid artifact and every shard pays only
    the probe join (measured: the in-plan router fit dominates wall at
    bench scale, experiments/ROUTED_ASSIGN_r14.json)."""
    spark = vectors.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    if router is None:
        cells, router_arr = build_centroid_router(
            centroids, cell_target=cell_target, router_iter=router_iter
        )
    else:
        cells, router_arr = router
    pts = ensure_parallelism(
        vectors.select(
            F.col(id_col).alias("vid"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                "v"
            ),
        )
    )
    # two transforms so the O(dims) distance fold runs ONCE per cell:
    # Catalyst does not common-subexpression lambda bodies, and folding
    # twice (once per bound) measurably doubled the router stage
    dists = F.transform(
        F.col("cells"),
        lambda cell: F.struct(
            cell["cell"].alias("cell"),
            cell["radius"].alias("radius"),
            F.sqrt(_sq_dist(F.col("v"), cell["rc"])).alias("rd"),
        ),
    )
    bounds = F.transform(
        F.col("__d"),
        lambda c: F.struct(
            c["cell"].alias("cell"),
            (c["rd"] - c["radius"]).alias("lb"),
            (c["rd"] + c["radius"]).alias("ub"),
        ),
    )
    probes = (
        pts.crossJoin(F.broadcast(router_arr))
        .withColumn("__d", dists)
        .withColumn("__b", bounds)
        .withColumn(
            "__u", F.array_min(F.transform(F.col("__b"), lambda b: b["ub"]))
        )
        .select(
            "vid",
            "v",
            F.explode(
                F.filter(
                    F.col("__b"),
                    lambda b: b["lb"] <= F.col("__u") + F.lit(eps),
                )
            ).alias("__p"),
        )
        .select("vid", "v", F.col("__p.cell").alias("cell"))
        .repartition(n_parts, "cell")
    )
    fine = (
        centroids.select(F.col("cid"), F.col("c"))
        .join(cells.select("cid", "cell"), "cid")
        .select(
            "cell",
            F.col("cid").cast("int").alias("cid"),
            F.transform(F.col("c"), lambda x: x.cast("double")).alias("c"),
        )
        .repartition(n_parts, "cell")
    )
    return (
        probes.join(fine, "cell")
        .select(
            "vid",
            F.struct(
                _sq_dist(F.col("v"), F.col("c")).alias("d"),
                F.col("cid").alias("cid"),
            ).alias("__cand"),
        )
        .groupBy("vid")
        .agg(F.min("__cand").alias("__best"))
        .select(
            F.col("vid").alias(id_col),
            F.col("__best.cid").alias("cluster"),
            F.round(F.col("__best.d"), 6).alias("sq_dist"),
        )
    )


def cluster_cohesion(assignments: DataFrame) -> DataFrame:
    """Quantizer-quality report over a (vec_id, cluster, sq_dist)
    assignment table (from ``kmeans_assign`` or
    ``assign_to_centroids``): per cluster — member count, inertia
    (Σ sq_dist), and mean squared distance. The elbow/balance
    diagnostic a curation pipeline reads before trusting a clustering
    for blocking or diversity sampling.

    Sums run in DECIMAL over the 6dp-rounded distances, so the report
    is exact and order-independent — bit-identical on any partitioning
    (a double sum would drift with partial-agg order)."""
    d = F.col("sq_dist").cast("decimal(28,6)")
    return (
        assignments.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.sum(d).alias("__inertia"),
        )
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            "n_members",
            F.col("__inertia").cast("double").alias("inertia"),
            # IEEE double division of the EXACT decimal total — decimal
            # division would follow engine-specific scale rules
            (F.col("__inertia").cast("double") / F.col("n_members")).alias(
                "mean_sq_dist"
            ),
        )
    )


def cluster_balanced_sample(
    assignments: DataFrame, n_per_cluster: int, id_col: str = "vec_id"
) -> DataFrame:
    """Diversity sampling: the ``n_per_cluster`` lowest-id members of
    every cluster — the standard cluster-balanced draw that keeps every
    region of embedding space represented in a curated subset (a flat
    random sample over-draws the dense clusters). Deterministic by
    construction (id order), one cluster-keyed window whose partitions
    are cluster-sized (bounded by the quantizer's balance — checked by
    ``cluster_cohesion``)."""
    if n_per_cluster < 1:
        raise ValueError(f"n_per_cluster must be >= 1, got {n_per_cluster}")
    w = Window.partitionBy("cluster").orderBy(id_col)
    return (
        assignments.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_cluster)
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            F.col(id_col),
            F.col("__rn").cast("int").alias("rank_in_cluster"),
        )
    )


def cluster_prototype_prune(
    assignments: DataFrame,
    n_per_cluster: int,
    id_col: str = "vec_id",
    keep_central: bool = True,
) -> DataFrame:
    """Prototype-based data pruning over a (id, cluster, sq_dist)
    assignment table — the published curation move for large training
    corpora (SSL-prototypes / SemDeDup family): rank every member by
    its distance to the cluster centroid and keep ``n_per_cluster``
    per cluster. ``keep_central=True`` keeps the most PROTOTYPICAL
    members (lowest distance — drop outliers/noise); ``False`` keeps
    the most MARGINAL (highest distance — the hard-example curriculum,
    which the prototype-pruning literature finds beats random keep at
    large dataset sizes).

    Determinism: sq_dist is the 6dp-rounded column both assignment
    paths emit, and ties break by id — the same (value, id) ordering
    at any partitioning. One cluster-keyed window, partitions bounded
    by quantizer balance exactly as ``cluster_balanced_sample``.
    Output: (cluster, id, sq_dist, rank_in_cluster)."""
    if n_per_cluster < 1:
        raise ValueError(f"n_per_cluster must be >= 1, got {n_per_cluster}")
    order = (
        F.asc("sq_dist") if keep_central else F.desc("sq_dist"),
        F.asc(id_col),
    )
    w = Window.partitionBy("cluster").orderBy(*order)
    return (
        assignments.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_cluster)
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            F.col(id_col),
            F.col("sq_dist"),
            F.col("__rn").cast("int").alias("rank_in_cluster"),
        )
    )
