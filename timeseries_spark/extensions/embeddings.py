"""Embedding-matrix statistics and dimensionality reduction.

Operators a 100 TB embedding pipeline runs before/under its ANN
stack (extensions/similarity.py):

- ``covariance_pairs`` — the d×d covariance of the embedding cloud
  (collapsed-dimension detection, whitening input, PCA precursor). The
  O(n·d²) products are inherent to the statistic; what matters at scale
  is the plan shape: pairs are generated per row inside one codegen'd
  projection (no self-join of an exploded table — that shape reads and
  shuffles the corpus twice), and the groupBy on (i, j) partial-
  aggregates map-side, so the only exchange carries ≤ d(d+1)/2 rows per
  task, never the corpus.

- ``random_projection`` — Johnson–Lindenstrauss sign-matrix projection
  d → k: y = R·x/√k with R[i][j] ∈ {−1, +1} derived from a
  multiplicative integer hash, so the "matrix" is never materialized,
  broadcast, or even stored — both engines (and every executor)
  regenerate any entry from (k, i) alone. ZERO shuffles: the whole
  reduction is a per-row codegen'd expression, the embarrassingly
  parallel shape a corpus-scale dimensionality reduction must have.
  Public background: Achlioptas (2003) database-friendly random
  projections — ±1 entries suffice for the JL guarantee.

- ``pca_top_component`` / ``pca_scores`` — the dominant eigenvector by
  power iteration on the covariance relation (no eigensolver, fully
  SQL-replayable) and the corpus projection onto it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from timeseries_spark.functions.vectors import checked_dims

# Knuth multiplicative constant; mixes the (component, output-dim) pair
# before the parity extraction so signs don't follow the (i+j) parity
# lattice a plain linear hash would produce.
_JL_MULT = 2654435761
_JL_STEP = 97
_JL_MOD = 4294967296  # 2^32


def jl_sign(k: Column | int, i: Column | int) -> Column:
    """Deterministic ±1 for output dim k, input dim i — bit 16 of the
    multiplicative hash (low bits of a mod-2^32 multiply are weak).
    Pure 64-bit integer arithmetic + exact double floor-division, so
    any engine reproduces it from the indices alone."""
    h = F.pmod(
        F.lit(k) * F.lit(_JL_MULT) + F.lit(i) * F.lit(_JL_STEP)
        if isinstance(k, int)
        else k * F.lit(_JL_MULT) + i * F.lit(_JL_STEP),
        F.lit(_JL_MOD),
    )
    bit = F.pmod(F.floor(h / F.lit(65536)), F.lit(2))
    return (bit * 2 - 1).cast("double")


# the same hash as ANSI SQL, for DuckDB oracles (k, i are column names)
JL_SIGN_SQL = (
    "(CAST((CAST(floor(((({k} * 2654435761 + {i} * 97) % 4294967296)"
    " + 4294967296) % 4294967296 / 65536) AS BIGINT) % 2) AS DOUBLE)"
    " * 2 - 1)"
)


def covariance_pairs(
    vectors: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Upper-triangle covariance of the embedding cloud as long-form
    rows ``(i, j, cov)`` for i ≤ j, cov rounded to 6dp.

    Single scan, single tiny shuffle: each row emits ONE primitive
    double array — its d(d+1)/2 upper-triangle outer products followed
    by its d raw values — and a single posexplode + hash aggregate over
    the linear position yields every Σxixj AND every per-dim Σxi at
    once (map-side partial aggregation reduces each task to
    ≤ d(d+1)/2 + d rows before the exchange). The triangular position →
    (i, j) mapping is a d(d+1)/2-row broadcast literal (no fragile
    inverse-triangular arithmetic in the plan), and cov = E[xy] −
    E[x]E[y] assembles via two more broadcast joins of the d-row dim
    sums. Measured at sf0.1×5 (10k vectors): the primitive
    upper-triangle encoding runs 1.6× faster than the full-d² variant
    and 2.4× faster than a struct-per-pair explode — the statistic is
    compute-bound at n·d²/2 products, so halving the emitted elements
    is the lever; the shuffle is constant-size regardless of n."""
    if dims < 1:
        raise ValueError(f"dims must be >= 1, got {dims}")
    v = F.transform(
        checked_dims(F.col(vec_col), dims, "covariance_pairs"),
        lambda x: x.cast("double"),
    )
    tri = F.flatten(
        F.transform(
            v,
            lambda xi, i: F.transform(
                F.slice(v, i + 1, F.lit(dims) - i), lambda xj: xi * xj
            ),
        )
    )
    from timeseries_spark.functions.parallelism import ensure_parallelism

    # The eager checkpoint is load-bearing (round-7 event-log finding):
    # `agg` is consumed by TWO branches (pair rows and dim sums), and
    # Catalyst pushes each branch's pos-filter BELOW the aggregate —
    # making the two exchange subtrees textually different, so AQE's
    # ReusedExchange never fires and the full O(n·d²) corpus pass ran
    # TWICE. Materializing the ≤ d(d+1)/2 + d row result once keeps the
    # corpus pass single by construction, not by optimizer goodwill.
    # ensure_parallelism matters for the same compute-vs-bytes reason as
    # everywhere: a corpus that fits one parquet split would run the
    # d²-per-row expansion on one core.
    agg = (
        ensure_parallelism(vectors)
        .select(F.posexplode(F.concat(tri, v)).alias("pos", "val"))
        .groupBy("pos")
        .agg(
            F.sum("val").alias("sij"),
            F.count(F.lit(1)).cast("double").alias("n"),
        )
        .localCheckpoint(eager=True)
    )
    n_tri = dims * (dims + 1) // 2
    mapping = vectors.sparkSession.createDataFrame(
        [
            (p, i, j)
            for p, (i, j) in enumerate(
                (i, j) for i in range(dims) for j in range(i, dims)
            )
        ],
        "pos int, i int, j int",
    )
    pairs = agg.where(F.col("pos") < n_tri).join(F.broadcast(mapping), "pos")
    dim_sums = agg.where(F.col("pos") >= n_tri).select(
        (F.col("pos") - n_tri).cast("int").alias("d"),
        F.col("sij").alias("sd"),
    )
    return (
        pairs.join(
            F.broadcast(
                dim_sums.select(F.col("d").alias("i"), F.col("sd").alias("si"))
            ),
            "i",
        )
        .join(
            F.broadcast(
                dim_sums.select(F.col("d").alias("j"), F.col("sd").alias("sj"))
            ),
            "j",
        )
        .select(
            "i",
            "j",
            F.round(
                F.col("sij") / F.col("n")
                - (F.col("si") / F.col("n")) * (F.col("sj") / F.col("n")),
                6,
            ).alias("cov"),
        )
    )


def random_projection(
    vectors: DataFrame,
    dims: int,
    out_dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """JL sign-projection d → out_dims: proj[k] = Σ_i sign(k,i)·x_i /
    √out_dims, each component rounded to 6dp. Per-row expression only —
    no shuffle, no stored matrix, no fit step — so it composes in front
    of any ANN/clustering operator as a free map stage."""
    if dims < 1:
        raise ValueError(f"dims must be >= 1, got {dims}")
    if not 1 <= out_dims:
        raise ValueError(f"out_dims must be >= 1, got {out_dims}")
    scale = float(out_dims) ** 0.5
    v = F.transform(
        checked_dims(F.col(vec_col), dims, "random_projection"),
        lambda x: x.cast("double"),
    )
    proj = F.transform(
        F.sequence(F.lit(0), F.lit(out_dims - 1)),
        lambda k: F.round(
            F.aggregate(
                F.zip_with(
                    v,
                    F.sequence(F.lit(0), F.lit(dims - 1)),
                    lambda x, i: x * jl_sign(k, i),
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            / F.lit(scale),
            6,
        ),
    )
    return vectors.select(F.col(id_col), proj.alias(out_col))


def pca_top_components(
    vectors: DataFrame,
    dims: int,
    n_components: int = 3,
    n_iter: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-r principal components by sequential power iteration with
    per-iteration Gram–Schmidt re-orthogonalization — the deflation
    step of the whitening path, still with NO eigensolver and still
    exactly SQL-replayable.

    Component c repeats the ``pca_top_component`` loop, but after each
    matvec the iterate is orthogonalized against the already-found
    components IN ORDER (modified Gram–Schmidt: subtract the projection
    onto component 0, then — from the residual — onto component 1, …)
    before normalizing and snapping. Sequential-vs-classical GS matters
    for cross-engine exactness: the two differ by O(ε) terms on the
    1e-10-snapped components, so the oracle must (and does) replay the
    SAME order. Orthogonality of the result is enforced by
    construction — the final iterate is normalized AFTER the
    subtraction — so pairwise dots are bounded by snap rounding
    (≤ d·1e-10), regardless of how converged the iteration is.

    Returns (component, dim, loading, eigenvalue): component 0 is
    identical to ``pca_top_component``'s output; eigenvalue_c is the
    final residual norm ‖GS(C·v)‖, non-increasing in c for a converged
    iteration.

    Scale shape: the corpus is touched ONCE (covariance_pairs); all
    r·n_iter rounds run on the d²-row matrix relation with the bounded
    driver-loop + eager localCheckpoint discipline. The GS corrections
    are d-row broadcast joins — constant-size regardless of n."""
    if n_components < 1:
        raise ValueError(f"n_components must be >= 1, got {n_components}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    snap = lambda c: F.floor(c * 1e10 + F.lit(0.5)).cast("double") / 1e10  # noqa: E731
    upper = covariance_pairs(vectors, dims, id_col, vec_col)
    cov = upper.unionByName(
        upper.where(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "cov"
        )
    ).localCheckpoint(eager=True)
    dims_rel = (
        cov.select(F.col("i").alias("dim")).distinct().localCheckpoint(eager=True)
    )
    start = F.lit(1.0 / float(dims) ** 0.5)
    done = []  # (v_df(dim, x), norm_df(nm)) per found component
    for _c in range(n_components):
        v = dims_rel.withColumn("x", start)
        norm = None
        for _t in range(n_iter):
            w = (
                cov.join(v.select(F.col("dim").alias("j"), "x"), "j")
                .groupBy(F.col("i").alias("dim"))
                .agg(F.sum(F.col("cov") * F.col("x")).alias("w"))
            )
            for pv, _pn in done:
                p = pv.select("dim", F.col("x").alias("px"))
                dot = w.join(p, "dim").agg(
                    F.sum(F.col("w") * F.col("px")).alias("dp")
                )
                w = (
                    w.join(p, "dim")
                    .crossJoin(F.broadcast(dot))
                    .select(
                        "dim",
                        (F.col("w") - F.col("dp") * F.col("px")).alias("w"),
                    )
                )
            norm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nm"))
            # nm=0 guard as in pca_top_component: once the cloud's rank
            # is exhausted the residual collapses; emit the zero vector
            # with eigenvalue 0 instead of a NULL cascade.
            v = (
                w.crossJoin(F.broadcast(norm))
                .select(
                    "dim",
                    snap(
                        F.when(
                            F.col("nm") > 0, F.col("w") / F.col("nm")
                        ).otherwise(F.lit(0.0))
                    ).alias("x"),
                )
                .localCheckpoint(eager=True)
            )
        done.append((v, norm))
    out = None
    for c, (v, norm) in enumerate(done):
        part = v.crossJoin(F.broadcast(norm)).select(
            F.lit(c).cast("int").alias("component"),
            F.col("dim").cast("bigint").alias("dim"),
            F.round("x", 6).alias("loading"),
            F.round("nm", 6).alias("eigenvalue"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def pca_top_component(
    vectors: DataFrame,
    dims: int,
    n_iter: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal component of the embedding cloud by power
    iteration on the covariance matrix — the first step of every
    whitening / spectral-diagnostic pipeline, done WITHOUT a linear-
    algebra library: v ← snap(C·v / ‖C·v‖) for ``n_iter`` rounds from
    the uniform start v₀ = 1/√d (exactly representable for power-of-two
    d). Returns (dim, loading, eigenvalue): loadings 6dp-rounded, the
    eigenvalue is the final iterate's ‖C·v‖ (the Rayleigh quotient of a
    unit vector under a symmetric PSD matrix).

    Scale shape: the corpus is touched ONCE (by ``covariance_pairs``);
    every iteration after runs on the d²-row matrix relation — a
    matvec is one broadcast-state join + a d-row aggregate, with the
    same bounded-driver-loop + eager localCheckpoint discipline as
    ``pagerank``. Determinism: the matrix entries are the 6dp-rounded
    covariance values BOTH engines already agree on exactly, each
    iterate snaps half-up at 1e-10 (drift cannot accumulate), and the
    fixed positive start vector pins the sign — so plain SQL replays
    the whole iteration (chained CTEs), which no eigensolver call
    could offer."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    snap = lambda c: F.floor(c * 1e10 + F.lit(0.5)).cast("double") / 1e10  # noqa: E731
    upper = covariance_pairs(vectors, dims, id_col, vec_col)
    cov = upper.unionByName(
        upper.where(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "cov"
        )
    ).localCheckpoint(eager=True)
    v = cov.select(F.col("i").alias("dim")).distinct().withColumn(
        "x", F.lit(1.0 / float(dims) ** 0.5)
    )
    norm = None
    for _ in range(n_iter):
        w = (
            cov.join(
                v.select(F.col("dim").alias("j"), "x"), "j"
            )
            .groupBy(F.col("i").alias("dim"))
            .agg(F.sum(F.col("cov") * F.col("x")).alias("w"))
        )
        norm = w.agg(
            F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nm")
        )
        # nm=0 guard: an all-constant embedding cloud has an all-zero
        # covariance, so C·v collapses and w/nm would be NULL (non-ANSI
        # x/0) — silently nulling every loading. The documented
        # degenerate result is the ZERO vector with eigenvalue 0: a
        # deterministic, join-safe sentinel (callers see loading=0.0
        # everywhere instead of a poisoned NULL cascade).
        v = (
            w.crossJoin(F.broadcast(norm))
            .select(
                "dim",
                snap(
                    F.when(
                        F.col("nm") > 0, F.col("w") / F.col("nm")
                    ).otherwise(F.lit(0.0))
                ).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
    return v.crossJoin(F.broadcast(norm)).select(
        F.col("dim").cast("bigint").alias("dim"),
        F.round("x", 6).alias("loading"),
        F.round("nm", 6).alias("eigenvalue"),
    )


def pca_whiten_scores(
    vectors: DataFrame,
    dims: int,
    n_components: int = 3,
    n_iter: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Whitened r-D summary of every vector: component c's score is
    (x · v_c) / √λ_c — the projection onto the learned principal axes
    rescaled to unit variance, the standard decorrelated input for
    downstream distance/clustering stages. Returns (id, whitened)
    with ``whitened`` an array<double> ordered by component.

    The r components fold to ONE broadcast row (array of (pc, ev)
    structs ordered by component), so the projection is a zero-shuffle
    map stage over the corpus — same shape as ``pca_scores`` but r-wide.
    Scores are emitted as RAW doubles: both engines fold the dot
    product in dim order over identical 6dp inputs and divide by the
    same √(6dp λ), so the IEEE results are bit-equal and rounding
    would only add half-way-boundary hazards. A rank-exhausted
    component (λ = 0) contributes 0.0, matching the zero-vector
    sentinel upstream."""
    comp = pca_top_components(
        vectors, dims, n_components, n_iter, id_col, vec_col
    )
    per_comp = (
        comp.groupBy("component")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "loading"))
            ).alias("s"),
            F.first("eigenvalue").alias("ev"),
        )
        .select(
            "component",
            F.transform("s", lambda t: t["loading"]).alias("pc"),
            "ev",
        )
    )
    one_row = per_comp.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("component", "pc", "ev"))
        ).alias("comps")
    )
    v = F.transform(
        checked_dims(F.col(vec_col), dims, "pca_whiten_scores"),
        lambda x: x.cast("double"),
    )
    return vectors.crossJoin(F.broadcast(one_row)).select(
        F.col(id_col),
        F.transform(
            F.col("comps"),
            lambda cc: F.when(
                cc["ev"] > 0,
                F.aggregate(
                    F.zip_with(v, cc["pc"], lambda x, w: x * w),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                )
                / F.sqrt(cc["ev"]),
            ).otherwise(F.lit(0.0)),
        ).alias("whitened"),
    )


def pca_scores(
    vectors: DataFrame,
    dims: int,
    n_iter: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every vector onto the learned top component:
    score = Σ_i loading_i · x_i (4dp-rounded) — the 1-D summary used
    for spectral outlier screens and stratified sampling along the
    dominant axis. The 64-row component folds to ONE broadcast array
    row (array_agg ordered by dim — the sq8 stats idiom), so the
    projection is a zero-shuffle map stage over the corpus."""
    comp = pca_top_component(vectors, dims, n_iter, id_col, vec_col)
    loadings = comp.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "loading"))
        ).alias("s")
    ).select(
        F.transform("s", lambda t: t["loading"]).alias("pc1")
    )
    v = F.transform(
        checked_dims(F.col(vec_col), dims, "pca_scores"),
        lambda x: x.cast("double"),
    )
    return vectors.crossJoin(F.broadcast(loadings)).select(
        F.col(id_col),
        F.round(
            F.aggregate(
                F.zip_with(v, F.col("pc1"), lambda x, w: x * w),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
            4,
        ).alias("pc1_score"),
    )


def standardize_embeddings(
    vectors: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "standardized",
) -> DataFrame:
    """Per-dimension z-score standardization of the embedding cloud:
    out[i] = (x[i] − μ_i) / σ_i with population σ, the preprocessing
    step in front of distance-based stages (k-means, cosine ANN over
    heterogeneous-scale dims). A collapsed dimension (σ = 0) maps to
    0.0 — a deterministic sentinel, not a NULL cascade.

    Two passes over nothing but the corpus column: one posexplode scan
    aggregates (Σx, Σx², n) per dim — map-side partial combine, the
    only exchange carries d rows — then the d-row stats table folds to
    ONE broadcast row and the rescale is a zero-shuffle codegen'd map.
    μ and σ are snapped half-up at 1e-6 before use and each output
    component at 1e-6 after, so both engines rescale with identical
    constants and emit identical arrays (the unordered corpus sums
    differ at ~1e-13; the snap absorbs it)."""
    if dims < 1:
        raise ValueError(f"dims must be >= 1, got {dims}")
    snap6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("double") / 1e6  # noqa: E731
    v = F.transform(
        checked_dims(F.col(vec_col), dims, "standardize_embeddings"),
        lambda x: x.cast("double"),
    )
    stats = (
        vectors.select(F.posexplode(v).alias("d", "x"))
        .groupBy("d")
        .agg(
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.count(F.lit(1)).cast("double").alias("n"),
        )
        .select(
            "d",
            snap6(F.col("sx") / F.col("n")).alias("mu"),
            snap6(
                F.sqrt(
                    F.greatest(
                        F.col("sxx") / F.col("n")
                        - (F.col("sx") / F.col("n"))
                        * (F.col("sx") / F.col("n")),
                        F.lit(0.0),
                    )
                )
            ).alias("sigma"),
        )
    )
    one_row = stats.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("d", "mu", "sigma"))
        ).alias("ms")
    )
    return vectors.crossJoin(F.broadcast(one_row)).select(
        F.col(id_col),
        F.zip_with(
            v,
            F.col("ms"),
            lambda x, s: F.when(
                s["sigma"] > 0, snap6((x - s["mu"]) / s["sigma"])
            ).otherwise(F.lit(0.0)),
        ).alias(out_col),
    )
