"""Embedding-matrix statistics / dimensionality-reduction queries
(extensions/embeddings.py): covariance of the embedding cloud and the
JL sign projection. Beyond-reference surface for the embedding side of
a training-data pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_spark.extensions.embeddings import (
    JL_SIGN_SQL,
    covariance_pairs,
    random_projection,
)
from timeseries_spark.queries import load, query


# upper-triangle covariance as a reusable CTE body: (i, j, cov), i <= j,
# 6dp-rounded — shared by the covariance gate and the power-iteration
# replay so the two oracles can never drift
_COV_UPPER = """
    cpair AS (
      SELECT ti.i - 1 AS i, tj.i - 1 AS j,
             embedding[ti.i]::DOUBLE AS xi,
             embedding[tj.i]::DOUBLE AS xj
      FROM embeddings,
           unnest(generate_series(1, 64)) AS ti(i),
           unnest(generate_series(1, 64)) AS tj(i)
      WHERE ti.i <= tj.i
    ),
    covu AS (
      SELECT i, j,
             round(sum(xi * xj) / count(*)
                   - (sum(xi) / count(*)) * (sum(xj) / count(*)), 6) AS cov
      FROM cpair GROUP BY i, j
    )"""


@query(
    "embedding_covariance",
    oracle=f"""
    WITH {_COV_UPPER}
    SELECT i, j, cov FROM covu
    """,
)
def embedding_covariance(spark, sf_dir):
    """Upper-triangle 64×64 covariance of the embedding cloud as
    long-form (i, j, cov) rows — collapsed-dimension detection /
    whitening input for the ANN stack. One corpus scan: pairs are
    generated per row in a codegen'd projection carrying xi and xj, so
    a single hash aggregate yields Σxixj, Σxi, Σxj, n at once (within
    any (i,j) group sum(xi) is the global per-dim sum) and the only
    exchange carries ≤ 2080 partial rows per task
    (extensions/embeddings.py:covariance_pairs)."""
    emb = load(spark, sf_dir, "embeddings")
    out = covariance_pairs(emb, dims=64)
    return out.select(
        F.col("i").cast("bigint").alias("i"),
        F.col("j").cast("bigint").alias("j"),
        "cov",
    )


_PROJ_SIGN = JL_SIGN_SQL.format(k="(g.k - 1)", i="(t.i - 1)")


@query(
    "embedding_projection",
    oracle=f"""
    WITH terms AS (
      SELECT vec_id, g.k - 1 AS k, t.i AS i,
             embedding[t.i]::DOUBLE * {_PROJ_SIGN} AS term
      FROM embeddings,
           unnest(generate_series(1, 64)) AS t(i),
           unnest(generate_series(1, 16)) AS g(k)
    ),
    sums AS (
      -- dim-ORDERED fold, mirroring the pca_scores oracle: Spark's
      -- F.aggregate walks dims sequentially, and an unordered sum()
      -- takes a different double-add path — a value landing exactly on
      -- a .xxxxx5 6dp boundary would then round differently
      -- (0.0 + t0 == t0, so list_reduce's missing init changes nothing)
      SELECT vec_id, k,
             round(list_reduce(list(term ORDER BY i),
                               (a, b) -> a + b) / 4.0, 6) AS y
      FROM terms GROUP BY vec_id, k
    )
    SELECT vec_id, list(y ORDER BY k) AS proj
    FROM sums GROUP BY vec_id
    """,
)
def embedding_projection(spark, sf_dir):
    """Johnson–Lindenstrauss sign projection 64 → 16 dims: proj[k] =
    Σ_i sign(k,i)·x_i / √16 with the ±1 matrix regenerated from a
    multiplicative integer hash — never stored, never broadcast, and
    the whole reduction is a per-row codegen'd expression with ZERO
    shuffles (the oracle's unnest/group replay is the quadratic shape
    this plan exists to avoid; extensions/embeddings.py:
    random_projection)."""
    emb = load(spark, sf_dir, "embeddings")
    return random_projection(emb, dims=64, out_dims=16)


def _fold(terms: str) -> str:
    """Ordered double left-fold with an explicit 0.0 init — the exact
    replay of Spark's F.aggregate(..., lit(0.0), +)."""
    return (
        "list_reduce(list_prepend(0.0::DOUBLE, "
        + terms
        + "), (a, b) -> a + b)"
    )


def _pca_multi_ctes(n_components: int, n_iter: int) -> str:
    """Array-state power-iteration replay, mirroring the Spark
    implementation exactly: the matrix folds to 64 ordered per-row
    value lists and the iterate to ONE (vv list, nm) row; matvec, the
    sequential (modified) Gram–Schmidt dots/subtractions, and the norm
    are all dim-ORDERED folds, so the doubles are bit-identical across
    engines by construction. Every CTE is MATERIALIZED — DuckDB inlines
    plain CTEs, and this chain is re-referenced across components/
    iterations, which would make the plan tree (and the parquet
    re-opens) exponential in n_components."""
    ctes = [
        _COV_UPPER.strip().replace("covu AS (", "covu AS MATERIALIZED ("),
        """cov AS MATERIALIZED (
      SELECT i, j, cov FROM covu
      UNION ALL
      SELECT j, i, cov FROM covu WHERE i < j
    )""",
        """crow AS MATERIALIZED (
      SELECT i, list(cov ORDER BY j) AS cvals FROM cov GROUP BY i
    )""",
    ]
    matvec = _fold(
        "list_transform(generate_series(1, 64), k -> r.cvals[k] * s.vv[k])"
    )
    for c in range(n_components):
        ctes.append(
            f"""c{c}v0 AS (
      SELECT list_transform(generate_series(1, 64), k -> 0.125::DOUBLE)
        AS vv
    )"""
        )
        for t in range(1, n_iter + 1):
            ctes.append(
                f"""c{c}w{t}p0 AS MATERIALIZED (
      SELECT list(w ORDER BY i) AS wv FROM (
        SELECT r.i AS i, {matvec} AS w
        FROM crow r, c{c}v{t - 1} s)
    )"""
            )
            cur = f"c{c}w{t}p0"
            for pq in range(c):
                dot = _fold(
                    "list_transform(generate_series(1, 64), "
                    "k -> w2.wv[k] * q2.vv[k])"
                )
                nxt = f"c{c}w{t}p{pq + 1}"
                ctes.append(
                    f"""{nxt} AS MATERIALIZED (
      SELECT list_transform(generate_series(1, 64),
               k -> w.wv[k] - d.dp * q.vv[k]) AS wv
      FROM {cur} w, c{pq}v{n_iter} q,
           (SELECT {dot} AS dp
            FROM {cur} w2, c{pq}v{n_iter} q2) d
    )"""
                )
                cur = nxt
            norm = _fold("list_transform(wv, x -> x * x)")
            ctes.append(
                f"""c{c}n{t} AS MATERIALIZED (
      SELECT sqrt({norm}) AS nm FROM {cur}
    )"""
            )
            ctes.append(
                f"""c{c}v{t} AS MATERIALIZED (
      SELECT list_transform(wv, x -> CASE WHEN nm > 0
               THEN floor(x / nm * 1e10 + 0.5) / 1e10
               ELSE 0.0 END) AS vv
      FROM {cur}, c{c}n{t}
    )"""
            )
    return ",\n    ".join(ctes)


def _pca_multi_oracle(n_components: int, n_iter: int) -> str:
    parts = [
        f"""SELECT {c} AS component, CAST(t.k - 1 AS BIGINT) AS dim,
           round(v.vv[t.k], 6) AS loading, round(n.nm, 6) AS eigenvalue
    FROM c{c}v{n_iter} v, c{c}n{n_iter} n,
         unnest(generate_series(1, 64)) AS t(k)"""
        for c in range(n_components)
    ]
    return (
        f"\n    WITH {_pca_multi_ctes(n_components, n_iter)}\n    "
        + "\n    UNION ALL\n    ".join(parts)
    )


def _pca_single_oracle(n_iter: int) -> str:
    return f"""
    WITH {_pca_multi_ctes(1, n_iter)}
    SELECT CAST(t.k - 1 AS BIGINT) AS dim,
           round(v.vv[t.k], 6) AS loading, round(n.nm, 6) AS eigenvalue
    FROM c0v{n_iter} v, c0n{n_iter} n,
         unnest(generate_series(1, 64)) AS t(k)
    """


def _pca_scores_oracle(n_iter: int) -> str:
    # the dot product folds in DIM ORDER (Spark's zip_with/aggregate
    # walks the arrays sequentially) and the multiplier is the
    # 6dp-ROUNDED loading the Spark side broadcasts, not the raw 1e-10
    # iterate — both were sf0.1 lessons (3 of 2000 rows sat exactly on
    # a 4dp half-way boundary)
    dot = _fold(
        "list_transform(generate_series(1, 64), "
        "k -> e.embedding[k]::DOUBLE * round(v.vv[k], 6))"
    )
    return f"""
    WITH {_pca_multi_ctes(1, n_iter)}
    SELECT e.vec_id, round({dot}, 4) AS pc1_score
    FROM embeddings e, c0v{n_iter} v
    """


@query("pca_top_component", oracle=_pca_single_oracle(6))
def pca_top_component_q(spark, sf_dir):
    """Top principal component of the embedding cloud: 6 power-method
    rounds on the 6dp-exact covariance relation (v ← snap(C·v/‖C·v‖),
    1e-10 half-up per round, uniform start) — iterative linear algebra
    with NO eigensolver, replayed exactly by chained CTEs; the corpus
    is touched once by the covariance pass, every round after runs on
    the d²-row matrix (extensions/embeddings.py:pca_top_component)."""
    from timeseries_spark.extensions.embeddings import pca_top_component

    emb = load(spark, sf_dir, "embeddings")
    return pca_top_component(emb, dims=64, n_iter=6)


def _pca_whiten_oracle(n_components: int, n_iter: int) -> str:
    parts = []
    for c in range(n_components):
        dot = _fold(
            "list_transform(generate_series(1, 64), "
            "k -> e.embedding[k]::DOUBLE * round(v.vv[k], 6))"
        )
        parts.append(
            f"""SELECT e.vec_id, {c} AS component,
           CASE WHEN (SELECT round(nm, 6) FROM c{c}n{n_iter}) > 0
                THEN {dot}
                     / sqrt((SELECT round(nm, 6) FROM c{c}n{n_iter}))
                ELSE 0.0 END AS s
    FROM embeddings e, c{c}v{n_iter} v"""
        )
    scores = "\n    UNION ALL\n    ".join(parts)
    return f"""
    WITH {_pca_multi_ctes(n_components, n_iter)},
    scores AS (
    {scores}
    )
    SELECT vec_id, list(s ORDER BY component) AS whitened
    FROM scores GROUP BY vec_id
    """


@query("pca_top3", oracle=_pca_multi_oracle(3, 6))
def pca_top3(spark, sf_dir):
    """Top-3 principal components by sequential power iteration with
    per-iteration modified Gram–Schmidt against the previously found
    components — deflation without an eigensolver, orthogonal BY
    CONSTRUCTION (the final iterate is normalized after the
    subtraction, so pairwise dots are bounded by the 1e-10 snap), and
    replayed exactly by ~90 chained CTEs. Component 0 is identical to
    pca_top_component; eigenvalues are non-increasing
    (extensions/embeddings.py:pca_top_components)."""
    from timeseries_spark.extensions.embeddings import pca_top_components

    emb = load(spark, sf_dir, "embeddings")
    return pca_top_components(emb, dims=64, n_components=3, n_iter=6)


@query("pca_whiten_scores", oracle=_pca_whiten_oracle(3, 6))
def pca_whiten_scores_q(spark, sf_dir):
    """Whitened 3-D summary of every embedding: (x · v_c) / √λ_c per
    learned component — the decorrelated, unit-variance projection a
    clustering / distance stage consumes. The three components fold to
    ONE broadcast row, so the corpus pass is a zero-shuffle map; scores
    are RAW doubles (dim-ordered folds over 6dp inputs make the IEEE
    results bit-equal across engines, and the harness normalizes at
    9dp) (extensions/embeddings.py:pca_whiten_scores)."""
    from timeseries_spark.extensions.embeddings import pca_whiten_scores

    emb = load(spark, sf_dir, "embeddings")
    return pca_whiten_scores(emb, dims=64, n_components=3, n_iter=6)


@query("pca_scores", oracle=_pca_scores_oracle(6))
def pca_scores_q(spark, sf_dir):
    """Per-vector projection onto the trained top principal component
    (4dp) — the 64-row component folds to one broadcast array and the
    projection is a zero-shuffle map over the corpus
    (extensions/embeddings.py:pca_scores)."""
    from timeseries_spark.extensions.embeddings import pca_scores

    emb = load(spark, sf_dir, "embeddings")
    return pca_scores(emb, dims=64, n_iter=6)


@query(
    "embedding_standardize",
    oracle="""
    WITH xs AS (
      SELECT vec_id, t.i - 1 AS d, embedding[t.i]::DOUBLE AS x
      FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
    ),
    stats AS (
      SELECT d,
             floor(sum(x) / count(*) * 1e6 + 0.5) / 1e6 AS mu,
             floor(sqrt(greatest(
                     sum(x * x) / count(*)
                     - (sum(x) / count(*)) * (sum(x) / count(*)),
                     0.0)) * 1e6 + 0.5) / 1e6 AS sigma
      FROM xs GROUP BY d
    ),
    z AS (
      SELECT xs.vec_id, xs.d,
             CASE WHEN s.sigma > 0
                  THEN floor((xs.x - s.mu) / s.sigma * 1e6 + 0.5) / 1e6
                  ELSE 0.0 END AS zx
      FROM xs JOIN stats s ON s.d = xs.d
    )
    SELECT vec_id, list(zx ORDER BY d) AS standardized
    FROM z GROUP BY vec_id
    """,
)
def embedding_standardize(spark, sf_dir):
    """Per-dimension z-score standardization of the embedding cloud
    (population σ, 1e-6 snapped constants and components, σ=0 dims →
    0.0): one d-row stats exchange from a single posexplode scan, then
    a zero-shuffle broadcast rescale map — the preprocessing stage in
    front of k-means / distance ANN
    (extensions/embeddings.py:standardize_embeddings)."""
    from timeseries_spark.extensions.embeddings import (
        standardize_embeddings,
    )

    emb = load(spark, sf_dir, "embeddings")
    return standardize_embeddings(emb, dims=64)


@query(
    "embedding_outliers",
    oracle="""
    WITH xs AS (
      SELECT vec_id, t.i - 1 AS d, embedding[t.i]::DOUBLE AS x
      FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
    ),
    stats AS (
      SELECT d,
             floor(sum(x) / count(*) * 1e6 + 0.5) / 1e6 AS mu,
             floor(sqrt(greatest(
                     sum(x * x) / count(*)
                     - (sum(x) / count(*)) * (sum(x) / count(*)),
                     0.0)) * 1e6 + 0.5) / 1e6 AS sigma
      FROM xs GROUP BY d
    ),
    z AS (
      SELECT xs.vec_id, xs.d,
             CASE WHEN s.sigma > 0
                  THEN floor((xs.x - s.mu) / s.sigma * 1e6 + 0.5) / 1e6
                  ELSE 0.0 END AS zx
      FROM xs JOIN stats s ON s.d = xs.d
    ),
    score AS (
      SELECT vec_id,
             round(sqrt(list_reduce(
               list_prepend(0.0::DOUBLE, list(zx * zx ORDER BY d)),
               (a, b) -> a + b) / 64.0), 6) AS outlier_score
      FROM z GROUP BY vec_id
    )
    SELECT vec_id, outlier_score FROM score
    ORDER BY outlier_score DESC, vec_id LIMIT 20
    """,
)
def embedding_outliers(spark, sf_dir):
    """Top-20 embedding outliers by diagonal-Mahalanobis distance:
    RMS of the per-dimension z-scores (collapsed dims contribute 0) —
    the spectral screen run before training on an embedding corpus.
    Composes the zero-shuffle standardization map with a per-row
    dim-ordered fold and a distributed TakeOrderedAndProject cut
    (extensions/embeddings.py:standardize_embeddings)."""
    from timeseries_spark.extensions.embeddings import (
        standardize_embeddings,
    )

    emb = load(spark, sf_dir, "embeddings")
    z = standardize_embeddings(emb, dims=64)
    score = F.round(
        F.sqrt(
            F.aggregate(
                F.transform("standardized", lambda x: x * x),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            / F.lit(64.0)
        ),
        6,
    )
    return (
        z.select("vec_id", score.alias("outlier_score"))
        .orderBy(F.col("outlier_score").desc(), "vec_id")
        .limit(20)
    )
