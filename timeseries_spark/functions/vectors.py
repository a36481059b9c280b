"""Vector math over ``array<float|double>`` columns, JVM-side.

For the similarity-search extension operators (BASELINE.json): dot product,
norms, cosine — all as `zip_with`/`aggregate` higher-order functions so
brute-force scoring runs inside codegen, no Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise product folded to a double sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a, b) in double precision; NULL if either norm is 0."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def cosine_from_norms(
    a: Column, b: Column, na: Column, nb: Column
) -> Column:
    """cos(a, b) with PRECOMPUTED per-side l2 norms — bit-identical to
    ``cosine_similarity`` (each norm is the same sqrt-of-fold
    expression, evaluated at vector grain instead of pair grain, and
    the division keeps the same ``dot / (na * nb)`` association), but
    the per-PAIR work drops from three array folds to one. This is the
    round-11 answer to the semantic-dedup verify cost: a quantized
    prescreen with a PROVABLE no-false-negative slack keeps 100% of
    candidate pairs on isotropic unit embeddings (measured: PQ m=8/K=16
    residual |e| ~ 0.74 per unit vector, so the slack exceeds any
    usable threshold), so the honest lever is the constant factor of
    the exact verify itself, not candidate reduction."""
    denom = na * nb
    return F.when(denom > 0, dot(a, b) / denom)


def as_double(col: Column) -> Column:
    """Cast an array column's elements to double (score math contract)."""
    return F.transform(col, lambda x: x.cast("double"))


def checked_dims(col: Column, dims: int, who: str) -> Column:
    """The vector as doubles, or a loud job failure on a length mismatch.

    Shared by every fixed-width ANN operator (SQ8, PQ, IVF-PQ): a dims
    mismatch silently NULLs downstream element_at/slice math and
    degenerates rankings to arbitrary id order, so it must fail the job
    instead (same contract as hyperplane_lsh_topk's checked_bucket)."""
    v = as_double(col)
    return F.when(F.size(v) == dims, v).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{who}: expected {dims}-dim vector, got "),
                F.size(v).cast("string"),
            )
        )
    )
