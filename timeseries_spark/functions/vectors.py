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
