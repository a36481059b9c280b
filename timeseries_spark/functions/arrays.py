"""Array kernels for the harmonic-sum scoring path.

These re-express the reference's `F.expr` higher-order-function pipeline
(timeseries.py:488-510) as composable Column functions. All of it stays
JVM-side (Catalyst `ArrayFilter` / `ArraySort` / `ZipWith` / `ArrayAggregate`
expressions) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_TOP_K = 50
DEFAULT_MAX_SCORE = 1.64  # sum(1/i^2, i=1..10000), timeseries.py:35


def let(value: Column, body) -> Column:
    """Evaluate ``value`` ONCE and hand it to ``body`` as a bound lambda
    variable — a let-binding for expensive sub-expressions referenced
    more than once inside a larger expression.

    Catalyst performs no common-subexpression elimination INSIDE lambda
    functions (round-16 plan audit: the flagship fold's sorted top-k
    pool — slice(reverse(array_sort(filter(...)))) — appeared FOUR
    times per fold step, once for the carried state and three times
    inside harmonic_sum's references to its argument, and each copy was
    evaluated). Wrapping the expression as the sole element of a
    one-element ``transform`` binds it to a lambda variable that the
    runtime evaluates exactly once; the unwrap is a constant-index
    element_at. Results are identical by construction — the bound value
    is the same expression, just not re-evaluated."""
    return F.element_at(F.transform(F.array(value), body), 1)


def top_k_desc(scores: Column, k: int = DEFAULT_TOP_K) -> Column:
    """Top-``k`` values of a double array, descending, NaN removed.

    Reference idiom: ``filter(x -> NOT isnan(x))`` then
    ``slice(reverse(array_sort(..)), 1, 50)`` (timeseries.py:488-494).
    """
    clean = F.filter(scores, lambda x: ~F.isnan(x))
    return F.slice(F.reverse(F.array_sort(clean)), 1, k)


def harmonic_sum(sorted_scores: Column) -> Column:
    """``sum(scores[i] / i^2)`` with 1-based positions over a descending array.

    NULL on an empty array — matching the reference, where empty cumulative
    cells fold to NULL, not 0 (timeseries.py:496-508: ``sequence(1, 0)`` zips
    to null entries and ``0D + NULL`` is NULL). Dense series therefore carry
    NULL before the first evidence year; the novelty pass fills them.
    """
    # let-bind the argument: it is referenced three times below (idx
    # sizing, the zip, the emptiness guard), and callers pass expensive
    # sorted-top-k expressions — without the binding each reference
    # re-evaluates the argument (no CSE inside lambdas; see ``let``)
    def _body(ss):
        idx = F.sequence(F.lit(1), F.greatest(F.size(ss), F.lit(1)))
        weighted = F.zip_with(ss, idx, lambda s, i: s / (i * i))
        total = F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)
        return F.when(F.size(ss) > 0, total).otherwise(
            F.lit(None).cast("double")
        )

    return let(sorted_scores, _body)


def harmonic_score(
    scores: Column, k: int = DEFAULT_TOP_K, max_score: float = DEFAULT_MAX_SCORE
) -> Column:
    """Normalized top-``k`` harmonic sum (timeseries.py:488-510)."""
    return harmonic_sum(top_k_desc(scores, k)) / F.lit(max_score)
