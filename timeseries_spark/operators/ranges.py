"""Interval (range) join: match points to the intervals containing them.

Spark plans a raw inequality join (``p >= lo AND p <= hi``) as a
nested-loop/cartesian — quadratic, and the classic scale trap. The
bucketized plan makes it an equi join:

1. pick a bucket width; each point belongs to bucket ``floor(p / w)``;
2. explode every interval into the buckets it overlaps
   (``sequence(floor(lo/w), floor(hi/w))``);
3. equi-join on the bucket (one hash shuffle), then re-check the exact
   containment predicate.

Cost: |points| + Σ(interval_span / w) shuffled rows, vs |points| × |intervals|
for the nested loop. Width tunes the tradeoff: narrower buckets replicate
long intervals more; wider buckets admit more false candidates into the
post-filter. Intervals tables small enough to broadcast skip all of this —
pass ``broadcast=True`` to use a broadcast inequality join instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float = 1.0,
    how: str = "inner",
    broadcast: bool = False,
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi`` (closed bounds).

    ``how='left'`` keeps unmatched points with NULL interval columns."""
    if broadcast:
        cond = (F.col(point_col) >= F.col(lo_col)) & (
            F.col(point_col) <= F.col(hi_col)
        )
        return points.join(F.broadcast(intervals), cond, how)

    b = F.lit(float(bucket_width))
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / b))
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b), F.floor(F.col(hi_col) / b)
            )
        ),
    )
    joined = p.join(i, "__bucket", how)
    contained = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) <= F.col(hi_col)
    )
    if how == "inner":
        return joined.filter(contained).drop("__bucket")
    # left: null out interval columns on bucket-collisions that fail the
    # exact predicate, then dedupe points that matched nothing
    ival_cols = [c for c in intervals.columns]
    nulled = joined.select(
        *[c for c in points.columns],
        *[
            F.when(contained, F.col(c)).alias(c)
            for c in ival_cols
        ],
    )
    matched = nulled.filter(F.col(lo_col).isNotNull())
    unmatched = (
        nulled.join(
            matched.select(*points.columns).distinct(),
            points.columns,
            "left_anti",
        )
        .select(*points.columns)
        .distinct()
        .select(
            "*", *[F.lit(None).cast(intervals.schema[c].dataType).alias(c) for c in ival_cols]
        )
    )
    return matched.unionByName(unmatched)
