"""As-of join: attach to each left row the most recent right row at or
before its event time, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the brief's canonical
"operator Spark lacks". The idiomatic composition — no UDF, no range
self-join blowup — is the union-and-carry-forward plan:

1. stack right rows (carrying their payload) and left rows (payload NULL)
   into one frame, tagged by side;
2. one window per key ordered by (time, right-before-left on ties):
   ``last(payload, ignorenulls=True)`` carries the latest right payload
   forward onto every subsequent left row;
3. keep the left rows.

The payload is ONE struct of all value columns plus the right timestamp,
so the carried match is always the single latest right row — a right row
whose value columns are NULL still wins (its struct is non-null), and
multiple value columns can never mix rows. This is DuckDB's ASOF
semantics exactly: latest row's values, NULLs included.

Cost: ONE shuffle of |left| + |right| on the key — the same price as a
plain equi join, regardless of how far back matches reach. The naive
alternative (range join ``l.t >= r.t`` + argmax) is quadratic per key.
Tie semantics match DuckDB's ``ASOF JOIN`` (>=): a right row exactly at
the left timestamp matches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``value_cols`` from the
    latest ``right`` row with ``right_time <= left_time`` on the same key
    (NULLs when no prior right row exists).

    ``tolerance`` (same units as the time columns) drops matches older
    than ``left_time - tolerance`` — the standard staleness bound."""
    on = list(on)
    values = list(value_cols)

    # one struct per right row: all payload columns + the row's timestamp.
    # last(ignorenulls) over the STRUCT treats a right row with NULL
    # payload fields as a real (non-null) match, and guarantees every
    # projected field comes from the same — latest — right row.
    r = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_r"),
        F.struct(
            F.col(right_time).alias("__rt"),
            *[F.col(c).alias(c) for c in values],
        ).alias("__pay"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns if c not in on],
    )
    pay_type = r.schema["__pay"].dataType
    l = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_r"),
        F.lit(None).cast(pay_type).alias("__pay"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c not in on],
    )
    # right rows sort before left rows at equal time => ">=" tie semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__is_r").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = r.unionByName(l).withColumn(
        "__cp", F.last("__pay", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__is_r") == 0)
    if tolerance is not None:
        fresh = F.col("__cp.__rt") >= F.col("__t") - tolerance
        vals = [F.when(fresh, F.col(f"__cp.{c}")).alias(c) for c in values]
    else:
        vals = [F.col(f"__cp.{c}").alias(c) for c in values]
    return out.select(
        *on,
        F.col("__t").alias(left_time),
        *[
            F.col(f"__l_{c}").alias(c)
            for c in left.columns
            if c not in on and c != left_time
        ],
        *vals,
    )
