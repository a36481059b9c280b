"""Classic time-series resampling / smoothing / anomaly kernels.

The reference engine stops at yearly cumulative scores + novelty peaks
(timeseries.py:441-635); a general time-series engine also needs the
bread-and-butter ops every monitoring / feature pipeline runs: OHLC
resampling, gap filling with interpolation, exponential smoothing, and
rolling-window anomaly scores. All four are pure DataFrame compositions
(no UDFs, no driver collects):

- ``resample_ohlc`` is a single hash aggregation with map-side partial
  combine (``min_by/max_by`` on a (ts, tiebreak) struct key) — one
  shuffle at bucket grain, deterministic under timestamp ties.
- ``linear_interpolate`` uses two IGNORE NULLS windows (last non-null
  behind, first non-null ahead) over the densified series — state per
  key is O(1), no collect of the series.
- ``ema`` evaluates the exponential recurrence in closed form over the
  ordered prefix array: ema_p = (1-a)^(p-1)·x_1 + Σ_{j=2..p}
  a·(1-a)^(p-j)·x_j. Per-key state is the series prefix — bounded by
  the series length per key (days/years), the same bounded-state
  argument as the flagship's cumulative score arrays, NOT by the raw
  event count (aggregate to series grain first).
- ``rolling_zscore`` is a fixed ROWS window (trailing n buckets), so
  state per key is O(n) regardless of history length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_ohlc(
    df: DataFrame,
    keys: Sequence[str],
    bucket: Column,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Downsample to OHLC bars per (keys, bucket).

    open/close are the values at the earliest/latest (ts, tiebreak) in
    the bucket — the struct key makes the pick deterministic even under
    timestamp collisions. One shuffle, partial-aggregated map-side.
    """
    order_key = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return (
        df.select(*keys, bucket.alias("bucket"), ts_col, tiebreak_col, value_col)
        .groupBy(*keys, "bucket")
        .agg(
            F.min_by(value_col, order_key).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, order_key).alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 2).alias("total"),
        )
    )


def linear_interpolate(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    value_col: str,
    out_col: str = "filled",
) -> DataFrame:
    """Fill NULL gaps in a (already densified) series by linear
    interpolation between the nearest non-null neighbors; runs off
    either edge fall back to nearest-value fill. Two windows over the
    same partitioning — a single sort-shuffle, O(1) state per key.
    """
    t = F.col(time_col).cast("double")
    pt = F.when(
        F.col(value_col).isNotNull(), F.struct(t.alias("t"), F.col(value_col).alias("v"))
    )
    behind = Window.partitionBy(*keys).orderBy(time_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ahead = Window.partitionBy(*keys).orderBy(time_col).rowsBetween(
        0, Window.unboundedFollowing
    )
    prev = F.last(pt, ignorenulls=True).over(behind)
    nxt = F.first(pt, ignorenulls=True).over(ahead)
    lerp = prev["v"] + (nxt["v"] - prev["v"]) * (t - prev["t"]) / (
        nxt["t"] - prev["t"]
    )
    return df.withColumn(
        out_col,
        F.round(
            F.when(F.col(value_col).isNotNull(), F.col(value_col))
            .when(prev.isNotNull() & nxt.isNotNull(), lerp)
            .when(prev.isNotNull(), prev["v"])
            .when(nxt.isNotNull(), nxt["v"]),
            4,
        ),
    )


def ema(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float,
    out_col: str = "ema",
) -> DataFrame:
    """Exponential moving average, ema_t = a·x_t + (1-a)·ema_{t-1} with
    ema_1 = x_1, evaluated per row as a left fold of the recurrence over
    the ordered prefix array (no iterative jobs). The fold applies
    exactly `a·x + (1-a)·acc` element-by-element — plain IEEE double
    ops in a fixed order, so any engine replaying the same fold lands
    on bit-identical results (no libm pow involved). Apply at series
    grain (one row per key × bucket), where the prefix array is bounded
    by the series length — not at raw-event grain. Values must be
    non-null (collect_list silently skips NULLs, which would misalign
    the prefix against the row positions) — densify + interpolate
    first if the series has gaps.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    w = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    xs = F.collect_list(F.col(value_col).cast("double")).over(w)
    a = float(alpha)
    # first-element init (acc NULL -> seed with x) mirrors DuckDB's
    # list_reduce semantics, keeping the oracle replay fold-for-fold
    expr = (
        f"aggregate(__xs, cast(null as double), (acc, x) -> "
        f"CASE WHEN acc IS NULL THEN x ELSE {a} * x + {1.0 - a} * acc END)"
    )
    # half-up-at-1e-4 via floor(x·1e4 + 0.5): plain double ops shared by
    # every engine, immune to round()'s half-even-vs-half-up divergence
    return (
        df.withColumn("__xs", xs)
        .withColumn(
            out_col,
            F.floor(F.expr(expr) * 10000 + F.lit(0.5)) / 10000,
        )
        .drop("__xs")
    )


def rolling_zscore(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    n_rows: int,
    z_thresh: float,
) -> DataFrame:
    """Trailing-window anomaly score: z of the current value against
    the mean/stddev of the last ``n_rows`` buckets (inclusive). z is
    NULL when the window has <2 points or zero variance; ``is_anomaly``
    is a strict |z| > threshold on non-null z. O(n_rows) state.
    """
    w = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(
        -(n_rows - 1), 0
    )
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    z = F.when(std > 0, (F.col(value_col) - mean) / std)
    return (
        df.withColumn("roll_mean", F.round(mean, 4))
        .withColumn("z", F.round(z, 4))
        .withColumn("is_anomaly", z.isNotNull() & (F.abs(z) > z_thresh))
    )


def rolling_median(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    n_rows: int,
    out_col: str = "roll_median",
) -> DataFrame:
    """Robust trailing-window center: exact median of the last
    ``n_rows`` values (inclusive) via an order-statistic on the sorted
    window array — O(n_rows) state per key, immune to the single-spike
    distortion a rolling MEAN suffers. Median of an even window is the
    mean of the two central order stats; NULL values are skipped (the
    median of the values present), and an all-NULL window yields NULL.
    Deterministic: the sorted array and the index arithmetic are
    identical in any engine."""
    if n_rows < 1:
        raise ValueError(f"n_rows must be >= 1, got {n_rows}")
    w = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(
        -(n_rows - 1), 0
    )
    xs = F.array_sort(F.collect_list(F.col(value_col).cast("double")).over(w))
    n = F.size(xs)
    mid_hi = ((n + 2) / 2).cast("int")  # 1-based upper-middle
    mid_lo = ((n + 1) / 2).cast("int")  # 1-based lower-middle
    med = F.when(n == 0, F.lit(None).cast("double")).when(
        n % 2 == 1, F.element_at(xs, mid_lo)
    ).otherwise(
        (F.element_at(xs, mid_lo) + F.element_at(xs, mid_hi)) / 2
    )
    return df.withColumn(out_col, med)
