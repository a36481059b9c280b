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


def counter_rate(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    counter_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-interval increase + per-second rate of a monotonic counter
    with resets (the Prometheus ``increase``/``rate`` semantics): the
    increase between consecutive samples is ``v - lag(v)`` unless the
    counter went DOWN (a process restart reset it to zero), in which
    case the post-reset value itself is the best lower bound on the
    increase. First sample per key has no predecessor -> NULL. A single
    keyed lag window — O(1) state per key, no SinglePartition.
    """
    order = [F.col(order_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_v = F.lag(counter_col).over(w)
    prev_t = F.lag(F.col(order_col)).over(w)
    cur = F.col(counter_col)
    inc = F.when(prev_v.isNull(), F.lit(None).cast("double")).when(
        cur >= prev_v, (cur - prev_v).cast("double")
    ).otherwise(cur.cast("double"))
    dt = (F.col(order_col) - prev_t).cast("double")
    return (
        df.withColumn("increase", inc)
        .withColumn(
            "rate",
            F.when(dt > 0, F.round(inc / dt, 6)),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    keys: Sequence[str],
    ts_micros_col: str,
    value_col: str,
    bucket_end_micros_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Time-weighted average of an irregularly-sampled gauge per key:
    each sample holds its value until the next sample (step/LOCF
    semantics), the last sample extends to the bucket end, and the
    average weights each value by the integer-microsecond duration it
    held. The classic continuous-aggregate kernel for irregular series
    where a plain AVG over-weights bursts of samples. One lead window +
    one hash agg on the same key — integer duration math, so the only
    float op is the final weighted division.
    """
    w = Window.partitionBy(*keys).orderBy(ts_micros_col, tiebreak_col)
    nxt_t = F.lead(F.col(ts_micros_col)).over(w)
    dur = F.coalesce(nxt_t, F.col(bucket_end_micros_col)) - F.col(
        ts_micros_col
    )
    return (
        df.withColumn("__dur", dur)
        .groupBy(*keys)
        .agg(
            F.round(
                F.sum(F.col(value_col) * F.col("__dur"))
                / F.sum("__dur"),
                6,
            ).alias("twa"),
            F.round(F.avg(value_col), 6).alias("plain_avg"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


def downsample_m4(
    df: DataFrame,
    keys: Sequence[str],
    bucket: Column,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """M4 visualization-oriented downsampling (Jugel et al., VLDB 2014):
    per (key, pixel bucket) keep the first, last, minimum and maximum
    samples WITH their timestamps — the 4 points per pixel column that
    make the downsampled line render pixel-identically to the full
    series. Unlike OHLC (values only), M4 preserves the extremes'
    x-coordinates. Single min_by/max_by hash aggregation — one shuffle
    at bucket grain, deterministic under value/timestamp ties via the
    (value|ts, ts|tiebreak) struct orderings.
    """
    t = F.col(ts_col)
    tb = F.col(tiebreak_col)
    v = F.col(value_col)
    time_key = F.struct(t, tb)
    min_key = F.struct(v, t, tb)  # ties -> earliest sample wins
    return (
        df.select(*keys, bucket.alias("bucket"), ts_col, tiebreak_col, value_col)
        .groupBy(*keys, "bucket")
        .agg(
            F.min_by(t, time_key).alias("t_first"),
            F.min_by(v, time_key).alias("v_first"),
            F.max_by(t, time_key).alias("t_last"),
            F.max_by(v, time_key).alias("v_last"),
            F.min_by(t, min_key).alias("t_min"),
            F.min(v).alias("v_min"),
            F.max_by(t, min_key).alias("t_max"),
            F.max(v).alias("v_max"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def series_gaps(
    df: DataFrame,
    keys: Sequence[str],
    tick_col: str,
    expected_step: int = 1,
) -> DataFrame:
    """Missing-data detection on a regularly-ticked series: for each
    consecutive pair of PRESENT ticks whose distance exceeds the
    expected step, emit the gap (first missing tick, last missing tick,
    length). The monitoring primitive behind 'which days did this feed
    not deliver'. One keyed lead window + a filter — rows out ≤ rows
    in, no densification needed (the scaffold variant would materialize
    the full grid just to drop it).
    """
    if expected_step < 1:
        raise ValueError(f"expected_step must be >= 1, got {expected_step}")
    w = Window.partitionBy(*keys).orderBy(tick_col)
    nxt = F.lead(F.col(tick_col)).over(w)
    return (
        df.select(*keys, tick_col)
        .withColumn("__next", nxt)
        .filter(F.col("__next") - F.col(tick_col) > expected_step)
        .select(
            *keys,
            (F.col(tick_col) + expected_step).alias("gap_start"),
            (F.col("__next") - expected_step).alias("gap_end"),
            ((F.col("__next") - F.col(tick_col)) / expected_step - 1)
            .cast("long")
            .alias("n_missing"),
        )
    )


def cusum(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    round_dp: int = 4,
) -> DataFrame:
    """Two-sided CUSUM change-point statistic against each series' own
    mean: s⁺_t = max(0, s⁺_{t-1} + (x_t - μ)) accumulates upward level
    shifts, s⁻_t the downward ones — a sustained shift grows the
    statistic linearly while zero-mean noise keeps collapsing it to 0
    (Page 1954). The recurrence is a left fold over the ordered prefix
    array (the ema discipline: plain double ops in a fixed order, so
    any engine replaying the fold matches bit-for-bit); per-key state
    is the series prefix, bounded by series length — apply at series
    grain, not event grain. μ is the key's own full-series mean, so
    the statistic is self-calibrating across series of different
    scales; thresholding (typically h·σ) is the caller's policy.
    """
    mean = F.avg(F.col(value_col).cast("double")).over(
        Window.partitionBy(*keys)
    )
    w = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    xs = F.collect_list(F.col(value_col).cast("double") - mean).over(w)
    up = F.aggregate(
        xs, F.lit(0.0), lambda acc, x: F.greatest(F.lit(0.0), acc + x)
    )
    dn = F.aggregate(
        xs, F.lit(0.0), lambda acc, x: F.greatest(F.lit(0.0), acc - x)
    )
    return df.withColumn("cusum_up", F.round(up, round_dp)).withColumn(
        "cusum_down", F.round(dn, round_dp)
    )


def _array_median(xs: Column) -> Column:
    """Exact median of a sorted double array as an order statistic —
    NULL for an empty array, the center element for odd length, the
    mean of the two central elements for even length."""
    n = F.size(xs)
    mid_hi = ((n + 2) / 2).cast("int")
    mid_lo = ((n + 1) / 2).cast("int")
    return F.when(n == 0, F.lit(None).cast("double")).when(
        n % 2 == 1, F.element_at(xs, mid_lo)
    ).otherwise(
        (F.element_at(xs, mid_lo) + F.element_at(xs, mid_hi)) / 2
    )


def rolling_mad_score(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    n_rows: int,
    score_thresh: float,
) -> DataFrame:
    """Robust trailing-window anomaly score: |x - median| / (1.4826 ·
    MAD), where MAD is the median absolute deviation over the last
    ``n_rows`` values. The robust twin of rolling_zscore — a single
    prior spike inflates a mean/stddev window enough to mask the next
    spike, but the median/MAD pair shrugs off up to half the window
    being garbage. 1.4826 scales MAD to stddev-equivalent units for a
    normal series, so the same threshold works for both scorers. Score
    is NULL when MAD is zero (constant window). Two array order
    statistics over one O(n_rows) ROWS window — no second shuffle.
    """
    if n_rows < 1:
        raise ValueError(f"n_rows must be >= 1, got {n_rows}")
    w = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(
        -(n_rows - 1), 0
    )
    xs = F.array_sort(F.collect_list(F.col(value_col).cast("double")).over(w))
    med = _array_median(xs)
    devs = F.array_sort(
        F.transform(xs, lambda x: F.abs(x - med))
    )
    mad = _array_median(devs)
    score = F.when(
        mad > 0,
        F.abs(F.col(value_col) - med) / (F.lit(1.4826) * mad),
    )
    return (
        df.withColumn("roll_med", med)
        .withColumn("mad", mad)
        .withColumn("robust_score", F.round(score, 4))
        .withColumn(
            "is_anomaly", score.isNotNull() & (score > score_thresh)
        )
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
    return df.withColumn(out_col, _array_median(xs))


def psi_drift(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    split_col: Column,
    lo: float,
    hi: float,
    n_bins: int,
    smoothing: float = 0.5,
) -> DataFrame:
    """Population Stability Index between a baseline and a comparison
    slice of each series: PSI = Σ_bins (p̂_i - q̂_i)·ln(p̂_i/q̂_i) over a
    fixed value grid, the standard drift monitor for feature / score
    distributions (PSI < 0.1 stable, > 0.25 shifted). ``split_col``
    must evaluate to 0 (baseline) or 1 (comparison). Shares are add-k
    smoothed so empty bins stay finite and the statistic is defined
    even for disjoint supports. One (keys, bin) hash aggregation with
    conditional sums, then a per-key reduction over ≤ n_bins rows —
    the same mergeable-sketch scale shape as histogram_counts.
    """
    if n_bins < 1 or not hi > lo:
        raise ValueError(
            f"need hi > lo and n_bins >= 1, got [{lo}, {hi}) x {n_bins}"
        )
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    b = F.floor((v - lo) / width).cast("int")
    b = F.when(b < 0, 0).when(b > n_bins - 1, n_bins - 1).otherwise(b)
    side = split_col.cast("int")
    bins = (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .select(*keys, b.alias("__bin"), side.alias("__side"))
        .groupBy(*keys, "__bin")
        .agg(
            F.sum(F.when(F.col("__side") == 0, 1).otherwise(0)).alias("__n0"),
            F.sum(F.when(F.col("__side") == 1, 1).otherwise(0)).alias("__n1"),
        )
    )
    tot = Window.partitionBy(*keys)
    k = float(smoothing)
    denom0 = F.sum("__n0").over(tot).cast("double") + F.lit(k * n_bins)
    denom1 = F.sum("__n1").over(tot).cast("double") + F.lit(k * n_bins)
    p = (F.col("__n0").cast("double") + F.lit(k)) / denom0
    q = (F.col("__n1").cast("double") + F.lit(k)) / denom1
    terms = bins.select(
        *keys,
        F.col("__n0"),
        F.col("__n1"),
        ((p - q) * F.log(p / q)).alias("__term"),
    )
    return terms.groupBy(*keys).agg(
        F.round(F.sum("__term"), 6).alias("psi"),
        F.sum("__n0").alias("n_baseline"),
        F.sum("__n1").alias("n_compare"),
    )


def seasonal_naive_eval(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    season: int,
) -> DataFrame:
    """Forecast-baseline evaluation: per key, the mean absolute error
    of the naive forecast (yesterday's value) and the seasonal-naive
    forecast (the value one season ago), plus their ratio — the MASE
    denominator/numerator pair that tells an engineer whether a series
    even HAS exploitable seasonality before any model is fit. Only
    ticks where BOTH forecasts exist are scored, so the two MAEs
    compare on identical rows. Two lag windows over one key sort.
    """
    if season < 2:
        raise ValueError(f"season must be >= 2, got {season}")
    w = Window.partitionBy(*keys).orderBy(order_col)
    x = F.col(value_col).cast("double")
    naive = F.lag(x, 1).over(w)
    seasonal = F.lag(x, season).over(w)
    scored = df.select(
        *keys,
        F.when(
            naive.isNotNull() & seasonal.isNotNull(),
            F.abs(x - naive),
        ).alias("__e1"),
        F.when(
            naive.isNotNull() & seasonal.isNotNull(),
            F.abs(x - seasonal),
        ).alias("__es"),
    )
    mae1 = F.sum("__e1") / F.count("__e1")
    maes = F.sum("__es") / F.count("__es")
    return scored.groupBy(*keys).agg(
        F.round(mae1, 6).alias("mae_naive"),
        F.round(maes, 6).alias("mae_seasonal"),
        F.round(
            F.when(mae1 > 0, maes / mae1), 6
        ).alias("seasonal_vs_naive"),
        F.count("__e1").alias("n_scored"),
    )


def holt_linear(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float,
    gamma: float,
) -> DataFrame:
    """Holt's double-exponential smoothing: level l_t = α·x_t +
    (1-α)·(l_{t-1} + b_{t-1}) and trend b_t = γ·(l_t - l_{t-1}) +
    (1-γ)·b_{t-1}, seeded l_1 = x_1, b_1 = 0 — the one-step-ahead
    forecaster (l_t + b_t) for trending series that a plain EMA lags
    behind. Like ``ema``, the two-variable recurrence is a left fold
    over the ordered prefix array with a struct accumulator — plain
    double ops in a fixed order (no libm), so any engine replaying
    the fold is bit-identical; state is bounded by series length
    (apply at series grain). Values must be non-null (densify first).
    Output columns: level, trend, forecast_next (4dp floor-snapped).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not 0.0 < gamma <= 1.0:
        raise ValueError(f"gamma must be in (0, 1], got {gamma}")
    w = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    xs = F.collect_list(F.col(value_col).cast("double")).over(w)
    a, g = float(alpha), float(gamma)
    # the new level appears inside the trend update too — inline it
    # verbatim so the oracle fold replays the exact same double ops
    new_l = f"({a} * e + {1.0 - a} * (acc.l + acc.b))"
    fold = (
        "aggregate(__xs, "
        "cast(null as struct<x: double, l: double, b: double>), "
        "(acc, e) -> CASE WHEN acc IS NULL THEN "
        "named_struct('x', e, 'l', e, 'b', cast(0.0 as double)) "
        "ELSE named_struct('x', e, "
        f"'l', {new_l}, "
        f"'b', {g} * ({new_l} - acc.l) + {1.0 - g} * acc.b) END)"
    )
    snap = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    res = F.expr(fold)
    return (
        df.withColumn("__xs", xs)
        .withColumn("level", snap(res["l"]))
        .withColumn("trend", snap(res["b"]))
        .withColumn("forecast_next", snap(res["l"] + res["b"]))
        .drop("__xs")
    )


def winsorize(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    p_lo: float,
    p_hi: float,
) -> DataFrame:
    """Group-wise winsorization: clamp each value into its own group's
    [p_lo, p_hi] percentile band — the robust outlier treatment that
    keeps row count intact (unlike a filter) while bounding the moments
    a downstream mean/stddev sees. Two passes over the data sharing one
    key grain: an exact-percentile aggregate per key (at 100 TB swap
    ``percentile`` for ``approx_percentile``'s mergeable t-digest, the
    same opt-in as the exact distinct counts), broadcast back onto the
    rows when the key cardinality is dimension-sized. Adds ``clamped``
    and ``was_clipped``.
    """
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1, got {p_lo}, {p_hi}")
    bands = df.groupBy(*keys).agg(
        F.expr(f"percentile({value_col}, {p_lo})").alias("__lo"),
        F.expr(f"percentile({value_col}, {p_hi})").alias("__hi"),
    )
    v = F.col(value_col)
    return (
        df.join(F.broadcast(bands), list(keys))
        .withColumn(
            "clamped",
            F.round(F.least(F.greatest(v, F.col("__lo")), F.col("__hi")), 4),
        )
        .withColumn(
            "was_clipped", (v < F.col("__lo")) | (v > F.col("__hi"))
        )
        .drop("__lo", "__hi")
    )


def holt_winters_additive(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float,
    gamma: float,
    delta: float,
    period: int,
) -> DataFrame:
    """Holt-Winters additive triple-exponential smoothing: level
    l_t = α·(x_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1}), trend
    b_t = γ·(l_t − l_{t−1}) + (1−γ)·b_{t−1}, season
    s_t = δ·(x_t − l_t) + (1−δ)·s_{t−m} — the classic forecaster for
    series with both drift and a repeating weekly/daily shape that
    Holt alone cannot track. Seeds follow the same convention as
    ``holt_linear`` (l_1 = x_1, b_1 = 0) with a zero seasonal vector,
    so the first ``period`` steps learn the season from scratch — a
    deterministic rule both engines replay exactly.

    The m seasonal components ride in the accumulator as a length-m
    queue (oldest first): each step consumes q[1] as s_{t−m} and
    appends s_t, so state is O(period) per row and the whole
    recurrence stays one ordered fold per series — same single
    key-grain exchange as ``ema``/``holt_linear``; no self-joins, no
    iteration. Values must be non-null (densify first). Output
    columns: level, trend, seasonal (s_t), forecast_next
    (l_t + b_t + s_{t+1−m}), all 4dp floor-snapped.

    The DuckDB oracle replays this as a RECURSIVE CTE carrying the
    queue as a DOUBLE[] — NOT a list_reduce fold, for the same
    in-place accumulator-mutation pitfall documented on
    ``holt_linear``.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not 0.0 < gamma <= 1.0:
        raise ValueError(f"gamma must be in (0, 1], got {gamma}")
    if not 0.0 < delta <= 1.0:
        raise ValueError(f"delta must be in (0, 1], got {delta}")
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    w = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    xs = F.collect_list(F.col(value_col).cast("double")).over(w)
    a, g, d, m = float(alpha), float(gamma), float(delta), int(period)
    # the new level feeds the trend AND season updates — inline it
    # verbatim everywhere so the oracle replays identical double ops
    new_l = (
        f"({a} * (e - element_at(acc.q, 1)) "
        f"+ {1.0 - a} * (acc.l + acc.b))"
    )
    new_s = f"({d} * (e - {new_l}) + {1.0 - d} * element_at(acc.q, 1))"
    fold = (
        "aggregate(__xs, "
        "cast(null as struct<l: double, b: double, q: array<double>>), "
        "(acc, e) -> CASE WHEN acc IS NULL THEN "
        "named_struct('l', e, 'b', cast(0.0 as double), "
        f"'q', array_repeat(cast(0.0 as double), {m})) "
        "ELSE named_struct("
        f"'l', {new_l}, "
        f"'b', {g} * ({new_l} - acc.l) + {1.0 - g} * acc.b, "
        f"'q', concat(slice(acc.q, 2, {m - 1}), array({new_s}))) END)"
    )
    snap = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    res = F.expr(fold)
    return (
        df.withColumn("__xs", xs)
        .withColumn("level", snap(res["l"]))
        .withColumn("trend", snap(res["b"]))
        .withColumn("seasonal", snap(F.element_at(res["q"], m)))
        .withColumn(
            "forecast_next",
            snap(res["l"] + res["b"] + F.element_at(res["q"], 1)),
        )
        .drop("__xs")
    )


def stl_decompose(
    df: DataFrame,
    key_cols: Sequence[str],
    day_col: str,
    value_col: str,
    period: int = 7,
    half_window: int = 3,
) -> DataFrame:
    """Additive seasonal-trend decomposition (classical moving-average
    STL, Cleveland et al. lineage — the textbook `decompose`):

        trend    = centered moving average of the series
                   (RANGE ±half_window on the integer day index)
        seasonal = phase means of the detrended series
                   (phase = day % period), centered so Σ seasonal = 0
        residual = value − trend − seasonal

    Returns (keys…, day, value, trend, seasonal, residual).

    Cross-engine exactness discipline (the snap-between-stages rule the
    power-iteration kernels use): the trend average runs on
    DECIMAL(18,2) sums (exact, order-independent) divided cast-to-
    double; the detrended series is snapped half-up at 1e-6 and
    re-quantized to decimal before the phase mean, so every later
    stage consumes exact inputs and both engines produce bit-equal
    doubles — residuals are emitted RAW.

    Scale shape: one key-grain window for the trend (RANGE frame,
    O(window) state per row), one (key, phase)-grain aggregate +
    key-grain mean for the seasonal — all shuffles on the series keys,
    nothing corpus-grain, no UDFs."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    if half_window < 1:
        raise ValueError(f"half_window must be >= 1, got {half_window}")
    keys = list(key_cols)
    snap6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("double") / 1e6  # noqa: E731
    w_tr = (
        Window.partitionBy(*keys)
        .orderBy(F.col(day_col))
        .rangeBetween(-half_window, half_window)
    )
    base = df.select(
        *keys, F.col(day_col).alias("day"), F.col(value_col).alias("value")
    ).withColumn(
        "trend",
        (
            F.sum(F.col("value").cast("decimal(18,2)")).over(w_tr)
        ).cast("double")
        / F.count(F.lit(1)).over(w_tr),
    ).withColumn(
        "detr_q",
        snap6(F.col("value") - F.col("trend")).cast("decimal(18,6)"),
    ).withColumn("phase", F.pmod(F.col("day"), F.lit(period)))
    phase_means = (
        base.groupBy(*keys, "phase")
        .agg(
            (
                F.sum("detr_q").cast("double")
                / F.count(F.lit(1))
            ).alias("pm_raw")
        )
        .withColumn("pm_q", snap6(F.col("pm_raw")).cast("decimal(18,6)"))
    )
    centers = phase_means.groupBy(*keys).agg(
        (
            F.sum("pm_q").cast("double") / F.count(F.lit(1))
        ).alias("pm_center")
    )
    seasonal = (
        phase_means.join(centers, keys)
        .select(
            *keys,
            "phase",
            snap6(
                F.col("pm_q").cast("double") - F.col("pm_center")
            ).alias("seasonal"),
        )
    )
    return (
        base.join(seasonal, [*keys, "phase"])
        .select(
            *keys,
            "day",
            "value",
            "trend",
            "seasonal",
            (
                F.col("value") - F.col("trend") - F.col("seasonal")
            ).alias("residual"),
        )
    )


def theil_sen_trend(
    df: DataFrame,
    key_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key robust linear trend: the Theil–Sen estimator — slope =
    median of all pairwise slopes (y_j − y_i)/(x_j − x_i), x_i < x_j —
    with up to ~29% outlier breakdown vs OLS's zero (Sen 1968, public).
    Intercept = median of the residuals y_i − slope·x_i (Sen's
    original — unlike median(y) − slope·median(x) it stays exact when
    an outlier shifts the marginal median). Returns (keys…, n_points,
    n_pairs, slope, intercept), snapped at 1e-6.

    Scale shape: the pairwise self-join is keyed on the series key and
    quadratic ONLY in the series length (points per key — days/years,
    bounded by the calendar), never in row count; the medians are
    exact-percentile aggregates at key grain. Cross-engine: pairwise
    slopes are identical doubles (exact inputs), and both engines
    interpolate the even-count median as lower + 0.5·(upper−lower);
    the 1e-6 snap absorbs any last-ulp interpolation difference."""
    keys = list(key_cols)
    snap6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("double") / 1e6  # noqa: E731
    pts = df.select(
        *keys,
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    a = pts
    b = pts.select(
        *keys, F.col("x").alias("x2"), F.col("y").alias("y2")
    )
    slopes = (
        a.join(b, keys)
        .where(F.col("x") < F.col("x2"))
        .select(
            *keys,
            (
                (F.col("y2") - F.col("y")) / (F.col("x2") - F.col("x"))
            ).alias("pair_slope"),
        )
    )
    med_slope = slopes.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr("percentile(pair_slope, 0.5)").alias("ms"),
    )
    resid = pts.join(med_slope, keys).groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.first("n_pairs").alias("n_pairs"),
        F.first("ms").alias("ms"),
        F.expr("percentile(y - ms * x, 0.5)").alias("mr"),
    )
    return resid.select(
        *keys,
        "n_points",
        "n_pairs",
        snap6(F.col("ms")).alias("slope"),
        snap6(F.col("mr")).alias("intercept"),
    )


def weighted_median(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Per-key lower weighted median: the smallest value whose
    cumulative weight reaches half the total — the robust center for
    weighted corpora (docs weighted by tokens, orders by price). Exact
    and interpolation-free, so ties and engine replay are trivial:
    the (value, weight) order is total via the value sort and the
    decimal cumulative sums are order-independent.

    One key-grain sort window (cumulative decimal weight) + one
    key-grain aggregate (min qualifying value) — no global windows, no
    collect. A NEGATIVE weight breaks the cumulative-mass construction
    and raises at runtime (guard folded into the weight — an unused
    guard column would be pruned); zero-total keys yield NULL (no mass
    to locate a median in)."""
    keys = list(key_cols)
    wdec = F.when(
        F.col(weight_col) < 0,
        F.raise_error(
            F.lit("weighted_median: negative weight")
        ).cast("decimal(18,4)"),
    ).otherwise(F.col(weight_col).cast("decimal(18,4)"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("v"), F.col("wt"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        df.select(*keys, F.col(value_col).alias("v"), wdec.alias("wt"))
        .withColumn("cw", F.sum("wt").over(w))
        .withColumn(
            "tw", F.sum("wt").over(Window.partitionBy(*keys))
        )
    )
    return (
        cum.groupBy(*keys)
        .agg(
            F.min(
                F.when(
                    (F.col("tw") > 0)
                    & (F.col("cw") * 2 >= F.col("tw")),
                    F.col("v"),
                )
            ).alias("weighted_median"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.first("tw").cast("double").alias("total_weight"),
        )
    )
