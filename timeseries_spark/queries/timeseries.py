"""Time-series toolkit queries over the events table (beyond the
reference's yearly score/novelty kernels): OHLC resampling, gap-fill
with linear interpolation, exponential smoothing, rolling anomaly
scores. All pure DataFrame plans — see operators/timeseries.py for the
scale-shape notes (single-shuffle aggs, O(1)/O(n) window state).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_spark.operators.scaffold import dense_scaffold, year_spine
from timeseries_spark.operators.timeseries import (
    counter_rate,
    cusum,
    downsample_m4,
    ema,
    linear_interpolate,
    resample_ohlc,
    rolling_mad_score,
    rolling_median,
    rolling_zscore,
    series_gaps,
    time_weighted_avg,
)
from timeseries_spark.queries import load, query

# value > _SPARSE_MIN keeps ~1% of events: 10-19 of 31 days present per
# type at sf0.01, so interpolation gaps genuinely bind at the gate scale
_SPARSE_MIN = 230.0

# epoch micros without a session-zone round trip: timestampdiff works on
# TIMESTAMP and TIMESTAMP_NTZ alike (unix_micros rejects NTZ, and a cast
# to TIMESTAMP would shift by the session zone's utc offset); the NTZ
# normalization makes the expression valid whichever type load() yields
_EPOCH_US = (
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
    "cast({col} as timestamp_ntz))"
)


def _epoch_us(col: str) -> F.Column:
    return F.expr(_EPOCH_US.format(col=col))


@query(
    "resample_ohlc",
    oracle="""
    WITH ranked AS (
      SELECT event_type, day(ts) AS day, value,
             row_number() OVER (PARTITION BY event_type, day(ts)
                                ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (PARTITION BY event_type, day(ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events
    )
    SELECT event_type, day AS bucket,
           max(CASE WHEN rn_open = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_close = 1 THEN value END) AS close,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM ranked
    GROUP BY event_type, day
    """,
)
def resample_ohlc_daily(spark, sf_dir):
    """OHLC downsampling to daily bars per event_type: first/last value
    by (ts, event_id) plus high/low/count/total — a single min_by/max_by
    hash aggregation (one shuffle, map-side partials), not a sort."""
    events = load(spark, sf_dir, "events")
    return resample_ohlc(
        events,
        keys=["event_type"],
        bucket=F.dayofmonth("ts"),
        ts_col="ts",
        value_col="value",
        tiebreak_col="event_id",
    )


_DAILY_SPARSE = f"""
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events WHERE value > {_SPARSE_MIN} GROUP BY event_type, day(ts)
"""


@query(
    "gapfill_interpolate",
    oracle=f"""
    WITH facts AS ({_DAILY_SPARSE}),
    spine AS (SELECT unnest(generate_series(1, 31)) AS day),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT * FROM types CROSS JOIN spine),
    dense AS (
      SELECT g.event_type, g.day, f.total
      FROM grid g LEFT JOIN facts f USING (event_type, day)
    ),
    nn AS (
      SELECT event_type, day, total,
             last_value(CASE WHEN total IS NOT NULL THEN
                 struct_pack(t := CAST(day AS DOUBLE), v := total) END
               IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
             first_value(CASE WHEN total IS NOT NULL THEN
                 struct_pack(t := CAST(day AS DOUBLE), v := total) END
               IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
      FROM dense
    )
    SELECT event_type, day, total,
           round(CASE
             WHEN total IS NOT NULL THEN total
             WHEN prev IS NOT NULL AND nxt IS NOT NULL THEN
               prev.v + (nxt.v - prev.v) * (CAST(day AS DOUBLE) - prev.t)
                 / (nxt.t - prev.t)
             WHEN prev IS NOT NULL THEN prev.v
             WHEN nxt IS NOT NULL THEN nxt.v
           END, 4) AS filled
    FROM nn
    """,
)
def gapfill_interpolate(spark, sf_dir):
    """Densify a sparse daily series (value > threshold keeps ~1% of
    events) onto the full day spine, then linearly interpolate interior
    gaps and nearest-fill the edges — two IGNORE NULLS windows, O(1)
    state per key (operators/timeseries.py:linear_interpolate)."""
    events = load(spark, sf_dir, "events")
    facts = (
        events.filter(F.col("value") > _SPARSE_MIN)
        .select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    spine = year_spine(
        events.sparkSession, 1, 31, include_sentinel=False
    ).withColumnRenamed("year", "day")
    dense = dense_scaffold(facts, ["event_type"], spine, "day").select(
        "event_type", "day", "total"
    )
    return linear_interpolate(
        dense, keys=["event_type"], time_col="day", value_col="total"
    )


@query(
    "ema_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    ),
    pfx AS (
      SELECT event_type, day, total,
             list(total) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS xs
      FROM daily
    )
    SELECT event_type, day, total,
           floor(list_reduce(xs, (acc, x) -> 0.3 * x + 0.7 * acc)
                 * 10000 + 0.5) / 10000 AS ema
    FROM pfx
    """,
)
def ema_daily(spark, sf_dir):
    """Exponential moving average (alpha = 0.3) of the daily per-type
    totals, evaluated as a left fold of the recurrence over the ordered
    prefix array — no iterative jobs, bounded by series length, and
    fold-for-fold identical to the oracle's list_reduce
    (operators/timeseries.py:ema)."""
    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return ema(daily, keys=["event_type"], order_col="day",
               value_col="total", alpha=0.3)


@query(
    "rolling_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    ),
    win AS (
      SELECT event_type, day, total,
             avg(total) OVER w AS m, stddev_samp(total) OVER w AS s
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, total,
           round(m, 4) AS roll_mean,
           round(CASE WHEN s > 0 THEN (total - m) / s END, 4) AS z,
           CASE WHEN s > 0 THEN abs((total - m) / s) > 2.0
                ELSE FALSE END AS is_anomaly
    FROM win
    """,
)
def rolling_anomaly(spark, sf_dir):
    """Trailing-7-day rolling z-score anomaly flags on the daily
    per-type totals — fixed ROWS window, O(7) state per key
    (operators/timeseries.py:rolling_zscore)."""
    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return rolling_zscore(
        daily, keys=["event_type"], order_col="day", value_col="total",
        n_rows=7, z_thresh=2.0,
    )


@query(
    "daily_series_correlation",
    oracle="""
    WITH daily AS (
      SELECT event_type, day(ts) AS day,
             CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2)
                  AS DECIMAL(18,2)) AS total
      FROM events GROUP BY event_type, day(ts)
    ),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(c.total) AS DOUBLE) AS sx,
             CAST(sum(p.total) AS DOUBLE) AS sy,
             CAST(sum(c.total * p.total) AS DOUBLE) AS sxy,
             CAST(sum(c.total * c.total) AS DOUBLE) AS sxx,
             CAST(sum(p.total * p.total) AS DOUBLE) AS syy,
             count(*) AS n_days
      FROM (SELECT day, total FROM daily WHERE event_type = 'click') c
      JOIN (SELECT day, total FROM daily WHERE event_type = 'purchase') p
        USING (day)
    )
    SELECT CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN floor((n * sxy - sx * sy)
                           / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                           * 1e6 + 0.5) / 1e6
           END AS corr_cp,
           CASE WHEN n > 1
                THEN floor((sxy - sx * sy / n) / (n - 1) * 1e6 + 0.5) / 1e6
           END AS cov_cp,
           n_days
    FROM m
    """,
)
def daily_series_correlation(spark, sf_dir):
    """Cross-series Pearson correlation + sample covariance between the
    click and purchase daily totals — the co-movement primitive of
    multi-series analytics, one day-grain equi-join plus a single
    global aggregate (1 output row), snapped at 1e-6.

    Determinism at scale (caught by the sf1 double-run digest gate,
    round 10): both the per-day double sum AND Spark's corr/covar merge
    are partial-order dependent, and at sf1 magnitudes the jitter
    crosses the 1e-6 snap boundary. All aggregation therefore runs on
    exact DECIMAL moments (order-independent); the correlation formula
    is evaluated in double ONCE at the end, with the identical
    expression on both engines."""
    events = load(spark, sf_dir, "events")
    dec = "decimal(38,6)"
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(
            F.round(F.sum(F.col("value").cast(dec)), 2)
            .cast("decimal(18,2)")  # bounded so products stay exact
            .alias("total")
        )
    )
    c = daily.filter(F.col("event_type") == "click").select(
        "day", F.col("total").alias("c_total")
    )
    p = daily.filter(F.col("event_type") == "purchase").select(
        "day", F.col("total").alias("p_total")
    )
    m = (
        c.join(p, "day")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("c_total").cast("double").alias("sx"),
            F.sum("p_total").cast("double").alias("sy"),
            F.sum(F.col("c_total") * F.col("p_total"))
            .cast("double")
            .alias("sxy"),
            F.sum(F.col("c_total") * F.col("c_total"))
            .cast("double")
            .alias("sxx"),
            F.sum(F.col("p_total") * F.col("p_total"))
            .cast("double")
            .alias("syy"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )
    snap = lambda col: (  # noqa: E731
        F.floor(col * 1e6 + F.lit(0.5)).cast("double") / 1e6
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    # degenerate guards (round-11 advice): with one joined day the
    # covariance denominator is n-1 = 0, and a constant series zeroes a
    # variance — the old corr/covar_samp builtins returned NULL there,
    # so the explicit-moment rewrite must too (CaseWhen evaluates its
    # branches lazily, keeping 0/0 = NaN out of the output); the oracle
    # SQL mirrors the same CASE WHEN
    return m.select(
        F.when(
            ((n * sxx - sx * sx) > 0) & ((n * syy - sy * sy) > 0),
            snap(
                (n * sxy - sx * sy)
                / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
            ),
        ).alias("corr_cp"),
        F.when(
            n > 1, snap((sxy - sx * sy / n) / (n - F.lit(1.0)))
        ).alias("cov_cp"),
        "n_days",
    )


@query(
    "rolling_median_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    ),
    win AS (
      SELECT event_type, day, total,
             list_sort(list(total) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS xs
      FROM daily
    )
    SELECT event_type, day, total,
           CASE WHEN len(xs) % 2 = 1
                THEN xs[CAST(floor((len(xs) + 1) / 2) AS INT)]
                ELSE (xs[CAST(floor((len(xs) + 1) / 2) AS INT)]
                      + xs[CAST(floor((len(xs) + 2) / 2) AS INT)]) / 2
           END AS roll_median
    FROM win
    """,
)
def rolling_median_daily(spark, sf_dir):
    """Trailing-7-day rolling MEDIAN of the daily per-type totals — the
    robust companion to rolling_anomaly's mean/stddev, computed as an
    order statistic over the sorted window array
    (operators/timeseries.py:rolling_median)."""
    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return rolling_median(
        daily, keys=["event_type"], order_col="day", value_col="total",
        n_rows=7,
    )


def _hourly_counter(spark, sf_dir):
    """Shared fixture for the counter queries: an hourly-sampled
    monotonic counter per event_type (cumulative event count on the
    linear hour tick) with resets injected by a mod-997 wrap — the
    restart-prone exported counter every metrics backend ingests."""
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    hourly = (
        events.select(
            "event_type",
            ((F.dayofmonth("ts") - 1) * 24 + F.hour("ts")).alias("tick"),
        )
        .groupBy("event_type", "tick")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("tick")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return hourly.select(
        "event_type", "tick", (F.sum("n").over(w) % 997).alias("counter")
    )


@query(
    "counter_rate_hourly",
    oracle="""
    WITH hourly AS (
      SELECT event_type, (day(ts) - 1) * 24 + hour(ts) AS tick,
             count(*) AS n
      FROM events GROUP BY event_type, tick
    ),
    ctr AS (
      SELECT event_type, tick,
             CAST(sum(n) OVER (PARTITION BY event_type ORDER BY tick
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) % 997
               AS BIGINT) AS counter
      FROM hourly
    ),
    lagd AS (
      SELECT event_type, tick, counter,
             lag(counter) OVER (PARTITION BY event_type ORDER BY tick) AS pv,
             lag(tick) OVER (PARTITION BY event_type ORDER BY tick) AS pt
      FROM ctr
    )
    SELECT event_type, tick, counter,
           CASE WHEN pv IS NULL THEN NULL
                WHEN counter >= pv THEN CAST(counter - pv AS DOUBLE)
                ELSE CAST(counter AS DOUBLE) END AS increase,
           CASE WHEN pt IS NOT NULL AND tick - pt > 0 THEN round(
             (CASE WHEN counter >= pv THEN CAST(counter - pv AS DOUBLE)
                   ELSE CAST(counter AS DOUBLE) END) / (tick - pt), 6)
           END AS rate
    FROM lagd
    """,
)
def counter_rate_hourly(spark, sf_dir):
    """Prometheus-style increase/rate over a resetting monotonic
    counter: per-hour increase is counter - lag(counter) unless the
    counter wrapped (restart), in which case the post-reset value lower
    bounds it; rate divides by the tick distance so missing hours don't
    inflate it (operators/timeseries.py:counter_rate)."""
    return counter_rate(
        _hourly_counter(spark, sf_dir),
        keys=["event_type"],
        order_col="tick",
        counter_col="counter",
    )


@query(
    "twa_daily",
    oracle="""
    WITH s AS (
      SELECT event_type, day(ts) AS day, epoch_us(ts) AS tus, event_id,
             value,
             epoch_us(date_trunc('day', ts) + INTERVAL 1 DAY) AS bucket_end
      FROM events
    ),
    d AS (
      SELECT event_type, day, value,
             coalesce(lead(tus) OVER (PARTITION BY event_type, day
                                      ORDER BY tus, event_id),
                      bucket_end) - tus AS dur
      FROM s
    )
    SELECT event_type, day,
           round(sum(value * dur) / sum(dur), 6) AS twa,
           round(avg(value), 6) AS plain_avg,
           count(*) AS n_samples
    FROM d GROUP BY event_type, day
    """,
)
def twa_daily(spark, sf_dir):
    """Time-weighted daily average of the event value gauge per type:
    each sample holds until the next one (LOCF), the last extends to
    midnight, and weights are integer microsecond durations — the
    irregular-sampling average a plain AVG gets wrong
    (operators/timeseries.py:time_weighted_avg)."""
    events = load(spark, sf_dir, "events")
    s = events.select(
        "event_type",
        F.dayofmonth("ts").alias("day"),
        _epoch_us("ts").alias("tus"),
        "event_id",
        "value",
        F.expr(
            _EPOCH_US.format(
                col="date_trunc('DAY', cast(ts as timestamp_ntz))"
                " + INTERVAL 1 DAY"
            )
        ).alias("bucket_end"),
    )
    return time_weighted_avg(
        s,
        keys=["event_type", "day"],
        ts_micros_col="tus",
        value_col="value",
        bucket_end_micros_col="bucket_end",
        tiebreak_col="event_id",
    )


@query(
    "downsample_m4",
    oracle="""
    WITH s AS (
      SELECT event_type, CAST(floor((day(ts) - 1) / 3) AS INT) AS bucket,
             epoch_us(ts) AS tus, event_id, value
      FROM events
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY tus, event_id) AS rf,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY tus DESC, event_id DESC) AS rl,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY value, tus, event_id) AS rmin,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY value DESC, tus DESC,
                                         event_id DESC) AS rmax
      FROM s
    )
    SELECT event_type, bucket,
           max(CASE WHEN rf = 1 THEN tus END) AS t_first,
           max(CASE WHEN rf = 1 THEN value END) AS v_first,
           max(CASE WHEN rl = 1 THEN tus END) AS t_last,
           max(CASE WHEN rl = 1 THEN value END) AS v_last,
           max(CASE WHEN rmin = 1 THEN tus END) AS t_min,
           min(value) AS v_min,
           max(CASE WHEN rmax = 1 THEN tus END) AS t_max,
           max(value) AS v_max,
           count(*) AS n
    FROM r GROUP BY event_type, bucket
    """,
)
def downsample_m4_q(spark, sf_dir):
    """M4 visualization downsampling (Jugel et al., VLDB 2014): per
    (event_type, 3-day pixel bucket) the first/last/min/max samples
    WITH their timestamps — the 4 points per pixel column that render
    identically to the full series. One min_by/max_by hash aggregation
    (operators/timeseries.py:downsample_m4)."""
    events = load(spark, sf_dir, "events")
    s = events.select(
        "event_type",
        F.floor((F.dayofmonth("ts") - 1) / 3).cast("int").alias("pix"),
        _epoch_us("ts").alias("tus"),
        "event_id",
        "value",
    )
    return downsample_m4(
        s,
        keys=["event_type"],
        bucket=F.col("pix"),
        ts_col="tus",
        value_col="value",
        tiebreak_col="event_id",
    ).drop("pix")


@query(
    "series_gaps_daily",
    oracle=f"""
    WITH facts AS ({_DAILY_SPARSE}),
    lagd AS (
      SELECT event_type, day,
             lead(day) OVER (PARTITION BY event_type ORDER BY day) AS nxt
      FROM facts
    )
    SELECT event_type, day + 1 AS gap_start, nxt - 1 AS gap_end,
           CAST(nxt - day - 1 AS BIGINT) AS n_missing
    FROM lagd WHERE nxt - day > 1
    """,
)
def series_gaps_daily(spark, sf_dir):
    """Missing-data report on the sparse daily series (same ~1% filter
    as gapfill_interpolate, so gaps genuinely bind): each run of absent
    days per type as (gap_start, gap_end, n_missing) — one keyed lead
    window, no densified grid (operators/timeseries.py:series_gaps)."""
    events = load(spark, sf_dir, "events")
    facts = (
        events.filter(F.col("value") > _SPARSE_MIN)
        .select("event_type", F.dayofmonth("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", "day")
    )
    return series_gaps(facts, keys=["event_type"], tick_col="day")


@query(
    "rolling_mad_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    ),
    win AS (
      SELECT event_type, day, total,
             list_sort(list(total) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS xs
      FROM daily
    ),
    med AS (
      SELECT *, CASE WHEN len(xs) % 2 = 1
                  THEN xs[CAST(floor((len(xs) + 1) / 2) AS INT)]
                  ELSE (xs[CAST(floor((len(xs) + 1) / 2) AS INT)]
                        + xs[CAST(floor((len(xs) + 2) / 2) AS INT)]) / 2
                END AS roll_med
      FROM win
    ),
    dev AS (
      SELECT *, list_sort(list_transform(xs, x -> abs(x - roll_med))) AS ds
      FROM med
    ),
    madc AS (
      SELECT event_type, day, total, roll_med,
             CASE WHEN len(ds) % 2 = 1
                  THEN ds[CAST(floor((len(ds) + 1) / 2) AS INT)]
                  ELSE (ds[CAST(floor((len(ds) + 1) / 2) AS INT)]
                        + ds[CAST(floor((len(ds) + 2) / 2) AS INT)]) / 2
             END AS mad
      FROM dev
    )
    SELECT event_type, day, total, roll_med, mad,
           round(CASE WHEN mad > 0
                      THEN abs(total - roll_med) / (1.4826 * mad) END,
                 4) AS robust_score,
           CASE WHEN mad > 0
                THEN abs(total - roll_med) / (1.4826 * mad) > 3.5
                ELSE FALSE END AS is_anomaly
    FROM madc
    """,
)
def rolling_mad_daily(spark, sf_dir):
    """Robust trailing-7-day anomaly score |x - median| / (1.4826·MAD)
    on the daily per-type totals — the outlier-resistant twin of
    rolling_anomaly: one prior spike can mask the next under
    mean/stddev but not under median/MAD
    (operators/timeseries.py:rolling_mad_score)."""
    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return rolling_mad_score(
        daily, keys=["event_type"], order_col="day", value_col="total",
        n_rows=7, score_thresh=3.5,
    )


@query(
    "cusum_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    ),
    dev AS (
      SELECT event_type, day, total,
             total - avg(total) OVER (PARTITION BY event_type) AS d
      FROM daily
    ),
    pfx AS (
      SELECT event_type, day, total,
             list(d) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS xs
      FROM dev
    )
    SELECT event_type, day, total,
           round(list_reduce(list_prepend(0.0::DOUBLE, xs),
                 (a, x) -> greatest(0.0, a + x)), 4) AS cusum_up,
           round(list_reduce(list_prepend(0.0::DOUBLE, xs),
                 (a, x) -> greatest(0.0, a - x)), 4) AS cusum_down
    FROM pfx
    """,
)
def cusum_daily(spark, sf_dir):
    """Two-sided CUSUM change-point statistic of the daily per-type
    totals against each series' own mean — sustained level shifts grow
    it linearly, noise collapses it to zero; evaluated as a left fold
    over the ordered prefix (operators/timeseries.py:cusum)."""
    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return cusum(daily, keys=["event_type"], order_col="day",
                 value_col="total")


@query(
    "series_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    )
    SELECT event_type,
           floor(regr_slope(total, day) * 1e6 + 0.5) / 1e6 AS slope,
           floor(regr_intercept(total, day) * 1e6 + 0.5) / 1e6
             AS intercept,
           floor(regr_r2(total, day) * 1e6 + 0.5) / 1e6 AS r2,
           count(*) AS n_days
    FROM daily GROUP BY event_type
    """,
)
def series_trend(spark, sf_dir):
    """Per-series linear trend: OLS slope / intercept / R² of the
    daily total against the day index — the 'is this metric drifting'
    one-liner, a single hash aggregation over the built-in regression
    aggregates (JVM-side partial combine, one shuffle at key grain),
    snapped at 1e-6."""
    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    snap = lambda col: (  # noqa: E731
        F.floor(col * 1e6 + F.lit(0.5)).cast("double") / 1e6
    )
    return daily.groupBy("event_type").agg(
        snap(F.regr_slope("total", "day")).alias("slope"),
        snap(F.regr_intercept("total", "day")).alias("intercept"),
        snap(F.regr_r2("total", "day")).alias("r2"),
        F.count(F.lit(1)).alias("n_days"),
    )


@query(
    "acf_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    ),
    lagd AS (
      SELECT event_type, total,
             lag(total, 1) OVER w AS l1,
             lag(total, 2) OVER w AS l2,
             lag(total, 3) OVER w AS l3
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type,
           floor(corr(total, l1) * 1e6 + 0.5) / 1e6 AS acf1,
           floor(corr(total, l2) * 1e6 + 0.5) / 1e6 AS acf2,
           floor(corr(total, l3) * 1e6 + 0.5) / 1e6 AS acf3,
           count(*) AS n_days
    FROM lagd GROUP BY event_type
    """,
)
def acf_daily(spark, sf_dir):
    """Autocorrelation of each daily series at lags 1-3 — the
    seasonality / persistence fingerprint (white noise ~0, trending
    series high acf1). One keyed lag window feeding one hash
    aggregation of built-in corr — two key-grain exchanges total,
    snapped at 1e-6."""
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagd = daily.select(
        "event_type",
        "total",
        F.lag("total", 1).over(w).alias("l1"),
        F.lag("total", 2).over(w).alias("l2"),
        F.lag("total", 3).over(w).alias("l3"),
    )
    snap = lambda col: (  # noqa: E731
        F.floor(col * 1e6 + F.lit(0.5)).cast("double") / 1e6
    )
    return lagd.groupBy("event_type").agg(
        snap(F.corr("total", "l1")).alias("acf1"),
        snap(F.corr("total", "l2")).alias("acf2"),
        snap(F.corr("total", "l3")).alias("acf3"),
        F.count(F.lit(1)).alias("n_days"),
    )


@query(
    "cusum_changepoint_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    ),
    ser AS (
      SELECT event_type, list(total ORDER BY day) AS vals
      FROM daily GROUP BY event_type
    ),
    stats AS (
      SELECT event_type, vals, len(vals) AS n,
        list_reduce(list_prepend(0.0::DOUBLE, vals), (a, v) -> a + v)
          / len(vals) AS mu
      FROM ser
    ),
    sig AS (
      SELECT *, sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(vals, v -> (v - mu) * (v - mu))),
          (a, v) -> a + v) / n) AS sigma
      FROM stats
    ),
    folded AS (
      -- field order is load-bearing: DuckDB's list_reduce evaluates
      -- struct_pack fields IN ORDER with the accumulator ALIASED
      -- (a later field reads an earlier field's UPDATED value - pinned
      -- by tests/test_round14.py's semantics probe). With (mp, sp, mn,
      -- sn) every expression reads only fields not yet written this
      -- step, so the fold is correct under BOTH aliasing and standard
      -- fold semantics; sp-first was silently wrong under aliasing.
      SELECT event_type, n, mu, sigma,
        list_reduce(
          list_prepend(
            struct_pack(mp := 0.0::DOUBLE, sp := 0.0::DOUBLE,
                        mn := 0.0::DOUBLE, sn := 0.0::DOUBLE),
            list_transform(vals, v ->
              struct_pack(mp := 0.0::DOUBLE, sp := v::DOUBLE,
                          mn := 0.0::DOUBLE, sn := 0.0::DOUBLE))),
          (acc, e) -> struct_pack(
            mp := greatest(acc.mp,
                    greatest(0.0, acc.sp + e.sp - mu - 0.5 * sigma)),
            sp := greatest(0.0, acc.sp + e.sp - mu - 0.5 * sigma),
            mn := greatest(acc.mn,
                    greatest(0.0, acc.sn + mu - e.sp - 0.5 * sigma)),
            sn := greatest(0.0, acc.sn + mu - e.sp - 0.5 * sigma))
        ) AS st
      FROM sig
    )
    SELECT event_type, n AS n_days,
           round(mu, 6) AS mu, round(sigma, 6) AS sigma,
           round(st.mp, 6) AS max_cusum_pos,
           round(st.mn, 6) AS max_cusum_neg,
           CAST(st.mp > 4 * sigma OR st.mn > 4 * sigma AS INT)
             AS changepoint
    FROM folded
    """,
)
def cusum_changepoint_daily(spark, sf_dir):
    """Two-sided CUSUM changepoint detection per daily series — the
    sequential drift monitor a 100 TB ingestion pipeline runs over its
    own volume/quality metrics: s⁺_t = max(0, s⁺_{t-1} + x_t − μ − κ)
    (and the mirrored s⁻), flagging when either excursion exceeds 4σ
    (κ = σ/2, the standard half-shift slack). The recursion is
    inherently sequential, so it runs as ONE per-key array fold over
    the day-sorted totals (the novelty-kernel idiom: collect, sort,
    F.aggregate with a struct state) — no window exchange, no
    per-row Python, and the fold order is identical in the DuckDB
    replay, so μ, σ, and both excursion maxima are bit-exact across
    engines before the 6dp snap."""
    events = load(spark, sf_dir, "events")
    daily = (
        events.select(
            "event_type", F.dayofmonth("ts").alias("day"), "value"
        )
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    zero4 = F.struct(
        F.lit(0.0).alias("sp"), F.lit(0.0).alias("mp"),
        F.lit(0.0).alias("sn"), F.lit(0.0).alias("mn"),
    )

    def step(acc, v):
        sp = F.greatest(
            F.lit(0.0),
            acc["sp"] + v - F.col("mu") - 0.5 * F.col("sigma"),
        )
        sn = F.greatest(
            F.lit(0.0),
            acc["sn"] + F.col("mu") - v - 0.5 * F.col("sigma"),
        )
        return F.struct(
            sp.alias("sp"),
            F.greatest(acc["mp"], sp).alias("mp"),
            sn.alias("sn"),
            F.greatest(acc["mn"], sn).alias("mn"),
        )

    return (
        daily.groupBy("event_type")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("day", "total"))
            ).alias("ser")
        )
        .withColumn(
            "vals", F.transform("ser", lambda s: s["total"])
        )
        .withColumn("n_days", F.size("vals"))
        .withColumn(
            "mu",
            F.aggregate("vals", F.lit(0.0), lambda a, v: a + v)
            / F.col("n_days"),
        )
        .withColumn(
            "sigma",
            F.sqrt(
                F.aggregate(
                    "vals",
                    F.lit(0.0),
                    lambda a, v: a
                    + (v - F.col("mu")) * (v - F.col("mu")),
                )
                / F.col("n_days")
            ),
        )
        .withColumn("st", F.aggregate("vals", zero4, step))
        .select(
            "event_type",
            "n_days",
            F.round("mu", 6).alias("mu"),
            F.round("sigma", 6).alias("sigma"),
            F.round(F.col("st.mp"), 6).alias("max_cusum_pos"),
            F.round(F.col("st.mn"), 6).alias("max_cusum_neg"),
            (
                (F.col("st.mp") > 4 * F.col("sigma"))
                | (F.col("st.mn") > 4 * F.col("sigma"))
            )
            .cast("int")
            .alias("changepoint"),
        )
    )


@query(
    "psi_value_drift",
    oracle="""
    WITH b AS (
      SELECT event_type,
             least(greatest(CAST(floor(value / 50.0) AS INT), 0), 9)
               AS bin,
             CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END AS side
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    c AS (
      SELECT event_type, bin,
             sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS n0,
             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS n1
      FROM b GROUP BY event_type, bin
    ),
    t AS (
      SELECT *, sum(n0) OVER (PARTITION BY event_type) AS t0,
                sum(n1) OVER (PARTITION BY event_type) AS t1
      FROM c
    )
    SELECT event_type,
           round(sum(
             ((CAST(n0 AS DOUBLE) + 0.5) / (CAST(t0 AS DOUBLE) + 5.0)
              - (CAST(n1 AS DOUBLE) + 0.5) / (CAST(t1 AS DOUBLE) + 5.0))
             * ln(((CAST(n0 AS DOUBLE) + 0.5) / (CAST(t0 AS DOUBLE) + 5.0))
                  / ((CAST(n1 AS DOUBLE) + 0.5)
                     / (CAST(t1 AS DOUBLE) + 5.0)))), 6) AS psi,
           CAST(sum(n0) AS BIGINT) AS n_baseline,
           CAST(sum(n1) AS BIGINT) AS n_compare
    FROM t GROUP BY event_type
    """,
)
def psi_value_drift(spark, sf_dir):
    """Population Stability Index of each type's value distribution,
    first half of the month vs second — the standard drift monitor
    (PSI < 0.1 stable), computed on a fixed 10-bin grid with add-0.5
    smoothing (operators/timeseries.py:psi_drift)."""
    from timeseries_spark.operators.timeseries import psi_drift

    events = load(spark, sf_dir, "events")
    return psi_drift(
        events,
        keys=["event_type"],
        value_col="value",
        split_col=F.when(F.dayofmonth("ts") <= 15, 0).otherwise(1),
        lo=0.0,
        hi=500.0,
        n_bins=10,
    )


@query(
    "seasonal_naive_eval",
    oracle="""
    WITH daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    ),
    lagd AS (
      SELECT event_type, total,
             lag(total, 1) OVER w AS f1,
             lag(total, 7) OVER w AS fs
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    scored AS (
      SELECT event_type,
             CASE WHEN f1 IS NOT NULL AND fs IS NOT NULL
                  THEN abs(total - f1) END AS e1,
             CASE WHEN f1 IS NOT NULL AND fs IS NOT NULL
                  THEN abs(total - fs) END AS es
      FROM lagd
    )
    SELECT event_type,
           round(sum(e1) / count(e1), 6) AS mae_naive,
           round(sum(es) / count(es), 6) AS mae_seasonal,
           round(CASE WHEN sum(e1) / count(e1) > 0 THEN
             (sum(es) / count(es)) / (sum(e1) / count(e1)) END, 6)
             AS seasonal_vs_naive,
           count(e1) AS n_scored
    FROM scored GROUP BY event_type
    """,
)
def seasonal_naive_eval_q(spark, sf_dir):
    """Forecast-baseline scorecard per daily series: MAE of the naive
    (lag-1) and seasonal-naive (lag-7) forecasts on the same rows,
    plus their ratio — whether a series has exploitable weekly
    structure before any model is fit
    (operators/timeseries.py:seasonal_naive_eval)."""
    from timeseries_spark.operators.timeseries import seasonal_naive_eval

    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return seasonal_naive_eval(
        daily, keys=["event_type"], order_col="day", value_col="total",
        season=7,
    )


@query(
    "holt_daily",
    # NOTE the oracle replays the recurrence as a RECURSIVE CTE, not a
    # list_reduce struct fold: DuckDB 1.0.0's list_reduce mutates the
    # accumulator in place during field evaluation, so a later struct
    # field reading acc.l sees the NEW level — coupled two-variable
    # recurrences silently corrupt (repro: tr := acc.lv after
    # lv := acc.lv + x returns the updated lv). The CTE steps the exact
    # same double ops one rank at a time, bit-identical to the fold.
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    ),
    ranked AS (
      SELECT event_type, day, total,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS rn
      FROM daily
    ),
    rec AS (
      SELECT event_type, rn, day, total,
             total::DOUBLE AS l, 0.0::DOUBLE AS b
      FROM ranked WHERE rn = 1
      UNION ALL
      SELECT d.event_type, d.rn, d.day, d.total,
             0.5 * d.total + 0.5 * (r.l + r.b),
             0.3 * ((0.5 * d.total + 0.5 * (r.l + r.b)) - r.l)
               + 0.7 * r.b
      FROM rec r JOIN ranked d
        ON d.event_type = r.event_type AND d.rn = r.rn + 1
    )
    SELECT event_type, day, total,
           floor(l * 10000 + 0.5) / 10000 AS level,
           floor(b * 10000 + 0.5) / 10000 AS trend,
           floor((l + b) * 10000 + 0.5) / 10000 AS forecast_next
    FROM rec
    """,
)
def holt_daily(spark, sf_dir):
    """Holt double-exponential smoothing (alpha=0.5, gamma=0.3) of the
    daily per-type totals: level + trend recurrence as a struct-fold
    over the ordered prefix, with the one-step forecast level+trend —
    fold-for-fold identical to the oracle's list_reduce
    (operators/timeseries.py:holt_linear)."""
    from timeseries_spark.operators.timeseries import holt_linear

    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return holt_linear(
        daily, keys=["event_type"], order_col="day", value_col="total",
        alpha=0.5, gamma=0.3,
    )


@query(
    "winsorized_values",
    # quantile_cont would NOT replay Spark's exact `percentile` at
    # scale (caught by the round-11 sf1 cross-engine gate): DuckDB
    # interpolates with the two-weight form (1-f)*lo + f*hi, which
    # between two EQUAL neighbors returns 2.52 + 5e-16, while Spark
    # computes lo + f*(hi - lo), exactly 2.52 when hi == lo — and a
    # band off by 5e-16 flips `was_clipped` for every row sitting
    # exactly on it (5% of a group). The oracle therefore replays
    # Spark's formula verbatim on the sorted value array.
    oracle="""
    WITH pb AS (
      SELECT event_type,
             list_sort(list(value) FILTER (value IS NOT NULL)) AS xs,
             CAST(count(value) - 1 AS DOUBLE) * 0.05 AS p05,
             CAST(count(value) - 1 AS DOUBLE) * 0.95 AS p95
      FROM events GROUP BY event_type
    ),
    bands AS (
      SELECT event_type,
             xs[CAST(floor(p05) AS BIGINT) + 1]
               + (p05 - floor(p05))
                 * (xs[CAST(ceil(p05) AS BIGINT) + 1]
                    - xs[CAST(floor(p05) AS BIGINT) + 1]) AS lo,
             xs[CAST(floor(p95) AS BIGINT) + 1]
               + (p95 - floor(p95))
                 * (xs[CAST(ceil(p95) AS BIGINT) + 1]
                    - xs[CAST(floor(p95) AS BIGINT) + 1]) AS hi
      FROM pb
    )
    SELECT e.event_id, e.event_type, e.value,
           round(least(greatest(e.value, b.lo), b.hi), 4) AS clamped,
           e.value < b.lo OR e.value > b.hi AS was_clipped
    FROM events e JOIN bands b USING (event_type)
    """,
)
def winsorized_values(spark, sf_dir):
    """Group-wise winsorization of the event values at each type's own
    [p05, p95] band — outlier clamping that keeps row count intact;
    exact percentiles per key broadcast back onto the rows
    (operators/timeseries.py:winsorize)."""
    from timeseries_spark.operators.timeseries import winsorize

    events = load(spark, sf_dir, "events")
    return winsorize(
        events.select("event_id", "event_type", "value"),
        keys=["event_type"],
        value_col="value",
        p_lo=0.05,
        p_hi=0.95,
    )


# Holt-Winters oracle: the coupled level/trend/season recurrence with
# the seasonal queue carried as a DOUBLE[] through a RECURSIVE CTE (see
# the list_reduce pitfall note on holt_daily). The new level feeds every
# other update, so its expression is inlined verbatim — built once here
# to keep the three copies character-identical.
_HW_NL = "(0.5 * (d.total - r.q[1]) + 0.5 * (r.l + r.b))"
_HW_NS = f"(0.4 * (d.total - {_HW_NL}) + 0.6 * r.q[1])"
_HW_ORACLE = f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    ),
    ranked AS (
      SELECT event_type, day, total,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS rn
      FROM daily
    ),
    rec AS (
      SELECT event_type, rn, day, total,
             total::DOUBLE AS l, 0.0::DOUBLE AS b,
             [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]::DOUBLE[] AS q
      FROM ranked WHERE rn = 1
      UNION ALL
      SELECT d.event_type, d.rn, d.day, d.total,
             {_HW_NL},
             0.3 * ({_HW_NL} - r.l) + 0.7 * r.b,
             r.q[2:7] || [{_HW_NS}]
      FROM rec r JOIN ranked d
        ON d.event_type = r.event_type AND d.rn = r.rn + 1
    )
    SELECT event_type, day, total,
           floor(l * 10000 + 0.5) / 10000 AS level,
           floor(b * 10000 + 0.5) / 10000 AS trend,
           floor(q[7] * 10000 + 0.5) / 10000 AS seasonal,
           floor((l + b + q[1]) * 10000 + 0.5) / 10000 AS forecast_next
    FROM rec
    """


@query("holt_winters_daily", oracle=_HW_ORACLE)
def holt_winters_daily(spark, sf_dir):
    """Holt-Winters additive triple-exponential smoothing (alpha=0.5,
    gamma=0.3, delta=0.4, weekly period m=7) of the daily per-type
    totals: level + trend + a length-7 seasonal queue folded over the
    ordered prefix — the drift-plus-weekly-shape forecaster Holt alone
    cannot track (operators/timeseries.py:holt_winters_additive). One
    key-grain exchange; O(period) state per row."""
    from timeseries_spark.operators.timeseries import holt_winters_additive

    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return holt_winters_additive(
        daily, keys=["event_type"], order_col="day", value_col="total",
        alpha=0.5, gamma=0.3, delta=0.4, period=7,
    )


@query(
    "hw_residual_anomaly",
    oracle=f"""
    WITH base AS (
      SELECT * FROM ({_HW_ORACLE})
    ),
    lagd AS (
      SELECT event_type, day, total,
             lag(forecast_next) OVER (PARTITION BY event_type
                                      ORDER BY day) AS fprev
      FROM base
    ),
    r AS (
      SELECT event_type, day, total, total - fprev AS resid
      FROM lagd WHERE fprev IS NOT NULL
    ),
    s AS (
      SELECT event_type, avg(resid) AS mu, stddev_samp(resid) AS sd
      FROM r GROUP BY event_type
    ),
    z AS (
      SELECT r.event_type, r.day, round(r.resid, 4) AS resid,
             floor((r.resid - mu) / sd * 1e6 + 0.5) / 1e6 AS z
      FROM r JOIN s USING (event_type)
    )
    SELECT event_type, day, resid, z, abs(z) > 3 AS is_anomaly FROM z
    """,
)
def hw_residual_anomaly(spark, sf_dir):
    """Seasonality-aware anomaly detection: z-score the Holt-Winters
    ONE-STEP-AHEAD forecast errors (total_t − forecast made at t−1) —
    a spike that is merely the weekly shape scores ~0 here while a
    plain value z-score would flag it. Composes the oracle-exact HW
    fold with one lag window + one per-series moment aggregate; all
    three share the event_type key grain, so the whole detector adds
    no corpus-grain exchange beyond the smoother's own."""
    from pyspark.sql import Window

    from timeseries_spark.operators.timeseries import holt_winters_additive

    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    hw = holt_winters_additive(
        daily, keys=["event_type"], order_col="day", value_col="total",
        alpha=0.5, gamma=0.3, delta=0.4, period=7,
    )
    w = Window.partitionBy("event_type").orderBy("day")
    r = (
        hw.withColumn("fprev", F.lag("forecast_next").over(w))
        .where(F.col("fprev").isNotNull())
        .select(
            "event_type",
            "day",
            (F.col("total") - F.col("fprev")).alias("resid"),
        )
    )
    s = r.groupBy("event_type").agg(
        F.avg("resid").alias("mu"), F.stddev_samp("resid").alias("sd")
    )
    zsnap = (
        F.floor((F.col("resid") - F.col("mu")) / F.col("sd") * 1e6 + F.lit(0.5))
        .cast("double")
        / 1e6
    )
    return (
        r.join(F.broadcast(s), "event_type")
        .select(
            "event_type",
            "day",
            F.round("resid", 4).alias("resid"),
            zsnap.alias("z"),
        )
        .withColumn("is_anomaly", F.abs(F.col("z")) > 3)
    )


@query(
    "stl_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    ),
    tr AS (
      SELECT event_type, day, total,
             CAST(sum(CAST(total AS DECIMAL(18,2))) OVER w AS DOUBLE)
               / count(*) OVER w AS trend
      FROM daily WINDOW w AS (
        PARTITION BY event_type ORDER BY day
        RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    detq AS (
      SELECT *,
             CAST(floor((total - trend) * 1e6 + 0.5) / 1e6
                  AS DECIMAL(18,6)) AS detr_q,
             day % 7 AS phase
      FROM tr
    ),
    pm AS (
      SELECT event_type, phase,
             CAST(floor(CAST(sum(detr_q) AS DOUBLE) / count(*) * 1e6
                        + 0.5) / 1e6 AS DECIMAL(18,6)) AS pm_q
      FROM detq GROUP BY event_type, phase
    ),
    ctr AS (
      SELECT event_type, CAST(sum(pm_q) AS DOUBLE) / count(*) AS pm_center
      FROM pm GROUP BY event_type
    ),
    seas AS (
      SELECT p.event_type, p.phase,
             floor((CAST(p.pm_q AS DOUBLE) - c.pm_center) * 1e6 + 0.5)
               / 1e6 AS seasonal
      FROM pm p JOIN ctr c USING (event_type)
    )
    SELECT d.event_type, d.day, d.total AS value, d.trend, s.seasonal,
           d.total - d.trend - s.seasonal AS residual
    FROM detq d
    JOIN seas s ON s.event_type = d.event_type AND s.phase = d.phase
    """,
)
def stl_daily(spark, sf_dir):
    """Classical additive seasonal-trend decomposition of each daily
    series: centered ±3-day moving-average trend (exact decimal sums),
    weekly (day%7) phase means of the snapped detrended series as the
    seasonal component (centered to sum 0), raw residuals — the
    monitoring decomposition behind 'is this drop trend, seasonality,
    or anomaly'. All shuffles at series/phase grain
    (operators/timeseries.py:stl_decompose)."""
    from timeseries_spark.operators.timeseries import stl_decompose

    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return stl_decompose(
        daily, ["event_type"], "day", "total", period=7, half_window=3
    )


@query(
    "theil_sen_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    ),
    pts AS (
      SELECT event_type, CAST(day AS DOUBLE) AS x,
             CAST(total AS DOUBLE) AS y
      FROM daily
    ),
    slopes AS (
      SELECT a.event_type, (b.y - a.y) / (b.x - a.x) AS pair_slope
      FROM pts a JOIN pts b
        ON a.event_type = b.event_type AND a.x < b.x
    ),
    ms AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
             quantile_cont(pair_slope, 0.5) AS ms
      FROM slopes GROUP BY event_type
    ),
    res AS (
      SELECT p.event_type, CAST(count(*) AS BIGINT) AS n_points,
             first(s.n_pairs) AS n_pairs, first(s.ms) AS ms,
             quantile_cont(p.y - s.ms * p.x, 0.5) AS mr
      FROM pts p JOIN ms s ON s.event_type = p.event_type
      GROUP BY p.event_type
    )
    SELECT event_type, n_points, n_pairs,
           floor(ms * 1e6 + 0.5) / 1e6 AS slope,
           floor(mr * 1e6 + 0.5) / 1e6 AS intercept
    FROM res
    """,
)
def theil_sen_daily(spark, sf_dir):
    """Robust (median-of-pairwise-slopes) daily trend per series — the
    outlier-proof counterpart of series_trend's OLS: the pair join is
    keyed on the series and quadratic only in days, medians are exact
    percentiles at key grain
    (operators/timeseries.py:theil_sen_trend)."""
    from timeseries_spark.operators.timeseries import theil_sen_trend

    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return theil_sen_trend(daily, ["event_type"], "day", "total")
