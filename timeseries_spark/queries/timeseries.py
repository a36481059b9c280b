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
    ema,
    linear_interpolate,
    resample_ohlc,
    rolling_median,
    rolling_zscore,
)
from timeseries_spark.queries import load, query

# value > _SPARSE_MIN keeps ~1% of events: 10-19 of 31 days present per
# type at sf0.01, so interpolation gaps genuinely bind at the gate scale
_SPARSE_MIN = 230.0


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
      SELECT event_type, day(ts) AS day, round(sum(value), 2) AS total
      FROM events GROUP BY event_type, day(ts)
    )
    SELECT floor(corr(c.total, p.total) * 1e6 + 0.5) / 1e6 AS corr_cp,
           floor(covar_samp(c.total, p.total) * 1e6 + 0.5) / 1e6 AS cov_cp,
           count(*) AS n_days
    FROM (SELECT day, total FROM daily WHERE event_type = 'click') c
    JOIN (SELECT day, total FROM daily WHERE event_type = 'purchase') p
      USING (day)
    """,
)
def daily_series_correlation(spark, sf_dir):
    """Cross-series Pearson correlation + sample covariance between the
    click and purchase daily totals — the co-movement primitive of
    multi-series analytics, one day-grain equi-join plus a single
    global aggregate (1 output row), snapped at 1e-6."""
    events = load(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.dayofmonth("ts").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    c = daily.filter(F.col("event_type") == "click").select(
        "day", F.col("total").alias("c_total")
    )
    p = daily.filter(F.col("event_type") == "purchase").select(
        "day", F.col("total").alias("p_total")
    )
    j = c.join(p, "day")
    snap = lambda col: (  # noqa: E731
        F.floor(col * 1e6 + F.lit(0.5)).cast("double") / 1e6
    )
    return j.agg(
        snap(F.corr("c_total", "p_total")).alias("corr_cp"),
        snap(F.covar_samp("c_total", "p_total")).alias("cov_cp"),
        F.count(F.lit(1)).alias("n_days"),
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
