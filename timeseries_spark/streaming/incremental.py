"""Incremental event-time operators, batch/stream agnostic.

Each transformation takes a DataFrame (batch or streaming) and returns one;
``read_event_stream`` + ``run_available_now`` wire them to a parquet-backed
stream for tests and to any real source (Kafka etc.) in production.

Watermarks bound state: a tumbling-window aggregation with a ``delay``
watermark keeps only windows newer than ``max(event_time) - delay`` in the
state store — the property that makes these run forever at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseries_spark import schemas


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming scan of an events directory (parquet files appear over
    time). Schema must be explicit — streaming sources never infer."""
    return (
        spark.readStream.schema(schemas.EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def windowed_type_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """Tumbling event-time window counts per event_type.

    Late data beyond ``watermark`` is dropped (streaming) — batch mode
    computes the same result exactly since nothing is late at rest.
    Output: (window_start_s, event_type, n, total_value)."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "2 hours",
    streaming: bool = False,
    watermark: str = "4 hours",
) -> DataFrame:
    """Session-window aggregation per user (gap-based session merge via
    the native ``session_window`` — no custom state handler needed).

    Output: (user_id, session_start_s, n_events, total_value); the session
    spans all events whose inter-arrival gap stays under ``gap``."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(
            F.session_window("ts", gap).alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start_s"),
            "n_events",
            "total_value",
        )
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, spark: SparkSession
) -> DataFrame:
    """Drain all currently-available input through the streaming plan into
    an in-memory sink and return the materialized result (test harness)."""
    # complete mode: append would hold back windows not yet past the
    # watermark, so a drained test run would miss the newest windows
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
