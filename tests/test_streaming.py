"""Structured Streaming surface: the same transformations must produce
identical results via readStream (availableNow drain) and batch."""

import pytest
from pyspark.sql import functions as F

from timeseries_spark.queries import load
from timeseries_spark.streaming import (
    read_event_stream,
    run_available_now,
    sessionize,
    windowed_type_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """Re-materialize events as micros timestamps so the streaming source
    (explicit schema, no nanos) can read them."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    load(spark, SF, "events").write.mode("overwrite").parquet(out)
    return out


def test_stream_matches_batch_windowed(spark, event_dir):
    batch = windowed_type_counts(
        spark.read.parquet(event_dir), "1 hour", streaming=False
    )
    stream = windowed_type_counts(
        read_event_stream(spark, event_dir), "1 hour", watermark="2 hours"
    )
    got = run_available_now(stream, "win_counts_test", spark)
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in got.collect()}
    assert b == s
    assert len(b) > 0


def test_stream_sessionize_matches_batch(spark, event_dir):
    batch = sessionize(spark.read.parquet(event_dir), "2 hours", streaming=False)
    stream = sessionize(
        read_event_stream(spark, event_dir), "2 hours", streaming=True
    )
    got = run_available_now(stream, "sessions_test", spark)
    assert {tuple(r) for r in batch.collect()} == {tuple(r) for r in got.collect()}


def test_watermark_bounds_state(spark, event_dir):
    """The streaming plan carries an event-time watermark node."""
    stream = windowed_type_counts(
        read_event_stream(spark, event_dir), "1 hour", watermark="2 hours"
    )
    assert "EventTimeWatermark" in stream._jdf.queryExecution().analyzed().toString()


def test_stateful_running_peaks_matches_batch(spark, event_dir, tmp_path_factory):
    """applyInPandasWithState (one double of state per user) must equal the
    batch running-max window, including state carried across micro-batches:
    the input is split into 3 ts-ordered files and drained with
    maxFilesPerTrigger=1, so each user's record must survive the state
    store between batches."""
    from timeseries_spark.streaming import running_peaks

    events = spark.read.parquet(event_dir)
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    step = (hi - lo) / 3
    multi = str(tmp_path_factory.mktemp("events_parts"))
    for p in range(3):
        lower = lo + p * step
        upper = hi if p == 2 else lo + (p + 1) * step
        cond = (F.col("ts") >= lower) & (
            F.col("ts") <= upper if p == 2 else F.col("ts") < upper
        )
        events.filter(cond).coalesce(1).write.mode("append").parquet(multi)
    batch = running_peaks(events, streaming=False)
    stream = running_peaks(read_event_stream(spark, multi), streaming=True)
    got = run_available_now(stream, "peaks_test", spark, output_mode="append")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in got.collect()}
    assert b == s
    assert len(b) > 0
