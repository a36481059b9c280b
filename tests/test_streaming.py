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
