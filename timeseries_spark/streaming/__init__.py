"""Structured Streaming surface (engine extension — SURVEY.md §2.9).

The reference is batch-only: its "time series" are retrospective yearly
tables. Parity needs no streaming, but an incremental mode maps naturally
onto Structured Streaming: the same event-time transformations run over
``readStream`` with watermarks bounding state. Transformations live here
as batch/stream-agnostic DataFrame functions (the idiomatic pattern), so
every streaming op is also exercisable by the batch oracle gate.
"""

from timeseries_spark.streaming.incremental import (
    IncrementalAssociationSink,
    attribute_conversions,
    dedup_events,
    read_event_stream,
    run_incremental,
    run_available_now,
    running_peaks,
    sessionize,
    windowed_type_counts,
)

__all__ = [
    "IncrementalAssociationSink",
    "attribute_conversions",
    "dedup_events",
    "read_event_stream",
    "run_incremental",
    "run_available_now",
    "running_peaks",
    "sessionize",
    "windowed_type_counts",
]
