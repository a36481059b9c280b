"""Pipeline runner: the engine's staged-table public API."""

from timeseries_spark.plans.incremental import (
    affected_keys,
    incremental_association,
)
from timeseries_spark.plans.pipeline import TimeseriesPipeline, point_query

__all__ = [
    "TimeseriesPipeline",
    "affected_keys",
    "incremental_association",
    "point_query",
]
