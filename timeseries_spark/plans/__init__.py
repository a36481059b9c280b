"""Pipeline runner: the engine's staged-table public API."""

from timeseries_spark.plans.pipeline import TimeseriesPipeline, point_query

__all__ = ["TimeseriesPipeline", "point_query"]
