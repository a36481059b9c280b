"""Readers / writers (SURVEY.md §2.1 S1-S11)."""

from timeseries_spark.sources.io import (
    read_csv,
    read_parquet,
    table_exists,
    write_parquet,
)

__all__ = ["read_parquet", "read_csv", "write_parquet", "table_exists"]
