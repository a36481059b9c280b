"""Readers / writers (SURVEY.md §2.1 S1-S11) and seeded fixture
generators (the stage-0 replacement, S12)."""

from timeseries_spark.sources.fixtures import (
    gen_credible_set,
    gen_disease,
    gen_drugs,
    gen_evidence,
    gen_study,
    gen_target,
)
from timeseries_spark.sources.io import (
    read_csv,
    read_parquet,
    register_views,
    table_exists,
    write_csv,
    write_parquet,
)

__all__ = [
    "gen_credible_set",
    "gen_disease",
    "gen_drugs",
    "gen_evidence",
    "gen_study",
    "gen_target",
    "read_csv",
    "read_parquet",
    "register_views",
    "table_exists",
    "write_csv",
    "write_parquet",
]
