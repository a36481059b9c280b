"""Shared Spark session + domain fixtures (FIXTURES.md §A)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

from timeseries_spark.config import EngineConfig
from timeseries_spark import schemas
from timeseries_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark(app_name="timeseries_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def cfg() -> EngineConfig:
    # small bounds keep hand-computed expectations readable
    return EngineConfig(first_year=2000, last_year=2010)


@pytest.fixture(scope="session")
def evidence_dated(spark):
    """Tiny dated-evidence fixture with the hand-checkable TSLP/asthma-style
    cell from the reference's own validation (analysis.ipynb cells 75-77):
    one year with scores [0.891, 0.0576] -> (0.891/1 + 0.0576/4)/1.64."""
    rows = [
        # (id, targetId, diseaseId, datasourceId, score, literature, year)
        ("e1", "T1", "D1", "src_a", 0.891, ["1111"], 2003),
        ("e2", "T1", "D1", "src_a", 0.0576, None, 2003),
        ("e3", "T1", "D1", "src_a", 0.87, ["2222", "3333"], 2005),
        ("e4", "T1", "D1", "src_b", 0.5, None, 2004),
        ("e5", "T1", "D1", "src_b", float("nan"), None, 2004),  # NaN dropped
        ("e6", "T2", "D1", "src_a", 0.3, None, None),  # undated sentinel
        ("e7", "T2", "D2", "src_a", 1.0, None, 2000),
    ]
    return spark.createDataFrame(
        rows,
        schema="id string, targetId string, diseaseId string, datasourceId string,"
        " score double, literature array<string>, year int",
    )


@pytest.fixture(scope="session")
def disease(spark):
    rows = [
        ("D1", "asthma", ["DA", "ROOT"], ["TA1"]),
        ("D2", "eczema", ["ROOT"], ["TA1"]),
        ("DA", "airway disease", ["ROOT"], ["TA1"]),
        ("ROOT", "disease", [], ["TA1"]),
    ]
    return spark.createDataFrame(rows, schema=schemas.DISEASE)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def load(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
