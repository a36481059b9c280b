"""Driver-contract query registry.

Every implemented operator from SURVEY.md §2 registers here as a named
(spark_fn, oracle_sql) pair over the /root/testdata tables. The driver runs
the Spark query and the DuckDB oracle side-by-side at sf0.01 and compares
row count + schema + order-insensitive value hash (CORRECTNESS_r{N}.json).

Conventions that keep the cross-engine hash stable:
- every computed column is aliased identically in both engines;
- double aggregates are rounded (4 decimals) in BOTH engines;
- DuckDB integer SUMs are cast back to BIGINT (DuckDB widens to HUGEINT);
- timestamps are reduced to int years/days before output.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable with its oracle."""

    def deco(fn):
        REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects unless
    # nanos surface as a long; the conf is runtime-settable, so set it here
    # rather than relying on session-build flags (the driver owns the
    # session). The nanos-epoch long is then converted to a real timestamp
    # (micros precision suffices for day-grain analytics).
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _import_all()
    return {name: q.fn for name, q in sorted(REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    _import_all()
    return {
        name: q.oracle for name, q in sorted(REGISTRY.items()) if q.oracle is not None
    }


def _import_all() -> None:
    # import side effects populate REGISTRY
    from timeseries_spark.queries import analytics  # noqa: F401
    from timeseries_spark.queries import core  # noqa: F401
    from timeseries_spark.queries import domain  # noqa: F401
    from timeseries_spark.queries import stage3  # noqa: F401
    from timeseries_spark.queries import tsq  # noqa: F401
    from timeseries_spark.queries import text  # noqa: F401
    from timeseries_spark.queries import dedup  # noqa: F401
    from timeseries_spark.queries import similarity  # noqa: F401
    from timeseries_spark.queries import multimodal  # noqa: F401
    from timeseries_spark.queries import sampling  # noqa: F401
    from timeseries_spark.queries import timeseries  # noqa: F401
    from timeseries_spark.queries import search  # noqa: F401
    from timeseries_spark.queries import cleaning  # noqa: F401
    from timeseries_spark.queries import graph  # noqa: F401
    from timeseries_spark.queries import jsonl  # noqa: F401
    from timeseries_spark.queries import classifier  # noqa: F401
    from timeseries_spark.queries import dataquality  # noqa: F401
    from timeseries_spark.queries import embeddings  # noqa: F401
    from timeseries_spark.queries import bpe  # noqa: F401
