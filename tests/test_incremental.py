"""Incremental recompute must equal a full recompute, row for row."""

import pytest
from pyspark.sql import functions as F

from timeseries_spark.operators.novelty import add_novelty
from timeseries_spark.operators.scoring import association_score
from timeseries_spark.plans import incremental_association

KEYS = ("diseaseId", "targetId", "datasourceId")


@pytest.fixture(scope="module")
def new_batch(spark):
    rows = [
        # touches an existing group (D1,T1,src_a) and creates a new one
        ("e8", "T1", "D1", "src_a", 0.95, None, 2008),
        ("e9", "T9", "D2", "src_c", 0.4, None, 2006),
    ]
    return spark.createDataFrame(
        rows,
        schema="id string, targetId string, diseaseId string,"
        " datasourceId string, score double, literature array<string>,"
        " year int",
    )


def _full(evidence, cfg):
    return add_novelty(association_score(evidence, cfg, KEYS), cfg, KEYS)


def _as_set(df):
    return {
        (r["diseaseId"], r["targetId"], r["datasourceId"], r["year"],
         None if r["score"] is None else round(r["score"], 9),
         round(r["novelty"], 9))
        for r in df.collect()
    }


def test_incremental_equals_full(spark, evidence_dated, new_batch, cfg):
    existing = _full(evidence_dated, cfg)
    all_evidence = evidence_dated.unionByName(new_batch)
    inc = incremental_association(
        existing, all_evidence, new_batch, cfg, KEYS
    )
    assert _as_set(inc) == _as_set(_full(all_evidence, cfg))


def test_untouched_groups_not_recomputed(spark, evidence_dated, new_batch, cfg):
    """Rows of untouched groups must come through the anti-join unchanged —
    the delta plan never rescans them."""
    existing = _full(evidence_dated, cfg)
    # poison untouched groups in the existing table; the delta must keep
    # the poisoned values (proof they were not recomputed)
    poisoned = existing.withColumn(
        "novelty",
        F.when(F.col("targetId") == "T2", F.lit(9.9)).otherwise(
            F.col("novelty")
        ),
    )
    all_evidence = evidence_dated.unionByName(new_batch)
    inc = incremental_association(poisoned, all_evidence, new_batch, cfg, KEYS)
    t2 = inc.filter("targetId = 'T2'").select("novelty").distinct().collect()
    assert {r["novelty"] for r in t2} == {9.9}


def test_streaming_foreachbatch_incremental(
    spark, evidence_dated, new_batch, cfg, tmp_path_factory
):
    """End-to-end live mode: a stream of evidence files drained with
    availableNow through the foreachBatch sink must leave the newest
    association version equal to a full batch recompute of all evidence."""
    from timeseries_spark.streaming.incremental import (
        IncrementalAssociationSink,
        run_incremental,
    )

    base = tmp_path_factory.mktemp("live")
    stream_dir = str(base / "in")
    evidence_dated.coalesce(1).write.parquet(stream_dir)
    new_batch.coalesce(1).write.mode("append").parquet(stream_dir)

    schema = evidence_dated.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    sink = IncrementalAssociationSink(
        cfg, str(base / "evidence"), str(base / "assoc")
    )
    run_incremental(stream, sink)

    current = sink.current_version(spark)
    assert current is not None
    got = spark.read.parquet(current)
    expected = _full(evidence_dated.unionByName(new_batch), cfg)
    assert _as_set(got) == _as_set(expected)
