"""Round-12 regression pins.

Covers the four round-11 ADVICE items: stale-partial-artifact eviction
in the atomic publisher, temp-dir cleanup when the staged build itself
fails, the thread-safe (conf-toggle-free) staged_table read, and the
all-null degenerate input to the rank statistics.
"""

from __future__ import annotations

import os

import pytest


def test_publish_atomic_evicts_stale_partial_artifact(spark, tmp_path):
    """A destination left behind WITHOUT _SUCCESS (crashed run of the
    old in-place writer, manual copy, etc.) must not block publishing
    forever: os.rename fails ENOTEMPTY on every retry, and swallowing
    that as 'lost the race' would serve the partial artifact to every
    later reader. The publisher must evict the stale dir and land the
    fresh build."""
    from timeseries_spark.extensions.staging import _publish_atomic

    path = str(tmp_path / "artifact")
    # fabricate a stale partial artifact: files present, no _SUCCESS
    os.makedirs(path)
    with open(os.path.join(path, "part-00000.parquet"), "w") as f:
        f.write("partial garbage")

    _publish_atomic(
        lambda tmp: spark.range(7).write.parquet(tmp), path
    )
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert spark.read.parquet(path).count() == 7
    assert not [
        p for p in os.listdir(str(tmp_path)) if ".tmp-" in p
    ], "temp dirs must not accumulate"


def test_publish_atomic_keeps_complete_winner(spark, tmp_path):
    """The race-loser path is unchanged: if the destination holds a
    COMPLETE artifact (_SUCCESS present), the loser discards its temp
    dir and the winner's artifact survives byte-for-byte."""
    from timeseries_spark.extensions.staging import _publish_atomic

    path = str(tmp_path / "artifact")
    _publish_atomic(lambda tmp: spark.range(5).write.parquet(tmp), path)
    _publish_atomic(lambda tmp: spark.range(3).write.parquet(tmp), path)
    assert spark.read.parquet(path).count() == 5
    assert not [p for p in os.listdir(str(tmp_path)) if ".tmp-" in p]


def test_publish_atomic_cleans_tmp_on_failed_build(spark, tmp_path):
    """If write(tmp) raises (a Spark job failure mid-materialization)
    the temp directory must be removed before the exception propagates
    — otherwise repeated failed builds accumulate tmp-* litter in the
    stage root."""
    from timeseries_spark.extensions.staging import _publish_atomic

    path = str(tmp_path / "artifact")

    def failing_write(tmp: str) -> None:
        os.makedirs(tmp)
        with open(os.path.join(tmp, "half.parquet"), "w") as f:
            f.write("x")
        raise RuntimeError("job died mid-write")

    with pytest.raises(RuntimeError, match="job died"):
        _publish_atomic(failing_write, path)
    assert not os.path.exists(path)
    assert not [p for p in os.listdir(str(tmp_path)) if ".tmp-" in p]


def test_staged_table_read_leaves_session_conf_alone(
    spark, tmp_path, monkeypatch
):
    """The partition-type round-trip is now carried by the READER
    schema, not a session-global partitionColumnTypeInference toggle —
    under concurrent point serving an interleaved set/unset could let
    another thread read with inference enabled. The conf must be
    untouched across the call and numeric-looking partition strings
    must still round-trip verbatim."""
    monkeypatch.setenv("SPARK_GRAFT_STAGE_DIR", str(tmp_path / "stage"))
    from timeseries_spark.extensions.staging import staged_table

    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    before = spark.conf.get(key)

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [("007", 1.5), ("12", 2.5)], ["pid", "val"]
    ).write.parquet(src)

    seen = []
    orig_set = spark.conf.set
    monkeypatch.setattr(
        spark.conf,
        "set",
        lambda k, v: (seen.append(k), orig_set(k, v)),
    )
    for _ in range(2):  # build call + cached-serve call
        out = staged_table(
            spark, lambda: spark.read.parquet(src), src, "confsafe", ("pid",)
        )
        assert sorted(r.pid for r in out.collect()) == ["007", "12"]
        assert dict(out.dtypes)["pid"] == "string"
    assert key not in seen, "read path must not toggle session conf"
    assert spark.conf.get(key) == before


def test_rank_stats_all_null_values_keep_rows(spark):
    """Degenerate input — every pooled value NULL: percentile_approx
    returns a NULL bounds array, so an un-coalesced bucket fold would
    yield NULL bucket ids and the offsets equi-join would DROP every
    row, returning an empty frame. The guard must keep the row (NULL
    statistics are the honest answer; silently empty is not)."""
    from timeseries_spark.extensions.dataquality import (
        ks_two_sample,
        mann_whitney_u,
    )

    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", None), ("b", None)],
        "g string, v double",
    )
    # NULL pools as one fully-tied distinct value: midrank (4+1)/2,
    # U_a = 2*2.5 - 2*3/2 = 2, z = 0; a dropped join would yield NULLs
    u = mann_whitney_u(df, "g", "v", "a", "b").collect()
    assert len(u) == 1
    assert (u[0]["n_a"], u[0]["n_b"]) == (2, 2)
    assert u[0]["u_a"] == 2.0 and u[0]["u_b"] == 2.0
    assert u[0]["z_stat"] == 0.0
    k = ks_two_sample(df, "g", "v", "a", "b").collect()
    assert len(k) == 1
    assert (k[0]["n_a"], k[0]["n_b"]) == (2, 2)
    assert k[0]["ks_stat"] == 0.0
