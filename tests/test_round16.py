"""Round-16 pins.

ADVICE r15 regressions:
- the cache registry's weak keying actually collects (a naive
  WeakKeyDictionary[SparkSession, list[DataFrame]] is pinned forever by
  DataFrame._session's strong back-ref — the exact leak the registry
  exists to prevent in long-lived serving processes),
- the staged-postings fingerprint tracks build semantics (a v1-era
  artifact must not serve under the v2 NULL-text contract).
"""

from __future__ import annotations

import gc

from timeseries_spark.queries import load

SF = "/root/testdata/sf0.001"


def test_cache_registry_entry_collects_with_dropped_session(spark):
    # ADVICE r15: register a cache in a newSession() clone, drop every
    # Python reference, and the registry bookkeeping must vanish — the
    # stored handles may not pin the session object.
    from timeseries_spark.extensions import caching

    clone = spark.newSession()
    df = caching.register_cache(clone.range(7).toDF("x"), "r16test")
    assert len(caching.live_caches(clone, family="r16test")) == 1
    n_sessions_before = len(caching._REGISTRY)

    del df, clone
    # PySpark itself pins the most-recently-created session: newSession
    # runs _monkey_patch_RDD, whose RDD.toDF closure (a class attribute,
    # i.e. a global) captures the session until the NEXT session is
    # created and overwrites it. Displace that patch so the only
    # remaining question is whether OUR registry pins the clone.
    spark.newSession()
    gc.collect()

    # the weakref callback purged the dropped session's slot entirely
    assert len(caching._REGISTRY) < n_sessions_before
    assert caching.live_caches(family="r16test") == []


def test_cache_registry_release_survives_dead_python_dataframe(spark):
    # The interior cache points register DataFrames whose Python object
    # dies when the builder returns (only JVM lineage persists). The
    # registry must still show AND release those blocks via the
    # retained JVM handle.
    from timeseries_spark.extensions import caching

    caching.register_cache(spark.range(11).toDF("y"), "r16dead")
    gc.collect()  # the only Python ref was the local above

    live = caching.live_caches(spark, family="r16dead")
    assert len(live) == 1
    lvl = live[0].storageLevel
    assert lvl.useMemory or lvl.useDisk
    assert caching.release_caches(spark, "r16dead") == 1
    assert caching.live_caches(spark, family="r16dead") == []


def test_postings_stage_path_tracks_build_semantics_version(spark, tmp_path):
    # ADVICE r15: build_postings' NULL-text contract changed (v2) but
    # the artifact fingerprint didn't — a stale v1 index would keep
    # serving diverged corpus stats. The path must move when the
    # build-semantics version moves.
    from timeseries_spark.extensions import search, staging

    src = str(tmp_path / "docs")
    load(spark, SF, "documents").limit(5).write.parquet(src)

    p_now = staging.postings_stage_path(src)
    assert f"v{search.POSTINGS_BUILD_VERSION}" != "v1"
    old = search.POSTINGS_BUILD_VERSION
    try:
        search.POSTINGS_BUILD_VERSION = old - 1
        p_old = staging.postings_stage_path(src)
    finally:
        search.POSTINGS_BUILD_VERSION = old
    assert p_now != p_old
