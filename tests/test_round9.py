"""Round-9 regression tests: the four ADVICE fixes.

1. welch_ttest: an ABSENT group must raise, not return an all-NULL row
   (the pivot produced NULL moments, NULL-ing the guard predicate).
2. mann_whitney_u / ks_two_sample: quantize_decimals bounds the
   distinct-value axis for continuous metrics; statistic is exact for
   the quantized metric.
3. k_core: per-round count is now a convergence early-exit.
4. connected_components: output restricted to the vertex table even
   when `pairs` carries stray endpoint ids.
"""
import pytest


def test_welch_ttest_absent_group_raises(spark):
    from timeseries_spark.extensions.dataquality import welch_ttest

    # group "b" has rows; group "a" is entirely absent from the input.
    # Before the round-9 fix the pivot yielded NULL n/s/ss for "a", the
    # guard predicate evaluated to NULL (falls through to otherwise),
    # and the function silently returned a row of NULL statistics.
    df = spark.createDataFrame(
        [("b", 2.0), ("b", 3.0), ("b", 4.0)], "g string, v double"
    )
    with pytest.raises(Exception, match="welch_ttest"):
        welch_ttest(df, "g", "v", "a", "b").collect()
    with pytest.raises(Exception, match="welch_ttest"):
        welch_ttest(df, "g", "v", "b", "a").collect()


def test_welch_ttest_both_groups_absent_raises(spark):
    from timeseries_spark.extensions.dataquality import welch_ttest

    df = spark.createDataFrame(
        [("c", 2.0), ("c", 3.0)], "g string, v double"
    )
    with pytest.raises(Exception, match="welch_ttest"):
        welch_ttest(df, "g", "v", "a", "b").collect()


def test_mann_whitney_quantize_matches_prerounded(spark):
    from timeseries_spark.extensions.dataquality import mann_whitney_u

    rows = [
        ("a", 1.04), ("a", 1.96), ("a", 3.14159), ("b", 2.04),
        ("b", 3.96), ("b", 1.0401),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    pre = spark.createDataFrame(
        [(g, round(v, 1)) for g, v in rows], "g string, v double"
    )
    got = mann_whitney_u(df, "g", "v", "a", "b", quantize_decimals=1)
    want = mann_whitney_u(pre, "g", "v", "a", "b")
    assert got.collect() == want.collect()


def test_ks_quantize_matches_prerounded_and_bounds_axis(spark):
    from timeseries_spark.extensions.dataquality import ks_two_sample

    rows = [("a", i + 0.123456 * i) for i in range(50)] + [
        ("b", i + 0.654321 * i) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    pre = spark.createDataFrame(
        [(g, round(v, 0)) for g, v in rows], "g string, v double"
    )
    got = ks_two_sample(df, "g", "v", "a", "b", quantize_decimals=0)
    want = ks_two_sample(pre, "g", "v", "a", "b")
    assert got.collect() == want.collect()


def test_k_core_early_exit_and_converged_flag(spark):
    from timeseries_spark.extensions.graph import k_core

    # triangle (stable 2-core) + a pendant chain that peels in 2 rounds
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)],
        "src bigint, dst bigint",
    )
    got = {
        r["node"]: (r["core_degree"], r["converged"])
        for r in k_core(edges, k=2, n_rounds=8).collect()
    }
    assert set(got) == {1, 2, 3}
    assert all(v == (2, True) for v in got.values())


def test_k_core_unconverged_visible(spark):
    from timeseries_spark.extensions.graph import k_core

    # long chain under k=2 peels one node per... actually peels both
    # ends each round; with n_rounds=1 the interior still looks alive
    # after one round, so the flag must be False
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src bigint, dst bigint"
    )
    rows = k_core(edges, k=2, n_rounds=1).collect()
    assert rows and all(r["converged"] is False for r in rows)


def test_connected_components_restricted_to_vertices(spark):
    from timeseries_spark.extensions.dedup import connected_components

    # pair (10, 99) carries endpoint 99 that is NOT a vertex; the output
    # must still be exactly one row per VERTEX, and 99 must not leak in
    vertices = spark.createDataFrame(
        [(10,), (20,), (30,)], "doc_id bigint"
    )
    pairs = spark.createDataFrame(
        [(10, 99), (20, 30)], "id_a bigint, id_b bigint"
    )
    rows = connected_components(pairs, vertices).collect()
    got = {r["doc_id"]: r["component"] for r in rows}
    assert set(got) == {10, 20, 30}
    assert len(rows) == 3
    assert got[20] == got[30] == 20
    # 10's component label may legitimately be the stray min endpoint's
    # id only if smaller; here 10 < 99 so it stays its own component
    assert got[10] == 10
