"""Histogram quantile sketch: accuracy bound (one bin width), shard
mergeability, edge clamping, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseries_spark.extensions.sketches import (
    histogram_counts,
    histogram_quantiles,
)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "value double")


def test_estimates_within_one_bin_width(spark):
    xs = list(range(1000))  # uniform 0..999
    df = _vals(spark, xs)
    bins = histogram_counts(df, "value", 0.0, 1000.0, 20)  # width 50
    got = {
        r["q"]: r["est"]
        for r in histogram_quantiles(bins, [0.5, 0.9], 0.0, 1000.0, 20).collect()
    }
    import statistics

    for q in (0.5, 0.9):
        exact = statistics.quantiles(xs, n=100)[int(q * 100) - 1]
        assert abs(got[q] - exact) <= 50.0, (q, got[q], exact)


def test_shard_histograms_merge_by_addition(spark):
    a, b = list(range(0, 500)), list(range(500, 1000))
    whole = histogram_counts(_vals(spark, a + b), "value", 0.0, 1000.0, 10)
    ha = histogram_counts(_vals(spark, a), "value", 0.0, 1000.0, 10)
    hb = histogram_counts(_vals(spark, b), "value", 0.0, 1000.0, 10)
    merged = (
        ha.unionByName(hb).groupBy("bin").agg(F.sum("n").alias("n"))
    )
    as_map = lambda df: {r["bin"]: r["n"] for r in df.collect()}  # noqa: E731
    assert as_map(merged) == as_map(whole)
    qw = {r["q"]: r["est"] for r in
          histogram_quantiles(whole, [0.5], 0.0, 1000.0, 10).collect()}
    qm = {r["q"]: r["est"] for r in
          histogram_quantiles(merged, [0.5], 0.0, 1000.0, 10).collect()}
    assert qw == qm


def test_out_of_range_values_clamp_to_edge_bins(spark):
    df = _vals(spark, [-5.0, 0.0, 99.0, 150.0])
    got = {r["bin"]: r["n"] for r in
           histogram_counts(df, "value", 0.0, 100.0, 10).collect()}
    assert got[0] == 2  # -5 clamps down, 0 lands
    assert got[9] == 2  # 99 lands, 150 clamps up


def test_nulls_excluded_and_validation(spark):
    df = spark.createDataFrame([(1.0,), (None,)], "value double")
    [row] = histogram_counts(df, "value", 0.0, 10.0, 5).collect()
    assert row["n"] == 1
    with pytest.raises(ValueError):
        histogram_counts(df, "value", 10.0, 0.0, 5)


def test_quantile_out_of_range_raises(spark):
    df = _vals(spark, [1.0, 2.0])
    bins = histogram_counts(df, "value", 0.0, 10.0, 5)
    with pytest.raises(ValueError):
        histogram_quantiles(bins, [1.5], 0.0, 10.0, 5)
    with pytest.raises(ValueError):
        histogram_quantiles(bins, [0.0], 0.0, 10.0, 5)


def test_nan_values_are_excluded(spark):
    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (2.0,)], "value double"
    )
    rows = histogram_counts(df, "value", 0.0, 10.0, 5).collect()
    assert sum(r["n"] for r in rows) == 2  # NaN never lands in bin 0
