"""Round-11 regression pins: degenerate-input guards for the explicit
DECIMAL-moment correlation (advice fix) and the distributed rank-stat
behavior twins (the plan shape is asserted in test_plans.py)."""

import datetime

import pytest
from pyspark.sql import functions as F


def _corr_frame(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )


def _run_corr(spark, df, monkeypatch):
    """Drive the registered query body against a tiny injected events
    table by monkeypatching the loader."""
    import timeseries_spark.queries.timeseries as tsq

    monkeypatch.setattr(tsq, "load", lambda _s, _d, _t: df)
    return tsq.daily_series_correlation(spark, "ignored")


@pytest.fixture()
def ts():
    return lambda d: datetime.datetime(2024, 1, d, 12, 0, 0)


def test_correlation_single_day_yields_null_not_error(
    spark, ts, monkeypatch
):
    """n_days=1: covariance denominator n-1 = 0 and both variances are
    0 — the old corr/covar_samp builtins returned NULL, so the
    explicit-moment rewrite must too (not NaN, not DIVIDE_BY_ZERO)."""
    df = _corr_frame(
        spark,
        [("click", ts(1), 5.0), ("purchase", ts(1), 3.0)],
    )
    row = _run_corr(spark, df, monkeypatch).collect()[0]
    assert row.n_days == 1
    assert row.corr_cp is None
    assert row.cov_cp is None


def test_correlation_zero_variance_yields_null_corr(
    spark, ts, monkeypatch
):
    """A constant click series has zero variance: correlation is
    undefined (NULL), while covariance is defined and exactly 0."""
    df = _corr_frame(
        spark,
        [
            ("click", ts(1), 5.0),
            ("click", ts(2), 5.0),
            ("purchase", ts(1), 3.0),
            ("purchase", ts(2), 7.0),
        ],
    )
    row = _run_corr(spark, df, monkeypatch).collect()[0]
    assert row.n_days == 2
    assert row.corr_cp is None
    assert row.cov_cp == 0.0


def test_rank_stats_match_scipy_formulas_on_known_data(spark):
    """Behavior twin for the distributed ranking rewrite: hand-checked
    U and KS values on a tiny two-group sample with ties."""
    from timeseries_spark.extensions.dataquality import (
        ks_two_sample,
        mann_whitney_u,
    )

    rows = [("a", v) for v in [1.0, 2.0, 2.0, 5.0]] + [
        ("b", v) for v in [2.0, 3.0, 4.0]
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    u = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    # pooled sorted: 1,2,2,2,3,4,5 -> midranks 1,3,3,3,5,6,7
    # R_a = 1+3+3+7 = 14; U_a = 14 - 4*5/2 = 4; U_b = 12 - 4 = 8
    assert (u.n_a, u.n_b, u.u_a, u.u_b) == (4, 3, 4.0, 8.0)
    k = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    # ECDF_a: 1/4 @1, 3/4 @2, @3, @4, 1 @5; ECDF_b: 1/3 @2, 2/3 @3, 1 @4
    # gaps: .25, .416667, .083333, .25, 0 -> max .416667 at v=2
    assert (k.n_a, k.n_b) == (4, 3)
    assert k.ks_stat == pytest.approx(0.416667, abs=1e-6)
    assert k.ks_at == 2.0


def test_rank_stats_distributed_equals_unbucketed_reference(spark):
    """The bucketed cumulation must be invariant to the bucket count:
    B=2 and B=64 give identical statistics on the same data."""
    from timeseries_spark.extensions.dataquality import (
        ks_two_sample,
        mann_whitney_u,
    )

    df = (
        spark.range(500)
        .select(
            F.when(F.col("id") % 3 == 0, "a").otherwise("b").alias("g"),
            (F.sin(F.col("id").cast("double")) * 100).alias("v"),
        )
    )
    for fn in (mann_whitney_u, ks_two_sample):
        lo = fn(df, "g", "v", "a", "b", n_buckets=2).collect()
        hi = fn(df, "g", "v", "a", "b", n_buckets=64).collect()
        assert lo == hi
