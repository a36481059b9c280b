"""Holt-Winters additive smoothing + Zipf fit (round 6)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from timeseries_spark.operators.timeseries import holt_winters_additive


def _hw_python(xs, a, g, d, m):
    """Reference implementation of the exact seeding/update contract."""
    out = []
    l = b = None
    q = [0.0] * m
    for x in xs:
        if l is None:
            l, b = x, 0.0
        else:
            sp = q[0]
            nl = a * (x - sp) + (1 - a) * (l + b)
            nb = g * (nl - l) + (1 - g) * b
            ns = d * (x - nl) + (1 - d) * sp
            q = q[1:] + [ns]
            l, b = nl, nb
        out.append((l, b, q[-1], l + b + q[0]))
    return out


def test_holt_winters_matches_reference_fold(spark):
    xs = [10.0, 12.0, 9.0, 14.0, 11.0, 13.0, 10.5, 15.0, 12.5]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)], "k string, t int, x double"
    )
    got = {
        r["t"]: (r["level"], r["trend"], r["seasonal"], r["forecast_next"])
        for r in holt_winters_additive(
            df, ["k"], "t", "x", alpha=0.5, gamma=0.3, delta=0.4, period=3
        ).collect()
    }
    want = _hw_python(xs, 0.5, 0.3, 0.4, 3)
    for t, (l, b, s, f) in enumerate(want):
        snap = lambda v: math.floor(v * 10000 + 0.5) / 10000  # noqa: E731
        assert got[t] == (snap(l), snap(b), snap(s), snap(f)), f"t={t}"


def test_holt_winters_validates_params(spark):
    df = spark.createDataFrame([("k", 0, 1.0)], "k string, t int, x double")
    for bad in (
        dict(alpha=0.0),
        dict(gamma=1.5),
        dict(delta=-0.1),
        dict(period=1),
    ):
        kw = dict(alpha=0.5, gamma=0.3, delta=0.4, period=7) | bad
        with pytest.raises(ValueError):
            holt_winters_additive(df, ["k"], "t", "x", **kw)


def test_zipf_fit_recovers_power_law(spark, tmp_path):
    """A corpus whose token counts follow an exact power law
    freq(r) = C·r^s must come back with slope ~= s and r2 ~= 1."""
    from timeseries_spark.queries.text import zipf_fit

    s_true = -1.2
    rows = []
    doc_id = 0
    # 30 tokens, counts round(1000 * r^-1.2); emit as one-token docs
    for r in range(1, 31):
        cnt = max(1, round(1000 * r**s_true))
        for _ in range(cnt):
            rows.append((doc_id, f"tok{r:03d}", "en", "srcZ", 6))
            doc_id += 1
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    (row,) = zipf_fit(spark, str(tmp_path)).collect()
    assert row["source"] == "srcZ"
    # rounding to integer counts perturbs the tail slightly
    assert abs(row["zipf_slope"] - s_true) < 0.05
    assert row["zipf_r2"] > 0.99
    assert row["n_tokens"] == 30
