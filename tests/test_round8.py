"""Round-8 operators: triangle counting, MMR re-rank, token-label MI,
STL decomposition, embedding standardization."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_triangle_counts_k4_and_isolated_edge(spark):
    # K4 on {1,2,3,4}: 4 triangles, every node in 3; edge {5,6}: 0
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges.append((5, 6))
    from timeseries_spark.extensions.graph import triangle_counts

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0}


def test_triangle_counts_direction_and_dup_insensitive(spark):
    # both directions + duplicates + a loop must not change the count
    from timeseries_spark.extensions.graph import triangle_counts

    base = [(1, 2), (2, 3), (1, 3)]
    noisy = base + [(b, a) for a, b in base] + base + [(2, 2)]
    df = spark.createDataFrame(noisy, "src bigint, dst bigint")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_mmr_prefers_diverse_over_redundant(spark):
    # docs 1/2 are near-copies of each other (both highly relevant),
    # doc 3 is less relevant but diverse; with a diversity-leaning lam
    # the greedy step 2 must skip the redundant near-copy. The query is
    # deliberately NOT equal to any doc — if it were, rel == sim-to-
    # selected and MMR degenerates to a pure rel ranking.
    from timeseries_spark.extensions.similarity import mmr_rerank

    vecs = [
        (1, [0.9, 0.1]),
        (2, [0.905, 0.095]),
        (3, [0.6, -0.8]),
    ]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    qs = spark.createDataFrame(
        [(100, [1.0, 0.0])], "query_id bigint, query_vec array<double>"
    )
    out = sorted(
        mmr_rerank(df, qs, pool_k=3, k=2, lam=0.3).collect(),
        key=lambda r: r["step"],
    )
    # step 1: highest rel is doc 2; step 2: doc 3 (diverse) beats the
    # near-copy doc 1 despite doc 1's far higher relevance
    assert [r["neighbor_id"] for r in out] == [2, 3]


def test_mmr_validates(spark):
    import pytest

    from timeseries_spark.extensions.similarity import mmr_rerank

    df = spark.createDataFrame(
        [(1, [1.0])], "vec_id bigint, embedding array<double>"
    )
    qs = spark.createDataFrame(
        [(2, [1.0])], "query_id bigint, query_vec array<double>"
    )
    with pytest.raises(ValueError):
        mmr_rerank(df, qs, pool_k=2, k=5)
    with pytest.raises(ValueError):
        mmr_rerank(df, qs, lam=1.5)


def test_token_label_mi_discriminative_beats_uniform(spark):
    # 'aaa' only in label x, 'bbb' only in y (perfectly informative);
    # 'ccc' everywhere (zero information)
    from timeseries_spark.extensions.text import token_label_mi

    rows = [(i, "x", "aaa ccc") for i in range(10)] + [
        (i + 10, "y", "bbb ccc") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {r["token"]: r for r in token_label_mi(df, top_k=10).collect()}
    assert out["ccc"]["mi_nats"] == 0.0
    # perfect binary split: MI = ln 2
    assert abs(out["aaa"]["mi_nats"] - math.log(2)) < 1e-6
    assert abs(out["bbb"]["mi_nats"] - math.log(2)) < 1e-6
    assert out["aaa"]["doc_freq"] == 10


def test_stl_reconstructs_and_seasonal_centered(spark):
    # value = linear trend + weekly square wave; decomposition must
    # reconstruct exactly (value == trend + seasonal + residual by
    # construction) and the seasonal component must sum to ~0 over the
    # 7 phases
    from timeseries_spark.operators.timeseries import stl_decompose

    rows = [
        ("a", d, float(10 + d + (5 if d % 7 == 0 else 0)))
        for d in range(1, 29)
    ]
    df = spark.createDataFrame(rows, "k string, day int, v double")
    out = stl_decompose(df, ["k"], "day", "v", period=7, half_window=3)
    got = out.collect()
    assert len(got) == 28
    for r in got:
        assert abs(r["value"] - (r["trend"] + r["seasonal"] + r["residual"])) < 1e-9
    phases = {}
    for r in got:
        phases.setdefault(r["day"] % 7, set()).add(r["seasonal"])
    # one seasonal value per phase
    assert all(len(v) == 1 for v in phases.values())
    assert abs(sum(next(iter(v)) for v in phases.values())) < 1e-5
    # the spike phase carries the largest seasonal component
    assert max(phases, key=lambda p: next(iter(phases[p]))) == 0


def test_standardize_embeddings_unit_stats_and_constant_dim(spark):
    import numpy as np

    from timeseries_spark.extensions.embeddings import standardize_embeddings

    rng = np.random.RandomState(5)
    data = rng.randn(200, 3) * np.array([4.0, 0.5, 1.0]) + np.array(
        [10.0, -3.0, 0.0]
    )
    data[:, 2] = 7.0  # collapsed dimension
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id bigint, embedding array<double>",
    )
    out = standardize_embeddings(df, dims=3).collect()
    m = np.array([r["standardized"] for r in out])
    assert m.shape == (200, 3)
    for d in range(2):
        assert abs(m[:, d].mean()) < 1e-3
        assert abs(m[:, d].std() - 1.0) < 1e-3
    assert (m[:, 2] == 0.0).all()
