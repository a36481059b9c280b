"""Property-based invariants (SURVEY.md §5.3) over randomized evidence:
hypothesis generates small evidence sets; the engine's outputs must hold
the reference's mathematical guarantees for every one of them.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from timeseries_spark.config import EngineConfig
from timeseries_spark.operators.novelty import add_novelty
from timeseries_spark.operators.scoring import association_score

CFG = EngineConfig(first_year=2000, last_year=2006)
KEYS = ("diseaseId", "targetId", "datasourceId")

# max possible harmonic score: sum_{i<=k} 1/i^2 with unit evidence scores
MAX_HARMONIC = sum(1.0 / (i * i) for i in range(1, CFG.top_k + 1)) / CFG.max_score

evidence_rows = st.lists(
    st.tuples(
        st.sampled_from(["D1", "D2"]),
        st.sampled_from(["T1", "T2"]),
        st.sampled_from(["s1", "s2"]),
        st.one_of(st.none(), st.integers(2000, 2006)),
        st.one_of(
            st.floats(0.0, 1.0, allow_nan=False),
            st.just(float("nan")),
        ),
    ),
    min_size=1,
    max_size=12,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _score(spark, rows):
    df = spark.createDataFrame(
        [(f"e{i}", d, t, s, y, v) for i, (d, t, s, y, v) in enumerate(rows)],
        "id string, diseaseId string, targetId string, datasourceId string,"
        " year int, score double",
    )
    return association_score(df, CFG, KEYS)


@SLOW
@given(rows=evidence_rows)
def test_scores_bounded_and_monotone(spark, rows):
    out = _score(spark, rows).collect()
    series: dict[tuple, list] = {}
    for r in out:
        assert r["score"] is None or 0.0 <= r["score"] <= MAX_HARMONIC + 1e-9
        key = (r["diseaseId"], r["targetId"], r["datasourceId"])
        series.setdefault(key, []).append((r["year"], r["score"]))
    for vals in series.values():
        # sentinel (NULL year) sorts last = all-time score, the max
        ordered = [
            s
            for _, s in sorted(vals, key=lambda p: (p[0] is None, p[0]))
            if s is not None
        ]
        for a, b in zip(ordered, ordered[1:]):
            assert b >= a - 1e-12, "cumulative score must be non-decreasing"


@SLOW
@given(rows=evidence_rows)
def test_dense_grid_and_sentinel_roundtrip(spark, rows):
    out = _score(spark, rows)
    spine_years = set(range(CFG.first_year, CFG.last_year + 1)) | {None}
    got_years = {r["year"] for r in out.select("year").distinct().collect()}
    assert got_years <= spine_years
    # every key has the full dense spine
    per_key = out.groupBy(*KEYS).count().collect()
    for r in per_key:
        assert r["count"] == len(spine_years)


@SLOW
@given(rows=evidence_rows)
def test_novelty_bounded_and_zero_without_jump(spark, rows):
    scores = _score(spark, rows)
    out = add_novelty(scores, CFG, KEYS).collect()
    assert len(out) == len(scores.collect())
    for r in out:
        assert 0.0 <= r["novelty"] <= 1.0
    # novelty must be 0 strictly before a key's first positive score:
    # no jump has happened yet, so no peak can radiate there
    series: dict[tuple, list] = {}
    for r in out:
        key = (r["diseaseId"], r["targetId"], r["datasourceId"])
        series.setdefault(key, []).append(r)
    for vals in series.values():
        ordered = sorted(vals, key=lambda r: (r["year"] is None, r["year"]))
        for r in ordered:
            s = r["score"]
            if s is not None and not math.isnan(s) and s > 0:
                break
            assert r["novelty"] == 0.0, "novelty before first positive score"


@SLOW
@given(
    ancestors=st.lists(
        st.lists(st.sampled_from(["A1", "A2", "A3"]), max_size=3, unique=True),
        min_size=1,
        max_size=4,
    )
)
def test_ontology_expansion_rowcount(spark, ancestors):
    """|output| = Σ over evidence of (1 + |ancestors(disease)|)."""
    from timeseries_spark.operators.ontology import expand_ontology

    disease = spark.createDataFrame(
        [(f"D{i}", f"name{i}", a, ["TA1"]) for i, a in enumerate(ancestors)],
        "id string, name string, ancestors array<string>,"
        " therapeuticAreas array<string>",
    )
    evidence = spark.createDataFrame(
        [(f"e{i}", f"D{i}", "T1", "s1", 0.5, None) for i in range(len(ancestors))],
        "id string, diseaseId string, targetId string, datasourceId string,"
        " score double, year int",
    )
    out = expand_ontology(evidence, disease)
    expected = sum(1 + len(a) for a in ancestors)
    assert out.count() == expected
