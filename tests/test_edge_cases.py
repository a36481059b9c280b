"""Robustness edges: empty inputs, single rows, all-undated evidence —
operators must degrade gracefully, not throw."""

import pytest
from pyspark.sql import functions as F

from timeseries_spark.operators.novelty import add_novelty
from timeseries_spark.operators.scoring import association_score

KEYS = ("diseaseId", "targetId", "datasourceId")
SCHEMA = (
    "id string, diseaseId string, targetId string, datasourceId string,"
    " score double, year int"
)


def test_empty_evidence_yields_empty_outputs(spark, cfg):
    empty = spark.createDataFrame([], SCHEMA)
    scores = association_score(empty, cfg, KEYS)
    assert scores.count() == 0
    assert add_novelty(scores, cfg, KEYS).count() == 0


def test_single_evidence_row(spark, cfg):
    one = spark.createDataFrame(
        [("e1", "D", "T", "s", 0.5, 2005)], SCHEMA
    )
    out = add_novelty(association_score(one, cfg, KEYS), cfg, KEYS).collect()
    # full dense spine incl. sentinel row
    assert len(out) == (cfg.last_year - cfg.first_year + 1) + 1
    by_year = {r["year"]: r for r in out}
    assert by_year[2005]["score"] == pytest.approx(0.5 / 1.64)
    assert by_year[2005]["novelty"] > 0  # the jump year radiates
    assert by_year[2004]["score"] is None and by_year[2004]["novelty"] == 0.0


def test_all_undated_evidence(spark, cfg):
    """Only the sentinel (NULL-year) bucket scores; dated years stay NULL."""
    undated = spark.createDataFrame(
        [("e1", "D", "T", "s", 0.8, None), ("e2", "D", "T", "s", 0.4, None)],
        SCHEMA,
    )
    out = {r["year"]: r for r in add_novelty(
        association_score(undated, cfg, KEYS), cfg, KEYS
    ).collect()}
    assert out[None]["score"] == pytest.approx((0.8 + 0.4 / 4) / 1.64)
    assert out[cfg.first_year]["score"] is None


def test_approx_distinct_within_tolerance(spark, sf_dir):
    """approx_count_distinct (HLL++) is the documented 100TB opt-in for
    the exact A3 counts — show it lands within its error bound on real
    data (rsd=0.05 default)."""
    from timeseries_spark.queries import load

    orders = load(spark, sf_dir, "orders")
    exact, approx = orders.agg(
        F.countDistinct("o_custkey").alias("e"),
        F.approx_count_distinct("o_custkey").alias("a"),
    ).first()
    assert abs(approx - exact) / exact < 0.15
