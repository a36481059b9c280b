"""End-to-end pipeline golden run (SURVEY.md §5.2): dating → expansion →
score → novelty over the domain fixtures, staged parquet round-trip, point
query."""

import pytest
from pyspark.sql import functions as F

from timeseries_spark.plans import TimeseriesPipeline, point_query


@pytest.fixture(scope="module")
def staged(spark, evidence_dated, disease, cfg, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pipeline_out"))
    pipe = TimeseriesPipeline(cfg, out_dir=out)
    return pipe.run(evidence_dated, disease), out


def test_all_stages_produced(staged):
    tables, _ = staged
    assert set(tables) == {
        "association_by_datasource",
        "association_by_datasource_indirect",
        "association_overall",
        "association_overall_indirect",
    }
    for name, df in tables.items():
        assert df.count() > 0, name


def test_indirect_propagates_to_ancestors(staged):
    """D1's evidence must also score under its ancestors DA and ROOT."""
    tables, _ = staged
    direct = tables["association_by_datasource"]
    indirect = tables["association_by_datasource_indirect"]
    assert direct.filter("diseaseId = 'DA'").count() == 0
    da = indirect.filter(
        (F.col("diseaseId") == "DA") & (F.col("targetId") == "T1")
    )
    assert da.count() > 0
    # ROOT aggregates D1 + D2 evidence: its 2003 score for (ROOT, T1, src_a)
    # equals the D1 score (only D1 contributes T1 evidence)
    r = {
        row["year"]: row["score"]
        for row in indirect.filter(
            "diseaseId = 'ROOT' AND targetId = 'T1' AND datasourceId = 'src_a'"
        ).collect()
    }
    d = {
        row["year"]: row["score"]
        for row in direct.filter(
            "diseaseId = 'D1' AND targetId = 'T1' AND datasourceId = 'src_a'"
        ).collect()
    }
    assert r[2003] == pytest.approx(d[2003])


def test_overall_grain_combines_sources(staged, cfg):
    """Overall grain = two-level harmonic over the per-source scores
    (timeseries.py:638-732; weights default to 1.0 for sources outside the
    registry): at 2005 src_a has cumulated [0.891, 0.87, 0.0576] and src_b
    [0.5]; each is harmonic-summed and /1.64-normalized per source, then
    the two source scores are harmonic-summed and /1.64-normalized again."""
    tables, _ = staged
    overall = tables["association_overall"]
    s = {
        r["year"]: r["score"]
        for r in overall.filter("diseaseId = 'D1' AND targetId = 'T1'").collect()
    }
    src_a = (0.891 / 1 + 0.87 / 4 + 0.0576 / 9) / 1.64
    src_b = 0.5 / 1.64
    expected = (max(src_a, src_b) / 1 + min(src_a, src_b) / 4) / 1.64
    assert s[2005] == pytest.approx(expected)
    assert s[2010] == pytest.approx(expected)


def test_staged_parquet_partitioning(staged, spark):
    _, out = staged
    df = spark.read.parquet(f"{out}/association_by_datasource")
    assert "sourceId" in df.columns
    # partition pruning: reading one source touches one partition dir
    import os

    parts = [
        p
        for p in os.listdir(f"{out}/association_by_datasource")
        if p.startswith("sourceId=")
    ]
    assert sorted(parts) == ["sourceId=src_a", "sourceId=src_b"]


def test_skip_if_exists_is_correct(staged, spark, evidence_dated, disease, cfg):
    """S9 fix: a second run against the same out_dir reuses staged tables
    (no recompute-and-fail on existing paths)."""
    _, out = staged
    pipe = TimeseriesPipeline(cfg, out_dir=out)
    again = pipe.run(evidence_dated, disease)
    assert again["association_by_datasource"].count() > 0


def test_point_query_shape(staged, disease, spark):
    tables, _ = staged
    out = point_query(
        tables["association_overall"],
        tables["association_by_datasource"],
        "D1",
        "T1",
        disease=disease,
    ).collect()
    sources = {r["datasourceId"] for r in out}
    assert sources == {"overall", "src_a", "src_b"}
    assert all(r["diseaseName"] == "asthma" for r in out)
    years = [r["year"] for r in out if r["datasourceId"] == "overall"]
    assert years == sorted(years, key=lambda y: (y is None, y))
