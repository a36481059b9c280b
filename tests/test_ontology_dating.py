"""Ontology expansion (timeseries.py:339-366) and dating pipeline
(timestamp_evidence.py) semantics."""

import pytest
from pyspark.sql import functions as F

from timeseries_spark.operators.dating import (
    select_best_date,
    with_curation_year,
    with_pubmed_year,
    with_study_year,
    year_from_iso,
)
from timeseries_spark.operators.ontology import expand_ontology


def test_expand_ontology_rowcount(evidence_dated, disease):
    """Row count = sum over evidence of (1 + |ancestors|) (SURVEY.md §5.3)."""
    out = expand_ontology(evidence_dated, disease)
    # D1 has 2 ancestors (3 rows each), D2 has 1 (2 rows each)
    n_d1 = evidence_dated.filter("diseaseId = 'D1'").count()
    n_d2 = evidence_dated.filter("diseaseId = 'D2'").count()
    assert out.count() == n_d1 * 3 + n_d2 * 2


def test_expand_ontology_reassigns_disease(evidence_dated, disease):
    out = expand_ontology(evidence_dated, disease)
    got = {
        r["diseaseId"]
        for r in out.filter("id = 'e1'").select("diseaseId").collect()
    }
    assert got == {"D1", "DA", "ROOT"}


def test_year_from_iso(spark):
    df = spark.createDataFrame([("2014-07-30",), (None,)], "d string")
    got = [r[0] for r in df.select(year_from_iso("d")).collect()]
    assert got == [2014, None]


def test_best_date_priority(spark):
    """studyYear > curationYear > publicationYear > pubmedYear
    (timestamp_evidence.py:288)."""
    df = spark.createDataFrame(
        [
            ("a", 1999, 2005, 2010, 2015, "p1"),
            ("b", None, 2005, 2010, 2015, "p2"),
            ("c", None, None, 2010, 2015, None),
            ("d", None, None, None, None, "p3"),
        ],
        "id string, studyYear int, curationYear int, publicationYear int,"
        " pubmedYear int, pmid string",
    ).withColumn("targetId", F.lit("T"))
    out = {r["id"]: r for r in select_best_date(df, ("id", "targetId")).collect()}
    assert out["a"]["year"] == 1999
    assert out["b"]["year"] == 2005
    assert out["c"]["year"] == 2010
    assert out["d"]["year"] is None
    assert out["a"]["literature"] == ["p1"]
    assert out["c"]["literature"] == []


def test_best_date_min_over_pmids(spark):
    """One evidence exploded to several pmids keeps min(year) and the
    collected pmid set (timestamp_evidence.py:309-319)."""
    df = spark.createDataFrame(
        [
            ("a", None, None, None, 1994, "p1"),
            ("a", None, None, None, 1980, "p2"),
            ("a", None, None, None, None, "p2"),
        ],
        "id string, studyYear int, curationYear int, publicationYear int,"
        " pubmedYear int, pmid string",
    )
    out = select_best_date(df, ("id",)).collect()[0]
    assert out["year"] == 1980
    assert sorted(out["literature"]) == ["p1", "p2"]


def test_study_two_hop(spark):
    """gwas: evidence ⋈ credible_set ⋈ study (timestamp_evidence.py:209-230)."""
    ev = spark.createDataFrame([("e1", "L1"), ("e2", "L2"), ("e3", None)],
                               "id string, studyLocusId string")
    cs = spark.createDataFrame([("L1", "S1"), ("L2", "S9")],
                               "studyLocusId string, studyId string")
    st = spark.createDataFrame([("S1", "2014-07-30")],
                               "studyId string, publicationDate string")
    out = {r["id"]: r["studyYear"] for r in with_study_year(ev, st, cs).collect()}
    assert out == {"e1": 2014, "e2": None, "e3": None}


def test_pubmed_explode_outer_keeps_null_literature(spark):
    ev = spark.createDataFrame(
        [("e1", ["1", "2"]), ("e2", None), ("e3", [])],
        "id string, literature array<string>",
    )
    lookup = spark.createDataFrame([("1", 1994)], "pmid string, year int")
    out = with_pubmed_year(ev, lookup)
    assert out.count() == 4  # e1 twice, e2 & e3 kept with NULL pmid
    years = {r["id"]: r["pubmedYear"] for r in out.filter("pmid = '1'").collect()}
    assert years == {"e1": 1994}


def test_curation_year(spark):
    ev = spark.createDataFrame([("e1", "2001-02-03")], "id string, studyStartDate string")
    assert with_curation_year(ev).collect()[0]["curationYear"] == 2001


def test_multikey_curation_join_null_sentinel(spark):
    """J3: NULL join keys match NULL lookup keys via the "0" sentinel
    (timestamp_evidence.py:158-167)."""
    from timeseries_spark.operators.dating import with_curation_lookup_year

    ev = spark.createDataFrame(
        [("e1", "TF1", "DF1", "conf1"), ("e2", "TF2", None, "conf1"),
         ("e3", "TF1", "DF1", "other")],
        "id string, targetFromSourceId string, diseaseFromSource string,"
        " confidence string",
    )
    lookup = spark.createDataFrame(
        [("TF1", "DF1", "conf1", 2012), ("TF2", None, "conf1", 2015)],
        "targetFromSourceId string, diseaseFromSource string,"
        " confidence string, year int",
    )
    out = with_curation_lookup_year(
        ev, lookup, ("targetFromSourceId", "diseaseFromSource", "confidence")
    )
    got = {r["id"]: r["curationYear"] for r in out.collect()}
    assert got == {"e1": 2012, "e2": 2015, "e3": None}
    assert set(out.columns) == {
        "id", "targetFromSourceId", "diseaseFromSource", "confidence",
        "curationYear",
    }


def test_url_year_explode_outer(spark):
    from timeseries_spark.operators.dating import with_url_year

    ev = spark.createDataFrame(
        [("e1", [("http://a", "A"), ("http://b", "B")]), ("e2", None), ("e3", [])],
        "id string, urls array<struct<url:string,niceName:string>>",
    )
    lookup = spark.createDataFrame([("http://a", 2019)], "url string, year int")
    out = with_url_year(ev, lookup)
    assert out.count() == 4
    got = {r["id"]: r["curationYear"] for r in out.filter("url = 'http://a'").collect()}
    assert got == {"e1": 2019}


def test_merge_dated_anti_union(spark, evidence_dated):
    from timeseries_spark.operators.dating import merge_dated

    dated = evidence_dated.filter("year IS NOT NULL").withColumn(
        "extraCol", F.lit("x")
    )
    merged = merge_dated(dated, evidence_dated.drop("year"))
    assert merged.count() == evidence_dated.count()
    # undated remainder present with NULL extraCol
    undated = merged.filter("id = 'e6'").collect()[0]
    assert undated["extraCol"] is None


def test_dating_coverage_single_pass(spark, evidence_dated):
    from timeseries_spark.operators.dating import dating_coverage

    cov = {
        r["datasourceId"]: (r["n_evidence"], r["n_dated"], r["dated_fraction"])
        for r in dating_coverage(evidence_dated, evidence_dated).collect()
    }
    # src_a: 5 evidence rows, 4 dated (e6 undated); src_b: 2 rows, 2 dated
    assert cov["src_a"] == (5, 4, 0.8)
    assert cov["src_b"] == (2, 2, 1.0)
