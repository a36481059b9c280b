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


def test_dating_driver_registry_sequencing(spark):
    """DatingDriver (timestamp_evidence.py:360-375): per-source daters run
    over their registry slice, the untouched remainder is re-merged, the
    pubmed pass runs LAST over everything, and the priority coalesce picks
    studyYear > curationYear > publicationYear > pubmedYear."""
    import pyspark.sql.functions as F

    from timeseries_spark.operators.dating import (
        DatingDriver,
        reference_daters,
        year_from_iso,
    )
    from timeseries_spark.sources.fixtures import (
        gen_credible_set,
        gen_evidence,
        gen_study,
    )

    ev = gen_evidence(spark, n=2000)
    study = gen_study(spark)
    cs = gen_credible_set(spark)
    # deterministic pmid→year lookup covering every pmid in the corpus
    pmid2year = (
        ev.select(F.explode("literature").alias("pmid"))
        .distinct()
        .withColumn(
            "year", (F.lit(1990) + F.pmod(F.hash("pmid"), F.lit(30))).cast("int")
        )
    )
    # curation lookup for the csv-style daters: every (target, disease) of
    # the slapenrich slice dated 1997
    cur = (
        ev.filter(F.col("datasourceId") == "slapenrich")
        .select("targetId", "diseaseId")
        .distinct()
        .withColumn("year", F.lit(1997))
    )
    daters = [
        d
        for d in reference_daters()
        if d[0][0] in ("slapenrich", "gwas_credible_sets", "chembl")
    ]
    driver = DatingDriver(daters, pmid2year=pmid2year)
    out = driver.run(
        ev,
        {"study": study, "credible_set": cs, "curation": cur},
        group_cols=("id", "targetId", "diseaseId", "datasourceId", "score"),
    ).cache()

    # regrouped back to evidence grain
    assert out.count() == ev.count()

    # chembl: curationYear (ISO parse) wins over publication/pubmed
    chembl_expect = {
        r["id"]: r["y"]
        for r in ev.filter("datasourceId = 'chembl'")
        .select("id", year_from_iso("studyStartDate").alias("y"))
        .collect()
    }
    chembl_got = {
        r["id"]: r["year"]
        for r in out.filter("datasourceId = 'chembl'").collect()
    }
    assert chembl_got == chembl_expect

    # gwas: two-hop studyYear wins (every studyLocusId resolves)
    gwas_undated = out.filter(
        "datasourceId = 'gwas_credible_sets' AND year IS NULL"
    ).count()
    assert gwas_undated == 0

    # slapenrich: curation lookup (1997) wins over later candidates for
    # rows where pubmed/publication would give a different year
    slap = out.filter("datasourceId = 'slapenrich'").select("year").distinct()
    assert [r["year"] for r in slap.collect()] == [1997]

    # pubmed runs last and catches sources with no dater of their own:
    # an undatable europepmc row with literature gets its min pmid year
    one = (
        ev.filter(
            "datasourceId = 'europepmc' AND publicationYear IS NULL"
            " AND literature IS NOT NULL"
        )
        .select("id", F.explode("literature").alias("pmid"))
        .join(pmid2year, "pmid")
        .groupBy("id")
        .agg(F.min("year").alias("expected"))
        .limit(5)
        .collect()
    )
    assert one, "fixture must contain pubmed-only europepmc rows"
    got = {
        r["id"]: r["year"]
        for r in out.filter(
            F.col("id").isin([r["id"] for r in one])
        ).collect()
    }
    for r in one:
        assert got[r["id"]] == r["expected"]
    out.unpersist()


def test_dating_driver_missing_lookups_pass_through(spark):
    """Daters whose lookup is absent pass their slice through undated —
    the documented contract: a caller supplying only pmid2year still gets
    a full run (the pubmed pass catches everything)."""
    import pyspark.sql.functions as F

    from timeseries_spark.operators.dating import DatingDriver, reference_daters
    from timeseries_spark.sources.fixtures import gen_evidence

    ev = gen_evidence(spark, n=300)
    pmid2year = (
        ev.select(F.explode("literature").alias("pmid"))
        .distinct()
        .withColumn("year", F.lit(2001))
    )
    out = DatingDriver(reference_daters(), pmid2year=pmid2year).run(
        ev,
        {},  # no lookups at all
        group_cols=("id", "targetId", "diseaseId", "datasourceId", "score"),
    )
    assert out.count() == ev.count()
    # chembl still dates via its ISO column (no lookup needed); rows with
    # literature get the pubmed year
    assert (
        out.filter("datasourceId = 'chembl' AND year IS NULL").count() == 0
    )
