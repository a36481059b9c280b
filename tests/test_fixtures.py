"""Golden end-to-end run (SURVEY.md §5.2): seeded fixture generators →
ontology expansion → score → novelty, with hash-pinned aggregates. Any
semantic drift in the generators or the engine math breaks a pin.
"""

import pytest
from pyspark.sql import functions as F

from timeseries_spark.config import EngineConfig
from timeseries_spark.operators.novelty import add_novelty
from timeseries_spark.operators.ontology import expand_ontology
from timeseries_spark.operators.scoring import association_score
from timeseries_spark.sources.fixtures import (
    gen_disease,
    gen_drugs,
    gen_evidence,
    gen_target,
)

CFG = EngineConfig(first_year=2000, last_year=2010)


def _checksum(df, col):
    return df.agg(
        F.round(F.sum(F.nanvl(F.col(col), F.lit(0.0))), 6)
    ).first()[0]


@pytest.fixture(scope="module")
def evidence(spark):
    return gen_evidence(spark, 2000, 50, 40).withColumn(
        "year", F.col("publicationYear")
    )


def test_generators_deterministic(spark, evidence):
    again = gen_evidence(spark, 2000, 50, 40)
    assert _checksum(evidence, "score") == _checksum(again, "score")
    assert evidence.count() == 2000


def test_generator_shapes(spark, evidence):
    d = gen_disease(spark, 40)
    t = gen_target(spark, 50)
    dr = gen_drugs(spark, 100, 50)
    assert d.count() == 40
    assert d.filter(F.size("ancestors") == 0).count() == 4  # roots
    assert t.count() == 50
    assert dr.filter(F.col("firstApprovalYear").isNull()).count() > 0
    # referential integrity: evidence keys resolve against dimensions
    assert (
        evidence.join(d, evidence.diseaseId == d.id, "left_anti").count() == 0
    )
    assert (
        evidence.join(t, evidence.targetId == t.id, "left_anti").count() == 0
    )
    # europepmc is the high-volume source, as in the reference
    top = (
        evidence.groupBy("datasourceId").count().orderBy(F.desc("count")).first()
    )
    assert top["datasourceId"] == "europepmc"


def test_golden_pins(spark, evidence):
    """Pinned aggregates of the full run at (n=2000, 50 targets,
    40 diseases, seed s42). Regenerate pins deliberately if generator or
    engine semantics change on purpose."""
    assert _checksum(evidence, "score") == 992.3667
    d = gen_disease(spark, 40)
    indirect = expand_ontology(evidence, d)
    assert indirect.count() == 4917
    assoc = add_novelty(association_score(evidence, CFG), CFG)
    assert assoc.count() == 13008
    assert _checksum(assoc, "score") == 978.499392
    assert _checksum(assoc, "novelty") == 383.869


def test_dating_two_hop_over_generated_fixtures(spark):
    """Dating end-to-end on generated tables: gwas evidence rows resolve a
    studyYear through credible_set -> study; best-date coalesce prefers it
    over publicationYear."""
    from timeseries_spark.operators.dating import (
        select_best_date,
        with_study_year,
    )
    from timeseries_spark.sources.fixtures import gen_credible_set, gen_study

    ev = gen_evidence(spark, 5000, 50, 40)
    study = gen_study(spark, 500)
    cs = gen_credible_set(spark, 2000, 500)
    gwas = ev.filter(F.col("datasourceId") == "gwas_credible_sets")
    assert gwas.count() > 0
    dated = with_study_year(gwas, study, cs)
    resolved = dated.filter(F.col("studyYear").isNotNull())
    assert resolved.count() > 0
    best = select_best_date(
        dated.withColumn("pmid", F.explode_outer("literature")),
        ("id", "targetId", "diseaseId", "datasourceId"),
    )
    assert best.count() == gwas.count()
    # studyYear wins over publicationYear where both exist
    sample = (
        dated.filter(
            F.col("studyYear").isNotNull()
            & F.col("publicationYear").isNotNull()
            & (F.col("studyYear") != F.col("publicationYear"))
        )
        .select("id", "studyYear")
        .limit(1)
        .collect()
    )
    if sample:
        row = best.filter(F.col("id") == sample[0]["id"]).first()
        assert row["year"] == sample[0]["studyYear"]
