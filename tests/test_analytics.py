"""Stage-3 analytics: distribution counts, TA top-1, approval bell —
hand-computed expectations over tiny fixtures (SURVEY.md §5)."""

import pytest
from pyspark.sql import functions as F

from timeseries_spark.analytics import (
    approval_bell_matrix,
    first_approval_year,
    novelty_distribution,
    peak_novelty_rows,
    top_therapeutic_area,
)


@pytest.fixture(scope="module")
def assoc(spark):
    rows = [
        # diseaseId, targetId, datasourceId, year, score, novelty
        ("D1", "T1", "s1", 2001, 0.2, 0.0),
        ("D1", "T1", "s1", 2002, 0.6, 0.4),   # peak
        ("D1", "T1", "s1", 2003, 0.6, 0.1),
        ("D1", "T2", "s1", 2002, 0.3, 0.25),  # tie year 1
        ("D1", "T2", "s1", 2003, 0.5, 0.25),  # tie year 2 (both kept)
        ("D2", "T1", "s2", 2001, 0.9, 0.8),   # peak
        ("D2", "T1", "s2", None, 0.9, 0.0),   # undated row never counts
        ("D2", "T3", "s2", 2002, 0.1, 0.05),  # below cutoff
        # group whose GLOBAL max novelty sits on the undated bucket: the
        # reference's filter-then-argmax order must still count the best
        # dated peak (2003), not drop the group
        ("D2", "T4", "s2", None, 0.9, 0.9),
        ("D2", "T4", "s2", 2003, 0.5, 0.3),
        # same (D1,T1) pair peaking in BOTH sources: at datatype grain the
        # distinct pair count must not double
        ("D1", "T1", "s2", 2002, 0.5, 0.3),
    ]
    return spark.createDataFrame(
        rows,
        schema="diseaseId string, targetId string, datasourceId string,"
        " year int, score double, novelty double",
    )


def test_peak_rows_keep_ties(assoc):
    peaks = peak_novelty_rows(assoc)
    t2 = peaks.filter("targetId = 'T2' AND datasourceId = 's1'").collect()
    assert sorted(r["year"] for r in t2) == [2002, 2003]


def test_top_therapeutic_area_ranking(spark, disease):
    # priority list: TA2 before TA1; fixture diseases only carry TA1
    out = {
        r["diseaseId"]: r["therapeuticArea"]
        for r in top_therapeutic_area(disease, ["TA2", "TA1"]).collect()
    }
    assert out["D1"] == "TA1"
    # every disease with any TA got exactly one row
    assert len(out) == disease.filter(F.size("therapeuticAreas") > 0).count()


def test_novelty_distribution_counts(spark, assoc):
    disease_ta = spark.createDataFrame(
        [("D1", "TA1"), ("D2", "TA1")], schema="diseaseId string, therapeuticArea string"
    )
    out = novelty_distribution(
        assoc, disease_ta, cutoff=0.1, year_min=2000, year_max=2003
    )
    got = {
        (r["year"], r["datasourceId"]): (r["association"], r["target"])
        for r in out.filter("therapeuticArea = 'TA1'").collect()
    }
    # (D1,T1,s1) peaks 2002; (D1,T2,s1) ties 2002+2003; (D2,T1,s2) peaks 2001
    assert got[(2002, "s1")] == (2, 2)  # T1 and T2 both novel in 2002
    # T2's tie year still counts the association, but the TARGET count uses
    # first-peak-year-per-(ds,target) (min year) — T2 already counted at 2002
    assert got[(2003, "s1")] == (1, 0)
    assert got[(2001, "s2")] == (1, 1)
    # filter-then-argmax: T4's global max is on the undated bucket, but its
    # dated 2003 peak (novelty 0.3) must still count
    assert got[(2003, "s2")] == (1, 1)
    # dense zero-filled scaffold: every (year, source) cell exists
    assert got[(2001, "s1")] == (0, 0)
    assert out.count() == 4 * 2 * 1  # year_min..year_max × sources × TAs


def test_first_approval_keeps_ties(spark):
    drugs = spark.createDataFrame(
        [
            ("T1", "dA", 1999),
            ("T1", "dB", 1999),  # tie kept
            ("T1", "dC", 2005),
            ("T2", "dD", None),  # never approved -> dropped
        ],
        schema="targetId string, drugId string, firstApprovalYear int",
    )
    out = first_approval_year(drugs).collect()
    assert sorted(r["drugId"] for r in out) == ["dA", "dB"]


def test_bell_matrix_offsets(spark, assoc):
    approvals = spark.createDataFrame(
        [("T1", 2002), ("T2", 2000)],
        schema="targetId string, firstApprovalYear int",
    )
    out = {
        r["offset"]: r["n_targets"]
        for r in approval_bell_matrix(assoc, approvals, window=3, cutoff=0.1).collect()
    }
    # T1 peaks: 2002 (s1, off 0), 2001 (s2, off -1); T2 peaks 2002+2003 (off 2,3)
    assert out[0] == 1 and out[-1] == 1
    assert out[2] == 1 and out[3] == 1
    assert out[-3] == 0 and out[1] == 0
    assert len(out) == 7


def test_datatype_rollup(spark, assoc, cfg):
    """Datatype grain recounts the SAME peak rows per datatype — distinct
    pairs, not summed per-source counts (novelty_distribution.py:775-809):
    a pair peaking in two sources of one datatype counts ONCE."""
    from timeseries_spark.analytics.distribution import by_datatype
    from timeseries_spark.config import DataSource, EngineConfig

    disease_ta = spark.createDataFrame(
        [("D1", "TA1"), ("D2", "TA1")],
        schema="diseaseId string, therapeuticArea string",
    )
    # identity mapping (fixture sources unregistered): counts equal the
    # per-source distribution
    rolled = by_datatype(assoc, disease_ta, cfg, cutoff=0.1, year_min=2000, year_max=2003)
    got = {
        (r["year"], r["datatypeId"]): (r["association"], r["target"])
        for r in rolled.collect()
    }
    assert got[(2002, "s1")] == (2, 2)
    assert got[(2001, "s2")] == (1, 1)
    # s1 and s2 collapsed into ONE datatype: (D1,T1) peaks 2002 in s1 AND
    # s2 — distinct pair count at 2002 is 2 (D1T1, D1T2), NOT the
    # per-source sum 3; targets: T1+T2 first-peak 2002 -> 2 (T4: 2003)
    merged = EngineConfig(
        datasources=(
            DataSource("s1", "s1", "dt", 1.0),
            DataSource("s2", "s2", "dt", 1.0),
        )
    )
    rolled2 = by_datatype(assoc, disease_ta, merged, cutoff=0.1, year_min=2000, year_max=2003)
    got2 = {
        (r["year"], r["datatypeId"]): (r["association"], r["target"])
        for r in rolled2.collect()
    }
    # 2002 pairs {D1T1, D1T2} = 2, not the per-source sum 3; T1's FIRST
    # dt-grain peak year is 2001 (s2), so 2002 counts only T2
    assert got2[(2002, "dt")] == (2, 1)
    assert got2[(2001, "dt")] == (1, 1)  # pair (D2,T1); target T1


def test_cascade_slices_per_approval_year(spark, assoc):
    from timeseries_spark.analytics import approval_cascade

    approvals = spark.createDataFrame(
        [("T1", 2002), ("T2", 2000)],
        schema="targetId string, firstApprovalYear int",
    )
    out = approval_cascade(assoc, approvals, window=3, cutoff=0.1).collect()
    got = {(r["approvalYear"], r["offset"]): r["n_targets"] for r in out}
    # T1 (approved 2002): peaks at offsets 0 and -1; T2 (2000): offsets 2, 3
    assert got[(2002, 0)] == 1 and got[(2002, -1)] == 1
    assert got[(2000, 2)] == 1 and got[(2000, 3)] == 1
    assert got[(2002, 3)] == 0
    # 7 offsets per approval year present
    assert len(out) == 14


def test_target_facet_counts(spark, assoc):
    from timeseries_spark.analytics.distribution import target_facet_counts

    prior = spark.createDataFrame(
        [("T1", True, False), ("T2", False, True)],
        schema="targetId string, hasLigand boolean, hasSafetyEvent boolean",
    )
    novel = peak_novelty_rows(assoc).filter(F.col("novelty") >= 0.1)
    got = {
        (r["year"], r["datasourceId"]): (
            r["n_targets"], r["n_with_ligand"], r["n_with_safety_event"]
        )
        for r in target_facet_counts(novel, prior).collect()
    }
    assert got[(2002, "s1")] == (2, 1, 1)  # T1 (ligand) + T2 (safety)
    assert got[(2001, "s2")] == (1, 1, 0)  # T1 only


def test_bell_from_timeline_includes_phase_rows(spark):
    """The timeline-driven bell counts clinical-phase rows alongside
    source peaks — a target whose ONLY pre-approval signal is a phase-1/2
    trial still lands in the matrix (the reference's actual bell input)."""
    from timeseries_spark.analytics.approval import (
        approval_bell_from_timeline,
        approval_cascade_from_timeline,
    )

    timeline = spark.createDataFrame(
        [
            # (targetId, year, approvalYear) — TX has only a phase row
            ("T1", 2001, 2002),
            ("T1", 2002, 2002),
            ("TX", 1999, 2002),
        ],
        "targetId string, year int, approvalYear int",
    )
    bell = {
        r["offset"]: r["n_targets"]
        for r in approval_bell_from_timeline(timeline, window=3).collect()
    }
    assert bell[-1] == 1 and bell[0] == 1  # T1
    assert bell[-3] == 1  # TX clamped at -3
    casc = {
        (r["approvalYear"], r["offset"]): r["n_targets"]
        for r in approval_cascade_from_timeline(timeline, window=3).collect()
    }
    assert casc[(2002, -3)] == 1 and casc[(2002, 0)] == 1


def test_approval_bucket_bell_percentages(spark):
    """Irregular-bin bell (novelty_approval.py:518-715): per-datatype % of
    approved targets with a peak per bucket; exact-0 bucket separate from
    [-4,0); datatype remap collapses groups; denominator = distinct
    approved targets in the approval window."""
    from timeseries_spark.analytics.approval import approval_bucket_bell

    timeline = spark.createDataFrame(
        [
            # targetId, datasourceId, datatypeId, year, approvalYear
            ("T1", "s1", "genetic_association", 2000, 2002),  # off -2: [-4,0)
            ("T1", "s1", "genetic_association", 2002, 2002),  # off 0: "0"
            ("T2", "s2", "somatic_mutation", 1980, 2004),     # off -24: <-20
            ("T2", "s2", "somatic_mutation", 2006, 2004),     # off 2: (0,4]
            ("T3", "s3", "literature", 2010, 1990),           # approval outside window
        ],
        "targetId string, datasourceId string, datatypeId string,"
        " year int, approvalYear int",
    )
    novel = spark.createDataFrame(
        [("T1", 2002), ("T2", 2004), ("TZ", 2003), ("T3", 1990)],
        "targetId string, approvalYear int",
    )
    out = approval_bucket_bell(
        timeline,
        novel,
        year_min=2000,
        year_max=2025,
        datatype_groups={
            "somatic_genetic": ("somatic_mutation", "genetic_association")
        },
    )
    got = {
        (r["datatypeId"], r["years"]): r["pct_with_peak"]
        for r in out.collect()
    }
    # denominator: T1, T2, TZ approved in-window = 3 targets
    third = round(100.0 / 3, 4)
    assert got[("somatic_genetic", "[-4,0)")] == third  # T1
    assert got[("somatic_genetic", "0")] == third       # T1 exact
    assert got[("somatic_genetic", "<-20")] == third    # T2
    assert got[("somatic_genetic", "(0,4]")] == third   # T2
    assert got[("somatic_genetic", "(4,8]")] == 0.0
    # T3's approval (1990) is outside the window -> literature absent
    assert not any(dt == "literature" for dt, _ in got)
    # both targets peak somewhere -> two flags in two bins each, never
    # double-counted within a bin
    assert len(got) == 13  # one datatype x 13 bins


def test_early_phase_anchor_timeline(spark):
    """Early-clinical variant (novelty_approval.py:1513-1550): the anchor
    is the target's FIRST phase<=2 trial year (ISO-parsed), bounded to
    the window; the timeline then measures offsets from that anchor."""
    from timeseries_spark.analytics.approval import (
        approval_timeline,
        early_phase_targets,
    )

    drugs = spark.createDataFrame(
        [("d1", "drug one", 2010), ("d2", "drug two", 2012), ("d3", "x", None)],
        "drugId string, drug string, firstApprovalYear int",
    )
    chembl = spark.createDataFrame(
        [
            # drugId, targetId, diseaseId, clinicalPhase, studyStartDate, year
            ("d1", "T1", "D1", "1.0", "2003-05-01", 2003),
            ("d1", "T1", "D1", "2.0", "2001-07-01", 2001),  # earliest <3
            ("d1", "T1", "D1", "4.0", "1999-01-01", 1999),  # phase 4 ignored
            ("d2", "T2", "D2", "2.0", "1995-01-01", 1995),  # outside window
            ("d3", "T3", "D3", "1.0", "2005-01-01", 2005),  # never approved
        ],
        "drugId string, targetId string, diseaseId string,"
        " clinicalPhase string, studyStartDate string, year int",
    )
    anchors = early_phase_targets(drugs, chembl, year_min=2000, year_max=2025)
    got = {r["targetId"]: r["clinicalYear"] for r in anchors.collect()}
    # T1 anchored at 2001 (earliest phase<=2); T2 excluded (anchor 1995
    # outside window); T3 excluded (no approval)
    assert got == {"T1": 2001}

    assoc = spark.createDataFrame(
        [("D1", "T1", "s1", 2004, 0.5, 0.6)],
        "diseaseId string, targetId string, datasourceId string,"
        " year int, score double, novelty double",
    )
    tl = approval_timeline(
        anchors, assoc, chembl, anchor_col="clinicalYear"
    ).collect()
    by_src = {r["datasourceId"]: r for r in tl if r["datasourceId"] == "s1"}
    assert by_src["s1"]["window"] == 3  # 2004 - anchor 2001
    assert by_src["s1"]["clinicalYear"] == 2001


def test_biotype_breakdown(spark):
    from timeseries_spark.analytics.distribution import biotype_breakdown
    from timeseries_spark.sources.fixtures import gen_target

    pairs = spark.createDataFrame(
        [("ENSG00000000001", "D1"), ("ENSG00000000002", "D1"),
         ("ENSG00000000001", "D2")],
        "targetId string, diseaseId string",
    )
    out = {
        r["biotype"]: r["n_targets"]
        for r in biotype_breakdown(pairs, gen_target(spark, n=10)).collect()
    }
    # ids 1 and 2 are protein_coding in the deterministic fixture; the
    # duplicate (T1, D2) pair must not double-count T1
    assert out == {"protein_coding": 2}
