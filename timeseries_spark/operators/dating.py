"""Evidence dating: attach the best available year to each evidence row.

Re-expression of the reference's stage-1 pipeline (timestamp_evidence.py).
The reference runs eight per-source daters, each re-reading and re-writing
parquet, then a pubmed pass that re-reads and unions the full evidence set
twice (scan amplification, SURVEY.md §4). Here the daters are composable
column derivations / lookup joins applied in ONE pass, and the best-date
rule is the same priority coalesce:

    year = coalesce(studyYear, curationYear, publicationYear, pubmedYear)
    (timestamp_evidence.py:288, 304-307)

followed by per-evidence re-grouping with ``collect_set(pmid)`` +
``min(year)`` (timestamp_evidence.py:309-319).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DATE_PRIORITY = ("studyYear", "curationYear", "publicationYear", "pubmedYear")


def year_from_iso(col: str) -> F.Column:
    """First dash-separated field of a "YYYY-MM-DD" string as int
    (timestamp_evidence.py:190-194, 241-245 — F12)."""
    return F.split(F.col(col), "-").getItem(0).cast("int")


def with_study_year(
    evidence: DataFrame,
    study: DataFrame,
    credible_set: DataFrame | None = None,
) -> DataFrame:
    """studyYear via the GWAS two-hop snowflake (timestamp_evidence.py:209-230):
    evidence ⋈ credible_set on studyLocusId ⋈ study on studyId, year from
    the study's publicationDate. Falls back to a direct studyId join when
    no credible_set is given. Dimension sides are broadcast."""
    study_years = study.select(
        "studyId", year_from_iso("publicationDate").alias("studyYear")
    )
    if credible_set is not None:
        hop = credible_set.join(F.broadcast(study_years), "studyId").select(
            "studyLocusId", "studyYear"
        )
        return evidence.join(F.broadcast(hop), "studyLocusId", "left")
    return evidence.join(F.broadcast(study_years), "studyId", "left")


def with_curation_year(evidence: DataFrame, start_date_col: str = "studyStartDate") -> DataFrame:
    """curationYear from the source's own ISO date string (chembl path,
    timestamp_evidence.py:241-245)."""
    return evidence.withColumn("curationYear", year_from_iso(start_date_col))


def with_pubmed_year(evidence: DataFrame, pmid2year: DataFrame) -> DataFrame:
    """pubmedYear: explode_outer the literature array (keeping rows with
    NULL/empty arrays — timestamp_evidence.py:266) and join the pmid→year
    lookup. The lookup is millions of rows at most — broadcast if small,
    else a plain shuffle join; we leave the strategy to AQE."""
    return evidence.withColumn("pmid", F.explode_outer("literature")).join(
        pmid2year.withColumnRenamed("year", "pubmedYear"), "pmid", "left"
    )


def select_best_date(
    dated: DataFrame,
    group_cols: tuple[str, ...] = (
        "id",
        "targetId",
        "diseaseId",
        "datasourceId",
        "score",
        "drugId",
        "clinicalPhase",
        "studyLocusId",
        "urls",
    ),
) -> DataFrame:
    """Priority-coalesce the candidate years, then re-group each evidence
    row: literature = collect_set(pmid), year = min over exploded pmids
    (timestamp_evidence.py:304-319). Missing candidate columns are treated
    as all-NULL so partial pipelines compose."""
    for c in DATE_PRIORITY:
        if c not in dated.columns:
            dated = dated.withColumn(c, F.lit(None).cast("int"))
    return (
        dated.withColumn("year", F.coalesce(*[F.col(c) for c in DATE_PRIORITY]))
        .groupBy(*[c for c in group_cols if c in dated.columns])
        .agg(
            F.collect_set("pmid").alias("literature"),
            F.min("year").cast("int").alias("year"),
        )
    )
