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


def with_curation_lookup_year(
    evidence: DataFrame,
    lookup: DataFrame,
    keys: tuple[str, ...],
    year_col: str = "curationYear",
) -> DataFrame:
    """Multi-key curation-date join (J3, up to 6 key columns,
    timestamp_evidence.py:138-147, 168-177). NULL join keys on either side
    are filled with the sentinel "0" before the join — the reference's
    workaround for NULL never equaling NULL in an equi join
    (timestamp_evidence.py:158-167) — and restored after."""
    marked = [f"__k_{k}" for k in keys]
    lhs = evidence
    rhs = lookup
    for k, m in zip(keys, marked):
        lhs = lhs.withColumn(m, F.coalesce(F.col(k).cast("string"), F.lit("0")))
        rhs = rhs.withColumn(m, F.coalesce(F.col(k).cast("string"), F.lit("0"))).drop(k)
    out = lhs.join(
        F.broadcast(rhs.withColumnRenamed("year", year_col)), marked, "left"
    )
    return out.drop(*marked)


def with_url_year(evidence: DataFrame, url2year: DataFrame) -> DataFrame:
    """curationYear via the nested-struct-array URL path (clingen,
    timestamp_evidence.py:131-133): explode_outer the ``urls.url`` field
    (rows with NULL/empty arrays survive with a NULL url) and join the
    per-url year lookup."""
    return evidence.withColumn("url", F.explode_outer("urls.url")).join(
        F.broadcast(url2year.withColumnRenamed("year", "curationYear")),
        "url",
        "left",
    )


def merge_dated(dated: DataFrame, evidence: DataFrame) -> DataFrame:
    """Stack per-source dated frames with the not-yet-dated remainder:
    left-anti join on ``id`` finds untouched evidence, unionByName with
    allowMissingColumns re-assembles the full set
    (timestamp_evidence.py:259-266, 296-303 — J6 + U1)."""
    remainder = evidence.join(dated.select("id"), "id", "left_anti")
    return dated.unionByName(remainder, allowMissingColumns=True)


def dating_coverage(evidence: DataFrame, dated: DataFrame) -> DataFrame:
    """Per-source dating coverage report (timestamp_evidence.py:333-357):
    total vs dated evidence counts and the dated fraction, in ONE pass
    over a union instead of the reference's join of two aggregates (J9
    rewrite). ``dated`` must carry a non-null ``year`` for dated rows."""
    tagged = evidence.select(
        "datasourceId", F.lit(0).alias("is_dated")
    ).unionByName(
        dated.filter(F.col("year").isNotNull()).select(
            "datasourceId", F.lit(1).alias("is_dated")
        )
    )
    return tagged.groupBy("datasourceId").agg(
        F.sum(F.lit(1) - F.col("is_dated")).alias("n_evidence"),
        F.sum("is_dated").alias("n_dated"),
        F.round(
            F.sum("is_dated")
            / F.greatest(F.sum(F.lit(1) - F.col("is_dated")), F.lit(1)),
            4,
        ).alias("dated_fraction"),
    )
