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


def year_from_messy_date(col: F.Column) -> F.Column:
    """Multi-format year extraction — the reference's curation-date
    normalizer (parse_timestamp.py:267-287), which must accept
    dot-separated dates ('12.05.2019' -> 2019), plain years ('2019'),
    and slash dates with 2-digit years ('01/02/19' -> 2019), and reject
    junk ('++', free text) as NULL.

    Same try-order as the reference: the last dot-field when it is a
    4-digit number (covers plain years — a string with no dot IS its own
    last dot-field), else '20' + the last slash-field when that is
    2-digit, else NULL. Pure Column expressions — engine-portable."""
    s = F.trim(col)
    last_dot = F.element_at(F.split(s, r"\."), -1)
    last_slash = F.element_at(F.split(s, "/"), -1)
    return (
        F.when(last_dot.rlike("^[0-9]{4}$"), last_dot.cast("int"))
        .when(
            last_slash.rlike("^[0-9]{2}$"),
            F.concat(F.lit("20"), last_slash).cast("int"),
        )
        .cast("int")
    )


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


class DatingDriver:
    """Registry-driven stage-1 dating — the reference's main sequence
    (timestamp_evidence.py:360-375) as one composable run.

    ``daters`` is an ordered registry of ``(source_ids, fn)`` pairs; each
    ``fn(evidence_part, lookups)`` returns its sources' rows with candidate
    year columns attached (the composable operators in this module). The
    driver then:

    1. runs every dater over ITS sources' slice of the evidence (a
       ``datasourceId`` filter — partition-pruned when the layout is
       sourceId-partitioned, S2);
    2. stacks the dated frames and the untouched remainder
       (anti-join on id + unionByName(allowMissingColumns), the
       reference's tmp1 merge — timestamp_evidence.py:259-266);
    3. ALWAYS runs the pubmed pass last over the full union — every
       source's rows get a pubmedYear candidate from the exploded
       literature (timestamp_evidence.py:249-283, 'always process this
       source the last one');
    4. applies ``select_best_date``: the studyYear > curationYear >
       publicationYear > pubmedYear coalesce + per-evidence regroup.

    Unlike the reference — which writes tmp1 parquet per dater, re-reads
    the whole directory for the pubmed pass, writes tmp2, re-reads again
    for the coalesce, then gsutil-deletes both (timestamp_evidence.py:
    255-331) — no stage here touches storage: the per-source frames stay
    DataFrames and union once, removing the 3× scan amplification
    (SURVEY.md §4)."""

    def __init__(self, daters, pmid2year: DataFrame | None = None):
        self.daters = list(daters)
        self.pmid2year = pmid2year

    def run(
        self,
        evidence: DataFrame,
        lookups: dict[str, DataFrame] | None = None,
        group_cols: tuple[str, ...] | None = None,
    ) -> DataFrame:
        lookups = lookups or {}
        dated: DataFrame | None = None
        for sources, fn in self.daters:
            part = evidence.filter(F.col("datasourceId").isin(*sources))
            out = fn(part, lookups)
            dated = (
                out
                if dated is None
                else dated.unionByName(out, allowMissingColumns=True)
            )
        full = merge_dated(dated, evidence) if dated is not None else evidence
        if self.pmid2year is not None:
            full = with_pubmed_year(full, self.pmid2year)  # always last
        elif "pmid" not in full.columns:
            full = full.withColumn("pmid", F.lit(None).cast("string"))
        if group_cols is not None:
            return select_best_date(full, group_cols)
        return select_best_date(full)


def reference_daters() -> list:
    """The reference's eight named daters (timestamp_evidence.py:68-246)
    over this module's composable operators, in run order; pubmed is NOT
    here — the driver sequences it last itself. Sources whose lookup is
    absent pass through undated (their rows reach the pubmed pass, exactly
    the reference's fallback for pmid-only sources)."""

    def gwas(part, lookups):
        if "study" not in lookups:
            return part
        return with_study_year(
            part, lookups["study"], lookups.get("credible_set")
        )

    def chembl(part, lookups):
        return with_curation_year(part)

    def clinvar(part, lookups):
        if "clinvar" not in lookups:
            return part
        return with_curation_lookup_year(
            part, lookups["clinvar"], keys=("studyId",)
        )

    def clingen(part, lookups):
        if "url2year" not in lookups:
            return part
        return with_url_year(part, lookups["url2year"])

    def curation_csv(part, lookups):
        if "curation" not in lookups:
            return part
        return with_curation_lookup_year(
            part, lookups["curation"], keys=("targetId", "diseaseId")
        )

    return [
        (("slapenrich", "expression_atlas", "cancer_biomarkers",
          "gene2phenotype"), curation_csv),
        (("clingen",), clingen),
        (("eva", "eva_somatic"), clinvar),
        (("gwas_credible_sets",), gwas),
        (("chembl",), chembl),
    ]


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
