"""Deterministic domain-fixture generators (FIXTURES.md §A).

The reference's stage 0 scrapes dates from HTTP/FTP/XML into CSVs
(parse_timestamp.py:44-461) — external ingestion we replace with seeded
synthetic tables shaped like the reference's inputs. Generation is pure
Column math over ``spark.range`` (hash-derived pseudo-randoms, no Python
loops, no ``rand()``), so the same (n, seed) always produces identical
tables on any cluster size — the property golden tests depend on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseries_spark.config import DATA_SOURCES


def _u(salt: str, m: int) -> Column:
    """Deterministic uniform int in [0, m) from the row id."""
    return F.pmod(F.hash(F.col("id").cast("string"), F.lit(salt)), F.lit(m))


def gen_disease(spark: SparkSession, n: int = 300, seed: str = "s42") -> DataFrame:
    """Disease dimension with a 2-level ancestor DAG: ~10% of terms are
    roots (therapeutic areas, empty ancestors); the rest carry 1-3
    ancestors drawn from the roots."""
    n_roots = max(n // 10, 1)
    base = spark.range(n).withColumnRenamed("id", "rid").withColumn(
        "id",
        F.when(F.col("rid") < n_roots, F.concat(F.lit("TA_"), F.col("rid")))
        .otherwise(F.concat(F.lit("EFO_"), F.col("rid"))),
    )
    anc = F.array_distinct(
        F.array(
            *[
                F.concat(
                    F.lit("TA_"),
                    F.pmod(
                        F.hash(F.col("id"), F.lit(f"{seed}-anc{i}")),
                        F.lit(n_roots),
                    ),
                )
                for i in range(3)
            ]
        )
    )
    return base.select(
        "id",
        F.concat(F.lit("disease "), F.col("rid")).alias("name"),
        F.when(F.col("rid") < n_roots, F.array().cast("array<string>"))
        .otherwise(anc)
        .alias("ancestors"),
        F.when(F.col("rid") < n_roots, F.array(F.col("id")))
        .otherwise(F.slice(anc, 1, 1))
        .alias("therapeuticAreas"),
    )


def gen_target(spark: SparkSession, n: int = 500) -> DataFrame:
    return spark.range(n).select(
        F.concat(F.lit("ENSG"), F.lpad(F.col("id").cast("string"), 11, "0")).alias("id"),
        F.concat(F.lit("GENE"), F.col("id")).alias("approvedSymbol"),
        F.when(F.pmod("id", F.lit(10)) < 8, "protein_coding")
        .otherwise("lncRNA")
        .alias("biotype"),
    )


def gen_evidence(
    spark: SparkSession,
    n: int = 50_000,
    n_targets: int = 500,
    n_diseases: int = 300,
    seed: str = "s42",
) -> DataFrame:
    """Evidence fact table: Zipf-ish key skew (square of a uniform pushes
    mass toward low ids — hot targets/diseases exist, as in OT where a few
    genes dominate), ~2% NaN scores, ~30% missing publicationYear, source
    mix weighted toward europepmc (the reference's high-volume source)."""
    srcs = [ds.id for ds in DATA_SOURCES]
    df = spark.range(n)
    # skewed key draw: u^2/m keeps ids uniform-squared => low ids hot
    t_idx = F.pmod(_u(f"{seed}-t", n_targets) * _u(f"{seed}-t", n_targets), F.lit(n_targets))
    d_idx = F.pmod(_u(f"{seed}-d", n_diseases) * _u(f"{seed}-d", n_diseases), F.lit(n_diseases))
    n_roots = max(n_diseases // 10, 1)
    src_pick = _u(f"{seed}-s", 100)
    src_col = F.when(src_pick < 40, F.lit("europepmc"))
    for i, s in enumerate(srcs):
        lo = 40 + i * (60 // len(srcs))
        src_col = src_col.when(src_pick < lo + (60 // len(srcs)), F.lit(s))
    src_col = src_col.otherwise(F.lit(srcs[-1]))

    score = (_u(f"{seed}-sc", 10_000).cast("double") / 10_000)
    year = (F.lit(1990) + _u(f"{seed}-y", 36)).cast("int")
    pmid = F.concat(F.lit("3"), _u(f"{seed}-p", 1_000_000).cast("string"))

    return df.select(
        F.concat(F.lit("ev-"), F.col("id")).alias("id"),
        F.concat(F.lit("ENSG"), F.lpad(t_idx.cast("string"), 11, "0")).alias("targetId"),
        F.when(d_idx < n_roots, F.concat(F.lit("TA_"), d_idx))
        .otherwise(F.concat(F.lit("EFO_"), d_idx))
        .alias("diseaseId"),
        src_col.alias("datasourceId"),
        F.when(_u(f"{seed}-nan", 50) == 0, F.lit(float("nan")))
        .otherwise(score)
        .alias("score"),
        F.when(_u(f"{seed}-lit", 10) < 8, F.array(pmid)).alias("literature"),
        F.when(_u(f"{seed}-py", 10) < 7, year).alias("publicationYear"),
        F.when(
            src_col == "gwas_credible_sets",
            F.concat(F.lit("GCST"), _u(f"{seed}-st", 500).cast("string")),
        ).alias("studyId"),
        F.when(
            src_col == "gwas_credible_sets",
            F.concat(F.lit("L"), _u(f"{seed}-sl", 2_000).cast("string")),
        ).alias("studyLocusId"),
        F.when(
            src_col == "chembl",
            F.concat(year.cast("string"), F.lit("-06-01")),
        ).alias("studyStartDate"),
        F.when(
            src_col == "chembl",
            F.element_at(
                F.array(F.lit(0.5), F.lit(1.0), F.lit(2.0), F.lit(3.0), F.lit(4.0)),
                (_u(f"{seed}-ph", 5) + 1).cast("int"),
            ),
        ).alias("clinicalPhase"),
        F.when(
            src_col == "chembl",
            F.concat(F.lit("CHEMBL"), _u(f"{seed}-dr", 800).cast("string")),
        ).alias("drugId"),
        src_col.alias("sourceId"),
    )


def gen_drugs(spark: SparkSession, n: int = 800, n_targets: int = 500) -> DataFrame:
    """ChEMBL-style drugs.csv shape (novelty_approval.py:354-360)."""
    return spark.range(n).select(
        F.concat(F.lit("CHEMBL"), F.col("id")).alias("drugId"),
        F.concat(F.lit("drug "), F.col("id")).alias("drug"),
        F.concat(
            F.lit("ENSG"),
            F.lpad(F.pmod(F.hash(F.col("id").cast("string"), F.lit("dt")), F.lit(n_targets)).cast("string"), 11, "0"),
        ).alias("targetId"),
        F.when(
            F.pmod("id", F.lit(3)) != 0,
            (F.lit(1985) + F.pmod(F.hash(F.col("id").cast("string"), F.lit("ay")), F.lit(40))).cast("int"),
        ).alias("firstApprovalYear"),
    )


def gen_study(spark: SparkSession, n: int = 500) -> DataFrame:
    """GWAS study dimension (studyId, publicationDate "YYYY-MM-DD")."""
    return spark.range(n).select(
        F.concat(F.lit("GCST"), F.col("id")).alias("studyId"),
        F.concat(
            (F.lit(1995) + F.pmod(F.hash(F.col("id").cast("string"), F.lit("sy")), F.lit(30))).cast("string"),
            F.lit("-03-15"),
        ).alias("publicationDate"),
    )


def gen_credible_set(
    spark: SparkSession, n: int = 2_000, n_studies: int = 500
) -> DataFrame:
    """Credible-set bridge (studyLocusId -> studyId) for the two-hop
    dating join (timestamp_evidence.py:209-230)."""
    return spark.range(n).select(
        F.concat(F.lit("L"), F.col("id")).alias("studyLocusId"),
        F.concat(
            F.lit("GCST"),
            F.pmod(F.hash(F.col("id").cast("string"), F.lit("cs")), F.lit(n_studies)),
        ).alias("studyId"),
    )
