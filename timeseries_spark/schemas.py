"""Explicit StructType contracts for every table the engine touches.

The reference relies on Parquet-footer inference everywhere (SURVEY.md §1.3);
here every entity and derived table has a declared contract so readers can
validate and writers stay stable under schema evolution. Types follow what
the reference actually exercises (SURVEY.md §1.2): string ids, int years,
double scores, array<string>, one array<struct> (``urls``); no MapType /
DecimalType / native dates (dates are "YYYY-MM-DD" strings split to years).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


S = T.StringType()
I = T.IntegerType()
L = T.LongType()
D = T.DoubleType()
B = T.BooleanType()
ARR_S = T.ArrayType(T.StringType())


# --- entity tables (inputs; SURVEY.md §1.1) ---------------------------------

EVIDENCE = T.StructType(
    [
        _f("id", S, False),
        _f("targetId", S),
        _f("diseaseId", S),
        _f("datasourceId", S),
        _f("score", D),
        _f("literature", ARR_S),
        _f("publicationYear", I),
        _f("studyId", S),
        _f("studyLocusId", S),
        _f("studyStartDate", S),  # "YYYY-MM-DD"
        _f("clinicalPhase", D),
        _f("drugId", S),
        _f("urls", T.ArrayType(T.StructType([_f("url", S), _f("niceName", S)]))),
        _f("allelicRequirements", ARR_S),
        _f("sourceId", S),  # partition column, = datasourceId
    ]
)

DISEASE = T.StructType(
    [
        _f("id", S, False),
        _f("name", S),
        _f("ancestors", ARR_S),
        _f("therapeuticAreas", ARR_S),
    ]
)

TARGET = T.StructType(
    [_f("id", S, False), _f("approvedSymbol", S), _f("biotype", S)]
)

STUDY = T.StructType([_f("studyId", S, False), _f("publicationDate", S)])

CREDIBLE_SET = T.StructType(
    [_f("studyLocusId", S, False), _f("studyId", S)]
)

TARGET_PRIORITISATION = T.StructType(
    [_f("targetId", S, False), _f("hasLigand", B), _f("hasSafetyEvent", B)]
)

DRUGS = T.StructType(
    [_f("drugId", S, False), _f("drug", S), _f("firstApprovalYear", I)]
)

# per-source date lookups produced by stage 0 (parse_timestamp.py outputs)
PMID2YEAR = T.StructType([_f("pmid", S, False), _f("year", I)])
STUDY2YEAR = T.StructType(
    [_f("studyId", S, False), _f("datasourceId", S), _f("year", I)]
)

# --- derived tables (the engine's materialized views; SURVEY.md §1.1) ------

EVIDENCE_DATED = T.StructType(
    [
        _f("id", S, False),
        _f("targetId", S),
        _f("diseaseId", S),
        _f("datasourceId", S),
        _f("score", D),
        _f("literature", ARR_S),
        _f("year", I),  # best year; NULL = undated
        _f("sourceId", S),
    ]
)

ASSOCIATION_BY_DATASOURCE = T.StructType(
    [
        _f("diseaseId", S, False),
        _f("targetId", S, False),
        _f("datasourceId", S, False),
        _f("year", I),  # NULL = undated bucket (sentinel round-trip)
        _f("score", D),
        _f("novelty", D),
    ]
)

ASSOCIATION_OVERALL = T.StructType(
    [
        _f("diseaseId", S, False),
        _f("targetId", S, False),
        _f("year", I),
        _f("score", D),
        _f("novelty", D),
    ]
)

# --- extension tables (driver testdata; TESTDATA.md / FIXTURES.md §B) ------

DOCUMENTS = T.StructType(
    [
        _f("doc_id", L, False),
        _f("text", S),
        _f("lang", S),
        _f("source", S),
        _f("n_chars", L),
    ]
)

EMBEDDINGS = T.StructType(
    [
        _f("vec_id", L, False),
        _f("embedding", T.ArrayType(T.FloatType())),
        _f("label", I),
    ]
)

EVENTS = T.StructType(
    [
        _f("event_id", L, False),
        _f("ts", T.TimestampType()),
        _f("user_id", L),
        _f("event_type", S),
        _f("value", D),
        _f("props", S),
    ]
)

# multimodal: opaque binary payload + typed metadata (BASELINE.json extension)
MEDIA = T.StructType(
    [
        _f("media_id", L, False),
        _f("kind", S),  # image | audio | video
        _f("payload", T.BinaryType()),
        _f("meta", T.StructType(
            [
                _f("width", I),
                _f("height", I),
                _f("duration_ms", I),
                _f("codec", S),
            ]
        )),
    ]
)
