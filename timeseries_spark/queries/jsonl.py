"""JSONL interchange round-trip, oracle-gated (sources/io.py
read_jsonl/write_jsonl): documents are exported as line-delimited JSON
and re-read with the declared schema; the rollup over the re-read copy
must hash-match the rollup DuckDB computes over the original parquet —
proving the sink+scan pair loses nothing (types, escaping, NULLs)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from timeseries_spark.sources.io import read_jsonl, write_jsonl
from timeseries_spark.queries import load, query

_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


@query(
    "jsonl_roundtrip_rollup",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_words
    FROM documents
    GROUP BY lang, source
    """,
)
def jsonl_roundtrip_rollup(spark, sf_dir):
    """Export documents to JSONL (overwrite), re-read with the explicit
    schema, roll up per (lang, source). The text column crosses the
    JSON escaping boundary, so total_words matching the parquet oracle
    certifies byte-faithful round-tripping, not just row counts."""
    # pid-scoped path: concurrent processes (bench + pytest) must not
    # race one overwrite against another's in-flight scan; re-runs
    # within a process reuse (overwrite) their own dir, so /tmp does
    # not accumulate
    out = (
        f"/tmp/ts_jsonl_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{os.getpid()}/documents"
    )
    write_jsonl(load(spark, sf_dir, "documents"), out, mode="overwrite")
    docs = read_jsonl(spark, out, _DOC_SCHEMA)
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("total_words"),
    )
