"""Corpus normalization beyond the quality/redaction gates: within-doc
repetition removal and data-derived stop-token stripping.

Both are the shapes a 100 TB cleaning pass wants:

- ``dedup_tokens_in_doc`` is a pure per-row array rewrite (keep the
  first occurrence of each token, preserve order) — ZERO shuffles, no
  explode; cost is O(tokens²) per doc, bounded by document length, not
  corpus size.
- ``derive_stop_tokens`` / ``strip_stop_tokens`` discover the corpus's
  own boilerplate vocabulary (document frequency above a threshold) and
  strip it. The stoplist is a tiny aggregate (≤ |vocabulary| rows)
  collapsed to ONE row and broadcast onto the corpus — the only
  SinglePartition in the plan carries the stoplist, never documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from timeseries_spark.extensions.text import ws_tokens as _toks


def dedup_tokens_in_doc(
    docs: DataFrame, text_col: str = "text", out_col: str = "text_dedup"
) -> DataFrame:
    """Keep each token's first occurrence, preserving order: a token at
    (0-based) position i survives iff array_position (1-based, first
    match) equals i+1. Emits the rewritten text and how many tokens the
    rewrite dropped."""
    xs = _toks(F.col(text_col))
    kept = F.filter(xs, lambda x, i: F.array_position(xs, x) == i + 1)
    return docs.withColumn(out_col, F.concat_ws(" ", kept)).withColumn(
        "n_dropped", (F.size(xs) - F.size(kept)).cast("bigint")
    )


def derive_stop_tokens(
    docs: DataFrame,
    max_doc_ratio: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-row DataFrame holding the discovered stoplist: tokens whose
    document frequency exceeds ``max_doc_ratio`` of the corpus. The
    per-term df agg shuffles at vocabulary grain; the final collect_set
    collapses ≤ |vocabulary| survivors into a single broadcastable row.
    """
    if not 0.0 < max_doc_ratio <= 1.0:
        raise ValueError(f"max_doc_ratio must be in (0, 1], got {max_doc_ratio}")
    term_docs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_toks(F.col(text_col)))).alias("term"),
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    return (
        term_docs.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") > F.col("n_docs") * max_doc_ratio)
        .agg(F.collect_set("term").alias("stop_tokens"))
    )


def strip_stop_tokens(
    docs: DataFrame,
    max_doc_ratio: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text_clean",
) -> DataFrame:
    """Remove the corpus-derived boilerplate vocabulary from every
    document (order preserved). The stoplist row broadcasts; removal is
    a per-row array filter — one vocabulary-grain shuffle total."""
    stop = derive_stop_tokens(docs, max_doc_ratio, id_col, text_col)
    xs = _toks(F.col(text_col))
    kept = F.filter(
        xs, lambda x: ~F.array_contains(F.col("stop_tokens"), x)
    )
    return (
        docs.crossJoin(F.broadcast(stop))
        .withColumn(out_col, F.concat_ws(" ", kept))
        .withColumn("n_stripped", (F.size(xs) - F.size(kept)).cast("bigint"))
        .drop("stop_tokens")
    )
