"""Corpus-normalization queries (extensions/cleaning.py): within-doc
repetition removal and data-derived boilerplate stripping."""

from __future__ import annotations

from timeseries_spark.extensions.cleaning import (
    dedup_tokens_in_doc,
    strip_stop_tokens,
)
from timeseries_spark.queries import load, query

_STOP_RATIO = 0.78  # splits the synthetic vocab (df 0.75-0.80) both scales


@query(
    "doc_token_dedup",
    oracle="""
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS xs
               FROM documents),
    kept AS (
      SELECT doc_id, text, xs,
             list_filter(xs, (x, i) -> list_position(xs, x) = i) AS ys
      FROM t
    )
    SELECT doc_id, text,
           array_to_string(ys, ' ') AS text_dedup,
           CAST(len(xs) - len(ys) AS BIGINT) AS n_dropped
    FROM kept
    """,
)
def doc_token_dedup(spark, sf_dir):
    """Within-doc repetition removal: keep each token's first
    occurrence, preserve order — a pure per-row array rewrite, zero
    shuffles (extensions/cleaning.py:dedup_tokens_in_doc)."""
    docs = load(spark, sf_dir, "documents")
    return dedup_tokens_in_doc(docs).select(
        "doc_id", "text", "text_dedup", "n_dropped"
    )


@query(
    "strip_stop_tokens",
    oracle=f"""
    WITH n AS (SELECT count(*) AS n_docs FROM documents),
    dfs AS (
      SELECT term, count(*) AS df
      FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
              AS term FROM documents)
      GROUP BY term
    ),
    stop AS (
      SELECT coalesce(list(term), []) AS stop_tokens
      FROM dfs, n WHERE df > n_docs * {_STOP_RATIO}
    ),
    r AS (
      SELECT doc_id, string_split(text, ' ') AS xs,
             list_filter(string_split(text, ' '),
                         x -> NOT list_contains(stop_tokens, x)) AS ys
      FROM documents, stop
    )
    SELECT doc_id,
           -- DuckDB array_to_string([]) is NULL; Spark concat_ws is ''
           coalesce(array_to_string(ys, ' '), '') AS text_clean,
           CAST(len(xs) - len(ys) AS BIGINT) AS n_stripped
    FROM r
    """,
)
def strip_stop_tokens_q(spark, sf_dir):
    """Data-derived boilerplate removal: tokens in more than 78% of
    documents form the stoplist (one vocabulary-grain agg collapsed to
    a single broadcast row); stripping is a per-row array filter
    (extensions/cleaning.py:strip_stop_tokens)."""
    docs = load(spark, sf_dir, "documents")
    return strip_stop_tokens(docs, _STOP_RATIO).select(
        "doc_id", "text_clean", "n_stripped"
    )
