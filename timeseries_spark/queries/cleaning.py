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


@query(
    "boilerplate_grams",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
                  FROM documents),
    grams AS (
      SELECT doc_id,
             ts[g.i] || ' ' || ts[g.i+1] || ' ' || ts[g.i+2] || ' '
               || ts[g.i+3] AS gram
      FROM toks,
           unnest(generate_series(1, greatest(len(ts) - 3, 0))) AS g(i)
    )
    SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
    FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 3
    """,
)
def boilerplate_grams_q(spark, sf_dir):
    """C4-style boilerplate discovery: 4-grams repeated across >= 3
    documents — one explode + one gram-grain distinct-doc count
    (extensions/cleaning.py:boilerplate_grams)."""
    from timeseries_spark.extensions.cleaning import boilerplate_grams

    docs = load(spark, sf_dir, "documents")
    return boilerplate_grams(docs, n=4, min_df=3)


@query(
    "boilerplate_strip",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
                  FROM documents),
    tok AS (
      SELECT doc_id, g.i - 1 AS p, ts[g.i] AS token
      FROM toks, unnest(generate_series(1, len(ts))) AS g(i)
    ),
    grams AS (
      SELECT doc_id, g.i - 1 AS pos,
             ts[g.i] || ' ' || ts[g.i+1] || ' ' || ts[g.i+2] || ' '
               || ts[g.i+3] AS gram
      FROM toks,
           unnest(generate_series(1, greatest(len(ts) - 3, 0))) AS g(i)
    ),
    boiler AS (
      SELECT gram FROM grams GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 3
    ),
    cov AS (
      SELECT DISTINCT g.doc_id, g.pos + d.i AS p
      FROM grams g JOIN boiler b USING (gram),
           unnest(generate_series(0, 3)) AS d(i)
    ),
    kept AS (
      SELECT t.doc_id, t.p, t.token
      FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p
      WHERE c.p IS NULL
    ),
    agg AS (
      SELECT doc_id, string_agg(token, ' ' ORDER BY p) AS text_clean
      FROM kept GROUP BY doc_id
    ),
    covn AS (SELECT doc_id, count(*) AS n_boiler FROM cov GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           CAST(coalesce(covn.n_boiler, 0) AS BIGINT) AS n_boiler,
           round(coalesce(covn.n_boiler, 0)
                 / len(string_split(d.text, ' ')), 4) AS boiler_ratio,
           coalesce(agg.text_clean, '') AS text_clean
    FROM documents d
    LEFT JOIN agg USING (doc_id) LEFT JOIN covn USING (doc_id)
    """,
)
def boilerplate_strip_q(spark, sf_dir):
    """Strip every token covered by a cross-document boilerplate 4-gram
    (df >= 3) and report per-doc coverage — row count preserved, pure
    boilerplate docs survive with empty text
    (extensions/cleaning.py:strip_boilerplate)."""
    from timeseries_spark.extensions.cleaning import strip_boilerplate

    docs = load(spark, sf_dir, "documents")
    return strip_boilerplate(docs, n=4, min_df=3)
