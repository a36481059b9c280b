"""Full-text retrieval queries over the documents table: BM25 ranked
top-k and boolean postings algebra (extensions/search.py)."""

from __future__ import annotations

from timeseries_spark.extensions.search import bm25_topk, boolean_search
from timeseries_spark.queries import load, query

_Q_TERMS = ("spark", "hash", "window")
_MUST = ("spark", "vector")
_MUST_NOT = ("slow",)
_K = 10

_POSTINGS = """
      SELECT term, doc_id, dl, count(*) AS tf
      FROM (SELECT doc_id, len(string_split(text, ' ')) AS dl,
                   unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY term, doc_id, dl
"""


@query(
    "search_bm25_topk",
    oracle=f"""
    WITH post AS ({_POSTINGS}),
    matched AS (
      SELECT * FROM post WHERE term IN {repr(tuple(_Q_TERMS))}
    ),
    stats AS (
      SELECT count(*) AS n_docs,
             avg(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl
      FROM documents
    ),
    dfs AS (SELECT term, count(*) AS df FROM matched GROUP BY term),
    scored AS (
      SELECT m.doc_id,
             ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * m.tf
               / (m.tf + 1.2 * (1 - 0.75 + 0.75 * m.dl / s.avgdl)) AS w
      FROM matched m JOIN dfs d USING (term) CROSS JOIN stats s
    )
    SELECT doc_id,
           floor(sum(w) * 10000 + 0.5) / 10000 AS score,
           count(*) AS n_terms_hit
    FROM scored
    GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT {_K}
    """,
)
def search_bm25_topk(spark, sf_dir):
    """BM25 top-10 for a 3-term query: postings join (query side
    broadcast), one-row corpus stats broadcast, global top-k as
    TakeOrderedAndProject. Scores half-up rounded to 4 decimals before
    ranking so the cut is engine-reproducible."""
    docs = load(spark, sf_dir, "documents")
    return bm25_topk(docs, list(_Q_TERMS), k=_K)


@query(
    "search_boolean",
    oracle=f"""
    WITH post AS ({_POSTINGS}),
    hits AS (
      SELECT doc_id FROM post WHERE term IN {repr(tuple(_MUST))}
      GROUP BY doc_id HAVING count(*) = {len(_MUST)}
    )
    SELECT doc_id FROM hits
    WHERE doc_id NOT IN (
      SELECT doc_id FROM post WHERE term IN {repr(tuple(_MUST_NOT))}
    )
    """,
)
def search_boolean(spark, sf_dir):
    """Boolean index search: docs containing every must-term ('spark'
    AND 'vector') and none of the excluded ('slow') — broadcast
    postings probes + left anti join, never a text rescan."""
    docs = load(spark, sf_dir, "documents")
    return boolean_search(docs, list(_MUST), list(_MUST_NOT))
