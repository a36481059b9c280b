"""Full-text retrieval queries over the documents table: BM25 ranked
top-k and boolean postings algebra (extensions/search.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_spark.extensions.search import bm25_topk, boolean_search
from timeseries_spark.queries import REGISTRY, load, query

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
    "search_bm25_staged",
    oracle=REGISTRY["search_bm25_topk"].oracle,
)
def search_bm25_staged(spark, sf_dir):
    """BM25 from a STAGED inverted index — the index-once/query-many
    split every production search deployment runs: the tokenize+explode
    corpus pass happens once per corpus fingerprint
    (extensions/staging.py:staged_postings, term-clustered so the
    query-term filter prunes row groups), and this query's plan is a
    pure index probe — corpus stats (n_docs, avgdl) derive from the
    index's distinct (doc_id, dl) grain, so there is NO text rescan
    anywhere. Hash-identical to search_bm25_topk (same oracle): staging
    changes WHEN the index builds, never what it answers — dl values
    are integers whose double sum is exact, so the index-derived avgdl
    is bit-equal to the docs-scan average at any aggregation order."""
    from timeseries_spark.extensions.search import bm25_topk
    from timeseries_spark.extensions.staging import staged_postings

    docs = load(spark, sf_dir, "documents")
    idx = staged_postings(spark, docs, f"{sf_dir}/documents.parquet")
    return bm25_topk(docs, list(_Q_TERMS), k=_K, postings=idx)


_COS6 = (
    "round("
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, len({a})), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (x, y) -> x + y) / "
    "(sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform({a}, v -> v::DOUBLE * v::DOUBLE)), (x, y) -> x + y)) * "
    " sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform({b}, v -> v::DOUBLE * v::DOUBLE)), (x, y) -> x + y)))"
    ", 6)"
)
_N_CAND = 50
_QVID = 0


@query(
    "search_hybrid_rerank",
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
    ),
    cand AS (
      SELECT doc_id,
             floor(sum(w) * 10000 + 0.5) / 10000 AS bm25_score
      FROM scored GROUP BY doc_id
      ORDER BY bm25_score DESC, doc_id LIMIT {_N_CAND}
    ),
    emb AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (SELECT v FROM emb WHERE vec_id = {_QVID})
    SELECT c.doc_id, c.bm25_score,
           {_COS6.format(a="e.v", b="q.v")} AS cosine
    FROM cand c
    JOIN emb e ON e.vec_id = c.doc_id
    CROSS JOIN q
    ORDER BY cosine DESC, c.doc_id
    LIMIT {_K}
    """,
)
def search_hybrid_rerank(spark, sf_dir):
    """Two-stage hybrid retrieval — the production RAG pattern: BM25
    generates {_N_CAND} lexical candidates (the oracled ranked-retrieval
    stage), then the exact cosine against one broadcast query embedding
    reranks them and keeps the top-10. The vector math touches only the
    candidate set: the 50-row candidate table broadcasts into the
    embedding probe, so there is no corpus-grain shuffle outside the
    postings aggregate. Both cut points are deterministic (4dp-rounded
    BM25 then doc_id; 6dp-rounded cosine then doc_id)."""
    from timeseries_spark.extensions.search import hybrid_rerank

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    return hybrid_rerank(
        docs, emb, list(_Q_TERMS), query_vec_id=_QVID,
        n_candidates=_N_CAND, k=_K,
    )


@query(
    "search_hybrid_staged",
    oracle=REGISTRY["search_hybrid_rerank"].oracle,
)
def search_hybrid_staged(spark, sf_dir):
    """Hybrid retrieval served ENTIRELY from the staged inverted index
    (VERDICT r14 item 3): the BM25 candidate generator probes
    staged_postings (term-clustered parquet, indexed once per corpus
    fingerprint) and derives corpus stats from the index's (doc_id, dl)
    grain, so the whole two-stage plan — candidates AND rerank — never
    rescans raw text. Hash-identical to search_hybrid_rerank (same
    oracle): staging changes WHEN the index builds, never what it
    answers. The only corpus-scale inputs are the pruned index probe
    and the embedding scan the 50-row candidate broadcast prunes."""
    from timeseries_spark.extensions.search import hybrid_rerank
    from timeseries_spark.extensions.staging import staged_postings

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    idx = staged_postings(spark, docs, f"{sf_dir}/documents.parquet")
    return hybrid_rerank(
        docs, emb, list(_Q_TERMS), query_vec_id=_QVID,
        n_candidates=_N_CAND, k=_K, postings=idx,
    )


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


@query(
    "token_cooccurrence_topk",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    pairs AS (
      SELECT a.term AS t1, b.term AS t2, count(*) AS n
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY a.term, b.term
    )
    SELECT t1, t2, n FROM pairs
    ORDER BY n DESC, t1, t2 LIMIT 20
    """,
)
def token_cooccurrence_topk(spark, sf_dir):
    """Market-basket-lite: the 20 most frequent token pairs sharing a
    document. Per-doc distinct tokens self-join on doc_id, so work is
    Σ(per-doc distinct tokens)² — bounded by doc vocabulary, not corpus
    size (a real corpus caps to the top-frequency vocabulary first,
    exactly like the dedup layer's hot-shingle cap). Top-k is
    TakeOrderedAndProject on the fully-ordered (n desc, t1, t2).

    The doc scan goes through the parallelism guard: the pair stage is
    per-row quadratic compute over a byte-small parquet — the round-13
    sf1 profile (experiments/SEARCH_PROFILE_r13.json) caught it
    serialized onto 2 tasks carrying 2.7 of 3.4 task-seconds."""
    from timeseries_spark.functions.parallelism import ensure_parallelism

    docs = ensure_parallelism(load(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("term"),
    )
    a = tok.alias("a")
    b = tok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("t1"), F.col("b.term").alias("t2")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return pairs.orderBy(F.desc("n"), "t1", "t2").limit(20)


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH post AS ({_POSTINGS}),
    dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM post
            GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT p.doc_id, p.term, p.tf,
             floor(p.tf * (ln((n.n_docs + 1.0) / (d.df + 1.0)) + 1.0)
                   * 10000 + 0.5) / 10000 AS score
      FROM post p JOIN dfs d USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
)
def tfidf_top_terms_q(spark, sf_dir):
    """Top-5 TF-IDF terms per document (smoothed idf, 4dp snap before
    ranking) — keyword extraction over the postings relation; df reuses
    the postings exchange, N is a one-row broadcast
    (extensions/search.py:tfidf_top_terms)."""
    from timeseries_spark.extensions.search import tfidf_top_terms

    docs = load(spark, sf_dir, "documents")
    out = tfidf_top_terms(docs, k=5)
    return out.withColumn("tf", F.col("tf").cast("bigint"))
