"""Full-text retrieval over the corpus: inverted postings, BM25 ranked
top-k, boolean (AND / NOT) search.

The index is the classic distributed shape: a postings relation
(term, doc_id, tf) built by one explode + hash aggregation. Queries
never scan raw text again — they equi-join the (tiny, broadcast) query
term set against postings, so work is proportional to the matched
postings lists, not the corpus. At 100 TB the postings relation would
be written bucketed by term (sources/io.write_bucketed) so every search
is a bucket-local probe; nothing here assumes a resident index.

BM25 (Robertson/Sparck Jones, the Lucene-default variant):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, q) = Σ_t idf(t) · tf / (tf + k1·(1 - b + b·dl/avgdl))

N/avgdl are one-row aggregates broadcast onto the scored postings; the
global top-k is an orderBy+limit, which Spark executes as
TakeOrderedAndProject (per-partition heaps + driver merge of k rows —
no single-partition shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from timeseries_spark.extensions.caching import (
    register_cache,
    release_caches,
)
from timeseries_spark.functions.inline import inline_rows
from timeseries_spark.extensions.text import ws_tokens as tokens
from timeseries_spark.functions.parallelism import ensure_parallelism

K1 = 1.2
B = 0.75

_FAMILY = "search"


def release_search_caches(spark=None) -> int:
    """Unpersist every search-family cache (the matched-postings probes
    ``bm25_topk`` registers); returns how many were freed. ``spark``
    scopes to one session (``None`` = all). The round-14 dedup cache
    lifecycle, applied to the one persist the search family holds —
    without it every bench rep of a BM25-backed headline query leaked
    one cache block into the shared session."""
    return release_caches(spark, _FAMILY)


# Build-semantics version of the postings layout. Bumped whenever
# build_postings changes what an index CONTAINS (not just how fast it is
# built), so staged artifacts written under older semantics get a
# different fingerprint and are rebuilt rather than silently served:
#   v2: NULL text coalesces to '' and emits one "" posting, making
#       index-derived n_docs/avgdl equal the docs-scan path (a v1
#       artifact omits null-text docs entirely).
POSTINGS_BUILD_VERSION = 2


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    terms: Sequence[str] | None = None,
) -> DataFrame:
    """(term, doc_id, tf, dl): one explode + one hash agg. dl rides
    along (constant per doc) so scoring needs no join back to the docs.

    ``terms`` restricts the build to the given term set by filtering the
    exploded tokens BEFORE the aggregate (round-16, guide §2.3
    aggregate-less-before-you-shuffle): an ad-hoc query needs only its
    own terms' postings, and filtering after explode is row-identical to
    aggregating everything and joining the term list after — ``dl`` is
    the FULL token count, computed per row before the filter — while the
    (term, doc) aggregate and its exchange shrink from every token
    instance in the corpus to the matching ones. ``None`` (the staging
    path) builds the complete index.

    The doc scan goes through the parallelism guard: tokenize+explode is
    per-row compute over a byte-small parquet (the round-13 sf1 profile,
    experiments/SEARCH_PROFILE_r13.json `before`, shows the postings
    build serialized onto 2 tasks carrying 11.4 of 20.9 task-seconds —
    the dominant term of bm25's sf1 wall). At real scale the corpus
    arrives in thousands of splits and the guard is a no-op.

    NULL text coalesces to '' BEFORE tokenizing (round-14 advice): the
    whitespace tokenizer maps '' to one "" term, so EVERY doc — null
    text included — emits >=1 posting and the index's distinct
    (doc_id, dl) grain is exactly the doc grain. Without the coalesce,
    split(NULL)->NULL explodes to nothing, and index-derived corpus
    stats (n_docs, avgdl) would silently diverge from the docs-scan
    path on a corpus with null rows.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    exploded = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(txt)).alias("dl"),
        F.explode(tokens(txt)).alias("term"),
    )
    if terms is not None:
        exploded = exploded.where(F.col("term").isin(list(terms)))
    return exploded.groupBy("term", "doc_id", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = True,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Rank the corpus for a bag-of-words query; return the global
    top-k by (score desc, doc_id). Scores are half-up rounded to 4
    decimals BEFORE ranking so the ordering (and the k-th cut) is
    reproducible across engines regardless of last-ULP log/division
    noise.
    """
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = docs.sparkSession
    from_index = postings is not None
    if not from_index:
        # ad-hoc path: build only the query terms' postings — the
        # pre-aggregate term filter makes the (term, doc) aggregate
        # proportional to the query's matches instead of the corpus's
        # token count (see build_postings); the broadcast term join
        # below is then structure-preserving (df dedupe) rather than
        # the thing that discards the unmatched 99% after the fact
        postings = build_postings(
            docs, id_col, text_col, terms=list(dict.fromkeys(query_terms))
        )
    # dedupe the bag: a repeated query term would inflate df (and
    # double-count its weight) because postings match once per copy
    q = inline_rows(
        spark, [(t,) for t in dict.fromkeys(query_terms)], "term string"
    )
    # matched is consumed twice (df counts + scoring); it is tiny (the
    # query terms' postings only) while its lineage is a full corpus
    # scan — persisting it halves the text scans. Cache entries are
    # keyed by plan (same query re-uses one entry); callers looping
    # over many distinct queries pass persist=False or call
    # release_search_caches() between queries — the persist is
    # REGISTERED (extensions/caching.py, family "search") so serving
    # sessions have the same lifecycle the dedup family got in r14.
    matched = postings.join(F.broadcast(q), "term")
    if persist:
        matched = register_cache(matched, _FAMILY)

    if from_index:
        # corpus stats FROM the index (no text rescan): every doc holds
        # >=1 posting (the whitespace tokenizer maps empty text to one
        # "" term), and dl is constant per doc, so distinct (doc_id, dl)
        # is exactly the doc grain. n_docs is an exact integer and dl
        # values are integers whose double sum is exact below 2^53 —
        # the average is bit-identical to the docs-scan path at any
        # aggregation order, so the staged query shares the oracle.
        stats = (
            postings.select("doc_id", "dl")
            .distinct()
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.avg(F.col("dl").cast("double")).alias("avgdl"),
            )
        )
    else:
        # same NULL->'' contract as build_postings: a null-text doc
        # counts as one doc of length 1 (the single "" term) on BOTH
        # paths, so index-derived and docs-scan stats never diverge
        stats = docs.select(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg(
                F.size(
                    tokens(F.coalesce(F.col(text_col), F.lit("")))
                ).cast("double")
            ).alias("avgdl"),
        )
    df_counts = matched.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")  # postings are distinct per (term, doc)
    )

    scored = (
        matched.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * F.col("tf")
            / (
                F.col("tf")
                + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.floor(F.sum("w") * 10000 + F.lit(0.5)).cast("double").alias("s4"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .withColumn("score", F.col("s4") / 10000)
        .drop("s4")
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(k)


def hybrid_rerank(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: Sequence[str],
    query_vec_id: int,
    n_candidates: int = 50,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Two-stage hybrid retrieval — the production RAG shape: a cheap
    lexical candidate generator (BM25 over the postings index) feeds an
    exact embedding rerank, so the expensive vector math touches
    ``n_candidates`` rows instead of the corpus.

    Stage 1: ``bm25_topk(docs, query_terms, n_candidates)`` — the
    already-oracled ranked retrieval; its (score desc, doc_id) cut is
    deterministic. Stage 2: the candidate id set (n_candidates rows)
    BROADCASTS into an equi join against the embedding table — at
    100 TB this is a semi-join probe that prunes the embedding scan to
    the candidates — then one cosine per candidate against the single
    broadcast query vector (the embedding of ``query_vec_id``), rounded
    to 6dp, and a (cosine desc, doc_id) top-k via TakeOrderedAndProject.
    No corpus-grain shuffle anywhere: the only wide stages are inside
    the BM25 postings aggregate.

    Output: (doc_id, bm25_score, cosine) — the rerank keeps BM25's
    score so downstream mixers can blend lexical and semantic signals.

    ``postings`` passes a prebuilt inverted index through to
    ``bm25_topk`` — the staged production shape (staging.py:
    staged_postings): the candidate generator becomes a pure index
    probe with corpus stats derived from the index's (doc_id, dl)
    grain, so the WHOLE hybrid plan touches raw text zero times."""
    from timeseries_spark.functions.vectors import cosine_similarity

    cand = bm25_topk(
        docs, query_terms, k=n_candidates, id_col=id_col,
        text_col=text_col, postings=postings,
    ).select(F.col(id_col), F.col("score").alias("bm25_score"))
    as_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qv = (
        embeddings.filter(F.col(vec_id_col) == query_vec_id)
        .select(as_d.alias("__qv"))
    )
    return (
        embeddings.select(
            F.col(vec_id_col).alias(id_col), as_d.alias("__v")
        )
        .join(F.broadcast(cand), id_col)
        .crossJoin(F.broadcast(qv))
        .select(
            id_col,
            "bm25_score",
            F.round(
                cosine_similarity(F.col("__v"), F.col("__qv")), 6
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def boolean_search(
    docs: DataFrame,
    must: Sequence[str],
    must_not: Sequence[str] = (),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Conjunctive search over the postings: docs containing every
    ``must`` term and none of ``must_not``. The AND is a broadcast
    equi-join + HAVING count = |must|; the NOT is a left anti join
    against the excluded postings — index algebra, no text rescans.
    """
    if not must:
        # count = |must| can never bind at 0 matched terms — an empty
        # conjunction would silently return nothing instead of "all"
        raise ValueError("boolean_search needs at least one must-term")
    spark = docs.sparkSession
    # only the must/must-not terms' postings are ever probed — filter
    # the exploded tokens to that set BEFORE the aggregate (the same
    # round-16 pre-aggregate term filter bm25_topk's ad-hoc path uses;
    # row-identical for the probed terms, and the (term, doc) aggregate
    # shrinks from the corpus's token count to the matching instances)
    postings = build_postings(
        docs, id_col, text_col,
        terms=list(dict.fromkeys([*must, *must_not])),
    )
    mq = inline_rows(spark, [(t,) for t in must], "term string")
    hits = (
        postings.join(F.broadcast(mq), "term")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == len(must))
        .select("doc_id")
    )
    if must_not:
        nq = inline_rows(spark, [(t,) for t in must_not], "term string")
        excl = postings.join(F.broadcast(nq), "term").select("doc_id")
        hits = hits.join(excl, "doc_id", "left_anti")
    return hits


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Each document's k highest-TF-IDF terms — the classic keyword /
    signature extraction (public formulation: smoothed
    idf = ln((N + 1)/(df + 1)) + 1, the scikit-learn smoothing so no
    term divides by zero and corpus-wide terms keep a positive floor).

    Plan: postings build once (explode + hash agg); document frequency
    is a term-grain aggregate of the SAME postings relation (Catalyst
    reuses the exchange); N is a one-row broadcast; ranking is a
    doc-grain row_number window with (score DESC, term) tie-break —
    every shuffle is key-partitioned at term or doc grain. Scores are
    4dp floor-snapped BEFORE ranking so the cut is
    engine-reproducible. Output: (doc_id, term, tf, score, rnk)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    post = build_postings(docs, id_col, text_col)
    dfs = post.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = docs.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        post.join(dfs, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.floor(
                (
                    F.col("tf")
                    * (
                        F.log(
                            (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)
                        )
                        + 1.0
                    )
                )
                * 10000
                + F.lit(0.5)
            )
            / 10000,
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "score", "rnk")
    )
