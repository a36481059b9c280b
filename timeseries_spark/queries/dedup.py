"""Deduplication queries over the documents table (extension surface).

Every pipeline (exact digest, n-gram Jaccard inverted index, MinHash-LSH
banding, SimHash hamming) is reproduced verbatim in the DuckDB oracle via
the shared md5-based hashing, so candidate sets match EXACTLY — these are
not statistical checks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_spark.extensions.dedup import (
    connected_components,
    exact_duplicates,
    jaccard_pairs,
    lsh_candidates,
    simhash_pairs,
)
from timeseries_spark.extensions.hashing import md5_long_sql
from timeseries_spark.extensions.similarity import embedding_near_dup
from timeseries_spark.queries import load, query
from timeseries_spark.queries.similarity import _COS

# DuckDB spellings of the shared shingle/token pipeline. _RAW_SHINGLES is
# the non-distinct 3-gram list (the repetition oracle needs duplicates);
# _SHINGLES wraps it for the signature/banding pipelines — one spelling,
# no drift between the dedup and text oracles.
_TOKS = "string_split(text, ' ')"
_RAW_SHINGLES = (
    "(CASE WHEN len({t}) - 2 > 0 THEN "
    "list_transform(generate_series(1, len({t}) - 2), "
    "i -> array_to_string(list_slice({t}, i, i + 2), ' ')) "
    "ELSE [] END)"
).format(t=_TOKS)
_SHINGLES = f"list_distinct({_RAW_SHINGLES})"


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS digest, min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup by content digest: hash-groupBy, canonical = min id."""
    return exact_duplicates(load(spark, sf_dir, "documents"))


@query(
    "dedup_jaccard_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id AS id, unnest({_SHINGLES}) AS sh FROM documents
    ),
    sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id_a, id_b, n_common,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.10
    """,
)
def dedup_jaccard_pairs(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs via shingle inverted-index
    self-join (no all-pairs)."""
    return jaccard_pairs(
        load(spark, sf_dir, "documents"), n=3, threshold=0.10
    )


# double-hashing signature: sig[i] = min over shingles of h1 + i*h2
# (one md5 per shingle; matches extensions.dedup.lsh_candidates exactly)
_SIG_SQL = (
    "list_transform(generate_series(0, 31), i -> coalesce(list_min("
    "list_transform(shs, s -> "
    "('0x' || substring(md5(s), 1, 13))::BIGINT"
    " + i * ('0x' || substring(md5(s), 14, 13))::BIGINT"
    ")), 4611686018427387904))"
)


@query(
    "dedup_jaccard_capped",
    oracle=f"""
    WITH ex AS (
      SELECT doc_id AS id, unnest({_SHINGLES}) AS sh FROM documents
    ),
    hot AS (SELECT sh FROM ex GROUP BY sh HAVING count(*) > 5),
    sh AS (SELECT id, sh FROM ex WHERE sh NOT IN (SELECT sh FROM hot)),
    sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id_a, id_b, n_common,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.10
    """,
)
def dedup_jaccard_capped(spark, sf_dir):
    """Document-frequency-capped Jaccard: shingles with df > 5 (hot
    boilerplate — the sf0.01 corpus tops out at df 7, so the cap BINDS)
    are dropped before the inverted-index self-join, bounding every
    posting list; sizes and similarity live in the capped shingle space
    in both engines."""
    return jaccard_pairs(
        load(spark, sf_dir, "documents"), n=3, threshold=0.10, max_doc_freq=5
    )


@query(
    "dedup_lsh_capped",
    oracle=f"""
    WITH base AS (
      SELECT doc_id AS id, {_SHINGLES} AS shs FROM documents
    ),
    ex AS (SELECT id, unnest(shs) AS s FROM base),
    hot AS (SELECT s FROM ex GROUP BY s HAVING count(*) > 5),
    kept AS (SELECT id, s FROM ex WHERE s NOT IN (SELECT s FROM hot)),
    capped AS (
      SELECT b.id,
             coalesce(list(k.s) FILTER (k.s IS NOT NULL), []) AS shs
      FROM base b LEFT JOIN kept k ON k.id = b.id
      GROUP BY b.id
    ),
    sig AS (SELECT id, {_SIG_SQL} AS sig FROM capped WHERE len(shs) > 0),
    banded AS (
      SELECT id, band,
             md5(array_to_string(list_transform(
               list_slice(sig, band * 4 + 1, band * 4 + 4),
               v -> v::VARCHAR), ',')) AS digest
      FROM sig, unnest(generate_series(0, 7)) AS t(band)
    ),
    sent AS (SELECT id FROM capped WHERE len(shs) = 0)
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.digest = b.digest AND a.id < b.id
    UNION ALL
    SELECT m.id_a, s.id AS id_b
    FROM sent s CROSS JOIN (SELECT min(id) AS id_a FROM sent) m
    WHERE s.id > m.id_a
    """,
)
def dedup_lsh_capped(spark, sf_dir):
    """MinHash-LSH with the df > 5 shingle cap applied BEFORE signatures:
    hot shingles contribute to no signature, so a boilerplate run shared
    by the whole corpus can no longer mint a band bucket containing every
    doc. Docs whose shingles are ALL hot (pure boilerplate) are sentinel
    docs: both engines route them out of the band join and pair them as
    a star to their min id — m-1 pairs, same connected component, no
    quadratic mega-bucket."""
    return lsh_candidates(
        load(spark, sf_dir, "documents"),
        n=3,
        num_hashes=32,
        bands=8,
        max_doc_freq=5,
    )


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (SELECT label AS block, vec_id, embedding FROM embeddings)
    SELECT a.block, a.vec_id AS id_a, b.vec_id AS id_b,
           {_COS.format(a="a.embedding", b="b.embedding")} AS cos_sim
    FROM e a JOIN e b ON a.block = b.block AND a.vec_id < b.vec_id
    WHERE {_COS.format(a="a.embedding", b="b.embedding")} >= 0.30
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs, cluster-blocked self-join (no
    all-pairs): one shuffle on the block key, JVM-side double-fold cosine,
    threshold filter. The 100 TB blocker is a coarse quantizer bucket."""
    return embedding_near_dup(load(spark, sf_dir, "embeddings"), threshold=0.30)


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id AS id, {_SHINGLES} AS shs FROM documents
    ),
    sig AS (SELECT id, {_SIG_SQL} AS sig FROM sh WHERE len(shs) > 0),
    banded AS (
      SELECT id, band,
             md5(array_to_string(list_transform(
               list_slice(sig, band * 4 + 1, band * 4 + 4),
               v -> v::VARCHAR), ',')) AS digest
      FROM sig, unnest(generate_series(0, 7)) AS t(band)
    ),
    sent AS (SELECT id FROM sh WHERE len(shs) = 0)
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.digest = b.digest AND a.id < b.id
    UNION ALL
    SELECT m.id_a, s.id AS id_b
    FROM sent s CROSS JOIN (SELECT min(id) AS id_a FROM sent) m
    WHERE s.id > m.id_a
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(32) + LSH(8 bands × 4 rows) candidate pairs — the web-scale
    near-dup pipeline; bit-identical signatures in both engines. Shingle-
    less (empty) docs are sentinel docs: routed out of the band join and
    paired as a star to their min id in both engines."""
    return lsh_candidates(
        load(spark, sf_dir, "documents"), n=3, num_hashes=32, bands=8
    )


@query(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id AS id, unnest({_TOKS}) AS t FROM documents
    ),
    th AS (SELECT id, {md5_long_sql('t')} AS h FROM tok),
    bits AS (
      SELECT id, j,
             CASE WHEN sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0
                  THEN 1::BIGINT << j ELSE 0 END AS bitval
      FROM th, unnest(generate_series(0, 31)) AS g(j)
      GROUP BY id, j
    ),
    sk AS (SELECT id, CAST(sum(bitval) AS BIGINT) AS sk FROM bits GROUP BY id)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.sk, b.sk)) AS BIGINT) AS hamming
    FROM sk a JOIN sk b ON a.id < b.id
    WHERE bit_count(xor(a.sk, b.sk)) <= 6
    """,
)
def dedup_simhash(spark, sf_dir):
    """SimHash(32-bit) near-dup pairs, hamming <= 6; Spark computes the
    sketch in one HOF fold and candidates via pigeonhole banding (exact
    recall at this budget), the oracle brute-forces all pairs."""
    out = simhash_pairs(load(spark, sf_dir, "documents"), max_hamming=6)
    return out.withColumn("hamming", F.col("hamming").cast("bigint"))


@query(
    "dedup_simhash_capped",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id AS id, unnest({_TOKS}) AS t FROM documents
    ),
    th AS (SELECT id, {md5_long_sql('t')} AS h FROM tok),
    bits AS (
      SELECT id, j,
             CASE WHEN sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0
                  THEN 1::BIGINT << j ELSE 0 END AS bitval
      FROM th, unnest(generate_series(0, 31)) AS g(j)
      GROUP BY id, j
    ),
    sk AS (SELECT id, CAST(sum(bitval) AS BIGINT) AS sk FROM bits GROUP BY id),
    banded AS (
      SELECT id, sk, band, (sk >> (band * 4)) & 15 AS bb
      FROM sk, unnest(generate_series(0, 7)) AS t(band)
    ),
    kept AS (
      SELECT band, bb FROM banded GROUP BY band, bb HAVING count(*) <= 64
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.sk, b.sk)) AS BIGINT) AS hamming
    FROM banded a
    JOIN kept k ON k.band = a.band AND k.bb = a.bb
    JOIN banded b ON b.band = a.band AND b.bb = a.bb AND a.id < b.id
    WHERE bit_count(xor(a.sk, b.sk)) <= 6
    """,
)
def dedup_simhash_capped(spark, sf_dir):
    """SimHash near-dup pairs with the BUCKET CAP — the corpus-scale
    configuration: 4-bit bands have 16 values, so uncapped buckets grow
    ~n/16 and the bucket self-join turns quadratic (measured 19.8× wall
    for 10× data at sf1, experiments/SIMHASH_PROFILE_r13.json). Band
    buckets holding more than 64 docs are dropped before the join
    (broadcast anti-join), bounding candidate volume linearly in the
    corpus; recall is lost only for pairs whose every agreeing band is
    a hot boilerplate mega-bucket. The cap changes the answer, so the
    uncapped ``dedup_simhash`` stays registered for compat and the
    oracle replays the identical banded route + cap + exact hamming
    verify."""
    out = simhash_pairs(
        load(spark, sf_dir, "documents"), max_hamming=6, max_bucket=64
    )
    return out.withColumn("hamming", F.col("hamming").cast("bigint"))


@query(
    "dedup_simhash_capped_rel",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id AS id, unnest({_TOKS}) AS t FROM documents
    ),
    th AS (SELECT id, {md5_long_sql('t')} AS h FROM tok),
    bits AS (
      SELECT id, j,
             CASE WHEN sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0
                  THEN 1::BIGINT << j ELSE 0 END AS bitval
      FROM th, unnest(generate_series(0, 31)) AS g(j)
      GROUP BY id, j
    ),
    sk AS (SELECT id, CAST(sum(bitval) AS BIGINT) AS sk FROM bits GROUP BY id),
    banded AS (
      SELECT id, sk, band, (sk >> (band * 4)) & 15 AS bb
      FROM sk, unnest(generate_series(0, 7)) AS t(band)
    ),
    sizes AS (
      SELECT band, bb, CAST(count(*) AS BIGINT) AS n
      FROM banded GROUP BY band, bb
    ),
    stats AS (
      SELECT band, CAST(sum(n) AS BIGINT) AS tot,
             CAST(count(*) AS BIGINT) AS nb
      FROM sizes GROUP BY band
    ),
    kept AS (
      SELECT s.band, s.bb
      FROM sizes s JOIN stats t ON t.band = s.band
      WHERE s.n * t.nb <= 2 * t.tot
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.sk, b.sk)) AS BIGINT) AS hamming
    FROM banded a
    JOIN kept k ON k.band = a.band AND k.bb = a.bb
    JOIN banded b ON b.band = a.band AND b.bb = a.bb AND a.id < b.id
    WHERE bit_count(xor(a.sk, b.sk)) <= 6
    """,
)
def dedup_simhash_capped_rel(spark, sf_dir):
    """The 4-bit SimHash with a RELATIVE bucket cap (VERDICT r15 item
    4): a band bucket is dropped iff it holds more than 2× its band's
    MEAN bucket load. The absolute-cap variant (dedup_simhash_capped,
    kept for compat) saturates to the empty set past ~1k docs per band
    value — 16 values/band can't keep any linear-safe constant cap
    partial — while the mean scales with the corpus, so this rule
    drops only the relatively-hot boilerplate buckets and stays
    binding-but-not-total at every tier. The cap predicate is exact
    integer arithmetic (cnt·n_buckets > 2·band_total) rather than a
    quantile, deliberately: cross-engine quantile interpolation
    diverges at the 1e-16 grain (the winsorized_values sf1 lesson) and
    the mean-multiple rule is the same skew gate without a float in
    sight. Recall is lost only for pairs whose EVERY agreeing band is
    relatively hot — at corpus scale those are the mega-cluster
    boilerplate pairs the exact/minhash tiers own."""
    out = simhash_pairs(
        load(spark, sf_dir, "documents"),
        max_hamming=6,
        rel_bucket_factor=2,
    )
    return out.withColumn("hamming", F.col("hamming").cast("bigint"))


@query(
    "dedup_simhash_wide",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id AS id, unnest({_TOKS}) AS t FROM documents
    ),
    th AS (SELECT id, {md5_long_sql('t')} AS h FROM tok),
    bits AS (
      SELECT id, j,
             CASE WHEN sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0
                  THEN 1::BIGINT << j ELSE 0 END AS bitval
      FROM th, unnest(generate_series(0, 59)) AS g(j)
      GROUP BY id, j
    ),
    sk AS (SELECT id, CAST(sum(bitval) AS BIGINT) AS sk FROM bits GROUP BY id),
    banded AS (
      SELECT id, sk, band, (sk >> (band * 8)) & 255 AS bb
      FROM sk, unnest(generate_series(0, 6)) AS t(band)
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.sk, b.sk)) AS BIGINT) AS hamming
    FROM banded a
    JOIN banded b ON b.band = a.band AND b.bb = a.bb AND a.id < b.id
    WHERE bit_count(xor(a.sk, b.sk)) <= 6
    """,
)
def dedup_simhash_wide(spark, sf_dir):
    """SimHash near-dup pairs with the WIDE sketch — the other scale
    lever: a 60-bit sketch (md5 supplies 60 deterministic bits) in 7
    bands of 8 bits gives 256 values per band, so uncapped buckets run
    ~n/256 — 16x the dilution of the 32-bit default whose band join
    measured 19.8x wall for 10x data. Pigeonhole recall holds for
    hamming <= 6 (< 7 bands); the wider sketch also discriminates
    distance better, so the same threshold is a stricter (and at 60
    bits, far more precise) near-dup test. n_bits changes the answer —
    own oracle-gated query; the 32-bit ``dedup_simhash`` stays for
    compat."""
    out = simhash_pairs(
        load(spark, sf_dir, "documents"),
        max_hamming=6,
        n_bits=60,
        n_bands=7,
    )
    return out.withColumn("hamming", F.col("hamming").cast("bigint"))


@query(
    "dedup_simhash_capped_wide",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id AS id, unnest({_TOKS}) AS t FROM documents
    ),
    th AS (SELECT id, {md5_long_sql('t')} AS h FROM tok),
    bits AS (
      SELECT id, j,
             CASE WHEN sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0
                  THEN 1::BIGINT << j ELSE 0 END AS bitval
      FROM th, unnest(generate_series(0, 59)) AS g(j)
      GROUP BY id, j
    ),
    sk AS (SELECT id, CAST(sum(bitval) AS BIGINT) AS sk FROM bits GROUP BY id),
    banded AS (
      SELECT id, sk, band, (sk >> (band * 8)) & 255 AS bb
      FROM sk, unnest(generate_series(0, 6)) AS t(band)
    ),
    kept AS (
      SELECT band, bb FROM banded GROUP BY band, bb HAVING count(*) <= 256
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.sk, b.sk)) AS BIGINT) AS hamming
    FROM banded a
    JOIN kept k ON k.band = a.band AND k.bb = a.bb
    JOIN banded b ON b.band = a.band AND b.bb = a.bb AND a.id < b.id
    WHERE bit_count(xor(a.sk, b.sk)) <= 6
    """,
)
def dedup_simhash_capped_wide(spark, sf_dir):
    """SimHash with BOTH scale levers — the configuration a 100 TB
    corpus actually ships: the 60-bit/7×8-band sketch dilutes buckets
    16× (~n/256), and band buckets past 256 docs are still dropped
    before the self-join, so boilerplate mega-clusters can never turn
    the band join quadratic no matter how the hash distribution skews.
    Registered because the 4-bit capped variant (dedup_simhash_capped)
    SATURATES past ~1k docs per band value: with only 16 values/band,
    every bucket of a 50k-doc corpus exceeds any linear-safe absolute
    cap and the query legitimately returns the empty set (SF1_r14/15
    measure exactly that) — wide banding is what keeps a cap meaningful
    as n grows. Cap + width both change the answer — own oracle."""
    out = simhash_pairs(
        load(spark, sf_dir, "documents"),
        max_hamming=6,
        n_bits=60,
        n_bands=7,
        max_bucket=256,
    )
    return out.withColumn("hamming", F.col("hamming").cast("bigint"))


@query(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id AS id, {_SHINGLES} AS shs FROM documents
    ),
    sig AS (SELECT id, {_SIG_SQL} AS sig FROM sh),
    banded AS (
      SELECT id, band,
             md5(array_to_string(list_transform(
               list_slice(sig, band * 4 + 1, band * 4 + 4),
               v -> v::VARCHAR), ',')) AS digest
      FROM sig, unnest(generate_series(0, 7)) AS t(band)
    ),
    pairs AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.digest = b.digest AND a.id < b.id
    ),
    undirected AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT src, dst FROM undirected
      UNION
      SELECT r.src, u.dst FROM reach r JOIN undirected u ON r.dst = u.src
    )
    SELECT d.doc_id,
           least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS component
    FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
    GROUP BY d.doc_id
    """,
)
def dedup_components(spark, sf_dir):
    """Canonical-doc assignment: connected components of the MinHash-LSH
    near-dup graph by iterative min-label propagation (the engine's
    bounded-iteration surface); the oracle computes the same components
    with a recursive-CTE transitive closure. Un-paired docs form singleton
    components."""
    docs = load(spark, sf_dir, "documents")
    pairs = lsh_candidates(docs, n=3, num_hashes=32, bands=8)
    return connected_components(pairs, docs)


def _corpus_clean_oracle() -> str:
    """Composed cleaning-pipeline oracle: language gate -> quality gate ->
    exact-dedup canonical -> capped-LSH near-dup drop (keep the smaller id
    of each candidate pair)."""
    from timeseries_spark.extensions.text import LANG_MARKERS, redact_pii_sql

    redacted = redact_pii_sql(
        "s.text || CASE WHEN s.doc_id % 10 = 0"
        " THEN ' contact a.b@mail-x.com or http://x.io/p 1234567'"
        " ELSE '' END"
    )
    marker = ",\n      ".join(
        "struct_pack(hits := CAST(len(list_filter(string_split(text, ' '), "
        f"t -> t IN ({', '.join(repr(m) for m in ms)}))) AS BIGINT), "
        f"lang := '{lang}')"
        for lang, ms in sorted(LANG_MARKERS.items())
    )
    shingles = _SHINGLES.replace("string_split(text, ' ')",
                                 "string_split(s.text, ' ')")
    return f"""
    WITH scored AS (
      SELECT doc_id, text, [
      {marker}
      ] AS scores FROM documents
    ),
    m AS (
      SELECT doc_id, text, scores,
             list_max(list_transform(scores, x -> x.hits)) AS mh
      FROM scored
    ),
    lang AS (
      SELECT doc_id, text FROM m
      WHERE list_sort(list_transform(
              list_filter(scores, x -> x.hits = mh), x -> x.lang))[1] = 'en'
    ),
    q AS (
      SELECT doc_id, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
      FROM lang
      WHERE len(string_split(text, ' ')) >= 20
    ),
    keep_exact AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
    s AS (SELECT q.* FROM q JOIN keep_exact USING (doc_id)),
    base AS (SELECT s.doc_id AS id, {shingles} AS shs FROM s),
    ex AS (SELECT id, unnest(shs) AS sh FROM base),
    hot AS (SELECT sh FROM ex GROUP BY sh HAVING count(*) > 5),
    kept AS (SELECT id, sh FROM ex WHERE sh NOT IN (SELECT sh FROM hot)),
    capped AS (
      SELECT b.id, coalesce(list(k.sh) FILTER (k.sh IS NOT NULL), []) AS shs
      FROM base b LEFT JOIN kept k ON k.id = b.id GROUP BY b.id
    ),
    sig AS (SELECT id, {_SIG_SQL} AS sig FROM capped),
    banded AS (
      SELECT id, band,
             md5(array_to_string(list_transform(
               list_slice(sig, band * 4 + 1, band * 4 + 4),
               v -> v::VARCHAR), ',')) AS digest
      FROM sig, unnest(generate_series(0, 7)) AS t(band)
    ),
    dropped AS (
      SELECT DISTINCT b.id
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.digest = b.digest AND a.id < b.id
    )
    SELECT s.doc_id, s.n_words,
           md5({redacted}) AS redacted_md5
    FROM s
    WHERE s.doc_id NOT IN (SELECT id FROM dropped)
    """


@query("corpus_clean", oracle=_corpus_clean_oracle())
def corpus_clean(spark, sf_dir):
    """The composed pretraining-corpus cleaning pipeline — the extension
    operators chained the way a real 100 TB text pipeline runs them:
    language gate (marker-vocabulary argmax == 'en') -> quality gate
    (n_words >= 20) -> exact dedup (canonical = min doc id per digest) ->
    MinHash-LSH near-dup drop with the df>5 shingle cap (greedy keep the
    smaller id of each candidate pair) -> PII redaction of the surviving
    text (regexp_replace chain, oracle-gated byte-for-byte via md5; every
    10th survivor gets the deterministic PII suffix in both engines so
    the redactor provably binds on the clean synthetic corpus). Every
    stage reduces the corpus BEFORE the next, more expensive one — the
    filters and the redactor are codegen'd projections, the dedups are
    bucketed joins, nothing rescans dropped docs. Both gates, both
    dedups, and the redactor provably bind at sf0.01."""
    from timeseries_spark.extensions.text import (
        language_scores,
        quality_metrics,
        redact_pii,
    )

    docs = load(spark, sf_dir, "documents")
    lang = language_scores(docs).filter(F.col("pred_lang") == "en")
    q = (
        quality_metrics(lang)
        .filter(F.col("n_words") >= 20)
        .select("doc_id", "text", "n_words")
    )
    keep = exact_duplicates(q).select(F.col("keep_id").alias("doc_id"))
    survivors = q.join(keep, "doc_id", "semi")
    pairs = lsh_candidates(survivors, max_doc_freq=5)
    out = survivors.join(
        pairs.select(F.col("id_b").alias("doc_id")).distinct(),
        "doc_id",
        "anti",
    )
    red = redact_pii(
        out.withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.when(
                    F.pmod("doc_id", F.lit(10)) == 0,
                    F.lit(
                        " contact a.b@mail-x.com or http://x.io/p 1234567"
                    ),
                ).otherwise(F.lit("")),
            ),
        )
    )
    return red.select(
        "doc_id",
        "n_words",
        F.md5(F.col("text").cast("binary")).alias("redacted_md5"),
    )


def _eval_docs_sql() -> str:
    return "SELECT * FROM documents WHERE doc_id % 41 = 0"


@query(
    "contamination_report",
    oracle=f"""
    WITH ev AS (
      SELECT DISTINCT unnest({_SHINGLES}) AS sh
      FROM ({_eval_docs_sql()})
    ),
    tr AS (
      SELECT doc_id AS id, unnest({_SHINGLES}) AS sh FROM documents
    )
    SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_eval_hits
    FROM tr JOIN ev USING (sh)
    GROUP BY id
    """,
)
def contamination_report(spark, sf_dir):
    """Train/eval overlap audit: for every corpus doc sharing at least
    one distinct 3-gram with the eval set (every 41st doc, standing in
    for a benchmark suite), the count of shared distinct 3-grams. The
    eval shingle set broadcasts, so the corpus is scanned once with a
    map-side join — the plan shape for a 100 TB train corpus vs a
    few-MB benchmark."""
    from timeseries_spark.extensions.dedup import contamination_hits

    docs = load(spark, sf_dir, "documents")
    ev = docs.filter(F.pmod("doc_id", F.lit(41)) == 0)
    return contamination_hits(docs, ev, n=3).select(
        F.col("id").alias("doc_id"), "n_eval_hits"
    )


@query(
    "decontaminate",
    oracle=f"""
    WITH ev AS (
      SELECT DISTINCT unnest({_SHINGLES}) AS sh
      FROM ({_eval_docs_sql()})
    ),
    tr AS (
      SELECT doc_id AS id, unnest({_SHINGLES}) AS sh FROM documents
    ),
    hits AS (
      SELECT id, count(*) AS n_eval_hits
      FROM tr JOIN ev USING (sh)
      GROUP BY id
    )
    SELECT d.doc_id, d.source,
           CAST(coalesce(h.n_eval_hits, 0) AS BIGINT) AS n_eval_hits
    FROM documents d LEFT JOIN hits h ON h.id = d.doc_id
    WHERE coalesce(h.n_eval_hits, 0) < 2
    """,
)
def decontaminate_corpus(spark, sf_dir):
    """N-gram decontamination: drop every corpus doc sharing >= 2
    distinct 3-grams with the eval set (every 41st doc) — eval docs
    themselves share ALL their shingles and always go, near-copies go
    with them, clean docs keep an audited n_eval_hits of 0 or 1. One
    corpus scan: eval shingles broadcast in, the bounded hit table
    broadcasts back."""
    from timeseries_spark.extensions.dedup import decontaminate

    docs = load(spark, sf_dir, "documents")
    ev = docs.filter(F.pmod("doc_id", F.lit(41)) == 0)
    return decontaminate(docs, ev, n=3, min_hits=2).select(
        "doc_id", "source", "n_eval_hits"
    )


@query(
    "dedup_minhash_verified",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id AS id, {_SHINGLES} AS shs FROM documents
    ),
    sig AS (SELECT id, {_SIG_SQL} AS sig FROM sh WHERE len(shs) > 0),
    banded AS (
      SELECT id, band,
             md5(array_to_string(list_transform(
               list_slice(sig, band * 4 + 1, band * 4 + 4),
               v -> v::VARCHAR), ',')) AS digest
      FROM sig, unnest(generate_series(0, 7)) AS t(band)
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.digest = b.digest
                   AND a.id < b.id
    ),
    sent AS (SELECT id FROM sh WHERE len(shs) = 0)
    SELECT c.id_a, c.id_b,
           round(len(list_filter(generate_series(1, 32),
                                 i -> sa.sig[i] = sb.sig[i])) / 32.0, 6)
             AS est_jaccard
    FROM cand c
    JOIN sig sa ON sa.id = c.id_a
    JOIN sig sb ON sb.id = c.id_b
    WHERE len(list_filter(generate_series(1, 32),
                          i -> sa.sig[i] = sb.sig[i])) / 32.0 >= 0.5
    UNION ALL
    SELECT m.id_a, s.id AS id_b, 1.0 AS est_jaccard
    FROM sent s CROSS JOIN (SELECT min(id) AS id_a FROM sent) m
    WHERE s.id > m.id_a
    """,
)
def dedup_minhash_verified(spark, sf_dir):
    """MinHash pipeline stage 2: LSH candidates filtered by estimated
    Jaccard (fraction of agreeing signature components, an unbiased
    estimator of the true n-gram Jaccard) at threshold 0.5 — the
    verification pass a web-scale dedup runs WITHOUT re-reading text.
    One signature aggregate feeds both banding and verification;
    sentinel (shingle-less) docs star-pair at est 1.0."""
    from timeseries_spark.extensions.dedup import lsh_verified_pairs

    return lsh_verified_pairs(
        load(spark, sf_dir, "documents"), n=3, num_hashes=32, bands=8,
        est_threshold=0.5,
    )


@query(
    "dedup_incremental",
    oracle=f"""
    WITH newd AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
    oldd AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
    exact_surv AS (
      SELECT doc_id FROM newd
      WHERE md5(text) NOT IN (SELECT DISTINCT md5(text) FROM oldd)
    ),
    shN AS (SELECT doc_id AS id, {_SHINGLES} AS shs FROM newd),
    shO AS (SELECT doc_id AS id, {_SHINGLES} AS shs FROM oldd),
    sigN AS (SELECT id, {_SIG_SQL} AS sig FROM shN WHERE len(shs) > 0),
    sigO AS (SELECT id, {_SIG_SQL} AS sig FROM shO WHERE len(shs) > 0),
    bN AS (
      SELECT id, band,
             md5(array_to_string(list_transform(
               list_slice(sig, band * 4 + 1, band * 4 + 4),
               v -> v::VARCHAR), ',')) AS digest
      FROM sigN, unnest(generate_series(0, 7)) AS t(band)
    ),
    bO AS (
      SELECT id, band,
             md5(array_to_string(list_transform(
               list_slice(sig, band * 4 + 1, band * 4 + 4),
               v -> v::VARCHAR), ',')) AS digest
      FROM sigO, unnest(generate_series(0, 7)) AS t(band)
    ),
    near_hits AS (
      SELECT DISTINCT a.id FROM bN a
      JOIN bO b ON a.band = b.band AND a.digest = b.digest
    ),
    sentN AS (SELECT id FROM shN WHERE len(shs) = 0),
    sent_hits AS (
      SELECT id FROM sentN
      WHERE (SELECT count(*) FROM shO WHERE len(shs) = 0) > 0
    )
    SELECT d.doc_id, d.source FROM newd d
    JOIN exact_surv e ON e.doc_id = d.doc_id
    WHERE d.doc_id NOT IN (SELECT id FROM near_hits)
      AND d.doc_id NOT IN (SELECT id FROM sent_hits)
    """,
)
def dedup_incremental(spark, sf_dir):
    """Ingestion-time dedup: the 'new shard' (every 5th doc) is
    deduplicated AGAINST the existing corpus (the rest) — dropped on an
    exact digest match, any shared MinHash band, or empty-vs-empty
    sentinel match. The existing side reduces to digests + band digests
    (far smaller than its text) and all checks are anti/semi joins on
    those keys; the new shard is scanned once, never all-pairs."""
    from timeseries_spark.extensions.dedup import incremental_dedup

    docs = load(spark, sf_dir, "documents")
    new = docs.filter(F.pmod("doc_id", F.lit(5)) == 0)
    old = docs.filter(F.pmod("doc_id", F.lit(5)) != 0)
    return incremental_dedup(new, old, n=3, num_hashes=32, bands=8).select(
        "doc_id", "source"
    )


def _bloom_oracle() -> str:
    from timeseries_spark.extensions.hashing import md5_h1_sql, md5_h2_sql

    h1, h2 = md5_h1_sql("digest"), md5_h2_sql("digest")
    return f"""
    WITH oldd AS (
      SELECT md5(text) AS digest FROM documents WHERE doc_id % 5 <> 0
    ),
    newd AS (
      SELECT doc_id, md5(text) AS digest FROM documents
      WHERE doc_id % 5 = 0
    ),
    oldh AS (SELECT {h1} AS h1, {h2} AS h2 FROM oldd),
    bits AS (
      SELECT DISTINCT CAST((h1 + g.i * h2) % 4096 AS INT) AS bit
      FROM oldh, unnest(generate_series(0, 4)) AS g(i)
    ),
    newh AS (SELECT doc_id, digest, {h1} AS h1, {h2} AS h2 FROM newd),
    probes AS (
      SELECT doc_id, digest,
             CAST((h1 + g.i * h2) % 4096 AS INT) AS bit
      FROM newh, unnest(generate_series(0, 4)) AS g(i)
    ),
    flags AS (
      SELECT p.doc_id, p.digest,
             (count(CASE WHEN b.bit IS NULL THEN 1 END) = 0) AS bloom_maybe
      FROM probes p LEFT JOIN bits b ON b.bit = p.bit
      GROUP BY p.doc_id, p.digest
    )
    SELECT f.doc_id, f.bloom_maybe,
           (f.digest IN (SELECT digest FROM oldd)) AS actually_known
    FROM flags f
    """


@query("bloom_prefilter", oracle=_bloom_oracle())
def bloom_prefilter(spark, sf_dir):
    """Bloom-filter membership pre-filter for incremental dedup: the
    existing corpus's content digests build a 4096-bit / 5-hash filter
    (stored as set-bit positions — broadcastable); each new-shard doc
    probes it. bloom_maybe=false is a DEFINITE miss (skip the exact
    check entirely); true is confirmed exactly. Compared against true
    membership — the oracle equality proves zero false negatives on
    this corpus. Integer md5 bit math, identical in both engines."""
    from timeseries_spark.extensions.sketches import bloom_bits, bloom_maybe

    docs = load(spark, sf_dir, "documents")
    old = docs.filter(F.pmod("doc_id", F.lit(5)) != 0).select(
        F.md5("text").alias("digest")
    )
    new = docs.filter(F.pmod("doc_id", F.lit(5)) == 0).select(
        "doc_id", F.md5("text").alias("digest")
    )
    bloom = bloom_bits(old, "digest", m_bits=4096, k_hashes=5)
    flagged = bloom_maybe(new, bloom, "digest", m_bits=4096, k_hashes=5)
    known = old.distinct().withColumn("__known", F.lit(1))
    return (
        flagged.join(F.broadcast(known), "digest", "left")
        .select(
            "doc_id",
            "bloom_maybe",
            F.col("__known").isNotNull().alias("actually_known"),
        )
    )


def _corpus_prepare_oracle() -> str:
    from timeseries_spark.extensions.sampling import (
        dataset_split_sql,
        sample_hash_sql,
    )

    split_case = dataset_split_sql(
        [("train", 0.8), ("val", 0.1), ("test", 0.1)], "doc_id", "split"
    )
    return f"""
    WITH ev AS (
      SELECT DISTINCT unnest({_SHINGLES}) AS sh
      FROM ({_eval_docs_sql()})
    ),
    tr AS (
      SELECT doc_id AS id, unnest({_SHINGLES}) AS sh FROM documents
    ),
    hits AS (
      SELECT id, count(*) AS n_eval_hits FROM tr JOIN ev USING (sh)
      GROUP BY id
    ),
    decon AS (
      SELECT d.* FROM documents d
      LEFT JOIN hits h ON h.id = d.doc_id
      WHERE coalesce(h.n_eval_hits, 0) < 2
    ),
    scored AS (
      SELECT *, CAST(len(string_split(text, ' ')) AS DOUBLE) AS mv
      FROM decon
    ),
    cuts AS (
      SELECT source, round(quantile_cont(mv, 0.25), 4) AS cut
      FROM scored GROUP BY source
    ),
    quality AS (
      SELECT s.* FROM scored s JOIN cuts c USING (source)
      WHERE s.mv >= c.cut
    ),
    keep AS (
      SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)
    ),
    deduped AS (
      SELECT q.doc_id, q.source, {split_case} AS split
      FROM quality q JOIN keep USING (doc_id)
    ),
    train AS (SELECT doc_id, source FROM deduped WHERE split = 'train'),
    counts AS (
      SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n
      FROM train GROUP BY source
    ),
    stats AS (
      SELECT
        list_reduce(list_prepend(0::BIGINT, list(n ORDER BY
          (stratum IS NULL), coalesce(stratum, ''))), (a, b) -> a + b)
          AS total,
        list_reduce(list_prepend(0.0::DOUBLE,
          list(power(n::DOUBLE, 0.5) ORDER BY
            (stratum IS NULL), coalesce(stratum, ''))), (a, b) -> a + b)
          AS powsum
      FROM counts
    ),
    weights AS (
      SELECT stratum,
             round(power(n::DOUBLE, 0.5) / powsum * total::DOUBLE
                   / n::DOUBLE, 6) AS mix_weight
      FROM counts CROSS JOIN stats
    ),
    base AS (
      SELECT t.doc_id, t.source, w.mix_weight,
             CAST(floor(mix_weight) AS INT)
             + CASE WHEN {sample_hash_sql("t.doc_id", "tmix")}
                         < CAST(floor((mix_weight - floor(mix_weight))
                                      * 1152921504606846976.0) AS BIGINT)
                    THEN 1 ELSE 0 END AS copies
      FROM train t
      JOIN weights w ON w.stratum IS NOT DISTINCT FROM t.source
    )
    SELECT doc_id, source, mix_weight, CAST(g.copy AS INT) AS copy
    FROM base, unnest(generate_series(0, copies - 1)) AS g(copy)
    """


@query("corpus_prepare", oracle=_corpus_prepare_oracle())
def corpus_prepare(spark, sf_dir):
    """The round-5 corpus-preparation pipeline end to end, each stage
    reducing the corpus before the next: n-gram decontamination against
    the eval set (every 41st doc) -> per-source 25th-percentile quality
    floor -> exact dedup keep-one -> deterministic 80/10/10 split ->
    temperature-scaled (alpha=0.5) mixing of the TRAIN split with
    weights derived from the post-gate counts. Output: the train
    replicas (doc_id, source, mix_weight, copy). One oracle replays the
    entire chain, so every gate and the data-derived mix weights are
    correctness-gated in composition, not just in isolation."""
    from timeseries_spark.extensions.dedup import decontaminate
    from timeseries_spark.extensions.sampling import (
        dataset_split,
        temperature_mix,
    )
    from timeseries_spark.extensions.text import relative_quality_filter

    docs = load(spark, sf_dir, "documents")
    ev = docs.filter(F.pmod("doc_id", F.lit(41)) == 0)
    decon = decontaminate(docs, ev, n=3, min_hits=2)
    quality = relative_quality_filter(decon, p=0.25)
    keep = exact_duplicates(quality).select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = quality.join(keep, "doc_id", "semi")
    split = dataset_split(
        deduped, [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    )
    train = split.filter(F.col("split") == "train").select(
        "doc_id", "source"
    )
    return temperature_mix(train, alpha=0.5).select(
        "doc_id", "source", "mix_weight", "copy"
    )


def _contrastive_oracle() -> str:
    from timeseries_spark.extensions.hashing import md5_long_sql

    h = md5_long_sql(
        "'neg' || CAST(anchor_id AS VARCHAR) || ':'"
        " || CAST(neg_idx AS VARCHAR)"
    )
    return f"""
    WITH sh AS (
      SELECT doc_id AS id, {_SHINGLES} AS shs FROM documents
    ),
    sig AS (SELECT id, {_SIG_SQL} AS sig FROM sh WHERE len(shs) > 0),
    banded AS (
      SELECT id, band,
             md5(array_to_string(list_transform(
               list_slice(sig, band * 4 + 1, band * 4 + 4),
               v -> v::VARCHAR), ',')) AS digest
      FROM sig, unnest(generate_series(0, 7)) AS t(band)
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.digest = b.digest
                   AND a.id < b.id
    ),
    sent AS (SELECT id FROM sh WHERE len(shs) = 0),
    pos AS (
      SELECT c.id_a AS anchor_id, c.id_b AS partner_id
      FROM cand c
      JOIN sig sa ON sa.id = c.id_a
      JOIN sig sb ON sb.id = c.id_b
      WHERE len(list_filter(generate_series(1, 32),
                            i -> sa.sig[i] = sb.sig[i])) / 32.0 >= 0.5
      UNION ALL
      SELECT m.id_a AS anchor_id, s.id AS partner_id
      FROM sent s CROSS JOIN (SELECT min(id) AS id_a FROM sent) m
      WHERE s.id > m.id_a
    ),
    nn AS (SELECT count(*) AS N FROM documents),
    draws AS (
      SELECT d.doc_id AS anchor_id, CAST(g.i AS INT) AS neg_idx
      FROM documents d, unnest(generate_series(0, 1)) AS g(i)
    ),
    neg AS (
      SELECT h.anchor_id, h.neg_id AS partner_id FROM (
        SELECT anchor_id, neg_idx, ({h}) % nn.N AS neg_id
        FROM draws CROSS JOIN nn
      ) h
      JOIN documents p ON p.doc_id = h.neg_id
      WHERE h.neg_id != h.anchor_id
    )
    SELECT anchor_id, partner_id, 1 AS label FROM pos
    UNION ALL
    SELECT anchor_id, partner_id, 0 AS label FROM neg
    """


@query("contrastive_pairs", oracle=_contrastive_oracle())
def contrastive_pairs(spark, sf_dir):
    """Training-pair generation for contrastive objectives: positives =
    MinHash-verified near-duplicate pairs (est Jaccard >= 0.5, sentinel
    star included), negatives = 2 deterministic uniform draws per doc —
    the (anchor, partner, label) table a contrastive trainer consumes,
    assembled entirely from the oracle-gated building blocks and
    replayed end-to-end by one oracle."""
    from timeseries_spark.extensions.dedup import lsh_verified_pairs
    from timeseries_spark.extensions.sampling import negative_samples

    docs = load(spark, sf_dir, "documents")
    pos = lsh_verified_pairs(docs, est_threshold=0.5).select(
        F.col("id_a").alias("anchor_id"),
        F.col("id_b").alias("partner_id"),
        F.lit(1).alias("label"),
    )
    neg = negative_samples(docs, k=2).select(
        "anchor_id",
        F.col("neg_id").alias("partner_id"),
        F.lit(0).alias("label"),
    )
    return pos.unionByName(neg)


@query(
    "lsh_quality_report",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id AS id, {_SHINGLES} AS shs FROM documents
    ),
    sig AS (SELECT id, {_SIG_SQL} AS sig FROM sh WHERE len(shs) > 0),
    banded AS (
      SELECT id, band,
             md5(array_to_string(list_transform(
               list_slice(sig, band * 4 + 1, band * 4 + 4),
               v -> v::VARCHAR), ',')) AS digest
      FROM sig, unnest(generate_series(0, 7)) AS t(band)
    ),
    sent AS (SELECT id FROM sh WHERE len(shs) = 0),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.digest = b.digest
                   AND a.id < b.id
      UNION ALL
      SELECT m.id_a, s.id AS id_b
      FROM sent s CROSS JOIN (SELECT min(id) AS id_a FROM sent) m
      WHERE s.id > m.id_a
    ),
    shx AS (SELECT id, unnest(shs) AS s FROM sh),
    sizes AS (SELECT id, count(*) AS n FROM shx GROUP BY id),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS c
      FROM shx a JOIN shx b ON a.s = b.s AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    truth AS (
      SELECT id_a, id_b FROM pairs
      JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
      WHERE round(c / (sa.n + sb.n - c), 6) >= 0.5
    ),
    j AS (
      SELECT (c.id_a IS NOT NULL) AS is_cand,
             (t.id_a IS NOT NULL) AS is_true
      FROM cand c FULL JOIN truth t
        ON c.id_a = t.id_a AND c.id_b = t.id_b
    )
    SELECT
      CAST(sum(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT)
        AS n_candidates,
      CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
      CAST(sum(CASE WHEN is_cand AND is_true THEN 1 ELSE 0 END) AS BIGINT)
        AS n_hit,
      round(CAST(sum(CASE WHEN is_cand AND is_true THEN 1 ELSE 0 END)
                 AS DOUBLE)
            / nullif(sum(CASE WHEN is_true THEN 1 ELSE 0 END), 0), 4)
        AS pair_recall,
      round(CAST(sum(CASE WHEN is_cand AND is_true THEN 1 ELSE 0 END)
                 AS DOUBLE)
            / nullif(sum(CASE WHEN is_cand THEN 1 ELSE 0 END), 0), 4)
        AS candidate_precision
    FROM j
    """,
)
def lsh_quality_report(spark, sf_dir):
    """Measure, don't guess: recall/precision of the MinHash-LSH
    candidate generator against exact 3-gram Jaccard ≥ 0.5 ground truth
    on the SAME corpus — the one-row report that tells an engineer
    whether 32 hashes × 8 bands is enough before a 100 TB run. Both
    pipelines are the already-oracled operators; the comparison is one
    full-outer join of two pair tables + a single aggregate. (A full
    exact-truth pass is affordable at sample scale — the intended use —
    while LSH alone runs at corpus scale.)"""
    docs = load(spark, sf_dir, "documents")
    cand = lsh_candidates(docs, n=3, num_hashes=32, bands=8).withColumn(
        "is_cand", F.lit(True)
    )
    truth = jaccard_pairs(docs, n=3, threshold=0.5).select(
        "id_a", "id_b", F.lit(True).alias("is_true")
    )
    j = cand.join(truth, ["id_a", "id_b"], "full_outer").select(
        F.coalesce("is_cand", F.lit(False)).alias("is_cand"),
        F.coalesce("is_true", F.lit(False)).alias("is_true"),
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa
    agg = j.agg(
        cnt(F.col("is_cand")).alias("n_candidates"),
        cnt(F.col("is_true")).alias("n_true"),
        cnt(F.col("is_cand") & F.col("is_true")).alias("n_hit"),
    )
    ratio = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0, F.round(F.col(num) / F.col(den), 4)
    )
    return agg.select(
        "n_candidates",
        "n_true",
        "n_hit",
        ratio("n_hit", "n_true").alias("pair_recall"),
        ratio("n_hit", "n_candidates").alias("candidate_precision"),
    )


@query(
    "dedup_containment_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id AS id, unnest({_SHINGLES}) AS sh FROM documents
    ),
    sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id_a, id_b, n_common,
           round(n_common / sa.n_sh, 6) AS containment_a,
           round(n_common / sb.n_sh, 6) AS containment_b
    FROM pairs
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE round(n_common / sa.n_sh, 6) >= 0.4
       OR round(n_common / sb.n_sh, 6) >= 0.4
    """,
)
def dedup_containment_pairs(spark, sf_dir):
    """Asymmetric containment near-dup (|A∩B|/|A| ≥ 0.4 in either
    direction) — catches excerpt/quote relationships symmetric Jaccard
    misses; same inverted-index plan
    (extensions/dedup.py:containment_pairs)."""
    from timeseries_spark.extensions.dedup import containment_pairs

    return containment_pairs(
        load(spark, sf_dir, "documents"), n=3, threshold=0.4
    )


@query(
    "dedup_winnowing_pairs",
    oracle="""
    WITH hsrc AS (
      SELECT doc_id AS id,
             list_transform(generate_series(1, len(ts) - 2),
               i -> ('0x' || substring(
                       md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]),
                       1, 15))::BIGINT) AS hs
      FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
      WHERE len(ts) >= 3
    ),
    win AS (
      SELECT id, unnest(list_distinct(
        list_transform(generate_series(1, greatest(1, len(hs) - 3)),
          i -> list_reduce(hs[i:i+3],
                 (acc, c) -> CASE WHEN c <= acc THEN c
                             ELSE acc END)))) AS fp
      FROM hsrc WHERE len(hs) >= 1
    ),
    capped AS (SELECT fp FROM win GROUP BY fp HAVING count(*) <= 100),
    live AS (SELECT w.id, w.fp FROM win w JOIN capped c ON c.fp = w.fp)
    SELECT a.id AS doc_a, b.id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM live a JOIN live b ON a.fp = b.fp AND a.id < b.id
    GROUP BY a.id, b.id HAVING count(*) >= 2
    """,
)
def dedup_winnowing_pairs(spark, sf_dir):
    """Near-dup candidate pairs by winnowed fingerprints (the MOSS
    algorithm): token 3-gram md5 hashes, window-4 rightmost-minimum
    selection as ONE codegen'd expression per row (density ~2/(w+1),
    any shared >=6-token run guaranteed caught), hot fingerprints
    capped before the fingerprint-keyed inverted-index self-join —
    never all-pairs (extensions/dedup.py:winnow_pairs)."""
    from timeseries_spark.extensions.dedup import winnow_pairs

    docs = load(spark, sf_dir, "documents")
    return winnow_pairs(
        docs, k=3, window=4, min_shared=2, max_doc_freq=100
    )
