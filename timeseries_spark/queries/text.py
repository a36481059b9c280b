"""Text-analysis queries over the documents table (extension surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_spark.extensions.hashing import rolling_fingerprint_sql
from timeseries_spark.extensions.text import (
    LANG_MARKERS,
    STOPWORDS,
    fingerprints,
    language_scores,
    quality_metrics,
    regex_token_count,
    ws_tokens,
)
from timeseries_spark.queries import load, query

# raw (NON-distinct) 3-gram list, shared with the dedup oracles —
# _SHINGLES there is list_distinct(_RAW_SHINGLES)
from timeseries_spark.queries.dedup import _RAW_SHINGLES  # noqa: E402


@query(
    "word_frequencies",
    oracle="""
    SELECT w AS word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY w
    HAVING count(*) >= 100
    """,
)
def word_frequencies(spark, sf_dir):
    """F1 explode + F12 split: corpus word frequencies (the explode idiom
    of timeseries.py:354-359 / parse_timestamp.py:452-454)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(ws_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 100)
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "doc_quality",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           round((length(text) - (len(string_split(text, ' ')) - 1))
                 / len(string_split(text, ' ')), 4) AS mean_word_len,
           round(len(list_filter(string_split(text, ' '),
                                 t -> t IN ({_STOP_SQL})))
                 / len(string_split(text, ' ')), 4) AS stopword_ratio,
           round(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                 / length(text), 4) AS punct_ratio
    FROM documents
    """,
)
def doc_quality(spark, sf_dir):
    """Quality scoring: length / word stats / stopword + punct ratios —
    the cheap pretraining filters, all JVM-side expressions."""
    docs = load(spark, sf_dir, "documents")
    return quality_metrics(docs, "text").select(
        "doc_id",
        "n_chars_calc",
        "n_words",
        "mean_word_len",
        "stopword_ratio",
        "punct_ratio",
    )


@query(
    "token_counts",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
             AS BIGINT) AS re_tokens
    FROM documents
    """,
)
def token_counts(spark, sf_dir):
    """Token counting: whitespace tokens + a BPE-ish regex tokenizer
    (alpha runs / digit runs / punctuation singles)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(ws_tokens(F.col("text"))).cast("bigint").alias("ws_tokens"),
        regex_token_count(F.col("text")).cast("bigint").alias("re_tokens"),
    )


_MARKER_SQL = ",\n      ".join(
    "struct_pack(hits := CAST(len(list_filter(string_split(text, ' '), "
    f"t -> t IN ({', '.join(repr(m) for m in markers)}))) AS BIGINT), "
    f"lang := '{lang}')"
    for lang, markers in sorted(LANG_MARKERS.items())
)


@query(
    "language_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, [
        {_MARKER_SQL}
      ] AS scores
      FROM documents
    ),
    m AS (
      SELECT doc_id, lang, scores,
             list_max(list_transform(scores, s -> s.hits)) AS marker_hits
      FROM scored
    )
    SELECT doc_id, lang,
           list_sort(list_transform(
             list_filter(scores, s -> s.hits = marker_hits), s -> s.lang
           ))[1] AS pred_lang,
           marker_hits
    FROM m
    """,
)
def language_id(spark, sf_dir):
    """Language ID by marker-vocabulary hits (n-gram heuristic family);
    arg-max with deterministic ascending-code tie-break."""
    docs = load(spark, sf_dir, "documents")
    return language_scores(docs, "text").select(
        "doc_id", "lang", "pred_lang", "marker_hits"
    )


@query(
    "doc_fingerprints",
    oracle=f"""
    SELECT doc_id,
           md5(lower(trim(text))) AS md5_fp,
           {rolling_fingerprint_sql("string_split(lower(trim(text)), ' ')")}
             AS rolling_fp
    FROM documents
    """,
)
def doc_fingerprints(spark, sf_dir):
    """Document fingerprinting: normalized md5 + order-sensitive rolling
    hash (distinguishes token permutations), engine-reproducible."""
    docs = load(spark, sf_dir, "documents")
    return fingerprints(docs, "text").select("doc_id", "md5_fp", "rolling_fp")


@query(
    "doc_repetition",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_RAW_SHINGLES} AS shs FROM documents
    )
    SELECT doc_id,
           CAST(len(shs) AS BIGINT) AS n_shingles,
           CAST(len(list_distinct(shs)) AS BIGINT) AS n_distinct,
           CASE WHEN len(shs) > 0
                THEN round(1.0 - len(list_distinct(shs)) / len(shs), 4)
                ELSE 0.0 END AS repetition_ratio
    FROM sh
    """,
)
def doc_repetition(spark, sf_dir):
    """Within-doc 3-gram repetition ratio (Gopher-style degenerate-text
    filter): 1 - distinct/total shingles, zero for short docs — flags
    looping text before any cross-doc dedup."""
    from timeseries_spark.extensions.text import repetition_metrics

    docs = load(spark, sf_dir, "documents")
    return repetition_metrics(docs, n=3).select(
        "doc_id", "n_shingles", "n_distinct", "repetition_ratio"
    )


def _pii_oracle() -> str:
    from timeseries_spark.extensions.text import PII_PATTERNS

    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS {name}"
        for name, pat in PII_PATTERNS.items()
    )
    return f"""
    WITH aug AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 10 = 0
                  THEN ' contact a.b@mail-x.com or http://x.io/p 1234567'
                  ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id, {counts} FROM aug
    """


def _pii_redacted_oracle() -> str:
    from timeseries_spark.extensions.text import redact_pii_sql

    return f"""
    WITH aug AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 10 = 0
                  THEN ' contact a.b@mail-x.com or http://x.io/p 1234567'
                  ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           md5({redact_pii_sql("text")}) AS redacted_md5,
           CAST(len(regexp_extract_all({redact_pii_sql("text")},
                '<EMAIL>|<URL>|<DIGITS>')) AS BIGINT) AS n_redactions
    FROM aug
    """


@query("pii_redacted", oracle=_pii_redacted_oracle())
def pii_redacted(spark, sf_dir):
    """The acting half of the PII pass: every audit-registry match is
    replaced by its per-pattern placeholder token, and the oracle gates
    the redacted text BYTE FOR BYTE via md5 (plus a placeholder count so
    the redaction provably binds — every 10th doc gets the deterministic
    PII suffix in both engines, the clean-corpus convention from
    pii_audit_counts). The whole pass is a chain of codegen'd
    regexp_replace projections: one scan, zero shuffles, at any corpus
    size."""
    from timeseries_spark.extensions.text import redact_pii

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.pmod("doc_id", F.lit(10)) == 0,
                F.lit(" contact a.b@mail-x.com or http://x.io/p 1234567"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    red = redact_pii(docs)
    return red.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("redacted_md5"),
        F.regexp_count(
            F.col("text"), F.lit("<EMAIL>|<URL>|<DIGITS>")
        ).cast("bigint").alias("n_redactions"),
    )


@query("pii_audit_counts", oracle=_pii_oracle())
def pii_audit_counts(spark, sf_dir):
    """PII audit pass (pre-redaction): per-doc counts of emails, URLs,
    and long digit runs as codegen'd regexp projections. Every 10th doc
    gets a deterministic PII suffix in BOTH engines so all three
    patterns provably bind (the synthetic corpus itself is clean)."""
    from timeseries_spark.extensions.text import pii_counts

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.pmod("doc_id", F.lit(10)) == 0,
                F.lit(" contact a.b@mail-x.com or http://x.io/p 1234567"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_counts(docs).select(
        "doc_id", "n_emails", "n_urls", "n_long_digit_runs"
    )


@query(
    "doc_chunks",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    st AS (
      SELECT doc_id, toks, n, g.s AS chunk_start
      FROM t, unnest(generate_series(1, greatest(n - 16, 1), 48)) AS g(s)
    )
    SELECT doc_id,
           CAST((chunk_start - 1) / 48 AS INT) AS chunk_idx,
           CAST(chunk_start AS INT) AS chunk_start,
           CAST(least(64, n - chunk_start + 1) AS INT) AS n_chunk_tokens,
           array_to_string(
             list_slice(toks, chunk_start, chunk_start + 63), ' '
           ) AS chunk_text
    FROM st
    """,
)
def doc_chunks(spark, sf_dir):
    """Overlapping token-window chunking (64-token chunks, 16-token
    overlap) over the documents corpus — the retrieval/embedding chunker:
    start positions stride by 48, the tail chunk is emitted short, and a
    start opens only new tokens so no chunk is a suffix-subset of its
    predecessor. Pure sequence/slice HOFs, zero shuffles; the oracle
    replays the identical walk."""
    from timeseries_spark.extensions.text import chunk_documents

    docs = load(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=64, overlap=16)


@query(
    "quality_percentile_filter",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS metric_value
      FROM documents
    ),
    cuts AS (
      SELECT source,
             round(quantile_cont(metric_value, 0.25), 4) AS metric_cutoff
      FROM scored GROUP BY source
    )
    SELECT s.doc_id, s.source, s.metric_value, c.metric_cutoff
    FROM scored s JOIN cuts c USING (source)
    WHERE s.metric_value >= c.metric_cutoff
    """,
)
def quality_percentile_filter(spark, sf_dir):
    """Relative quality cutoff: keep docs at or above their SOURCE's
    25th-percentile token count — the per-stratum threshold a
    multi-source corpus needs because absolute length cutoffs don't
    transfer between sources. Cutoff table is one broadcast row per
    source; the filter is map-side."""
    from timeseries_spark.extensions.text import relative_quality_filter

    docs = load(spark, sf_dir, "documents")
    return relative_quality_filter(docs, p=0.25).select(
        "doc_id", "source", "metric_value", "metric_cutoff"
    )


@query(
    "vocab_topk",
    oracle="""
    SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, token) - 1
                AS INT) AS token_id,
           token, n_occurrences
    FROM (
      SELECT t AS token, CAST(count(*) AS BIGINT) AS n_occurrences
      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      GROUP BY t
      ORDER BY n_occurrences DESC, token
      LIMIT 20
    )
    """,
)
def vocab_topk_q(spark, sf_dir):
    """Corpus vocabulary induction: the 20 most frequent tokens with
    dense frequency-ranked ids (ties broken by token). Top-k compiles to
    TakeOrderedAndProject — parallel per-partition top-k, never a
    SinglePartition sort of the full vocabulary."""
    from timeseries_spark.extensions.text import vocab_topk

    docs = load(spark, sf_dir, "documents")
    return vocab_topk(docs, k=20)


@query(
    "oov_rate",
    oracle="""
    WITH vocab AS (
      SELECT t AS token FROM (
        SELECT t, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        GROUP BY t ORDER BY n DESC, t LIMIT 20
      )
    ),
    toks AS (
      SELECT doc_id AS id, unnest(string_split(text, ' ')) AS token
      FROM documents
    )
    SELECT t.id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(CASE WHEN v.token IS NULL THEN 1 END) AS BIGINT)
             AS n_oov,
           round(count(CASE WHEN v.token IS NULL THEN 1 END)
                 / CAST(count(*) AS DOUBLE), 4) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON v.token = t.token
    GROUP BY t.id
    """,
)
def oov_rate_q(spark, sf_dir):
    """Per-doc out-of-vocabulary rate against the induced top-20
    vocabulary — the coverage metric that decides whether a wordlist
    fits a corpus. The vocab broadcasts into the token stream; the only
    exchange is the per-doc count groupBy."""
    from timeseries_spark.extensions.text import oov_rate, vocab_topk

    docs = load(spark, sf_dir, "documents")
    return oov_rate(docs, vocab_topk(docs, k=20))


def _cms_oracle() -> str:
    from timeseries_spark.extensions.hashing import md5_h1_sql, md5_h2_sql

    h1, h2 = md5_h1_sql("t"), md5_h2_sql("t")
    return f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ),
    hashed AS (SELECT t, {h1} AS h1, {h2} AS h2 FROM toks),
    cells AS (
      SELECT g.i AS row, CAST((h1 + g.i * h2) % 256 AS INT) AS cell
      FROM hashed, unnest(generate_series(0, 3)) AS g(i)
    ),
    counters AS (
      SELECT row, cell, count(*) AS n FROM cells GROUP BY row, cell
    ),
    exact AS (
      SELECT t AS token, CAST(count(*) AS BIGINT) AS exact_n
      FROM toks GROUP BY t ORDER BY exact_n DESC, token LIMIT 20
    ),
    probes AS (
      SELECT e.token, e.exact_n, g.i AS row,
             CAST(({md5_h1_sql("e.token")} + g.i * {md5_h2_sql("e.token")})
                  % 256 AS INT) AS cell
      FROM exact e, unnest(generate_series(0, 3)) AS g(i)
    )
    SELECT p.token, p.exact_n,
           CAST(min(coalesce(c.n, 0)) AS BIGINT) AS cms_est
    FROM probes p LEFT JOIN counters c USING (row, cell)
    GROUP BY p.token, p.exact_n
    """


@query("heavy_hitters_cms", oracle=_cms_oracle())
def heavy_hitters_cms(spark, sf_dir):
    """Count-min sketch (4x256 counters) over the corpus token stream,
    point-estimating the 20 most frequent tokens against their exact
    counts — fixed-space frequency estimation (est >= exact by the CMS
    guarantee) whose integer md5 counters are bit-identical across
    engines, so the oracle matches exactly, not approximately. The
    heavy-hitter detector for hot-token / boilerplate analysis where
    exact counts mean materializing the vocabulary."""
    from timeseries_spark.extensions.sketches import (
        cms_counters,
        cms_estimate,
    )
    from timeseries_spark.extensions.text import ws_tokens

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(ws_tokens(F.col("text"))).alias("token"))
    counters = cms_counters(toks, "token", depth=4, width=256)
    # exact is consumed twice (probe keys + the comparison join) and its
    # lineage is a full corpus explode — persist the 20-row result so
    # the sketch-vs-exact diagnostic costs two corpus reads, not three
    from timeseries_spark.extensions.caching import register_cache

    exact = register_cache(
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "token")
        .limit(20),
        "text",
    )
    est = cms_estimate(
        exact.select("token"), counters, "token", depth=4, width=256
    )
    return est.join(F.broadcast(exact), "token").select(
        "token", "exact_n", "cms_est"
    )


@query(
    "unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT id, g.i AS pos, ts[g.i] AS token
      FROM (SELECT doc_id AS id, string_split(text, ' ') AS ts
            FROM documents),
           unnest(generate_series(1, len(ts))) AS g(i)
    ),
    counts AS (
      SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY token
    ),
    totals AS (
      SELECT sum(n) AS total, count(*) AS vocab FROM counts
    ),
    lp AS (
      SELECT t.id, t.pos,
             ln((c.n::DOUBLE + 0.5)
                / (tt.total::DOUBLE + 0.5 * tt.vocab)) AS lp
      FROM toks t JOIN counts c USING (token) CROSS JOIN totals tt
    ),
    folded AS (
      SELECT id, list(lp ORDER BY pos) AS ps FROM lp GROUP BY id
    )
    SELECT id AS doc_id, CAST(len(ps) AS BIGINT) AS n_tokens,
           round(list_reduce(list_prepend(0.0::DOUBLE, ps),
                             (a, b) -> a + b) / len(ps), 6) AS mean_logprob
    FROM folded
    """,
)
def unigram_logprob_q(spark, sf_dir):
    """LM-based quality score: per-doc mean log-probability under the
    corpus's own add-0.5-smoothed unigram model — rare/garbled tokens
    score low, fluent text near the corpus distribution scores high
    (the poor man's perplexity filter). The per-doc sum folds tokens in
    position order in BOTH engines, so scores are exact matches."""
    from timeseries_spark.extensions.text import unigram_logprob

    docs = load(spark, sf_dir, "documents")
    return unigram_logprob(docs)


@query(
    "bigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT id, g.i AS pos, ts[g.i] AS token
      FROM (SELECT doc_id AS id, string_split(text, ' ') AS ts
            FROM documents),
           unnest(generate_series(1, len(ts))) AS g(i)
    ),
    vocab AS (
      SELECT count(DISTINCT token) AS v FROM toks
    ),
    big AS (
      SELECT id, pos,
             lag(token) OVER (PARTITION BY id ORDER BY pos) AS prev,
             token AS cur
      FROM toks
      QUALIFY prev IS NOT NULL
    ),
    cnt AS (
      SELECT prev, cur, CAST(count(*) AS BIGINT) AS n
      FROM big GROUP BY prev, cur
    ),
    ctx AS (
      SELECT prev, sum(n) AS cn FROM cnt GROUP BY prev
    ),
    lp AS (
      SELECT b.id, b.pos,
             ln((c.n::DOUBLE + 0.5)
                / (x.cn::DOUBLE + 0.5 * v.v)) AS lp
      FROM big b
      JOIN cnt c ON b.prev = c.prev AND b.cur = c.cur
      JOIN ctx x ON b.prev = x.prev
      CROSS JOIN vocab v
    ),
    folded AS (
      SELECT id, list(lp ORDER BY pos) AS ps FROM lp GROUP BY id
    )
    SELECT id AS doc_id, CAST(len(ps) AS BIGINT) AS n_bigrams,
           round(list_reduce(list_prepend(0.0::DOUBLE, ps),
                             (a, b) -> a + b) / len(ps), 6) AS mean_logprob,
           round(exp(-(list_reduce(list_prepend(0.0::DOUBLE, ps),
                                   (a, b) -> a + b) / len(ps))), 6)
             AS perplexity
    FROM folded
    """,
)
def bigram_logprob_q(spark, sf_dir):
    """KenLM-style quality filter: per-doc mean bigram log-probability
    and perplexity under the corpus's own add-0.5-smoothed bigram model.
    Catches unusual token *transitions* (shuffled text, keyword
    stuffing) that unigram scoring misses. Transition sums fold in
    position order in BOTH engines, so scores are exact matches."""
    from timeseries_spark.extensions.text import bigram_logprob

    docs = load(spark, sf_dir, "documents")
    return bigram_logprob(docs)


@query(
    "tokenized_docs",
    oracle="""
    WITH vocab AS (
      SELECT CAST(row_number() OVER (ORDER BY n DESC, t) - 1 AS INT)
               AS token_id, t AS token
      FROM (
        SELECT t, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        GROUP BY t ORDER BY n DESC, t LIMIT 20
      )
    ),
    toks AS (
      SELECT id, g.i AS pos, ts[g.i] AS token
      FROM (SELECT doc_id AS id, string_split(text, ' ') AS ts
            FROM documents),
           unnest(generate_series(1, len(ts))) AS g(i)
    )
    SELECT t.id AS doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           list(coalesce(v.token_id, -1) ORDER BY t.pos) AS token_ids
    FROM toks t LEFT JOIN vocab v ON v.token = t.token
    GROUP BY t.id
    """,
)
def tokenized_docs(spark, sf_dir):
    """The actual tokenization step: every doc encoded to its integer
    token-id sequence against the induced top-20 vocabulary (OOV -> -1,
    the UNK id) — the dataset format a trainer consumes, byte-identical
    across engines. Vocab broadcasts into the position-exploded stream;
    one id-keyed groupBy reassembles the arrays."""
    from timeseries_spark.extensions.text import encode_tokens, vocab_topk

    docs = load(spark, sf_dir, "documents")
    return encode_tokens(docs, vocab_topk(docs, k=20))


@query(
    "source_divergence",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    cnt AS (
      SELECT source, token, count(*) AS n FROM toks GROUP BY source, token
    ),
    per_source AS (
      SELECT source, sum(n) AS st, count(*) AS sv FROM cnt GROUP BY source
    ),
    gcnt AS (SELECT token, sum(n) AS gn FROM cnt GROUP BY token),
    grand AS (SELECT sum(st) AS g FROM per_source)
    SELECT c.source,
           CAST(ps.st AS BIGINT) AS n_tokens,
           CAST(ps.sv AS BIGINT) AS vocab,
           round(sum(-(CAST(c.n AS DOUBLE) / CAST(ps.st AS DOUBLE))
                 * ln(CAST(c.n AS DOUBLE) / CAST(ps.st AS DOUBLE))), 6)
             AS entropy,
           round(sum((CAST(c.n AS DOUBLE) / CAST(ps.st AS DOUBLE))
                 * ln((CAST(c.n AS DOUBLE) / CAST(ps.st AS DOUBLE))
                      / (CAST(gc.gn AS DOUBLE) / CAST(gr.g AS DOUBLE)))), 6)
             AS kl_vs_corpus
    FROM cnt c
    JOIN per_source ps USING (source)
    JOIN gcnt gc USING (token)
    CROSS JOIN grand gr
    GROUP BY c.source, ps.st, ps.sv
    """,
)
def source_divergence_q(spark, sf_dir):
    """Corpus-mix diagnostics: per-source unigram entropy + KL
    divergence against the pooled corpus distribution — the numbers
    that drive mixing-weight decisions (low entropy = repetitive
    source, high KL = off-distribution source)
    (extensions/text.py:source_divergence)."""
    from timeseries_spark.extensions.text import source_divergence

    docs = load(spark, sf_dir, "documents")
    return source_divergence(docs)


@query(
    "rank_normalized_length",
    oracle="""
    SELECT doc_id, source, n_chars AS metric_value,
           round(percent_rank() OVER (
             PARTITION BY source ORDER BY n_chars), 6) AS pct_rank
    FROM documents
    """,
)
def rank_normalized_length(spark, sf_dir):
    """Cross-source score calibration: each doc's length mapped to its
    percent rank WITHIN its source (0 = shortest, 1 = longest there) —
    the uniform score a mixer thresholds when raw scales don't transfer
    across sources (extensions/text.py:rank_normalize)."""
    from timeseries_spark.extensions.text import rank_normalize

    docs = load(spark, sf_dir, "documents")
    return rank_normalize(
        docs.select("doc_id", "source", "n_chars"),
        strata_col="source",
        metric=F.col("n_chars"),
    ).drop("n_chars")


@query(
    "distinctive_tokens",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    cnt AS (
      SELECT source, token, count(*) AS n FROM toks GROUP BY source, token
    ),
    per_source AS (SELECT source, sum(n) AS st FROM cnt GROUP BY source),
    pooled AS (SELECT token, sum(n) AS gn FROM cnt GROUP BY token),
    grand AS (SELECT sum(st) AS g FROM per_source),
    scored AS (
      SELECT c.source, c.token, c.n,
             round(
               ln((CAST(c.n AS DOUBLE) + 0.5)
                  / (CAST(ps.st AS DOUBLE) - CAST(c.n AS DOUBLE) + 0.5))
               - ln((CAST(p.gn AS DOUBLE) - CAST(c.n AS DOUBLE) + 0.5)
                    / ((CAST(gr.g AS DOUBLE) - CAST(ps.st AS DOUBLE))
                       - (CAST(p.gn AS DOUBLE) - CAST(c.n AS DOUBLE))
                       + 0.5)), 6) AS log_odds
      FROM cnt c
      JOIN per_source ps USING (source)
      JOIN pooled p USING (token)
      CROSS JOIN grand gr
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY source
               ORDER BY log_odds DESC, token) AS rn
      FROM scored
    )
    SELECT source, token, n AS n_in_source, log_odds, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 5
    """,
)
def distinctive_tokens_q(spark, sf_dir):
    """'Fightin' words': per source, the 5 tokens with the highest
    smoothed log-odds of appearing there vs the rest of the corpus —
    WHICH vocabulary carries the divergence source_divergence measures
    (extensions/text.py:distinctive_tokens)."""
    from timeseries_spark.extensions.text import distinctive_tokens

    docs = load(spark, sf_dir, "documents")
    return distinctive_tokens(docs)


@query(
    "zipf_fit",
    oracle="""
    WITH freq AS (
      SELECT source, w AS token, count(*) AS cnt
      FROM (SELECT source, unnest(string_split(text, ' ')) AS w
            FROM documents)
      GROUP BY source, w
    ),
    ranked AS (
      SELECT source, token, cnt,
             row_number() OVER (PARTITION BY source
                                ORDER BY cnt DESC, token) AS rnk
      FROM freq
    )
    SELECT source,
           floor(regr_slope(ln(CAST(cnt AS DOUBLE)),
                            ln(CAST(rnk AS DOUBLE))) * 1e6 + 0.5) / 1e6
             AS zipf_slope,
           floor(regr_intercept(ln(CAST(cnt AS DOUBLE)),
                                ln(CAST(rnk AS DOUBLE))) * 1e6 + 0.5) / 1e6
             AS zipf_intercept,
           floor(regr_r2(ln(CAST(cnt AS DOUBLE)),
                         ln(CAST(rnk AS DOUBLE))) * 1e6 + 0.5) / 1e6
             AS zipf_r2,
           count(*) AS n_tokens
    FROM ranked WHERE rnk <= 100
    GROUP BY source
    """,
)
def zipf_fit(spark, sf_dir):
    """Zipf's-law fit per source: OLS of log(frequency) against
    log(rank) over each source's top-100 tokens — the corpus-health
    fingerprint (natural text sits near slope −1; spam, boilerplate,
    and synthetic floods bend the curve). One explode + (source, token)
    count shuffle — the same vocabulary-grain pass every other corpus
    diagnostic rides — then a rank window and the built-in regression
    aggregates at source grain; the corpus itself is scanned once and
    everything after the count table is vocabulary-sized."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    freq = (
        docs.select(
            "source", F.explode(ws_tokens(F.col("text"))).alias("token")
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), F.col("token")
    )
    ranked = freq.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= 100
    )
    snap = lambda c: (  # noqa: E731
        F.floor(c * 1e6 + F.lit(0.5)).cast("double") / 1e6
    )
    lf = F.log(F.col("cnt").cast("double"))
    lr = F.log(F.col("rnk").cast("double"))
    return ranked.groupBy("source").agg(
        snap(F.regr_slope(lf, lr)).alias("zipf_slope"),
        snap(F.regr_intercept(lf, lr)).alias("zipf_intercept"),
        snap(F.regr_r2(lf, lr)).alias("zipf_r2"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


@query(
    "trigram_backoff",
    oracle="""
    WITH toks AS (
      SELECT id, (id % 2 = 0) AS is_train, g.i AS pos, ts[g.i] AS token
      FROM (SELECT doc_id AS id, string_split(text, ' ') AS ts
            FROM documents),
           unnest(generate_series(1, len(ts))) AS g(i)
    ),
    stream AS (
      SELECT id, is_train, pos,
             lag(token, 2) OVER w AS p2,
             lag(token, 1) OVER w AS p1,
             token AS cur
      FROM toks WINDOW w AS (PARTITION BY id ORDER BY pos)
    ),
    tri AS (
      SELECT p2, p1, cur, count(*) AS n3,
             sum(count(*)) OVER (PARTITION BY p2, p1) AS c3
      FROM stream WHERE is_train AND p2 IS NOT NULL
      GROUP BY p2, p1, cur
    ),
    big AS (
      SELECT p1, cur, count(*) AS n2,
             sum(count(*)) OVER (PARTITION BY p1) AS c2
      FROM stream WHERE is_train AND p1 IS NOT NULL
      GROUP BY p1, cur
    ),
    uni AS (
      SELECT cur, count(*) AS n1 FROM stream WHERE is_train GROUP BY cur
    ),
    nt AS (SELECT count(*) AS nn FROM stream WHERE is_train),
    scored AS (
      SELECT s.id, s.pos,
             CASE
               WHEN t.n3 IS NOT NULL
                 THEN ln(t.n3::DOUBLE / t.c3)
               WHEN b.n2 IS NOT NULL
                 THEN ln(0.4 * b.n2::DOUBLE / b.c2)
               WHEN u.n1 IS NOT NULL
                 THEN ln(0.16000000000000003 * u.n1::DOUBLE / n.nn)
               ELSE ln(0.06400000000000002 / n.nn::DOUBLE)
             END AS ls
      FROM stream s
      LEFT JOIN tri t ON s.p2 = t.p2 AND s.p1 = t.p1 AND s.cur = t.cur
      LEFT JOIN big b ON s.p1 = b.p1 AND s.cur = b.cur
      LEFT JOIN uni u ON s.cur = u.cur
      CROSS JOIN nt n
      WHERE NOT s.is_train AND s.p2 IS NOT NULL
    ),
    folded AS (SELECT id, list(ls ORDER BY pos) AS ps FROM scored GROUP BY id)
    SELECT id AS doc_id, CAST(len(ps) AS BIGINT) AS n_scored,
           round(list_reduce(list_prepend(0.0::DOUBLE, ps),
                             (a, b) -> a + b) / len(ps), 6) AS mean_logscore,
           round(exp(-(list_reduce(list_prepend(0.0::DOUBLE, ps),
                                   (a, b) -> a + b) / len(ps))), 6)
             AS perplexity
    FROM folded
    """,
)
def trigram_backoff_q(spark, sf_dir):
    """Stupid-backoff trigram LM (β=0.4): even docs train the counts,
    odd docs are scored, so the trigram → bigram → unigram → OOV-floor
    backoff chain genuinely fires. Position-ordered fold in BOTH
    engines; the β² / β³ literals in the oracle are the exact doubles
    Python's 0.4*0.4 products produce
    (extensions/text.py:trigram_backoff_logprob)."""
    from timeseries_spark.extensions.text import trigram_backoff_logprob

    docs = load(spark, sf_dir, "documents")
    return trigram_backoff_logprob(docs)


@query(
    "token_source_mi",
    oracle="""
    WITH pres AS (
      SELECT DISTINCT doc_id AS doc, source AS lbl, token
      FROM (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
        FROM documents
      ) WHERE token != ''
    ),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    ncl AS (
      SELECT source AS lbl, CAST(count(*) AS DOUBLE) AS nc
      FROM documents GROUP BY source
    ),
    dtc AS (
      SELECT token, lbl, CAST(count(*) AS DOUBLE) AS ntc
      FROM pres GROUP BY token, lbl
    ),
    dt AS (SELECT token, sum(ntc) AS nt FROM dtc GROUP BY token),
    grid AS (
      SELECT d.token, d.nt, t.n, c.nc, coalesce(j.ntc, 0.0) AS ntc
      FROM dt d CROSS JOIN ncl c CROSS JOIN tot t
      LEFT JOIN dtc j ON j.token = d.token AND j.lbl = c.lbl
    ),
    mi AS (
      SELECT token, nt,
             round(sum(
               CASE WHEN ntc > 0
                    THEN (ntc / n) * ln(n * ntc / (nt * nc))
                    ELSE 0.0 END
               + CASE WHEN nc - ntc > 0 AND n - nt > 0
                      THEN ((nc - ntc) / n)
                           * ln(n * (nc - ntc) / ((n - nt) * nc))
                      ELSE 0.0 END), 6) AS mi_nats
      FROM grid GROUP BY token, nt
    )
    SELECT token, CAST(nt AS BIGINT) AS doc_freq, mi_nats
    FROM mi ORDER BY mi_nats DESC, token LIMIT 25
    """,
)
def token_source_mi(spark, sf_dir):
    """Top-25 tokens by mutual information with the document source —
    the information-gain feature-selection statistic over doc-level
    token presence; vocabulary-grain after one corpus scan, absent-
    class terms materialized by a vocab × labels broadcast grid, final
    cut via distributed TakeOrderedAndProject
    (extensions/text.py:token_label_mi)."""
    from timeseries_spark.extensions.text import token_label_mi

    docs = load(spark, sf_dir, "documents")
    return token_label_mi(docs, label_col="source", top_k=25)


@query(
    "collocations_pmi",
    oracle="""
    WITH toks AS (
      SELECT doc_id, pos, token FROM (
        SELECT doc_id, g.i AS pos, ts[g.i] AS token
        FROM (SELECT doc_id, string_split(text, ' ') AS ts
              FROM documents),
             unnest(generate_series(1, len(ts))) AS g(i)
      ) WHERE token != ''
    ),
    pairs AS (
      SELECT w1, w2, count(*) AS c12 FROM (
        SELECT lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
               token AS w2
        FROM toks
      ) WHERE w1 IS NOT NULL GROUP BY w1, w2
    ),
    uni AS (SELECT token, count(*) AS cu FROM toks GROUP BY token),
    nu AS (SELECT CAST(sum(cu) AS DOUBLE) AS nu FROM uni),
    nb AS (SELECT CAST(sum(c12) AS DOUBLE) AS nb FROM pairs)
    SELECT p.w1, p.w2, CAST(p.c12 AS BIGINT) AS pair_count,
           round(ln((p.c12 / nb.nb)
                    / ((u1.cu / nu.nu) * (u2.cu / nu.nu))), 6) AS pmi_nats
    FROM pairs p
    JOIN uni u1 ON u1.token = p.w1
    JOIN uni u2 ON u2.token = p.w2
    CROSS JOIN nu CROSS JOIN nb
    WHERE p.c12 >= 5
    ORDER BY pmi_nats DESC, p.w1, p.w2 LIMIT 25
    """,
)
def collocations_pmi_q(spark, sf_dir):
    """Top-25 adjacent-bigram collocations by PMI over token-level
    corpus frequencies — the multi-word-expression miner in front of
    phrase merging; one corpus scan feeds unigram and lag-window
    bigram counts, everything after is vocabulary-grain
    (extensions/text.py:collocations_pmi)."""
    from timeseries_spark.extensions.text import collocations_pmi

    docs = load(spark, sf_dir, "documents")
    return collocations_pmi(docs, min_count=5, top_k=25)


@query(
    "token_burstiness",
    oracle="""
    WITH per_doc AS (
      SELECT doc_id, token, count(*) AS c FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
      ) WHERE token != '' GROUP BY doc_id, token
    ),
    nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    stats AS (
      SELECT token, count(*) AS df_, sum(c) AS sc, sum(c * c) AS scc
      FROM per_doc GROUP BY token
    )
    SELECT token, CAST(df_ AS BIGINT) AS doc_freq,
           CAST(sc AS BIGINT) AS total_count,
           round((scc / n - (sc / n) * (sc / n)) / (sc / n), 6)
             AS burstiness
    FROM stats, nd
    WHERE df_ >= 5
    ORDER BY burstiness DESC, token LIMIT 25
    """,
)
def token_burstiness_q(spark, sf_dir):
    """Top-25 tokens by variance-to-mean dispersion of per-doc counts
    (zeros accounted for analytically, never materialized) — the
    bursty-vs-function-word screen; one corpus scan then
    vocabulary-grain moments (extensions/text.py:token_burstiness)."""
    from timeseries_spark.extensions.text import token_burstiness

    docs = load(spark, sf_dir, "documents")
    return token_burstiness(docs, min_docs=5, top_k=25)
