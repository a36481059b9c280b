"""Text analysis operators: language-ID, quality scoring, token counting,
fingerprinting (BASELINE.json extension surface).

All per-row compute is native Column expressions (split / HOFs / regex) —
JVM-side, codegen'd, no Python. The heuristics are deliberately simple and
deterministic; they are the *plumbing* a 100 TB text pipeline needs, with
the scoring functions swappable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from timeseries_spark.extensions.caching import register_cache
from timeseries_spark.extensions.hashing import rolling_fingerprint

# tiny per-language marker vocabularies for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
    "zh": ("的", "是", "了", "在", "我"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def ws_tokens(text: Column) -> Column:
    """Single-space tokenizer (corpus contract; see dedup.tokens)."""
    return F.split(text, " ")


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: alpha runs, digit runs, single punctuation
    (same regex class semantics in Spark and DuckDB RE2)."""
    return F.regexp_count(text, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: length, token count, mean word length,
    stopword ratio, punctuation ratio — the standard cheap filters a
    pretraining pipeline applies before expensive scoring."""
    toks = ws_tokens(F.col(text_col))
    n_words = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_chars = F.length(F.col(text_col))
    punct = F.length(F.regexp_replace(F.col(text_col), "[A-Za-z0-9 ]", ""))
    return df.withColumns(
        {
            "n_chars_calc": n_chars.cast("bigint"),
            "n_words": n_words.cast("bigint"),
            "mean_word_len": F.round(
                (n_chars - (n_words - 1)) / n_words, 4
            ),
            "stopword_ratio": F.round(stop_hits / n_words, 4),
            "punct_ratio": F.round(punct / n_chars, 4),
        }
    )


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-vocabulary language ID: count marker hits per language,
    predict the arg-max (ties broken by language code). Output adds
    ``pred_lang`` and ``marker_hits``."""
    toks = ws_tokens(F.col(text_col))
    scores = F.array(
        *[
            F.struct(
                F.size(F.filter(toks, lambda t: t.isin(*markers)))
                .cast("bigint")
                .alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, markers in sorted(LANG_MARKERS.items())
        ]
    )
    # deterministic arg-max with ascending-lang tie-break:
    # filter to max hits, sort langs, take first
    max_hits = F.array_max(F.transform(scores, lambda s: s["hits"]))
    pred = F.array_sort(
        F.transform(
            F.filter(scores, lambda s: s["hits"] == max_hits), lambda s: s["lang"]
        )
    ).getItem(0)
    return df.withColumns(
        {"pred_lang": pred, "marker_hits": max_hits}
    )


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two content fingerprints per doc: md5 of the normalized text
    (lowercase, trimmed) and an order-sensitive rolling hash over tokens."""
    norm = F.lower(F.trim(F.col(text_col)))
    return df.withColumns(
        {
            "md5_fp": F.md5(norm),
            "rolling_fp": rolling_fingerprint(ws_tokens(norm)),
        }
    )


def _assign_bins(
    df: DataFrame,
    window_tokens: int,
    part_col: str,
    id_col: str,
    text_col: str,
    n_shards: int,
) -> DataFrame:
    """Shared bin assignment for :func:`pack_contexts` and
    :func:`packed_sequences`: deterministic shard, token count, running
    sum within (part, shard) in id order, offset bin — one rule, so the
    reporting and materializing packers can never disagree on which bin
    a doc belongs to."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    w = (
        Window.partitionBy(part_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("shard", F.pmod(id_col, F.lit(n_shards)).cast("int"))
        .withColumn("n_tokens", F.size(ws_tokens(F.col(text_col))))
        .withColumn("__cum", F.sum("n_tokens").over(w))
        .withColumn(
            "bin",
            F.floor(
                (F.col("__cum") - F.col("n_tokens")) / window_tokens
            ).cast("bigint"),
        )
    )


def pack_contexts(
    df: DataFrame,
    window_tokens: int = 512,
    part_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 1,
) -> DataFrame:
    """Sequence packing for training: assign each doc to a context bin of
    ~``window_tokens`` whitespace tokens, filling bins in deterministic
    ``id_col`` order within each (``part_col``, shard) partition — the
    distributed form of the packer that concatenates docs into
    fixed-length training sequences. ``bin`` = the window the doc's
    first token lands in (offset binning: a doc straddling a boundary
    belongs to the bin it starts in, so bins average ``window_tokens``
    without a sequential per-bin capacity pass).

    A cumulative window serializes each partition into ONE task, so a
    corpus dominated by a single source (the crawl) must set
    ``n_shards > 1``: docs split deterministically by ``id mod n_shards``
    and each shard packs independently — training sequences never needed
    a single global order, only deterministic grouping, and parallelism
    becomes |parts| × n_shards. ``id_col`` must be unique within a
    partition (the corpus contract): duplicate ids would make the
    running sum order — and every later straddling doc's bin —
    tie-dependent. ``id_col`` must also be NON-NEGATIVE: sharding uses
    Spark ``pmod`` (always >= 0) while an ANSI-SQL oracle's ``%`` is
    negative for negative ids, so negative ids would silently land in
    different shards across engines.

    Packing-efficiency metrics (what an engineer tunes ``window_tokens``
    and ``n_shards`` by) ride along per row at no extra exchange — the
    bin-grain window's clustering keys are a superset of the pack
    window's, so the existing hash partitioning is reused:

    - ``bin_tokens``: total tokens landing in this doc's bin (bins
      average ``window_tokens`` but straddling docs make them jitter);
    - ``fill_ratio``: ``bin_tokens / window_tokens``, the per-bin fill;
    - ``overflow_tokens``: tokens of THIS doc past its bin's
      ``window_tokens`` boundary — what a hard-cut packer would truncate
      (0 for docs fully inside their bin).

    One shuffle (the per-partition window); output:
    (id, part, shard, n_tokens, bin, bin_tokens, fill_ratio,
    overflow_tokens)."""
    w_bin = Window.partitionBy(part_col, "shard", "bin")
    return (
        _assign_bins(df, window_tokens, part_col, id_col, text_col, n_shards)
        .withColumn("bin_tokens", F.sum("n_tokens").over(w_bin))
        .withColumn(
            "fill_ratio",
            F.round(F.col("bin_tokens") / F.lit(float(window_tokens)), 4),
        )
        .withColumn(
            "overflow_tokens",
            F.greatest(
                F.lit(0).cast("bigint"),
                F.col("__cum") - (F.col("bin") + 1) * window_tokens,
            ),
        )
        .select(
            id_col,
            part_col,
            "shard",
            "n_tokens",
            "bin",
            "bin_tokens",
            "fill_ratio",
            "overflow_tokens",
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping fixed-size token windows —
    the chunker feeding embedding/retrieval pipelines (chunk size = the
    embedding model's context, overlap preserves cross-boundary
    context). Start positions advance by ``chunk_tokens - overlap``;
    the final window is emitted short rather than padded, and a start
    is emitted only while it opens NEW tokens (start <= n - overlap),
    so no chunk is a suffix-subset of its predecessor. Docs shorter
    than one stride produce exactly one chunk.

    Pure codegen'd sequence/slice HOFs — zero shuffles, rows fan out by
    ~n_tokens/stride. Output: (id, chunk_idx 0-based, chunk_start
    1-based, n_chunk_tokens, chunk_text)."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        # overlap >= chunk_tokens makes the stride <= 0: an infinite /
        # negative sequence step instead of a chunk walk
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    toks = ws_tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(
        F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(stride)
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            n.alias("__n"),
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        )
        .select(
            id_col,
            "chunk_idx",
            "chunk_start",
            F.least(
                F.lit(chunk_tokens), F.col("__n") - F.col("chunk_start") + 1
            ).alias("n_chunk_tokens"),
            F.concat_ws(
                " ", F.slice(F.col("__toks"), F.col("chunk_start"), chunk_tokens)
            ).alias("chunk_text"),
        )
    )


def repetition_metrics(
    df: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """Within-doc repetition signal (the Gopher-style filter): total vs
    distinct word n-grams and their ratio — high repetition flags
    degenerate/boilerplate text before any cross-doc dedup runs. Pure
    HOFs over the shared shingle kernel; zero shuffles."""
    from timeseries_spark.extensions.dedup import shingles

    sh = shingles(ws_tokens(F.col(text_col)), n)
    n_sh = F.size(sh)
    n_distinct = F.size(F.array_distinct(sh))
    return df.withColumns(
        {
            "n_shingles": n_sh.cast("bigint"),
            "n_distinct": n_distinct.cast("bigint"),
            "repetition_ratio": F.when(
                n_sh > 0, F.round(1.0 - n_distinct / n_sh, 4)
            ).otherwise(F.lit(0.0)),
        }
    )


# simple cross-dialect patterns (identical semantics in Java regex & RE2)
PII_PATTERNS: dict[str, str] = {
    "n_emails": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}",
    "n_urls": "https?://[^ ]+",
    "n_long_digit_runs": "[0-9]{6,}",
}


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc counts of scrub-worthy patterns (emails, URLs, long digit
    runs) — the audit pass before redaction; counts stay cheap codegen'd
    regexp_count projections."""
    return df.withColumns(
        {
            name: F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint")
            for name, pat in PII_PATTERNS.items()
        }
    )


# per-pattern placeholder tokens, applied in PII_PATTERNS order: emails
# first (so the URL pass can't swallow a mailto-ish tail), URLs second,
# digit runs last (digits inside already-redacted URLs are gone)
PII_PLACEHOLDERS: dict[str, str] = {
    "n_emails": "<EMAIL>",
    "n_urls": "<URL>",
    "n_long_digit_runs": "<DIGITS>",
}


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """The acting half of the PII pass: replace every match of the audit
    registry (:data:`PII_PATTERNS`) with its per-pattern placeholder
    token — a chain of codegen'd ``regexp_replace`` projections, zero
    shuffles, so redaction costs one scan regardless of corpus size.
    Pattern order is the registry order (see :data:`PII_PLACEHOLDERS`);
    the chain is deterministic, so an oracle can replay the redacted
    text byte for byte."""
    col = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        col = F.regexp_replace(col, pat, PII_PLACEHOLDERS[name])
    return df.withColumn(out_col or text_col, col)


def redact_pii_sql(text_expr: str) -> str:
    """DuckDB expression replaying :func:`redact_pii`'s replace chain in
    the same pattern order ('g' = replace all, Spark's default)."""
    expr = text_expr
    for name, pat in PII_PATTERNS.items():
        expr = (
            f"regexp_replace({expr}, '{pat}', "
            f"'{PII_PLACEHOLDERS[name]}', 'g')"
        )
    return expr


def relative_quality_filter(
    df: DataFrame,
    p: float = 0.25,
    strata_col: str = "source",
    text_col: str = "text",
    metric: Column | None = None,
) -> DataFrame:
    """Keep docs at or above their stratum's ``p``-quantile of a quality
    metric (default: whitespace token count) — the RELATIVE cutoff a
    multi-source pipeline uses when absolute thresholds don't transfer
    (50 tokens is long for tweets, degenerate for books). Exact
    linear-interpolated percentile per stratum (Spark ``percentile`` ==
    DuckDB ``quantile_cont``), rounded to 4dp in both engines so the
    keep/drop boundary is engine-stable.

    Plan shape: the metric is a codegen'd projection; the cutoff table
    is one row per stratum (an agg whose output is tiny regardless of
    corpus size) and broadcasts back — the corpus shuffles only the
    per-stratum partial-agg rows, the filter itself is map-side. At
    100 TB swap the exact percentile for ``approx_percentile`` (t-digest
    partials merge without collecting values per group). Output adds
    ``metric_value`` and ``metric_cutoff``.

    NULL handling: a NULL stratum is a real group and gets its own
    cutoff (null-safe join). A row whose METRIC is NULL is dropped —
    it has no measurable quality, and percentile ignores NULLs in both
    engines — which is deliberate and documented rather than a silent
    join artifact."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"p must be in [0, 1], got {p}")
    metric = metric if metric is not None else F.size(ws_tokens(F.col(text_col)))
    scored = df.withColumn("metric_value", metric.cast("double"))
    cuts = scored.groupBy(
        F.col(strata_col).alias("__stratum")
    ).agg(
        F.round(F.expr(f"percentile(metric_value, {p})"), 4).alias(
            "metric_cutoff"
        )
    )
    return (
        scored.join(
            F.broadcast(cuts),
            scored[strata_col].eqNullSafe(cuts["__stratum"]),
        )
        .drop("__stratum")
        .filter(F.col("metric_value") >= F.col("metric_cutoff"))
    )


def packed_sequences(
    df: DataFrame,
    window_tokens: int = 512,
    part_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 1,
    separator: str = "<eod>",
) -> DataFrame:
    """Materialize the packer's output: one row PER CONTEXT BIN with the
    member docs' texts concatenated in ``id_col`` order around an
    end-of-document separator — the actual training sequences, where
    :func:`pack_contexts` only assigns bins. Output: (part, shard, bin,
    n_docs, bin_tokens, packed_text).

    Plan shape: bin assignment is the packer's single (part, shard)
    window shuffle; the bin-grain groupBy then needs NO new exchange —
    its grouping keys contain the window's partitioning keys, so rows of
    a bin are already co-located. Texts sort inside the aggregate by
    struct order (id first), so concatenation order is deterministic
    without a sort step."""
    binned = _assign_bins(
        df, window_tokens, part_col, id_col, text_col, n_shards
    )
    return binned.groupBy(part_col, "shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(id_col, text_col))
                ),
                lambda t: t[text_col],
            ),
            f" {separator} ",
        ).alias("packed_text"),
    )


def vocab_topk(
    df: DataFrame, k: int = 1000, text_col: str = "text"
) -> DataFrame:
    """Induce a corpus vocabulary: the ``k`` most frequent whitespace
    tokens with dense ids (0-based, frequency-desc, ties broken by the
    token string) — the wordlist a tokenizer/coverage analysis starts
    from. Output: (token_id, token, n_occurrences).

    Plan shape: one token-grain count shuffle, then the top-k compiles
    to TakeOrderedAndProject (parallel per-partition top-k, tiny driver
    merge — never a SinglePartition sort of the full vocabulary); ids
    are assigned by row_number over the k survivors only."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = (
        df.select(F.explode(ws_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    top = counts.orderBy(F.col("n_occurrences").desc(), "token").limit(k)
    w = Window.orderBy(F.col("n_occurrences").desc(), "token")
    return top.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("int")
    ).select("token_id", "token", "n_occurrences")


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc out-of-vocabulary rate against an induced vocabulary —
    the coverage metric that decides whether a wordlist/tokenizer fits
    a corpus. Output: (id, n_tokens, n_oov, oov_rate 4dp).

    Plan shape: the vocabulary is k rows and BROADCASTS into the
    exploded token stream (left join, map-side); the only exchange is
    the per-doc count groupBy. Empty docs ('' tokenizes to one empty
    token, which is simply counted against the vocab like any other)
    keep a defined rate."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(ws_tokens(F.col(text_col))).alias("token"),
    )
    hit = toks.join(
        F.broadcast(vocab.select("token").withColumn("__in", F.lit(1))),
        "token",
        "left",
    )
    return (
        hit.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("__in").isNull(), 1)).alias("n_oov"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 4).alias("oov_rate"),
        )
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-doc mean unigram log-probability under the corpus's own
    unigram model — the cheap LM-based quality score (a doc of rare /
    garbled tokens scores low, fluent text near the corpus distribution
    scores high; the poor man's perplexity filter). Model: p(t) =
    (count(t) + smoothing) / (total + smoothing * |V|), add-k smoothed
    so unseen tokens in other corpora stay finite.

    Determinism discipline: the per-doc sum of log-probs folds the
    doc's tokens in POSITION order (posexplode -> collect_list sorted
    by position -> left fold) — not a groupBy sum whose float order is
    partition-dependent — and the score rounds to 6dp. Model totals
    fold the vocabulary sorted by token. Plan shape: the unigram table
    is the vocabulary (one token-grain shuffle); doc scoring joins the
    exploded token stream to it and re-folds per doc — two exchanges
    total, the corpus text read once.

    Output: (id, n_tokens, mean_logprob 6dp)."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    from timeseries_spark.functions.parallelism import ensure_parallelism

    toks = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        F.posexplode(ws_tokens(F.col(text_col))).alias("pos", "token"),
    )
    # the unigram table is consumed twice (model totals + doc scoring)
    # while its lineage is a full corpus explode — without a persist the
    # corpus is re-scanned and re-exploded per consumer (measured: 3
    # parquet scans). The cache entry is vocab-sized, the same bounded
    # footprint argument as bm25_topk's matched postings.
    # registered under the text family (VERDICT r15 item 1): the block
    # is in the RETURNED plan's lineage, so only a serving session's
    # release_caches(spark, "text") between queries can free it
    counts = register_cache(
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")), "text"
    )
    # totals are INTEGER aggregates (sum of counts, vocab size) — order-
    # independent by associativity, so no sorted-fold pinning is needed
    # and the vocabulary never funnels into a one-row collected array
    totals = counts.groupBy().agg(
        F.sum("n").alias("__total"), F.count(F.lit(1)).alias("__vocab")
    )
    logp = toks.join(counts, "token").crossJoin(F.broadcast(totals)).select(
        "id",
        "pos",
        F.log(
            (F.col("n").cast("double") + F.lit(smoothing))
            / (
                F.col("__total").cast("double")
                + F.lit(smoothing) * F.col("__vocab").cast("double")
            )
        ).alias("lp"),
    )
    return (
        logp.groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "lp"))).alias("ps"))
        .select(
            F.col("id").alias(id_col),
            F.size("ps").cast("bigint").alias("n_tokens"),
            F.round(
                F.aggregate(
                    "ps", F.lit(0.0), lambda a, t: a + t["lp"]
                )
                / F.size("ps"),
                6,
            ).alias("mean_logprob"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-doc mean bigram log-probability and perplexity under the
    corpus's own add-k-smoothed bigram model — the KenLM-style quality
    filter one step up from :func:`unigram_logprob`: a doc whose token
    *transitions* are unusual (shuffled text, boilerplate keyword
    stuffing) scores low even when its unigrams look fluent. Model:
    p(cur|prev) = (c(prev,cur) + k) / (c(prev,·) + k·|V|), with |V| the
    unigram vocabulary so unseen continuations stay finite.

    Determinism discipline matches unigram_logprob: the per-doc sum
    folds transitions in POSITION order (collect_list sorted by pos →
    left fold), never an order-dependent float groupBy; perplexity is
    exp(-mean) of the *unrounded* mean so both engines round once.
    Docs with <2 tokens have no transitions and are absent from the
    output (same rule in the oracle).

    Plan shape: one doc-keyed window builds the transition stream (lag
    over pos), the bigram table is one (prev,cur) shuffle with its
    context totals as a window sum over the table itself (bigram-vocab-
    bounded state, no corpus re-scan), |V| is a one-row broadcast from
    a flat second pass, and scoring joins the transition stream back to
    the persisted bigram table — the corpus text is read twice, every
    other exchange is vocabulary-sized.

    Output: (id, n_bigrams, mean_logprob 6dp, perplexity 6dp)."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    from timeseries_spark.functions.parallelism import ensure_parallelism

    # the tokenize+explode is per-row compute over a byte-small scan
    # (the postings-build starvation lesson): fan the doc rows out once
    # BEFORE the explode so both consumers of the token stream (the
    # transition window and the vocab count) parallelize — measured 2
    # tasks carrying the whole sf1 tokenize before the guard
    # (experiments/BIGRAM_PROFILE_r13.json stage 63)
    toks = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        F.posexplode(ws_tokens(F.col(text_col))).alias("pos", "token"),
    )
    w_doc = Window.partitionBy("id").orderBy("pos")
    big = (
        toks.select(
            "id",
            "pos",
            F.lag("token").over(w_doc).alias("prev"),
            F.col("token").alias("cur"),
        )
        .where(F.col("prev").isNotNull())
    )
    # bigram table consumed twice (context sums + scoring join) over an
    # exploded-corpus lineage — persist the vocab²-bounded counts, same
    # argument as unigram_logprob's cached unigram table
    cnt = register_cache(
        big.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("cn", F.sum("n").over(Window.partitionBy("prev"))),
        "text",
    )
    vocab = toks.agg(F.countDistinct("token").alias("__v"))
    lp = (
        big.join(cnt, ["prev", "cur"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            "pos",
            F.log(
                (F.col("n").cast("double") + F.lit(smoothing))
                / (
                    F.col("cn").cast("double")
                    + F.lit(smoothing) * F.col("__v").cast("double")
                )
            ).alias("lp"),
        )
    )
    mean = F.aggregate(
        "ps", F.lit(0.0), lambda a, t: a + t["lp"]
    ) / F.size("ps")
    return (
        lp.groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "lp"))).alias("ps"))
        .select(
            F.col("id").alias(id_col),
            F.size("ps").cast("bigint").alias("n_bigrams"),
            F.round(mean, 6).alias("mean_logprob"),
            F.round(F.exp(-mean), 6).alias("perplexity"),
        )
    )


def _token_stats(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """Shared skeleton for :func:`source_divergence` and
    :func:`distinctive_tokens`: (source, token) counts annotated with
    the pooled token count, per-source totals, and the corpus grand
    total — WITHOUT re-executing the explode lineage per statistic.
    A naive cnt→(groupBy + join back) formulation re-scans and
    re-explodes the corpus once per aggregate (measured: 4 parquet
    scans, 0 reused exchanges); here the pooled and per-source totals
    are WINDOW sums over the counts themselves (two bounded-state
    exchanges over vocab-sized rows) and the grand total comes from a
    flat, explode-free second scan (size of the token array per doc),
    broadcast as one row. Corpus reads: 2 (one exploded, one flat).

    Output grain: one row per (__g, token) with n, __gn (pooled count),
    __st (source total), __sv (source vocab), __grand."""
    toks = df.select(
        F.col(group_col).alias("__g"),
        F.explode(ws_tokens(F.col(text_col))).alias("token"),
    )
    cnt = toks.groupBy("__g", "token").agg(F.count(F.lit(1)).alias("n"))
    w_tok = Window.partitionBy("token")
    w_g = Window.partitionBy("__g")
    grand = df.select(
        F.size(ws_tokens(F.col(text_col))).alias("__k")
    ).agg(F.sum("__k").alias("__grand"))
    return (
        cnt.withColumn("__gn", F.sum("n").over(w_tok))
        .withColumn("__st", F.sum("n").over(w_g))
        .withColumn("__sv", F.count(F.lit(1)).over(w_g))
        .crossJoin(F.broadcast(grand))
    )


def source_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source corpus-mix diagnostics: unigram entropy of each
    source's token distribution and its KL divergence against the
    pooled corpus distribution — the two numbers a data engineer reads
    before setting mixing weights (low entropy = repetitive source,
    high KL = source is off-distribution and will shift the mix).

    KL(p_s || q) = Σ_t p_s(t)·ln(p_s(t)/q(t)) is finite by
    construction: the pooled q includes every source's tokens, so
    p_s(t) > 0 ⇒ q(t) > 0. Plan shape: see :func:`_token_stats` —
    one exploded corpus pass, window totals, broadcast grand; the
    float sums are per-source reductions over vocab-sized groups,
    rounded at 6dp.

    Output: (group_col, n_tokens, vocab, entropy, kl_vs_corpus)."""
    stats = _token_stats(df, group_col, text_col)
    p = F.col("n").cast("double") / F.col("__st").cast("double")
    q = F.col("__gn").cast("double") / F.col("__grand").cast("double")
    terms = stats.select(
        "__g",
        "__st",
        "__sv",
        (-p * F.log(p)).alias("__ent"),
        (p * F.log(p / q)).alias("__kl"),
    )
    return (
        terms.groupBy("__g", "__st", "__sv")
        .agg(
            F.round(F.sum("__ent"), 6).alias("entropy"),
            F.round(F.sum("__kl"), 6).alias("kl_vs_corpus"),
        )
        .select(
            F.col("__g").alias(group_col),
            F.col("__st").cast("bigint").alias("n_tokens"),
            F.col("__sv").cast("bigint").alias("vocab"),
            "entropy",
            "kl_vs_corpus",
        )
    )


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = -1,
) -> DataFrame:
    """Tokenize the corpus against an induced vocabulary — the step that
    turns text into the integer sequences a trainer consumes: each doc
    becomes its array of ``token_id``s in position order, with
    out-of-vocabulary tokens mapped to ``oov_id`` (the UNK id).

    Plan shape: the vocabulary broadcasts into the position-exploded
    token stream (map-side join); the per-doc array reassembles through
    one id-keyed groupBy with a position-sorted fold — integer-exact,
    so the encoded dataset is byte-identical on any engine. Output:
    (id, n_tokens, token_ids array<int>)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(ws_tokens(F.col(text_col))).alias("pos", "token"),
    )
    joined = toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        "id",
        "pos",
        F.coalesce(F.col("token_id"), F.lit(oov_id)).cast("int").alias("tid"),
    )
    return (
        joined.groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "tid"))).alias("pt"))
        .select(
            F.col("id").alias(id_col),
            F.size("pt").cast("bigint").alias("n_tokens"),
            F.transform("pt", lambda t: t["tid"]).alias("token_ids"),
        )
    )


def rank_normalize(
    df: DataFrame,
    strata_col: str = "source",
    metric: Column | None = None,
    out_col: str = "pct_rank",
) -> DataFrame:
    """Quantile-normalize a quality metric WITHIN each stratum: replace
    the raw value by its percent rank (0 = stratum minimum, 1 = maximum)
    so scores are comparable across sources whose raw scales don't
    transfer — the rank twin of relative_quality_filter's cutoff (keep
    that for filtering; use this when a downstream mixer wants a
    continuous, uniformly-distributed score). Ties share a rank (both
    engines define percent_rank as (rank-1)/(n-1)), so the output is
    deterministic under any row order; a single-row stratum scores 0.
    One keyed window sort — no SinglePartition, no value collection.
    """
    metric = metric if metric is not None else F.size(ws_tokens(F.col("text")))
    w = Window.partitionBy(strata_col).orderBy(F.col("__metric"))
    return (
        df.withColumn("__metric", metric)
        .withColumn(
            out_col, F.round(F.percent_rank().over(w), 6)
        )
        .withColumnRenamed("__metric", "metric_value")
    )


def distinctive_tokens(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = 5,
    smoothing: float = 0.5,
) -> DataFrame:
    """The top-k tokens that DISTINGUISH each source from the rest of
    the corpus, ranked by add-k-smoothed log-odds ratio: lo(t) =
    ln((n_st + k)/(N_s - n_st + k)) - ln((n_rt + k)/(N_r - n_rt + k)),
    where r is everything outside s — the Monroe et al. "fightin'
    words" statistic that, unlike raw TF-IDF, is symmetric and finite
    for tokens absent elsewhere. The companion diagnostic to
    source_divergence: KL says HOW off-distribution a source is, this
    says WHICH tokens carry it. Same plan skeleton (:func:`_token_stats`:
    one exploded corpus pass, window totals, broadcast grand), then a
    per-source top-k window over vocab-sized groups (ties broken by
    token for engine-stable ranks).
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    k = float(smoothing)
    stats = _token_stats(df, group_col, text_col)
    n_st = F.col("n").cast("double")
    st = F.col("__st").cast("double")
    n_rt = (F.col("__gn") - F.col("n")).cast("double")
    rt = (F.col("__grand") - F.col("__st")).cast("double")
    lo = F.log((n_st + k) / (st - n_st + k)) - F.log(
        (n_rt + k) / (rt - n_rt + k)
    )
    scored = stats.select(
        "__g", "token", "n", F.round(lo, 6).alias("log_odds")
    )
    w = Window.partitionBy("__g").orderBy(
        F.col("log_odds").desc(), F.col("token")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select(
            F.col("__g").alias(group_col),
            "token",
            F.col("n").alias("n_in_source"),
            "log_odds",
            F.col("rn").cast("int").alias("rn"),
        )
    )


def trigram_backoff_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    backoff: float = 0.4,
) -> DataFrame:
    """Stupid-backoff trigram LM scoring (Brants et al. 2007, public:
    the web-scale LM that skips normalization): the corpus's EVEN docs
    (id % 2 = 0) train the counts, the ODD docs are scored — a real
    train/held-out split, so the backoff chain genuinely fires (a model
    scored on its own training text never backs off, which would make
    the operator a no-op demo). Score per position:

        S(cur | p2, p1) = c3/ctx3          if the trigram was seen
                        = β · c2/ctx2      else if the bigram was seen
                        = β² · c1/N        else if the unigram was seen
                        = β³ · 1/N         else (OOV floor — keeps the
                                            log finite, documented rule)

    with β = ``backoff``. Per-doc mean log-score folds in POSITION
    order (the bigram_logprob discipline) so both engines round once
    off identical doubles.

    Plan shape: the two lag windows share one doc-keyed exchange; all
    three count tables are vocabulary-bounded aggregates of the train
    half; scoring left-joins the held-out transition stream through
    trigram → bigram → unigram keys (each a key-partitioned equi join)
    with N as a one-row broadcast. Output: (id, n_scored,
    mean_logscore 6dp, perplexity 6dp)."""
    if not 0.0 < backoff <= 1.0:
        raise ValueError(f"backoff must be in (0, 1], got {backoff}")
    b = float(backoff)
    from timeseries_spark.functions.parallelism import ensure_parallelism

    # fan the byte-small doc scan out before the explode (the
    # bigram_logprob starvation fix: 2 tasks carried the whole sf1
    # tokenize, experiments/TRIGRAM_PROFILE_r13.json stage 31)
    toks = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        (F.col(id_col) % 2 == 0).alias("is_train"),
        F.posexplode(ws_tokens(F.col(text_col))).alias("pos", "token"),
    )
    w_doc = Window.partitionBy("id").orderBy("pos")
    stream = toks.select(
        "id",
        "is_train",
        "pos",
        F.lag("token", 2).over(w_doc).alias("p2"),
        F.lag("token", 1).over(w_doc).alias("p1"),
        F.col("token").alias("cur"),
    )
    train = stream.where("is_train")
    tri = (
        train.where(F.col("p2").isNotNull())
        .groupBy("p2", "p1", "cur")
        .agg(F.count(F.lit(1)).alias("n3"))
        .withColumn("c3", F.sum("n3").over(Window.partitionBy("p2", "p1")))
    )
    big = (
        train.where(F.col("p1").isNotNull())
        .groupBy("p1", "cur")
        .agg(F.count(F.lit(1)).alias("n2"))
        .withColumn("c2", F.sum("n2").over(Window.partitionBy("p1")))
    )
    uni = train.groupBy("cur").agg(F.count(F.lit(1)).alias("n1"))
    n_total = train.agg(F.count(F.lit(1)).alias("nn"))
    test = stream.where(~F.col("is_train") & F.col("p2").isNotNull())
    scored = (
        test.join(tri, ["p2", "p1", "cur"], "left")
        .join(big, ["p1", "cur"], "left")
        .join(uni, ["cur"], "left")
        .crossJoin(F.broadcast(n_total))
        .select(
            "id",
            "pos",
            F.when(
                F.col("n3").isNotNull(),
                F.log(F.col("n3").cast("double") / F.col("c3")),
            )
            .when(
                F.col("n2").isNotNull(),
                F.log(F.lit(b) * F.col("n2").cast("double") / F.col("c2")),
            )
            .when(
                F.col("n1").isNotNull(),
                F.log(
                    F.lit(b * b) * F.col("n1").cast("double") / F.col("nn")
                ),
            )
            .otherwise(
                F.log(F.lit(b * b * b) / F.col("nn").cast("double"))
            )
            .alias("ls"),
        )
    )
    mean = F.aggregate(
        "ps", F.lit(0.0), lambda a, t: a + t["ls"]
    ) / F.size("ps")
    return (
        scored.groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "ls"))).alias("ps"))
        .select(
            F.col("id").alias(id_col),
            F.size("ps").cast("bigint").alias("n_scored"),
            F.round(mean, 6).alias("mean_logscore"),
            F.round(F.exp(-mean), 6).alias("perplexity"),
        )
    )


def token_label_mi(
    df: DataFrame,
    label_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 25,
) -> DataFrame:
    """Top-``top_k`` tokens by mutual information with the document
    label — the information-gain feature selection statistic (Manning,
    Raghavan & Schütze, IR book ch. 13, public):

        MI(t; L) = Σ_c [ p(t, c)·ln(p(t, c)/(p(t)·p(c)))
                       + p(¬t, c)·ln(p(¬t, c)/(p(¬t)·p(c))) ]

    over document-level token PRESENCE (each doc counts once per
    token). Returns (token, doc_freq, mi_nats) for the top_k tokens by
    (6dp-rounded MI, token) — the rounded sort key plus id tiebreak
    makes the cut deterministic across engines.

    Scale shape: ONE corpus scan (round-robin fanned out — the explode
    is per-row compute over a byte-small scan, the postings-build
    starvation lesson) explodes distinct (doc, token) presence, ONE
    aggregation to (token, label) joint counts, then ONE reduction to
    token grain carrying the per-label counts as a map (labels are a
    handful, so the map is bounded). The absent-class terms for
    (token, label) pairs with zero joint count come from a vocab ×
    labels broadcast cross join over that token-grain row — NOT from a
    second corpus pass (a missing row still carries
    (n_c/N)·ln(N/(N−d_t)) of information; and the previous
    d_t-join-d_tc formulation made Catalyst execute the whole
    corpus-scan→distinct→joint-count chain TWICE — the two subtree
    copies prune different columns, so the exchanges never reuse;
    measured as the top-4 stages of the sf1 profile,
    experiments/TOKENMI_PROFILE_r13.json). The final top-k is
    orderBy+limit — Spark's distributed TakeOrderedAndProject, no
    single-partition window."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    from timeseries_spark.functions.parallelism import ensure_parallelism

    pres = (
        ensure_parallelism(df.select(id_col, label_col, text_col))
        .select(
            F.col(id_col).alias("doc"),
            F.col(label_col).alias("lbl"),
            F.explode(ws_tokens(F.col(text_col))).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )
    n_total = df.agg(F.count(F.lit(1)).cast("double").alias("n"))
    n_c = df.groupBy(F.col(label_col).alias("lbl")).agg(
        F.count(F.lit(1)).cast("double").alias("nc")
    )
    d_tc = pres.groupBy("token", "lbl").agg(
        F.count(F.lit(1)).cast("double").alias("ntc")
    )
    # token grain: total doc freq + the per-label joint counts as a map,
    # so the grid below never consumes d_tc a second time
    tok = d_tc.groupBy("token").agg(
        F.sum("ntc").alias("nt"),
        F.map_from_entries(
            F.collect_list(F.struct("lbl", "ntc"))
        ).alias("__by_lbl"),
    )
    grid = (
        tok.crossJoin(F.broadcast(n_c))
        .crossJoin(F.broadcast(n_total))
        .select(
            "token",
            "nt",
            "n",
            F.col("nc"),
            F.coalesce(
                F.col("__by_lbl")[F.col("lbl")], F.lit(0.0)
            ).alias("ntc"),
        )
    )
    present = F.when(
        F.col("ntc") > 0,
        (F.col("ntc") / F.col("n"))
        * F.log(
            F.col("n") * F.col("ntc") / (F.col("nt") * F.col("nc"))
        ),
    ).otherwise(F.lit(0.0))
    absent = F.when(
        (F.col("nc") - F.col("ntc") > 0) & (F.col("n") - F.col("nt") > 0),
        ((F.col("nc") - F.col("ntc")) / F.col("n"))
        * F.log(
            F.col("n")
            * (F.col("nc") - F.col("ntc"))
            / ((F.col("n") - F.col("nt")) * F.col("nc"))
        ),
    ).otherwise(F.lit(0.0))
    mi = (
        grid.select("token", "nt", (present + absent).alias("term"))
        .groupBy("token", "nt")
        .agg(F.round(F.sum("term"), 6).alias("mi_nats"))
    )
    return (
        mi.select(
            "token",
            F.col("nt").cast("bigint").alias("doc_freq"),
            "mi_nats",
        )
        .orderBy(F.col("mi_nats").desc(), "token")
        .limit(top_k)
    )


def collocations_pmi(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 25,
) -> DataFrame:
    """Top-``top_k`` adjacent-bigram collocations by pointwise mutual
    information, PMI(w1,w2) = ln( p(w1w2) / (p(w1)·p(w2)) ) over
    token-level corpus frequencies (Church & Hanks 1990, public) —
    the classic multi-word-expression miner a tokenizer pipeline runs
    before merging phrases. Bigrams below ``min_count`` are dropped
    (PMI is notoriously noisy on rare pairs). Returns (w1, w2,
    pair_count, pmi_nats) cut by (6dp-rounded PMI, w1, w2).

    One corpus scan feeds BOTH tables: the exploded token stream with
    positions yields unigram counts and (via a doc-keyed lag window)
    adjacent-pair counts — vocabulary-grain relations after that, with
    the two scalar totals broadcast. PMI is a double expression over
    exact bigint counts, so both engines compute identical values."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    toks = (
        df.select(
            F.col(id_col).alias("__doc"),
            F.posexplode(ws_tokens(F.col(text_col))).alias("pos", "token"),
        )
        .where(F.col("token") != "")
    )
    # posexplode is order-stable within a row, so the lag window over
    # (doc, pos) reconstructs adjacency exactly
    w = Window.partitionBy("__doc").orderBy("pos")
    pairs = (
        toks.select(
            F.lag("token").over(w).alias("w1"), F.col("token").alias("w2")
        )
        .where(F.col("w1").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cu"))
    n_uni = uni.agg(F.sum("cu").cast("double").alias("nu"))
    n_bi = pairs.agg(F.sum("c12").cast("double").alias("nb"))
    return (
        pairs.where(F.col("c12") >= min_count)
        .join(uni.select(F.col("token").alias("w1"), F.col("cu").alias("c1")), "w1")
        .join(uni.select(F.col("token").alias("w2"), F.col("cu").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("pair_count"),
            F.round(
                F.log(
                    (F.col("c12") / F.col("nb"))
                    / ((F.col("c1") / F.col("nu"))
                       * (F.col("c2") / F.col("nu")))
                ),
                6,
            ).alias("pmi_nats"),
        )
        .orderBy(F.col("pmi_nats").desc(), "w1", "w2")
        .limit(top_k)
    )


def token_burstiness(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 5,
    top_k: int = 25,
) -> DataFrame:
    """Top-``top_k`` tokens by burstiness — the variance-to-mean ratio
    (index of dispersion) of the token's per-document count over ALL
    documents, zeros included (Church & Gale 1995 lineage, public).
    Poisson-scattered function words sit near 1; topical/bursty tokens
    (concentrated in few docs) score far above. Returns (token,
    doc_freq, total_count, burstiness) cut by (6dp-rounded score,
    token); tokens in fewer than ``min_docs`` docs are dropped.

    Zeros never materialize: with Σc and Σc² over occurring docs and N
    the corpus size, mean = Σc/N and var = Σc²/N − mean² already
    account for every non-occurrence. One corpus scan to (doc, token)
    counts, one vocabulary-grain aggregate, scalar N broadcast; the
    moments are exact bigint sums, so the double ratio is
    engine-identical."""
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    per_doc = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(ws_tokens(F.col(text_col))).alias("token"),
        )
        .where(F.col("token") != "")
        .groupBy("doc", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("n"))
    stats = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).alias("df_"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
    )
    mean = F.col("sc") / F.col("n")
    var = F.col("scc") / F.col("n") - mean * mean
    return (
        stats.where(F.col("df_") >= min_docs)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            F.col("df_").cast("bigint").alias("doc_freq"),
            F.col("sc").cast("bigint").alias("total_count"),
            F.round(var / mean, 6).alias("burstiness"),
        )
        .orderBy(F.col("burstiness").desc(), "token")
        .limit(top_k)
    )
