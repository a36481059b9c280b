"""Deterministic sampling / corpus-mixing queries (extension surface).

Both engines derive every keep/replicate decision from the same
``md5(salt || key) < integer-threshold`` comparison, with thresholds
precomputed in Python and embedded as literals — the results are exact
row-set matches, not statistical approximations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_spark.extensions.sampling import (
    _threshold,
    dataset_split,
    dataset_split_sql,
    deterministic_sample,
    sample_hash_sql,
    stratified_sample,
    temperature_mix,
    weighted_mix,
)
from timeseries_spark.queries import load, query

_LANG_FRACTIONS = {"en": 0.5, "de": 1.0, "zh": 0.25}
_LANG_DEFAULT = 0.1

_MIX_WEIGHTS = {"src0": 2.5, "src1": 2.0, "src2": 0.5}
_MIX_DEFAULT = 1.0


def _case_sql(col: str, mapping: dict[str, int], default: int) -> str:
    whens = " ".join(
        f"WHEN {col} = '{k.replace(chr(39), chr(39) * 2)}' THEN {v}"
        for k, v in sorted(mapping.items())
    )
    return f"CASE {whens} ELSE {default} END"


def _strat_oracle() -> str:
    thr = _case_sql(
        "lang",
        {k: _threshold(v) for k, v in _LANG_FRACTIONS.items()},
        _threshold(_LANG_DEFAULT),
    )
    return f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {sample_hash_sql("doc_id", "smp")} < {thr}
    """


@query("sample_stratified", oracle=_strat_oracle())
def sample_stratified(spark, sf_dir):
    """Per-language stratified sample over the documents corpus (en 50%,
    de 100%, zh 25%, everything else 10%): one codegen'd hash filter,
    zero shuffles, per-row reproducible on any engine/partitioning —
    df.sample() can do none of that."""
    docs = load(spark, sf_dir, "documents")
    out = stratified_sample(
        docs,
        _LANG_FRACTIONS,
        strata_col="lang",
        default_fraction=_LANG_DEFAULT,
    )
    return out.select("doc_id", "lang", "source")


def _mix_oracle() -> str:
    full = _case_sql(
        "source", {k: int(v) for k, v in _MIX_WEIGHTS.items()}, int(_MIX_DEFAULT)
    )
    frac = _case_sql(
        "source",
        {k: _threshold(v - int(v)) for k, v in _MIX_WEIGHTS.items()},
        _threshold(_MIX_DEFAULT - int(_MIX_DEFAULT)),
    )
    return f"""
    WITH base AS (
      SELECT doc_id, source, {full} AS n_full,
             CASE WHEN {sample_hash_sql("doc_id", "mix")} < {frac}
                  THEN 1 ELSE 0 END AS extra
      FROM documents
    )
    SELECT doc_id, source, CAST(g.copy AS INT) AS copy
    FROM base, unnest(generate_series(0, n_full + extra - 1)) AS g(copy)
    """


@query("corpus_mix_weighted", oracle=_mix_oracle())
def corpus_mix_weighted(spark, sf_dir):
    """Deterministic corpus mixing: src0 upsampled 2.5x, src1 2.0x, src2
    downsampled 0.5x, the rest kept 1x — floor(w) full replicas per row
    plus a hash-decided extra for the fractional part, emitted via
    explode(sequence) with a 0-based copy index. The exact replica set
    is replayed by the oracle, so the mix is auditable row by row."""
    docs = load(spark, sf_dir, "documents")
    out = weighted_mix(docs, _MIX_WEIGHTS, default_weight=_MIX_DEFAULT)
    return out.select("doc_id", "source", "copy")


_SPLITS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]


@query(
    "dataset_split",
    oracle=f"""
    SELECT doc_id, lang,
           {dataset_split_sql(_SPLITS, "doc_id", "split")} AS split
    FROM documents
    """,
)
def dataset_split_assign(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment over the corpus:
    each doc's split is decided by its id hash against cumulative integer
    thresholds — stable under repartitioning and re-runs, so eval
    membership is auditable (randomSplit's assignment is neither). One
    codegen'd projection, zero shuffles."""
    docs = load(spark, sf_dir, "documents")
    return dataset_split(docs, _SPLITS).select("doc_id", "lang", "split")


@query(
    "dataset_split_grouped",
    oracle=f"""
    SELECT source, split, count(*) AS n_docs,
           count(DISTINCT doc_id) AS n_distinct
    FROM (
      SELECT doc_id, source,
             {dataset_split_sql(_SPLITS, "source", "gsplit")} AS split
      FROM documents
    )
    GROUP BY source, split
    """,
)
def dataset_split_grouped(spark, sf_dir):
    """LEAKAGE-SAFE split: the decision hash keys on ``source`` instead
    of doc_id, so every doc from one source (site/domain/dump shard)
    lands in the SAME split — near-duplicates that cluster within a
    source can never straddle train and eval, the standard contamination
    guard a per-doc split does not give. Same zero-shuffle cumulative-
    threshold projection (extensions/sampling.py:dataset_split with
    key_col='source'); the output is the (source, split) audit rollup —
    one row per source proves the group property (each source appears
    under exactly one split). Distinct salt ('gsplit') keeps the band
    assignment independent of the per-doc split query."""
    docs = load(spark, sf_dir, "documents")
    return (
        dataset_split(docs, _SPLITS, key_col="source", salt="gsplit")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col("doc_id")).alias("n_distinct"),
        )
    )


_TMIX_HASH_SPACE = "1152921504606846976.0"  # 2^60, exact as a double


@query(
    "corpus_mix_temperature",
    oracle=f"""
    WITH counts AS (
      SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    stats AS (
      SELECT
        list_reduce(list_prepend(0::BIGINT, list(n ORDER BY
                      (stratum IS NULL), coalesce(stratum, ''))),
                    (a, b) -> a + b) AS total,
        list_reduce(list_prepend(0.0::DOUBLE,
                                 list(power(n::DOUBLE, 0.5) ORDER BY
                                   (stratum IS NULL), coalesce(stratum, ''))),
                    (a, b) -> a + b) AS powsum
      FROM counts
    ),
    weights AS (
      SELECT stratum,
             round(power(n::DOUBLE, 0.5) / powsum * total::DOUBLE
                   / n::DOUBLE, 6) AS mix_weight
      FROM counts CROSS JOIN stats
    ),
    base AS (
      SELECT d.doc_id, d.source, w.mix_weight,
             CAST(floor(mix_weight) AS INT)
             + CASE WHEN {sample_hash_sql("d.doc_id", "tmix")}
                         < CAST(floor((mix_weight - floor(mix_weight))
                                      * {_TMIX_HASH_SPACE}) AS BIGINT)
                    THEN 1 ELSE 0 END AS copies
      FROM documents d
      JOIN weights w ON w.stratum IS NOT DISTINCT FROM d.source
    )
    SELECT doc_id, source, mix_weight, CAST(g.copy AS INT) AS copy
    FROM base, unnest(generate_series(0, copies - 1)) AS g(copy)
    """,
)
def corpus_mix_temperature(spark, sf_dir):
    """Temperature-scaled (alpha=0.5) corpus mixing with weights DERIVED
    FROM THE DATA: per-source weights (n_s^0.5 / sum n^0.5) * N / n_s
    upsample small sources and downsample large ones at constant ~N total
    — the multilingual rebalancing rule — then the weighted_mix replication
    applies them deterministically. The power-sum folds a sorted stratum
    array so the one distributed-sum float nondeterminism is pinned; the
    oracle replays weights and replica set exactly."""
    docs = load(spark, sf_dir, "documents")
    return temperature_mix(docs, alpha=0.5).select(
        "doc_id", "source", "mix_weight", "copy"
    )


@query(
    "context_packing",
    oracle="""
    WITH binned AS (
      SELECT doc_id, source, CAST(doc_id % 4 AS INT) AS shard,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             CAST(sum(len(string_split(text, ' '))) OVER (
                PARTITION BY source, doc_id % 4 ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING
              ) AS BIGINT) AS cum
      FROM documents
    )
    SELECT doc_id, source, shard, n_tokens,
           CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS bin,
           CAST(sum(n_tokens) OVER (
             PARTITION BY source, shard,
                          CAST(floor((cum - n_tokens) / 512.0) AS BIGINT)
           ) AS BIGINT) AS bin_tokens,
           round(CAST(sum(n_tokens) OVER (
             PARTITION BY source, shard,
                          CAST(floor((cum - n_tokens) / 512.0) AS BIGINT)
           ) AS BIGINT) / 512.0, 4) AS fill_ratio,
           greatest(CAST(0 AS BIGINT),
                    cum - (CAST(floor((cum - n_tokens) / 512.0) AS BIGINT)
                           + 1) * 512) AS overflow_tokens
    FROM binned
    """,
)
def context_packing(spark, sf_dir):
    """Sequence packing over the documents corpus: docs fill ~512-token
    context bins in doc_id order within each (source, shard) partition —
    4 deterministic shards per source so no source funnels through a
    single window task, the distributed analogue of concatenating docs
    into fixed-length training sequences. Emits the packing-efficiency
    metrics (per-bin fill_ratio, per-doc overflow_tokens) an engineer
    tunes window_tokens / n_shards by."""
    from timeseries_spark.extensions.text import pack_contexts

    docs = load(spark, sf_dir, "documents")
    return pack_contexts(docs, window_tokens=512, n_shards=4)


@query(
    "sample_take_n",
    oracle=f"""
    SELECT doc_id, source, CAST(take_rank AS INT) AS take_rank FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {sample_hash_sql("doc_id", "take")}, doc_id
             ) AS take_rank
      FROM documents
    ) WHERE take_rank <= 30
    """,
)
def sample_take_n(spark, sf_dir):
    """Hard per-source cap: exactly min(30, |source|) docs per source,
    selected as the lowest decision-hash ids — a stable pseudo-random
    draw that fractions can't express when stratum sizes are unknown.
    Runs as a salted two-phase top-n so the largest source never
    funnels through one window task; the oracle's single-window
    row_number is equivalent because salting is lossless for top-n."""
    from timeseries_spark.extensions.sampling import take_n_per_stratum

    docs = load(spark, sf_dir, "documents")
    return take_n_per_stratum(docs, n=30).select(
        "doc_id", "source", "take_rank"
    )


@query(
    "packed_sequences",
    oracle="""
    WITH binned AS (
      SELECT doc_id, source, text, CAST(doc_id % 4 AS INT) AS shard,
             len(string_split(text, ' ')) AS n_tokens,
             sum(len(string_split(text, ' '))) OVER (
               PARTITION BY source, doc_id % 4 ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS cum
      FROM documents
    )
    SELECT source, shard,
           CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           string_agg(text, ' <eod> ' ORDER BY doc_id) AS packed_text
    FROM binned
    GROUP BY source, shard, CAST(floor((cum - n_tokens) / 512.0) AS BIGINT)
    """,
)
def packed_sequences_q(spark, sf_dir):
    """Materialized training sequences: each ~512-token context bin's
    member docs concatenated in doc_id order around an <eod> separator —
    the packer's actual output (context_packing reports only the
    assignment + fill metrics). The bin-grain groupBy adds no exchange
    over the packer's single (source, shard) window shuffle."""
    from timeseries_spark.extensions.text import packed_sequences

    docs = load(spark, sf_dir, "documents")
    return packed_sequences(docs, window_tokens=512, n_shards=4)


def _wrs_oracle() -> str:
    h = sample_hash_sql("doc_id", "wrs")
    u = f"(({h})::DOUBLE + 1.0) / 1152921504606846976.0"
    key = f"round(power({u}, 1.0 / (n_chars::DOUBLE)), 12)"
    return f"""
    SELECT doc_id, source, CAST(wrs_rank AS INT) AS wrs_rank FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source ORDER BY {key} DESC, doc_id
             ) AS wrs_rank
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    ) WHERE wrs_rank <= 25
    """


@query("sample_weighted_reservoir", oracle=_wrs_oracle())
def sample_weighted_reservoir(spark, sf_dir):
    """Weighted reservoir sampling (A-Res): 25 docs per source drawn
    WITHOUT replacement with probability proportional to n_chars —
    longer docs likelier but never certain — rank key u^(1/weight) from
    the decision hash, reproducible on any engine/run. Salted two-phase
    top-n; the single-window oracle is equivalent because salting is
    lossless for top-n."""
    from timeseries_spark.extensions.sampling import weighted_sample_n

    docs = load(spark, sf_dir, "documents")
    return weighted_sample_n(
        docs, n=25, weight_col="n_chars", strata_col="source"
    ).select("doc_id", "source", "wrs_rank")


def _neg_oracle() -> str:
    from timeseries_spark.extensions.hashing import md5_long_sql

    h = md5_long_sql(
        "'neg' || CAST(anchor_id AS VARCHAR) || ':' || CAST(neg_idx AS VARCHAR)"
    )
    return f"""
    WITH nn AS (SELECT count(*) AS N FROM documents),
    draws AS (
      SELECT d.doc_id AS anchor_id, CAST(g.i AS INT) AS neg_idx
      FROM documents d, unnest(generate_series(0, 3)) AS g(i)
    ),
    hashed AS (
      SELECT anchor_id, neg_idx, ({h}) % nn.N AS neg_id
      FROM draws CROSS JOIN nn
    )
    SELECT h.anchor_id, h.neg_idx, h.neg_id
    FROM hashed h
    JOIN documents p ON p.doc_id = h.neg_id
    WHERE h.neg_id != h.anchor_id
    """


@query("negative_samples", oracle=_neg_oracle())
def negative_samples_q(spark, sf_dir):
    """Contrastive-training negative sampling: 4 deterministic uniform
    partner draws per anchor doc (hash of (anchor, slot) mod N over the
    dense id space), self-pairs dropped rather than re-drawn. The only
    shuffle is the partner-row join, keyed uniformly by the hash."""
    from timeseries_spark.extensions.sampling import negative_samples

    docs = load(spark, sf_dir, "documents")
    return negative_samples(docs, k=4)


_BUDGET = 4000
_BUDGET_SHARDS = 4


@query(
    "token_budget_mix",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok,
             ('0x' || substring(md5('budget:' || CAST(doc_id AS VARCHAR)),
                                1, 15))::BIGINT % {_BUDGET_SHARDS} AS shard
      FROM documents
    ),
    c AS (
      SELECT source, n_tok,
             sum(n_tok) OVER (
               PARTITION BY source, shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM c WHERE cum <= {_BUDGET // _BUDGET_SHARDS}
    GROUP BY source
    """,
)
def token_budget_mix(spark, sf_dir):
    """Per-source token-budget fill (4000 whitespace tokens per source,
    4 deterministic md5 shards): docs admitted in id order until the
    per-shard running total exceeds budget/shards — the "N tokens per
    domain" mixing step, sharded so no window ever holds a whole source
    (extensions/sampling.py:token_budget_mix). Report grain: admitted
    (source, n_docs, n_tokens)."""
    from timeseries_spark.extensions.sampling import token_budget_mix as tbm

    docs = load(spark, sf_dir, "documents")
    return tbm(docs, budget_per_source=_BUDGET, n_shards=_BUDGET_SHARDS)


@query(
    "training_shards",
    oracle="""
    WITH t AS (
      SELECT ('0x' || substring(md5('shard:' || CAST(doc_id AS VARCHAR)),
                                1, 15))::BIGINT % 8 AS shard_id,
             doc_id, len(string_split(text, ' ')) AS n_tok
      FROM documents
    )
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM t GROUP BY shard_id
    """,
)
def training_shards(spark, sf_dir):
    """Deterministic 8-way training-shard assignment audit: every doc
    lands in pmod(md5(doc_id), 8) — engine-portable, so the shard
    layout is reproducible anywhere — with per-shard doc/token counts
    and id envelopes, the balance report a training-data export job
    publishes next to its files
    (extensions/sampling.py:shard_stats)."""
    from timeseries_spark.extensions.sampling import shard_stats

    docs = load(spark, sf_dir, "documents")
    return shard_stats(docs, n_shards=8)
