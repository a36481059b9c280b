"""Deterministic sampling / corpus-mixing queries (extension surface).

Both engines derive every keep/replicate decision from the same
``md5(salt || key) < integer-threshold`` comparison, with thresholds
precomputed in Python and embedded as literals — the results are exact
row-set matches, not statistical approximations.
"""

from __future__ import annotations

from timeseries_spark.extensions.sampling import (
    _threshold,
    deterministic_sample,
    sample_hash_sql,
    stratified_sample,
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
