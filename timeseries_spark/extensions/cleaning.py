"""Corpus normalization beyond the quality/redaction gates: within-doc
repetition removal and data-derived stop-token stripping.

Both are the shapes a 100 TB cleaning pass wants:

- ``dedup_tokens_in_doc`` is a pure per-row array rewrite (keep the
  first occurrence of each token, preserve order) — ZERO shuffles, no
  explode; cost is O(tokens²) per doc, bounded by document length, not
  corpus size.
- ``derive_stop_tokens`` / ``strip_stop_tokens`` discover the corpus's
  own boilerplate vocabulary (document frequency above a threshold) and
  strip it. The stoplist is a tiny aggregate (≤ |vocabulary| rows)
  collapsed to ONE row and broadcast onto the corpus — the only
  SinglePartition in the plan carries the stoplist, never documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from timeseries_spark.extensions.text import ws_tokens as _toks


def dedup_tokens_in_doc(
    docs: DataFrame, text_col: str = "text", out_col: str = "text_dedup"
) -> DataFrame:
    """Keep each token's first occurrence, preserving order: a token at
    (0-based) position i survives iff array_position (1-based, first
    match) equals i+1. Emits the rewritten text and how many tokens the
    rewrite dropped."""
    xs = _toks(F.col(text_col))
    kept = F.filter(xs, lambda x, i: F.array_position(xs, x) == i + 1)
    return docs.withColumn(out_col, F.concat_ws(" ", kept)).withColumn(
        "n_dropped", (F.size(xs) - F.size(kept)).cast("bigint")
    )


def derive_stop_tokens(
    docs: DataFrame,
    max_doc_ratio: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-row DataFrame holding the discovered stoplist: tokens whose
    document frequency exceeds ``max_doc_ratio`` of the corpus. The
    per-term df agg shuffles at vocabulary grain; the final collect_set
    collapses ≤ |vocabulary| survivors into a single broadcastable row.
    """
    if not 0.0 < max_doc_ratio <= 1.0:
        raise ValueError(f"max_doc_ratio must be in (0, 1], got {max_doc_ratio}")
    term_docs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_toks(F.col(text_col)))).alias("term"),
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    return (
        term_docs.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") > F.col("n_docs") * max_doc_ratio)
        .agg(F.collect_set("term").alias("stop_tokens"))
    )


def strip_stop_tokens(
    docs: DataFrame,
    max_doc_ratio: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text_clean",
) -> DataFrame:
    """Remove the corpus-derived boilerplate vocabulary from every
    document (order preserved). The stoplist row broadcasts; removal is
    a per-row array filter — one vocabulary-grain shuffle total."""
    stop = derive_stop_tokens(docs, max_doc_ratio, id_col, text_col)
    xs = _toks(F.col(text_col))
    kept = F.filter(
        xs, lambda x: ~F.array_contains(F.col("stop_tokens"), x)
    )
    return (
        docs.crossJoin(F.broadcast(stop))
        .withColumn(out_col, F.concat_ws(" ", kept))
        .withColumn("n_stripped", (F.size(xs) - F.size(kept)).cast("bigint"))
        .drop("stop_tokens")
    )


def boilerplate_grams(
    docs: DataFrame,
    n: int = 4,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level boilerplate discovery (the C4/RefinedWeb move,
    public: Raffel et al. 2020 strip spans repeated across documents):
    word n-grams whose DOCUMENT frequency reaches ``min_df`` are
    boilerplate — navigation chrome, license footers, templated
    snippets. One explode + one (gram → distinct-doc count) shuffle
    with map-side partial aggregation; output is gram-grain
    (``(gram, df)``), bounded by the distinct-span count, never the
    corpus."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    from timeseries_spark.extensions.dedup import shingles, tokens

    return (
        docs.select(
            F.col(id_col),
            F.explode(shingles(tokens(F.col(text_col)), n)).alias("gram"),
        )
        .groupBy("gram")
        .agg(F.countDistinct(id_col).cast("bigint").alias("df"))
        .where(F.col("df") >= min_df)
    )


def strip_boilerplate(
    docs: DataFrame,
    n: int = 4,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove every token covered by any boilerplate n-gram occurrence
    and report per-doc coverage: ``(id, n_tokens, n_boiler,
    boiler_ratio, text_clean)`` — row count preserved (a doc that is
    pure boilerplate survives with empty ``text_clean``).

    Plan shape: grams explode once and feed BOTH the df-threshold
    aggregate and the coverage join (gram-keyed equi join — NOT
    broadcast by assumption: at 100 TB the boilerplate table is
    routinely large, so both sides hash-partition on the gram). Covered
    (doc, position) pairs dedup at doc grain, the keep-side anti-join
    runs at token grain, and the ordered reassembly is one sorted
    collect_list per doc — every shuffle is key-partitioned, none
    collects the corpus to fewer keys than documents."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    from timeseries_spark.extensions.dedup import shingles, tokens

    toks = tokens(F.col(text_col))
    grams = docs.select(
        F.col(id_col),
        F.posexplode(shingles(toks, n)).alias("pos", "gram"),
    )
    boiler = (
        grams.groupBy("gram")
        .agg(F.countDistinct(id_col).alias("df"))
        .where(F.col("df") >= min_df)
        .select("gram")
    )
    covered = (
        grams.join(boiler, "gram")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n - 1))
            ).alias("p"),
        )
        .distinct()
    )
    tok_rows = docs.select(
        id_col, F.posexplode(toks).alias("p", "token")
    )
    kept = (
        tok_rows.join(covered, [id_col, "p"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("p", "token"))
                    ),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("text_clean")
        )
    )
    covn = covered.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_boiler")
    )
    n_tokens = F.size(toks).cast("bigint")
    return (
        docs.select(id_col, n_tokens.alias("n_tokens"))
        .join(covn, id_col, "left")
        .join(kept, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_boiler", F.lit(0)).cast("bigint").alias("n_boiler"),
            F.round(
                F.coalesce("n_boiler", F.lit(0)) / F.col("n_tokens"), 4
            ).alias("boiler_ratio"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )
