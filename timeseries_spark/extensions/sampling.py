"""Deterministic sampling and corpus mixing for training-data pipelines.

A pretraining data pipeline reweights its sources: downsample the crawl,
upsample curated corpora 2-3x, hold per-language fractions steady. Doing
this with ``df.sample()`` is non-reproducible (seed × partitioning
dependent) and un-auditable; these operators decide per ROW from
``md5(salt || key)``, so the same row makes the same decision on any
engine, any partitioning, any day — the property that makes the sampled
corpus diffable and the pipeline oracle-checkable.

Scale shape: every decision is a codegen'd projection/filter — zero
shuffles, zero UDFs; upsampling replicates rows via ``explode(sequence)``
(row count grows by the weight, never the task count). Fractions compare
the 60-bit hash against an INTEGER threshold precomputed in Python
(``int(fraction * 2**60)``) — no float division at row scope, so there is
no cross-engine rounding edge at the keep/drop boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from timeseries_spark.extensions.hashing import md5_long

_HASH_SPACE = 2**60  # md5_long range (first 15 hex digits)


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return min(int(fraction * _HASH_SPACE), _HASH_SPACE)


def sample_hash(key: Column, salt: str) -> Column:
    """The 60-bit decision hash: ``md5_long(salt || flag || key)``. The
    one-character null flag ('0' for NULL, '1' otherwise) makes the
    encoding injective — a NULL key can never collide with any real key
    value (a bare ``coalesce(key, '<sentinel>')`` would share the NULL
    decision with a row whose key casts to the sentinel string). NULL
    keys therefore make a normal, consistent keep/replicate decision in
    every operator here — without the flag+coalesce, ``NULL < threshold``
    is NULL and a filter-based sampler would silently drop NULL keys even
    at fraction 1.0 while the mix's when/otherwise kept them."""
    return md5_long(
        F.concat(
            F.lit(salt),
            F.when(key.isNull(), F.lit("0")).otherwise(F.lit("1")),
            F.coalesce(key.cast("string"), F.lit("")),
        )
    )


def sample_hash_sql(key_expr: str, salt: str) -> str:
    """DuckDB expression mirroring :func:`sample_hash` byte for byte —
    oracle SQL must hash the identical encoded string or the sampled row
    sets diverge at the keep/drop boundary."""
    from timeseries_spark.extensions.hashing import md5_long_sql

    encoded = (
        f"'{salt}' || (CASE WHEN ({key_expr}) IS NULL THEN '0' ELSE '1' END)"
        f" || coalesce(CAST(({key_expr}) AS VARCHAR), '')"
    )
    return md5_long_sql(encoded)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "smp",
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row by key hash — exact
    reproducibility across engines and runs, unlike ``df.sample``."""
    return df.filter(
        sample_hash(F.col(key_col), salt) < F.lit(_threshold(fraction))
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "smp",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum keep fractions (e.g. per source or language), one
    codegen'd filter: the threshold is a when/otherwise chain over the
    stratum, the decision hash is shared across strata so changing one
    stratum's fraction never reshuffles another's sample."""
    thr: Column = F.lit(_threshold(default_fraction))
    for stratum, fraction in sorted(fractions.items(), reverse=True):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(_threshold(fraction))
        ).otherwise(thr)
    return df.filter(sample_hash(F.col(key_col), salt) < thr)


def dataset_split(
    df: DataFrame,
    splits: list[tuple[str, float]] | None = None,
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in exactly
    one split, decided by its key hash against cumulative integer
    thresholds — the split is stable under repartitioning, re-runs, and
    engine changes, so train/eval membership is auditable (the property
    row-level ``randomSplit`` lacks: its assignment changes with
    partitioning). Fractions must sum to 1.0 (within 1e-9); the LAST
    split absorbs the hash-space remainder so no row is ever unassigned.

    One codegen'd when/otherwise projection over the shared decision
    hash — zero shuffles; adds a ``split`` column."""
    splits = splits or [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    if len(splits) < 1:
        raise ValueError("splits must be non-empty")
    for name, frac in splits:
        if not 0.0 <= frac <= 1.0:
            # a negative fraction passes the sum check but makes the
            # cumulative thresholds non-monotonic: its split silently
            # gets zero rows and a hash band is mis-assigned
            raise ValueError(
                f"split fractions must be in [0, 1], got {frac} for"
                f" {name!r}"
            )
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"split fractions must sum to 1.0, got {total} — a gap would"
            " silently leave rows unassigned, an overlap double-assigns"
        )
    h = sample_hash(F.col(key_col), salt)
    cum = 0.0
    col: Column | None = None
    for name, frac in splits[:-1]:
        cum += frac
        cond = h < F.lit(_threshold(cum))
        col = F.when(cond, F.lit(name)) if col is None else col.when(
            cond, F.lit(name)
        )
    last = F.lit(splits[-1][0])
    return df.withColumn("split", last if col is None else col.otherwise(last))


def dataset_split_sql(
    splits: list[tuple[str, float]],
    key_expr: str = "doc_id",
    salt: str = "split",
) -> str:
    """DuckDB CASE expression replaying :func:`dataset_split`'s cumulative
    thresholds against the same decision hash."""
    h = sample_hash_sql(key_expr, salt)
    arms, cum = [], 0.0
    for name, frac in splits[:-1]:
        cum += frac
        arms.append(f"WHEN {h} < {_threshold(cum)} THEN '{name}'")
    return f"CASE {' '.join(arms)} ELSE '{splits[-1][0]}' END"


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-scaled corpus mixing: per-stratum replication weights
    are DERIVED FROM THE DATA as ``w_s = (n_s^alpha / sum_t n_t^alpha) *
    N / n_s`` — the standard multilingual/multi-source rebalancing rule
    (alpha=1 keeps natural proportions, alpha=0 equalizes strata, 0.5 is
    the usual compromise) — then applied with the same floor(w)-copies +
    hash-decided-extra replication as :func:`weighted_mix`. Total output
    size stays ~N while small strata are upsampled and large ones
    downsampled.

    Determinism discipline: the stratum count table is tiny, so the
    power-sum denominator folds a SORTED (by stratum) array in order —
    aggregation order, the one float nondeterminism in a distributed
    sum, is pinned — and the weight rounds to 6dp before the floor/frac
    split so a last-ulp ``pow`` difference between engines cannot move
    the replication boundary. Plan shape: one groupBy on the stratum
    (tiny output), a broadcast join back, then the codegen'd explode —
    the corpus itself is touched once and never reshuffled.

    Output adds ``mix_weight`` (the 6dp per-stratum weight) and ``copy``
    (0-based replica index)."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = df.groupBy(F.col(strata_col).alias("__stratum")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    # fold the per-stratum array in sorted order: total and power-sum are
    # then order-deterministic, matching the oracle's list_reduce. The
    # sort key carries an explicit null flag so a NULL stratum (a real
    # group with a real count) has an engine-agnostic position — struct
    # comparison on a raw nullable field orders differently across
    # engines. The per-stratum weights explode back OUT of the same
    # one-row stats aggregate, so the corpus is scanned once for
    # counting (a second counts subtree would scan it again)
    weights = (
        counts.groupBy()
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.when(F.col("__stratum").isNull(), 1)
                        .otherwise(0)
                        .alias("__isnull"),
                        F.coalesce(
                            F.col("__stratum").cast("string"), F.lit("")
                        ).alias("__key"),
                        "__stratum",
                        "__n",
                    )
                )
            ).alias("s")
        )
        .select(
            F.explode("s").alias("t"),
            F.aggregate(
                "s", F.lit(0).cast("bigint"), lambda a, t: a + t["__n"]
            ).alias("__total"),
            F.aggregate(
                "s",
                F.lit(0.0),
                lambda a, t: a + F.pow(t["__n"].cast("double"), F.lit(alpha)),
            ).alias("__powsum"),
        )
        .select(
            F.col("t.__stratum").alias("__stratum"),
            F.round(
                F.pow(F.col("t.__n").cast("double"), F.lit(alpha))
                / F.col("__powsum")
                * F.col("__total").cast("double")
                / F.col("t.__n").cast("double"),
                6,
            ).alias("mix_weight"),
        )
    )
    n_full = F.floor(F.col("mix_weight")).cast("int")
    frac_thr = F.floor(
        (F.col("mix_weight") - F.floor(F.col("mix_weight")))
        * F.lit(float(_HASH_SPACE))
    ).cast("bigint")
    copies = n_full + F.when(
        sample_hash(F.col(key_col), salt) < frac_thr, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.join(
            F.broadcast(weights),
            # null-safe: a NULL stratum is a real group and keeps its
            # derived weight — a bare == would silently drop every
            # NULL-stratum row from the mixed corpus
            df[strata_col].eqNullSafe(weights["__stratum"]),
        )
        .drop("__stratum")
        .withColumn(
            "copy",
            F.explode(
                F.when(
                    copies >= 1, F.sequence(F.lit(0), copies - 1)
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
    )


def _salted_top_n(
    df: DataFrame,
    n: int,
    partition_cols: list,
    order_cols: list,
    salt_key_col: str,
    num_salts: int,
    rank_alias: str,
) -> DataFrame:
    """The shared salted two-phase per-partition top-n (same idiom as
    brute_force_topk): a LOCAL top-n within (partitions, key-hash salt)
    bounds every window partition at ~|partition|/num_salts rows, then
    the global top-n ranks at most ``num_salts * n`` survivors —
    lossless, because each row lives in exactly one salt bucket. Emits
    ``rank_alias`` (1-based within the partition)."""
    if num_salts < 1:
        # pmod(hash, 0) is NULL — all rows would collapse into one null
        # salt bucket, reviving the single-task sort
        raise ValueError(f"num_salts must be >= 1, got {num_salts}")
    w_local = Window.partitionBy(
        *partition_cols,
        F.pmod(F.hash(F.col(salt_key_col)), F.lit(num_salts)),
    ).orderBy(*order_cols)
    w_global = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= n)
        .withColumn(rank_alias, F.row_number().over(w_global))
        .filter(F.col(rank_alias) <= n)
        .drop("__lr")
    )


def take_n_per_stratum(
    df: DataFrame,
    n: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "take",
    num_salts: int = 16,
) -> DataFrame:
    """Deterministic fixed-COUNT subsample: exactly ``min(n, |stratum|)``
    rows per stratum, chosen as the lowest decision-hash keys — the
    "cap every source at N docs" primitive (fractions can't express a
    hard cap when stratum sizes are unknown or skewed). The hash order
    makes the selection a stable pseudo-random draw: reproducible across
    engines/runs, and growing ``n`` only ever ADDS rows to the sample
    (nested like the fraction samplers).

    Scale shape: a bare ``row_number() OVER (PARTITION BY stratum)``
    funnels the LARGEST stratum through one task — the crawl source at
    100 TB. Instead the per-stratum top-n runs in two phases (same idiom
    as brute_force_topk): a local top-n within (stratum, key-hash salt)
    bounds every window partition at ~|stratum|/num_salts rows, then the
    global top-n ranks at most ``num_salts * n`` survivors. Lossless:
    each row lives in exactly one salt bucket, so every global winner
    survives its bucket's local top-n. Output adds ``take_rank``
    (1-based within the stratum)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    h = sample_hash(F.col(key_col), salt)
    return _salted_top_n(
        df, n, [strata_col], [h.asc(), F.col(key_col).asc()],
        key_col, num_salts, "take_rank",
    )


def weighted_mix(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic corpus mixing: each row is emitted ``floor(w)``
    times plus one more with probability ``frac(w)`` (decided by the key
    hash) — so a stratum with weight 2.5 is upsampled to exactly ~2.5x
    and weight 0.3 downsamples to ~0.3x, with per-row reproducibility.
    Output adds a ``copy`` index (0-based) so downstream shuffles can
    distinguish replicas. Rows whose copy count is 0 disappear via the
    empty-sequence explode — no filter pass needed."""

    for name, w in [("default_weight", default_weight), *weights.items()]:
        if w < 0:
            raise ValueError(
                f"weights must be >= 0, got {w} for {name!r} — a negative"
                " weight would silently emit zero copies, indistinguishable"
                " from weight 0"
            )

    def per_stratum(value_of) -> Column:
        col: Column = F.lit(value_of(default_weight))
        for stratum, w in sorted(weights.items(), reverse=True):
            col = F.when(
                F.col(strata_col) == stratum, F.lit(value_of(w))
            ).otherwise(col)
        return col

    n_full = per_stratum(lambda w: int(w))
    frac_thr = per_stratum(lambda w: _threshold(w - int(w)))
    copies = n_full + F.when(
        sample_hash(F.col(key_col), salt) < frac_thr, F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "copy",
        F.explode(
            F.when(copies >= 1, F.sequence(F.lit(0), copies - 1)).otherwise(
                F.array().cast("array<int>")
            )
        ),
    )


def weighted_sample_n(
    df: DataFrame,
    n: int,
    weight_col: str,
    strata_col: str | None = None,
    key_col: str = "doc_id",
    salt: str = "wrs",
    num_salts: int = 16,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-Res),
    deterministic: each row draws u from its decision hash (uniform in
    (0, 1]) and ranks by ``u^(1/weight)`` — the top ``n`` per stratum
    are the sample, and the probability of selection is proportional to
    the weight, exactly the semantics ``rand()``-based weighted sampling
    gives but reproducible on any engine, any partitioning, any run.
    The classic use: quality-weighted corpus subsetting, where better
    docs should be likelier — not certain — to survive.

    Determinism discipline: the rank key rounds to 12dp in both engines
    (coarse enough to absorb a last-ulp ``pow`` difference, fine enough
    that collisions are ~birthday(n^2/1e12); ties break on the row key).
    Rows with NULL or zero weight never sample (filtered before ranking
    — an explicit rule, not an ANSI-dependent u^(1/0) edge); negative
    weights are a loud error. Same salted two-phase top-n as
    :func:`take_n_per_stratum` — no stratum funnels one task. Output
    adds ``wrs_rank`` (1-based per stratum)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = F.col(weight_col).cast("double")
    guarded = df.withColumn(
        "__w",
        F.when(
            w < 0,
            F.raise_error(
                F.concat(
                    F.lit("weighted_sample_n: negative weight "),
                    w.cast("string"),
                )
            ),
        ).otherwise(w),
    )
    u = (
        sample_hash(F.col(key_col), salt).cast("double") + F.lit(1.0)
    ) / F.lit(float(_HASH_SPACE))
    key = F.round(F.pow(u, F.lit(1.0) / F.col("__w")), 12)
    strata = [strata_col] if strata_col else []
    scored = guarded.filter(F.col("__w") > 0).withColumn("__wrs", key)
    return _salted_top_n(
        scored, n, strata,
        [F.col("__wrs").desc(), F.col(key_col).asc()],
        key_col, num_salts, "wrs_rank",
    ).drop("__w", "__wrs")


def negative_samples(
    df: DataFrame,
    k: int = 4,
    id_col: str = "doc_id",
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor row draws ``k`` pseudo-random partner ids from the corpus —
    uniform, reproducible (the hash of (anchor, slot) picks the
    partner), and self-pairs are dropped rather than re-drawn, the
    standard accept/reject simplification (each anchor yields k or
    occasionally k-1 negatives).

    CONTRACT: ``id_col`` must be dense in [0, N) (the corpus-table
    convention here); the partner id is ``hash mod N``, so a sparse id
    space would silently lose draws — the inner join back to the corpus
    makes that loss visible as missing rows rather than wrong ones.

    Plan shape: N comes from a one-row broadcast count; draws are a
    codegen'd explode; the single shuffle is the equi join that
    materializes partner rows (at 100 TB this is the unavoidable
    "fetch k random rows per anchor" exchange, keyed uniformly by the
    hash — no skew by construction). Output: (anchor id, neg_idx 0-based,
    neg id)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n_row = df.groupBy().agg(F.count(F.lit(1)).alias("__N"))
    draws = (
        df.select(F.col(id_col).alias("anchor_id"))
        .crossJoin(F.broadcast(n_row))
        .select(
            "anchor_id",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_idx"),
            "__N",
        )
        .select(
            "anchor_id",
            "neg_idx",
            F.pmod(
                md5_long(
                    F.concat(
                        F.lit(salt),
                        F.col("anchor_id").cast("string"),
                        F.lit(":"),
                        F.col("neg_idx").cast("string"),
                    )
                ),
                F.col("__N"),
            ).alias("neg_id"),
        )
        .filter(F.col("neg_id") != F.col("anchor_id"))
    )
    partners = df.select(F.col(id_col).alias("neg_id"))
    return draws.join(partners, "neg_id").select(
        "anchor_id", "neg_idx", "neg_id"
    )


def token_budget_mix(
    docs: DataFrame,
    budget_per_source: int,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Fill a per-source TOKEN budget deterministically: within each
    source, docs are admitted in ``id_col`` order until their running
    whitespace-token total exceeds the budget — the "N tokens per
    domain" mixing step every pretraining recipe runs after weighting.

    Scale shape: a naive per-source cumulative window puts a whole
    source — possibly most of a 100 TB crawl — into ONE window task.
    Instead the source is split into ``n_shards`` deterministic
    md5 shards, each filling ``budget // n_shards`` tokens under its
    own (source, shard) window; the admitted total is then within one
    document of the target per shard (the same bounded-error contract
    as any parallel quota fill), and parallelism is sources x shards.
    Returns the audit grain a mixing report wants: (source, n_docs,
    n_tokens) over the ADMITTED set.
    """
    if budget_per_source < 1:
        raise ValueError(f"budget_per_source must be >= 1, got {budget_per_source}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    shard_budget = budget_per_source // n_shards
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).alias("n_tok"),
        F.pmod(
            md5_long(F.concat(F.lit("budget:"), F.col(id_col).cast("string"))),
            F.lit(n_shards),
        ).alias("__shard"),
    )
    w = (
        Window.partitionBy("source", "__shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    admitted = toks.withColumn("__cum", F.sum("n_tok").over(w)).where(
        F.col("__cum") <= shard_budget
    )
    return admitted.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )


def shard_stats(
    docs: DataFrame,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-shard assignment audit: every doc lands in
    ``pmod(md5(doc_id), n_shards)`` — the engine-portable hash, so the
    shard layout is reproducible anywhere — and the report carries what
    a shard-balance dashboard needs: docs, whitespace tokens, and the
    doc-id envelope per shard. One scan, one bounded (n_shards-row)
    shuffle."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return (
        docs.select(
            F.pmod(
                md5_long(F.concat(F.lit("shard:"), F.col(id_col).cast("string"))),
                F.lit(n_shards),
            ).alias("shard_id"),
            F.col(id_col).alias("doc_id"),
            F.size(F.split(F.col(text_col), " ")).alias("n_tok"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .select(
            F.col("shard_id").cast("bigint").alias("shard_id"),
            "n_docs", "n_tokens", "min_doc", "max_doc",
        )
    )
