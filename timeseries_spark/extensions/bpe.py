"""Distributed BPE (byte-pair-encoding) merge induction — tokenizer
training inside the engine.

The published BPE algorithm (Sennrich et al. 2016, public): start from
characters, repeatedly (1) count adjacent symbol pairs across the
corpus weighted by word frequency, (2) merge the most frequent pair
everywhere. The trained artifact is the ordered merge list; applying it
to text is the tokenizer.

Scale shape — the part that matters at 100 TB: the corpus is scanned
ONCE to build the (token, count) vocabulary; every merge round after
that runs at VOCABULARY grain (pair counting shuffles |vocab|·avg_len
rows with map-side partial aggregation, the winning pair is a one-row
TakeOrdered reduce broadcast back, and the merge rewrite is a per-row
string replace). Rounds follow the ``kmeans_fit`` /
``connected_components`` discipline: a bounded driver loop whose state
is eagerly ``localCheckpoint``-ed each round so the plan never grows
(plan-size blowup, not data, is the failure mode of chained iterations).

Determinism: ties on pair count break lexicographically on (left,
right), so the same corpus always yields the same merge table — which
is what lets a plain SQL engine replay the whole induction as chained
CTE stages for the oracle.

Representation: a word's segmentation is rendered as a bracket string
``[h][e][l][l][o]``. Merging pair (l, l) is then the plain string
replace ``[l][l] → [ll]`` — non-overlapping left-to-right replacement
IS greedy BPE merging, identical in Spark and ANSI SQL, with no
list-fold accumulator (and no DuckDB list_reduce mutation pitfall).
Tokens are restricted to ``^[a-z0-9]+$`` so the brackets can never
collide with symbol text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_RE = "^[a-z0-9]+$"


def _vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(token, cnt, s) at vocabulary grain; s = bracketed char split."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .where(F.col("token").rlike(TOKEN_RE))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "s",
            F.concat(
                F.lit("["),
                F.array_join(F.split(F.col("token"), ""), "]["),
                F.lit("]"),
            ),
        )
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair totals over the current segmentation, weighted by
    word frequency: (a, b, total)."""
    syms = F.split(
        F.expr("substring(s, 2, length(s) - 2)"), r"\]\["
    )
    n = F.size(syms)
    pairs = F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        words.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").cast("bigint").alias("total"))
    )


def induce_bpe(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Train ``n_merges`` BPE merges on the corpus. Returns
    ``(merges, words)``:

    - merges: (step, pair_left, pair_right, merged, pair_count) — the
      ordered merge table, the tokenizer artifact;
    - words: (token, cnt, s) — the final vocabulary segmentation under
      those merges (bracket rendering).

    Stops early (fewer rows in ``merges``) if the vocabulary runs out
    of adjacent pairs — single-character words can exhaust a toy corpus
    before ``n_merges`` rounds.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = _vocab(docs, text_col).localCheckpoint(eager=True)
    merge_rows: list[DataFrame] = []
    for step in range(1, n_merges + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("total"), "a", "b")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        # metadata-only driver decision (0 or 1 row, already
        # materialized by the eager checkpoint) — not a data collect
        if best.isEmpty():
            break
        merge_rows.append(
            best.select(
                F.lit(step).alias("step"),
                F.col("a").alias("pair_left"),
                F.col("b").alias("pair_right"),
                F.concat("a", "b").alias("merged"),
                F.col("total").alias("pair_count"),
            )
        )
        pat = F.concat(F.lit("["), F.col("a"), F.lit("]["), F.col("b"), F.lit("]"))
        rep = F.concat(F.lit("["), F.col("a"), F.col("b"), F.lit("]"))
        words = (
            words.crossJoin(F.broadcast(best))
            .withColumn("s", F.replace(F.col("s"), pat, rep))
            .select("token", "cnt", "s")
            .localCheckpoint(eager=True)
        )
    if not merge_rows:
        # a corpus of single-character words has no adjacent pairs at
        # all — surface an EMPTY merge table (correct artifact), not an
        # error (found by the round-6 property test)
        merges = docs.sparkSession.createDataFrame(
            [],
            "step int, pair_left string, pair_right string, "
            "merged string, pair_count bigint",
        )
    else:
        merges = merge_rows[0]
        for df in merge_rows[1:]:
            merges = merges.unionByName(df)
    return merges, words


def segment_topk(words: DataFrame, k: int = 50) -> DataFrame:
    """The k most frequent tokens with their final BPE segmentation —
    the human-inspectable artifact (did the tokenizer learn 'the' as
    one symbol?). Tie-break on token keeps the top-k set deterministic.
    """
    return (
        words.orderBy(F.desc("cnt"), "token")
        .limit(k)
        .select("token", "cnt", F.col("s").alias("seg"))
    )


def _disjoint_prefix(rows, batch_max: int, remaining: int):
    """The exactness-preserving batch: the longest PREFIX of the
    (total desc, a, b)-ordered pair list that is pairwise
    symbol-disjoint, shrunk until the last member's count STRICTLY
    exceeds the first unselected pair's (floor at 1 = plain greedy).

    Why this equals sequential greedy BPE, merge for merge:
    - prefix + first-conflict stop ⇒ every non-batch pair ranks at or
      below the stopping pair, so its count <= count(p_{m+1});
    - disjointness ⇒ merging p_i never changes the count of p_j (no
      shared symbol, and adjacency of a disjoint pair is untouched by
      a bracket rewrite elsewhere in the word);
    - a NEW pair created by merging (a,b)->ab, say (x,ab), occurs at
      most as often as the OLD pair (x,a) — which conflicts with the
      batch and therefore ranks <= p_{m+1};
    - the strict boundary count(p_m) > count(p_{m+1}) then puts every
      competitor STRICTLY below every batch member, so sequential
      greedy must pick exactly p_1..p_m in order (equal-count batch
      members resolve by the same (a, b) lex tie-break in both).

    "Symbol-disjoint" must include MERGED OUTPUTS, not just
    components: merging (a,b) mints new "ab" symbols, so a later pair
    with an "ab" component (possible when the vocabulary already
    contains multi-char symbols from earlier rounds) would see its
    count change mid-batch. Each selected pair therefore reserves
    {a, b, a+b}, and a candidate conflicts if any of ITS three strings
    is reserved.
    """
    batch: list = []
    used: set[str] = set()
    nxt = None
    for r in rows:
        if len(batch) >= min(batch_max, remaining):
            nxt = r
            break
        if {r["a"], r["b"], r["a"] + r["b"]} & used:
            nxt = r
            break
        batch.append(r)
        used |= {r["a"], r["b"], r["a"] + r["b"]}
    if nxt is not None:
        while len(batch) > 1 and batch[-1]["total"] <= nxt["total"]:
            nxt = batch.pop()
    return batch


def induce_bpe_batched(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    batch_max: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Sequential-exact BPE induction with BATCHED rounds: each corpus
    round merges up to ``batch_max`` pairwise-disjoint pairs at once
    (see ``_disjoint_prefix`` for the proof sketch), so a realistic
    30k-merge vocabulary needs hundreds of Spark rounds instead of
    30k sequential jobs. Output is identical to ``induce_bpe`` —
    same merge table (steps, counts, order), same final segmentation —
    which is what lets this share the sequential oracle.

    Driver boundary: ONE bounded collect of <= batch_max + 1 tiny
    (a, b, total) rows per round — the same metadata-only discipline as
    the kmeans convergence aggregate, never a data collect. The batch
    rewrite is a single chained literal replace per round (the merges
    are disjoint, so replace order within the chain is immaterial)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if batch_max < 1:
        raise ValueError(f"batch_max must be >= 1, got {batch_max}")
    spark = docs.sparkSession
    words = _vocab(docs, text_col).localCheckpoint(eager=True)
    merge_lits: list[tuple] = []
    while len(merge_lits) < n_merges:
        top = (
            _pair_counts(words)
            .orderBy(F.desc("total"), "a", "b")
            .limit(batch_max + 1)
            .collect()
        )
        if not top:
            break
        batch = _disjoint_prefix(
            top, batch_max, n_merges - len(merge_lits)
        )
        for r in batch:
            merge_lits.append(
                (len(merge_lits) + 1, r["a"], r["b"], r["a"] + r["b"], r["total"])
            )
        s = F.col("s")
        for r in batch:
            s = F.replace(
                s,
                F.lit(f"[{r['a']}][{r['b']}]"),
                F.lit(f"[{r['a']}{r['b']}]"),
            )
        words = (
            words.withColumn("s", s)
            .select("token", "cnt", "s")
            .localCheckpoint(eager=True)
        )
    merges = spark.createDataFrame(
        merge_lits,
        "step int, pair_left string, pair_right string, "
        "merged string, pair_count bigint",
    )
    return merges, words


def encode_corpus(
    docs: DataFrame,
    words: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """APPLY a trained tokenizer to the corpus — the serve half of the
    BPE train/apply split: the final vocabulary segmentation table
    (token -> bracket rendering, as returned by ``induce_bpe`` /
    ``induce_bpe_batched``) is broadcast, and tokenization is one
    vocabulary equi join — the corpus never replays a merge. Returns
    the per-doc tokenizer report: (doc_id, n_tokens, n_symbols,
    n_chars, compression) where compression = chars per emitted BPE
    symbol (the fertility metric tokenizer evaluations track).

    Docs whose every token falls outside the induction alphabet
    ([a-z0-9]+) produce no row — they contributed nothing to training
    and have no segmentation to report."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).where(F.col("token").rlike(TOKEN_RE))
    seg = toks.join(F.broadcast(words.select("token", "s")), "token")
    return (
        seg.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.size(F.split(F.col("s"), r"\]\["))).cast("bigint").alias(
                "n_symbols"
            ),
            F.sum(F.length("token")).cast("bigint").alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_symbols",
            "n_chars",
            F.round(
                F.col("n_chars").cast("double") / F.col("n_symbols"), 4
            ).alias("compression"),
        )
    )
