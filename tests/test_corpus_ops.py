"""Round-7 corpus operators: token-budget mixing, shard audit,
tokenizer application, embedding-space decontamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseries_spark.extensions.sampling import shard_stats, token_budget_mix


def test_token_budget_admits_in_id_order(spark):
    # one source, one shard: docs admitted by id until the running
    # total would pass the budget
    docs = spark.createDataFrame(
        [(1, "a b c", "s"), (2, "d e", "s"), (3, "f g h i", "s")],
        "doc_id bigint, text string, source string",
    )
    out = token_budget_mix(
        docs, budget_per_source=5, n_shards=1
    ).collect()
    # cum: doc1=3, doc2=5, doc3=9 -> docs 1,2 admitted (5 tokens)
    assert [(r["source"], r["n_docs"], r["n_tokens"]) for r in out] == [
        ("s", 2, 5)
    ]


def test_token_budget_per_source_isolation(spark):
    docs = spark.createDataFrame(
        [(1, "a b", "x"), (2, "c d", "y"), (3, "e f", "y")],
        "doc_id bigint, text string, source string",
    )
    out = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in token_budget_mix(docs, 4, n_shards=1).collect()
    }
    assert out == {"x": (1, 2), "y": (2, 4)}


def test_token_budget_validates(spark):
    docs = spark.createDataFrame(
        [(1, "a", "s")], "doc_id bigint, text string, source string"
    )
    with pytest.raises(ValueError):
        token_budget_mix(docs, 0)
    with pytest.raises(ValueError):
        token_budget_mix(docs, 10, n_shards=0)


def test_shard_stats_partition_and_totals(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (i + 1) + "end", "s") for i in range(20)],
        "doc_id bigint, text string, source string",
    )
    out = shard_stats(docs, n_shards=4).collect()
    # every doc in exactly one shard; token totals conserved
    assert sum(r["n_docs"] for r in out) == 20
    assert sum(r["n_tokens"] for r in out) == sum(i + 2 for i in range(20))
    assert all(0 <= r["shard_id"] < 4 for r in out)
    # deterministic: same input, same layout
    again = shard_stats(docs, n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_encode_corpus_hand_checked(spark):
    from timeseries_spark.extensions.bpe import encode_corpus, induce_bpe

    # 'abab' dominates: merges learn (a,b) then (ab,ab)
    docs = spark.createDataFrame(
        [(1, "abab abab ab"), (2, "ZZ!"), (3, "ab")],
        "doc_id bigint, text string",
    )
    _, words = induce_bpe(docs, n_merges=2)
    rep = {r["doc_id"]: r for r in encode_corpus(docs, words).collect()}
    # doc 1: 'abab' segments to [abab] (1 symbol), 'ab' to [ab]
    assert rep[1]["n_tokens"] == 3
    assert rep[1]["n_symbols"] == 3  # [abab] + [abab] + [ab]
    assert rep[1]["n_chars"] == 10
    assert rep[1]["compression"] == round(10 / 3, 4)
    # doc 2 has no [a-z0-9]+ token at all -> absent from the report
    assert 2 not in rep
    assert rep[3]["n_symbols"] == 1


def test_semantic_decontaminate_flags_only_hits(spark):
    from timeseries_spark.extensions.dedup import semantic_decontaminate

    ev = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    tr = spark.createDataFrame(
        [
            (10, [2.0, 0.0]),     # parallel to eval 0 -> cos 1.0
            (11, [1.0, 1.0]),     # cos ~0.7071 to both
            (12, [-1.0, 0.0]),    # cos -1 / 0 -> below threshold
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = {
        r["vec_id"]: (r["n_eval_hits"], r["max_cos"])
        for r in semantic_decontaminate(tr, ev, threshold=0.5).collect()
    }
    assert out == {10: (1, 1.0), 11: (2, 0.707107)}


def test_semantic_decontaminate_plan_broadcasts_eval(spark):
    from timeseries_spark.extensions.dedup import semantic_decontaminate

    ev = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    tr = spark.createDataFrame(
        [(10, [2.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    p = spark._jvm.PythonSQLUtils.explainString(
        semantic_decontaminate(tr, ev)._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" in p  # eval side broadcast
    assert "CartesianProduct" not in p
    # train side never shuffles except the final flagged-id aggregate
    assert p.count(") Exchange") <= 1
