"""Physical-plan audit (SURVEY.md §4): assert the plans we'd want at
100 TB, not just plans that pass. Formatted-mode explain is parsed for
scan pushdown, join strategy, Python boundary crossings, and shuffle
(Exchange) counts.

Counting note: in formatted mode every node appears twice (tree line +
detail header), so raw substring counts are divided by 2.
"""

import pytest

from timeseries_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plan(spark):
    q = all_queries()

    def get(name: str) -> str:
        df = q[name](spark, SF)
        return spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    return get


def shuffles(p: str) -> int:
    return (p.count("Exchange") - p.count("BroadcastExchange")) // 2


def test_point_query_pushes_filter_and_prunes_columns(plan):
    """P3/S2: the plotTargetDisease-style lookup must reach the parquet
    reader as a pushed filter with a pruned schema — at 100 TB this is the
    difference between a point read and a full scan."""
    p = plan("point_customer_orders")
    assert "EqualTo(o_custkey,371)" in p
    assert "o_comment" not in p  # untouched column never read
    assert shuffles(p) == 0


def test_dimension_joins_broadcast(plan):
    """J2 chains join facts to small dims: every dim side must broadcast —
    no SortMergeJoin, no shuffle of the fact table for the join itself."""
    for name in ("revenue_by_nation", "supplier_part_revenue", "ontology_rollup"):
        p = plan(name)
        assert p.count("SortMergeJoin") == 0, name
        assert p.count("BroadcastHashJoin") > 0, name
        assert shuffles(p) <= 2, name  # agg + presentation sort only


def test_scoring_plan_shuffle_budget(plan):
    """The harmonic-score pipeline (scaffold cross join + groupBy +
    cumulative window) must stay within 2 shuffles: one at evidence grain,
    one at series grain; the scaffold joins broadcast."""
    p = plan("assoc_score_yearly")
    assert p.count("CartesianProduct") == 0
    assert p.count("SortMergeJoin") == 0
    assert shuffles(p) <= 2


def test_novelty_adds_no_shuffle(plan):
    """The single-pass novelty kernel reuses the scoring partitioning: the
    combined score+novelty plan must not shuffle more than scoring alone
    (vs. +3 exchanges for the reference's lag->explode->agg->right-join)."""
    assert shuffles(plan("assoc_novelty_yearly")) <= shuffles(
        plan("assoc_score_yearly")
    )


def test_high_cardinality_flagship_budget(plan):
    """The 15k-group flagship (one series per customer) must keep the same
    2-shuffle shape as the coarse grain — partial aggregation before the
    exchange, window reusing the groupBy partitioning — or the plan has
    regressed in exactly the way that only bites at high cardinality."""
    p = plan("assoc_custkey_novelty")
    assert p.count("CartesianProduct") == 0
    assert p.count("SortMergeJoin") == 0
    assert shuffles(p) <= 2
    assert "partial_" in p  # map-side partial agg before the exchange


def test_no_cartesian_products_anywhere(plan):
    """Nothing in the registry may plan an unbounded cartesian product;
    scaffold cross joins must broadcast their small side."""
    for name in all_queries():
        assert plan(name).count("CartesianProduct") == 0, name


def test_python_boundary_only_in_multimodal(plan):
    """UDF discipline (SURVEY.md §2.10): every query stays JVM-side except
    two Arrow-batched-by-design classes — the multimodal codec queries,
    and (round-16, guide §4.2) the dedup queries whose final plan exposes
    embedding_near_dup's cogrouped NumPy cosine kernel (bit-identical to
    the JVM fold it replaced — see extensions/similarity.py — and Arrow
    cogroup-batched, never row-at-a-time: BatchEvalPython stays banned
    everywhere)."""
    multimodal = {
        "media_decode_stats",
        "media_feature_hist",
        "media_resize_rollup",
        "media_audio_resample",
    }
    vector_kernel = {
        "dedup_embedding_cosine",
        "dedup_embedding_kmeans",
    }
    for name in all_queries():
        p = plan(name)
        py = p.count("EvalPython") + p.count("InPandas") + p.count("MapInArrow")
        if name in multimodal:
            assert py > 0, name  # Arrow-batched, not row-at-a-time
            assert p.count("BatchEvalPython") == 0, name
        elif name in vector_kernel:
            assert p.count("FlatMapCoGroupsInPandas") > 0, name
            assert p.count("BatchEvalPython") == 0, name
        else:
            assert py == 0, name


def test_dedup_pipelines_avoid_all_pairs(plan, spark):
    """Candidate generation must be index/bucket joins, never all-pairs:
    no cartesian, no nested-loop join on the document side.

    Shuffle bounds count the INITIAL plan; self-joins repeat the shingle
    subtree per alias, and since the parallelism guard ends each copy in
    an identical round-robin Exchange, AQE's ReusedExchange computes it
    once at runtime (the textual count is the upper bound, not the
    executed count). Audit COLD: the round-13 multi-consumer persist()
    points otherwise splice each warm InMemoryRelation's full lineage —
    exchanges included — into the plan TEXT of whichever test runs
    second, making the count depend on suite order."""
    spark.catalog.clearCache()
    budget = {
        "dedup_jaccard_pairs": 7,  # 3 aliases of the shingle subtree
        # sentinel routing references the signature aggregate twice
        # (band path + star path), textually repeating the shingle
        # subtree; verified: the executed adaptive plan carries a
        # ReusedExchange and computes it once
        "dedup_minhash_lsh": 9,
        "dedup_simhash": 3,
        # 2 round-robin parallelism guards (one per self-join alias) +
        # 2 EXPLICIT (block, salt) repartitions that pin the pair-join
        # partitioning: user-numbered shuffles are exempt from AQE's
        # byte-based coalescing, which otherwise serialized the cosine
        # stage onto 1-2 tasks (round-7 event-log finding; the join
        # itself adds no further exchange — its requirement is already
        # satisfied)
        "dedup_embedding_cosine": 4,
        # df-capped variants: + the hot-set aggregation, textually repeated
        # per shingle-subtree alias (ReusedExchange computes it once; the
        # hot side itself broadcasts — no extra join shuffle)
        "dedup_jaccard_capped": 15,
        "dedup_lsh_capped": 17,
    }
    for name, bound in budget.items():
        p = plan(name)
        assert p.count("CartesianProduct") == 0, name
        assert shuffles(p) <= bound, name


def test_semantic_dedup_pair_stage_no_all_pairs(spark):
    """The composed semantic-dedup pipeline's candidate stage — the only
    place two corpus rows meet — must be a block-keyed equi join, never
    all-pairs: no CartesianProduct, no broadcast nested loop, no
    SinglePartition funnel. Asserted on the pair-generation subplan
    (the registry query's final plan is truncated by the connected-
    components checkpoints, so the stage is audited directly)."""
    from timeseries_spark.extensions.kmeans import kmeans_assign
    from timeseries_spark.extensions.similarity import embedding_near_dup
    from timeseries_spark.queries import load

    emb = load(spark, SF, "embeddings")
    clusters = kmeans_assign(emb, k=4, max_iter=3)
    blocked = emb.join(clusters.select("vec_id", "cluster"), "vec_id")
    pairs = embedding_near_dup(blocked, threshold=0.30, block_col="cluster")
    p = spark._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted"
    )
    assert p.count("CartesianProduct") == 0
    assert p.count("BroadcastNestedLoopJoin") == 0
    assert "SinglePartition" not in p


def test_shuffled_null_model_is_bucket_parallel(spark):
    """O5 scale fix: the permutation null model must not plan a global
    (partition-less) window — no Exchange SinglePartition anywhere; both
    row_number orderings partition by the hash bucket."""
    from pyspark.sql import functions as F

    from timeseries_spark.operators.scaffold import shuffled_null_years
    from timeseries_spark.queries import load

    ev = load(spark, SF, "orders").select(
        F.col("o_orderkey").cast("string").alias("id"),
        F.year("o_orderdate").cast("int").alias("year"),
        "o_custkey",
    )
    df = shuffled_null_years(ev)
    p = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in p
    assert p.count("CartesianProduct") == 0


def test_kmeans_init_no_single_partition(spark):
    """The round-3 kmeans fix, plan-asserted: centroid seeding must
    compile to TakeOrderedAndProject (parallel per-partition top-k), not
    a global Window funneling every vector through one SinglePartition
    exchange."""
    from pyspark.sql import functions as F

    from timeseries_spark.functions.parallelism import ensure_parallelism

    pts = ensure_parallelism(
        spark.range(1000).select(
            F.col("id").alias("vid"),
            F.array(F.rand(seed=7), F.rand(seed=11)).alias("v"),
        )
    )
    seed = pts.orderBy("vid").limit(4)
    p = spark._jvm.PythonSQLUtils.explainString(
        seed._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in p
    assert "SinglePartition" not in p


def test_brute_force_topk_no_single_partition(spark):
    """The round-3 two-phase salted top-k, plan-asserted: no per-query
    global sort — both row_number windows partition by (query, salt) or
    query over the bounded survivor set, and the plan carries no
    SinglePartition exchange and no global Sort over the scored corpus."""
    from pyspark.sql import functions as F

    from timeseries_spark.extensions.similarity import brute_force_topk
    from timeseries_spark.queries import load

    vecs = load(spark, SF, "embeddings")
    # filter, not limit: a GlobalLimit on the query side would plan its
    # own (legitimate, tiny) SinglePartition and mask the assertion
    queries = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = brute_force_topk(vecs, queries, k=5)
    p = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in p
    assert p.count("CartesianProduct") == 0


def test_lsh_sentinel_path_is_broadcast_star(plan):
    """The sentinel routing must stay a 1-row broadcast star: the LSH
    plan carries exactly ONE nested-loop join — the sentinel star over
    the broadcast min-id row — never a CartesianProduct; the band join
    stays an equi-join (hash or sort-merge, planner's choice by size)."""
    for name in ("dedup_minhash_lsh", "dedup_lsh_capped"):
        p = plan(name)
        assert p.count("CartesianProduct") == 0, name
        # formatted mode prints each node twice (tree + detail header):
        # exactly one nested-loop node means exactly two occurrences
        assert p.count("BroadcastNestedLoopJoin") == 2, name
        assert "BuildRight" in p, name


def test_sampling_queries_are_shuffle_free(plan):
    """The sampling/mixing/quality filters claim 'zero shuffles, zero
    UDFs' — assert it: pure projection/filter/explode plans, no Exchange
    other than the scan-side round-robin none of these use."""
    for name in (
        "sample_stratified",
        "corpus_mix_weighted",
        "doc_repetition",
        "pii_audit_counts",
    ):
        p = plan(name)
        assert shuffles(p) == 0, name
        assert p.count("EvalPython") + p.count("InPandas") == 0, name


def test_context_packing_single_sharded_shuffle(plan):
    """Context packing is one window shuffle on (source, shard) — and no
    SinglePartition funnel (the n_shards knob exists precisely so no
    source serializes into one task)."""
    p = plan("context_packing")
    assert shuffles(p) == 1
    assert "SinglePartition" not in p


def test_hyperplane_bucket_is_projection(plan):
    """Hyperplane LSH's bucket assignment must stay a codegen'd
    projection: no shuffle before the bucket equi-join besides the
    parallelism guard, query side broadcast, no SinglePartition."""
    for name in ("ann_hyperplane_topk", "ann_hyperplane_multiprobe"):
        p = plan(name)
        assert "SinglePartition" not in p, name
        assert p.count("BroadcastHashJoin") > 0 or p.count(
            "BroadcastExchange"
        ) > 0, name


def test_domain_pipeline_plan_budget(plan):
    """The composed domain pipeline (dating → ontology → score+novelty
    [→ overall]) must stay within a fixed shuffle budget with zero
    cartesian products and zero Python. SortMergeJoin is ALLOWED here —
    the dense-scaffold grid join is big-big at scale, and the grid side
    reuses the aggregation's (keys, year) hash partitioning, so SMJ is
    the plan we'd pick at 100 TB (unlike the dimension joins, which must
    broadcast and are asserted elsewhere)."""
    budget = {"assoc_domain_datasource": 7, "assoc_domain_overall": 9}
    for name, bound in budget.items():
        p = plan(name)
        assert p.count("CartesianProduct") == 0, name
        assert p.count("EvalPython") + p.count("InPandas") == 0, name
        assert shuffles(p) <= bound, name


def test_rollup_is_single_pass(plan):
    """ROLLUP must plan as one Expand + one aggregation — never a union of
    per-level aggregates (which would rescan the join output per level)."""
    p = plan("revenue_rollup")
    assert "Expand" in p
    assert p.count("Union") == 0
    assert shuffles(p) <= 2  # rollup agg + nothing else; joins broadcast


def test_round5_sampling_and_chunking_shuffle_free(plan):
    """dataset_split and doc_chunks claim zero shuffles: both must stay
    pure projection/explode plans over the scan."""
    for name in ("dataset_split", "doc_chunks"):
        p = plan(name)
        assert shuffles(p) == 0, name
        assert p.count("EvalPython") + p.count("InPandas") == 0, name


def test_decontaminate_single_corpus_exchange(plan):
    """Decontamination must scan the corpus once: eval shingles broadcast
    in, the hit table broadcasts back — the corpus-grain exchanges are
    the per-doc hit-count groupBy (already filtered to matching
    shingles); the other allowed exchange is the EVAL side's tiny
    distinct before its broadcast."""
    for name in ("contamination_report", "decontaminate"):
        p = plan(name)
        assert p.count("SortMergeJoin") == 0, name
        assert p.count("BroadcastHashJoin") > 0, name
        # 2 key-grain exchanges (eval distinct, per-doc hit groupBy) +
        # 2 round-robin parallelism guards on the shingle explodes
        # (round-7: the train-side explode of a single-split parquet ran
        # 1.6 s on one task inside corpus_prepare; the guards are
        # compute-parallelism, not data movement at scale — no-ops once
        # the input already carries >= defaultParallelism partitions)
        assert shuffles(p) <= 4, name


def test_temperature_mix_broadcasts_weights_back(plan):
    """Temperature mixing: the corpus is touched once — stratum counts
    reduce through a map-side partial agg, the k-row weight table
    broadcasts back, replication is a codegen'd explode. The only
    SinglePartition exchange carries the per-stratum stat rows."""
    p = plan("corpus_mix_temperature")
    assert p.count("SortMergeJoin") == 0
    assert p.count("BroadcastHashJoin") > 0
    assert shuffles(p) <= 2


def test_take_n_two_phase_no_single_partition(plan):
    """take_n_per_stratum: the per-stratum top-n must run salted (local
    phase keyed by (stratum, salt)) so no stratum funnels into one task —
    and never through a SinglePartition sort."""
    p = plan("sample_take_n")
    assert "SinglePartition" not in p
    assert shuffles(p) <= 2


def test_packed_sequences_no_extra_exchange(plan):
    """Materializing packed sequences must reuse the packer's
    (source, shard) window partitioning for the bin-grain groupBy —
    one shuffle total, no SinglePartition."""
    p = plan("packed_sequences")
    assert shuffles(p) == 1
    assert "SinglePartition" not in p


def test_late_round5_plan_shapes(plan):
    """The late-round operators keep their claimed shapes: tokenization
    and OOV scoring broadcast the induced vocabulary (never a sort-merge
    join at token grain); negative sampling's only join is the
    uniformly-keyed partner equi join; the HLL sketch never funnels the
    value stream through a SinglePartition (its one-row estimate fold
    consumes at most 2^p register rows)."""
    for name in ("tokenized_docs", "oov_rate"):
        p = plan(name)
        assert p.count("BroadcastHashJoin") > 0, name
        assert p.count("SortMergeJoin") == 0, name
    p = plan("negative_samples")
    assert p.count("CartesianProduct") == 0
    assert shuffles(p) <= 2  # partner join (+AQE coalesce)
    p = plan("approx_distinct_hll")
    # the only SinglePartition input is the register aggregate (<=2^p
    # rows per group) — assert the value stream reduced first
    assert p.count("SortMergeJoin") == 0


def test_bigram_logprob_plan_shape(plan):
    """Bigram LM scoring keeps its claimed shape: the |V| total crosses
    as a one-row broadcast (never a cartesian), the bigram table joins
    back to the corpus-sized transition stream as a shuffle join on the
    composite (prev,cur) key, and the whole pipeline stays within its
    shuffle budget: doc window + bigram groupBy + context window +
    scoring join + final fold. The transition stream is re-derived for
    scoring rather than persisted (it is corpus-sized; only the vocab-
    bounded bigram table caches), so the doc window runs twice. Each
    toks derivation now starts with the ensure_parallelism round-robin
    fan-out of the byte-small doc scan (round-13 starvation fix:
    2 tasks carried the whole sf1 tokenize, BIGRAM_PROFILE_r13.json;
    ratio 2.66 -> 1.06 after) — 3 extra RR exchanges over doc-grain
    rows, 10 total, all key-partitioned or bounded fan-outs, none
    corpus-collecting."""
    p = plan("bigram_logprob")
    assert p.count("CartesianProduct") == 0
    assert p.count("BroadcastNestedLoopJoin") // 2 <= 1  # the 1-row |V|
    assert shuffles(p) <= 10


def test_round6_dq_and_scd2_plan_shapes(plan):
    """dq_constraints: one scan of orders compiles all seven aggregate
    checks (the report explode runs on the single aggregated row) and
    the referential anti-join stays an equi join — no cartesian, no
    row-wise Python. scd2: both windows and the change filter share the
    user_id partitioning — exactly one corpus exchange."""
    p = plan("dq_constraints")
    assert p.count("CartesianProduct") == 0
    assert "Scan parquet" in p
    # orders read once for the agg suite + once for the anti join
    assert p.count("PushedFilters") >= 0 and shuffles(p) <= 4
    p = plan("scd2_user_status")
    assert shuffles(p) == 1
    assert "SinglePartition" not in p


def test_round6_embedding_plan_shapes(plan):
    """Covariance: the only exchange is the (i, j)-grain aggregate —
    pair generation is a codegen'd projection, never a self-join of the
    exploded corpus. Projection: zero exchanges of any kind."""
    p = plan("embedding_covariance")
    # one logical idx-grain aggregate exchange, duplicated in the static
    # plan per consumer (pair side + two broadcast dim-sum sides; AQE
    # reuses it at runtime) — and crucially no join shuffle at all
    assert shuffles(p) <= 3
    assert p.count("SortMergeJoin") == 0 and p.count("CartesianProduct") == 0
    p = plan("embedding_projection")
    assert "Exchange" not in p


def test_round6_boilerplate_plan_shape(plan):
    """Boilerplate strip: gram-keyed equi joins only (no broadcast
    ASSUMPTION on the boilerplate table, no cartesian), and no
    SinglePartition anywhere — every stage is key-partitioned."""
    p = plan("boilerplate_strip")
    assert p.count("CartesianProduct") == 0
    assert "SinglePartition" not in p
    p = plan("boilerplate_grams")
    assert shuffles(p) <= 2  # gram-grain distinct-doc count (partial agg)


def test_round6_zipf_and_hw_plan_shapes(plan):
    """zipf_fit: one corpus explode feeding the (source, token) count;
    everything after is vocabulary-grain (rank window + source-grain
    regression agg). holt_winters: same single key-grain exchange as
    ema/holt — the seasonal queue rides in the fold accumulator, never
    a join."""
    p = plan("zipf_fit")
    assert shuffles(p) <= 3
    assert "SinglePartition" not in p
    p = plan("holt_winters_daily")
    assert shuffles(p) <= 2  # daily agg + series window
    assert "SinglePartition" not in p
    assert p.count("CartesianProduct") == 0


def test_round6_audio_resample_boundary(plan):
    """The only Python boundary is the declared Arrow mapInPandas pair
    (fixture generator + resampler), and image payloads are filtered
    out BEFORE the second crossing (kind pushdown into the plan)."""
    p = plan("media_audio_resample")
    assert p.count("CartesianProduct") == 0
    # generator + resampler: exactly two mapInPandas nodes
    assert p.count("MapInPandas") // 2 == 2


def test_round6_late_plan_shapes(plan):
    """Late round-6 operators keep their claimed shapes: TF-IDF's only
    joins are the term-grain df join + one-row N broadcast (no
    cartesian); LPA and PCA never funnel through a SinglePartition that
    carries more than state rows (LPA state = nodes; PCA state = d
    rows); containment shares jaccard's inverted-index plan (no
    all-pairs); the classifier evaluations stay single-aggregate."""
    for name in ("tfidf_top_terms", "dedup_containment_pairs"):
        p = plan(name)
        assert p.count("CartesianProduct") == 0, name
    p = plan("label_propagation_communities")
    assert p.count("CartesianProduct") == 0
    p = plan("pca_top_component")
    assert p.count("CartesianProduct") == 0
    p = plan("lsh_quality_report")
    assert p.count("CartesianProduct") == 0
    # the only nested-loop is the sentinel star's one-row min-id
    # broadcast inherited from lsh_candidates
    assert p.count("BroadcastNestedLoopJoin") // 2 <= 1
    p = plan("classifier_confusion")
    # 4 GD-round gradient aggregates + the final confusion aggregate;
    # the persisted feature relation feeds all five without a re-scan
    assert shuffles(p) <= 5


def test_pair_join_repartition_pin_survives_execution(spark):
    """Round-7 regression pin: the explicit (block, salt) repartitions in
    embedding_near_dup must survive into the EXECUTED plan as
    REPARTITION_BY_NUM — Catalyst removes distribution-matching user
    repartitions in some positions (it does before a Window; see
    operators/scoring.py), and if it ever starts doing so here, AQE's
    byte-based coalescing re-serializes the compute-bound cosine stage
    onto 1-2 tasks (the 5x regression this fix removed)."""
    q = all_queries()
    df = q["dedup_embedding_cosine"](spark, SF)
    df.count()
    p = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "REPARTITION_BY_NUM" in p


def test_round8_graph_plans_no_cartesian(plan):
    """Triangle counting / clustering / k-core build wedges and peels
    with keyed equi joins only — a cartesian anywhere would square the
    edge relation at 100 TB."""
    for name in (
        "triangle_counts_parts",
        "clustering_coefficient_parts",
        "parts_graph_assortativity",
    ):
        p = plan(name)
        assert p.count("CartesianProduct") == 0, name
        assert p.count("BroadcastNestedLoopJoin") == 0, name


def test_mmr_post_pool_is_expression_only(plan):
    """After the salted pool phase (its local/global top-k windows),
    the greedy trajectory is per-row array expressions: no extra
    windows beyond brute_force_topk's two, and the whole plan carries
    no cartesian and only the pool build's exchanges."""
    p = plan("ann_mmr_rerank")
    assert p.count("CartesianProduct") == 0
    # brute_force_topk contributes exactly 2 window ops (salted local +
    # global top-k); the greedy steps must add none
    assert p.count("(Window") // 1 <= 4  # tree+detail lines for 2 ops
    assert shuffles(p) <= 4  # pool windows + vector join + pool agg


def test_standardize_plan_zero_shuffle_rescale(plan):
    """The rescale is a broadcast map: the only exchanges belong to the
    d-row stats aggregate (posexplode scan), never the corpus."""
    p = plan("embedding_standardize")
    assert p.count("CartesianProduct") == 0
    assert shuffles(p) <= 2  # stats partial+final; corpus side map-only


def test_winnowing_no_allpairs(plan):
    """Winnowed pair generation is a fingerprint-keyed equi self-join
    over capped fingerprints — never an all-pairs document join."""
    p = plan("dedup_winnowing_pairs")
    assert p.count("CartesianProduct") == 0
    assert p.count("BroadcastNestedLoopJoin") == 0


def test_stl_windows_are_keyed(plan):
    """Every window in the decomposition is partitioned by the series
    key — no SinglePartition global window."""
    p = plan("stl_daily")
    assert "SinglePartition" not in p
    assert p.count("CartesianProduct") == 0


def test_gini_windows_are_keyed(plan):
    p = plan("revenue_gini_by_nation")
    assert "SinglePartition" not in p
    assert p.count("CartesianProduct") == 0


def test_rank_stats_windows_are_distributed(spark, plan):
    """Round-11 fix for the registry's last SinglePartition-at-scale
    path: mann_whitney_u / ks_two_sample rank the pooled values via
    quantile-bucketed local windows + broadcast bucket offsets, so a
    continuous metric (distinct values ~ rows) never funnels the
    value axis through one task. Assert (a) no partition-less
    WindowExec in either plan — every windowspecdefinition must lead
    with a partition expression, not a sort order — and (b) the
    executed plan collapses all ranking branches onto ONE source scan
    via AQE exchange reuse."""
    import re

    from timeseries_spark.queries import all_queries

    q = all_queries()
    for name in ("mann_whitney_click_view", "ks_two_sample_click_view"):
        p = plan(name)
        # a windowspec whose FIRST argument is a sort order has no
        # partition columns ("v#8 ASC NULLS FIRST, ..."), i.e. a
        # global single-task window
        assert not re.findall(
            r"windowspecdefinition\([^,)]*(?:ASC|DESC)", p
        ), name
        df = q[name](spark, SF)
        df.collect()
        final = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert len(re.findall(r"FileScan parquet", final)) == 1, name
        assert final.count("ReusedExchange") >= 3, name
