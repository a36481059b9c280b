"""Property-based invariants for the dedup kernels: the HOF signature
formula must equal the explode/agg plan used at scale, duplicates must
always collide, and sketches must be permutation-stable where the math
says so."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from timeseries_spark.extensions.dedup import (
    lsh_candidates,
    minhash_signature,
    shingles,
    simhash32,
    simhash_pairs,
    tokens,
)

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c"),  # tiny alphabet forces collisions
        min_size=0,
        max_size=40,
    ),
    min_size=2,
    max_size=8,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


@SLOW
@given(rows=texts)
def test_hof_signature_equals_explode_plan(spark, rows):
    """minhash_signature (HOF form) and the lsh_candidates explode/groupBy
    plan compute THE SAME signature — the scale rewrite must be a pure
    physical change."""
    docs = _docs(spark, rows)
    hof = {
        r["doc_id"]: tuple(r["sig"])
        for r in docs.select(
            "doc_id",
            minhash_signature(
                F.array_distinct(shingles(tokens(F.col("text")), 3)), 32
            ).alias("sig"),
        ).collect()
    }
    # reproduce the explode/agg signature exactly as lsh_candidates builds it
    from timeseries_spark.extensions.dedup import EMPTY_SIG_SENTINEL
    from timeseries_spark.extensions.hashing import md5_h1, md5_h2

    hp = docs.select(
        F.col("doc_id").alias("id"),
        F.explode_outer(
            F.array_distinct(shingles(tokens(F.col("text")), 3))
        ).alias("s"),
    ).select("id", md5_h1(F.col("s")).alias("h1"), md5_h2(F.col("s")).alias("h2"))
    agg = hp.groupBy("id").agg(
        *[F.min(F.col("h1") + i * F.col("h2")).alias(f"m{i}") for i in range(32)]
    )
    exploded = {
        r["id"]: tuple(
            r[f"m{i}"] if r[f"m{i}"] is not None else EMPTY_SIG_SENTINEL
            for i in range(32)
        )
        for r in agg.collect()
    }
    assert hof == exploded


@SLOW
@given(rows=texts)
def test_exact_duplicates_always_collide(spark, rows):
    """Any two docs with identical text MUST appear as an LSH candidate
    pair (identical signatures agree on every band) and at SimHash
    hamming 0."""
    dup = rows + [rows[0]]  # force at least one exact duplicate pair
    docs = _docs(spark, dup)
    a, b = 0, len(dup) - 1
    lsh = {
        (r["id_a"], r["id_b"]) for r in lsh_candidates(docs, n=3).collect()
    }
    assert (a, b) in lsh
    sim = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(docs, max_hamming=6).collect()
    }
    assert sim.get((a, b)) == 0


@SLOW
@given(rows=texts)
def test_simhash_depends_only_on_token_multiset(spark, rows):
    """The sketch is a sum over token hashes — token order must not
    change it."""
    docs = _docs(spark, rows)
    rev = _docs(
        spark, [" ".join(reversed(t.split(" "))) for t in rows]
    )
    sk = lambda d: {
        r["doc_id"]: r["sk"]
        for r in d.select(
            "doc_id", simhash32(tokens(F.col("text"))).alias("sk")
        ).collect()
    }
    assert sk(docs) == sk(rev)


def test_doc_freq_cap_kills_hot_shingle_pairs(spark):
    """Two docs that share ONLY a corpus-hot shingle pair up uncapped but
    must NOT pair once max_doc_freq binds; pairs sharing cool shingles
    survive the cap unchanged."""
    from timeseries_spark.extensions.dedup import jaccard_pairs

    hot = "x y z"  # 3-gram carried by every doc -> df 6 > cap 3
    rows = [
        (0, f"{hot} alpha beta gamma delta"),
        (1, f"{hot} alpha beta gamma delta"),  # near-dup of 0 (cool overlap)
        (2, f"{hot} epsilon zeta eta theta"),
        (3, f"{hot} iota kappa lam mu"),
        (4, f"{hot} nu xi omicron pi"),
        (5, f"{hot} rho sigma tau upsilon"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, n=3, threshold=0.05).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(
            docs, n=3, threshold=0.05, max_doc_freq=3
        ).collect()
    }
    # uncapped: the hot shingle links everything pairwise
    assert (2, 3) in uncapped and (0, 2) in uncapped
    # capped: only the genuinely-similar pair remains
    assert capped == {(0, 1)}


def test_doc_freq_cap_lsh_sentinel_for_all_hot_docs(spark):
    """LSH with the cap: docs whose every shingle is hot join genuinely
    empty docs on the sentinel path — a STAR to the min sentinel id, not
    an all-pairs band bucket. Same connected component, m-1 pairs."""
    from timeseries_spark.extensions.dedup import lsh_candidates

    boiler = "one two three"
    rows = [(i, boiler) for i in range(5)] + [
        (5, ""),  # genuinely empty
        (6, f"{boiler} unique suffix here now"),
        (7, "totally different content words entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidates(docs, max_doc_freq=3).collect()
    }
    # all-hot docs 0-4 and empty doc 5 star to the min sentinel id (0)
    assert {(0, b) for b in range(1, 6)} <= capped
    # ...and do NOT pair among themselves (no quadratic mega-bucket)
    assert not any(1 <= a < b <= 5 for a, b in capped)
    # doc 7 shares nothing cool with anyone
    assert not any(7 in p for p in capped)


def test_lsh_sentinel_star_scales_linearly(spark):
    """The verdict's boilerplate fixture: >=100 all-hot docs produce
    exactly m-1 sentinel pairs (the star), never m(m-1)/2 — and pairs
    among REAL docs are unchanged by the presence of the boilerplate
    block."""
    from timeseries_spark.extensions.dedup import lsh_candidates

    boiler = "copyright footer all rights reserved"
    real = [
        (1000, "alpha beta gamma delta epsilon zeta eta theta"),
        (1001, "alpha beta gamma delta epsilon zeta eta theta"),
        (1002, "completely unrelated set of content words here"),
    ]
    m = 120
    rows = [(i, boiler) for i in range(m)] + real
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidates(docs, max_doc_freq=5).collect()
    }
    sent_pairs = {p for p in got if p[0] < m}
    real_pairs = got - sent_pairs
    assert sent_pairs == {(0, b) for b in range(1, m)}  # star, m-1 pairs
    assert real_pairs == {(1000, 1001)}
    # the real-doc pair set must be what the boilerplate-free corpus gives
    alone = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidates(
            spark.createDataFrame(real, "doc_id long, text string"),
            max_doc_freq=5,
        ).collect()
    }
    assert real_pairs == alone


@SLOW
@given(
    f1=st.floats(min_value=0.0, max_value=1.0),
    f2=st.floats(min_value=0.0, max_value=1.0),
)
def test_sample_fractions_nest(spark, f1, f2):
    """Hash-threshold sampling is monotone: the sample at the smaller
    fraction is always a subset of the sample at the larger one (stable
    A/B cohorts under fraction changes — the operational property)."""
    from timeseries_spark.extensions.sampling import deterministic_sample

    lo, hi = sorted((f1, f2))
    docs = spark.createDataFrame(
        [(i,) for i in range(80)], "doc_id long"
    )
    small = {r["doc_id"] for r in deterministic_sample(docs, lo).collect()}
    big = {r["doc_id"] for r in deterministic_sample(docs, hi).collect()}
    assert small <= big


@SLOW
@given(w=st.floats(min_value=0.0, max_value=4.0))
def test_weighted_mix_copies_bracket_weight(spark, w):
    """Every row gets floor(w) or ceil(w) copies — never anything else —
    and integer weights replicate exactly."""
    import math

    from timeseries_spark.extensions.sampling import weighted_mix

    docs = spark.createDataFrame(
        [(i, "s") for i in range(50)], "doc_id long, source string"
    )
    counts = {
        r["doc_id"]: r["count"]
        for r in weighted_mix(docs, {"s": w}).groupBy("doc_id").count().collect()
    }
    lo, hi = math.floor(w), math.ceil(w)
    assert all(c in (lo, hi) and c > 0 for c in counts.values())
    missing = 50 - len(counts)  # rows with zero copies never surface
    if lo >= 1:
        assert missing == 0
    if w == int(w):
        assert missing == (50 if w == 0 else 0)
        assert all(c == int(w) for c in counts.values())


@SLOW
@given(
    fracs=st.lists(
        st.floats(min_value=0.01, max_value=1.0), min_size=2, max_size=4
    )
)
def test_dataset_split_is_partition_of_unity(spark, fracs):
    """For ANY normalized fraction vector, every row lands in exactly one
    split — no loss, no double-assignment — and assignment is a pure
    function of the key."""
    from timeseries_spark.extensions.sampling import dataset_split

    total = sum(fracs)
    splits = [(f"s{i}", f / total) for i, f in enumerate(fracs)]
    # re-normalize the residual onto the last split so the sum is exact
    splits[-1] = (splits[-1][0], 1.0 - sum(f for _, f in splits[:-1]))
    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    out = dataset_split(docs, splits).collect()
    assert len(out) == 200
    assert len({r["doc_id"] for r in out}) == 200  # one split per row
    again = {
        (r["doc_id"], r["split"]) for r in dataset_split(docs, splits).collect()
    }
    assert {(r["doc_id"], r["split"]) for r in out} == again


@SLOW
@given(
    n_tokens=st.integers(min_value=0, max_value=60),
    chunk=st.integers(min_value=2, max_value=16),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunk_documents_covers_every_token(spark, n_tokens, chunk, overlap_frac):
    """For ANY (doc length, chunk size, overlap): every token appears in
    at least one chunk, chunk starts advance by exactly the stride, and
    concatenating stride-length prefixes reconstructs the document."""
    from timeseries_spark.extensions.text import chunk_documents

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    words = [f"w{i}" for i in range(n_tokens)]
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r["chunk_idx"],
    )
    stride = chunk - overlap
    assert [r["chunk_start"] for r in rows] == [
        1 + i * stride for i in range(len(rows))
    ]
    covered = set()
    for r in rows:
        toks = r["chunk_text"].split(" ")
        covered.update(range(r["chunk_start"], r["chunk_start"] + len(toks)))
    # every token position 1..max(n,1) covered (empty text -> [''] = 1 tok)
    assert covered == set(range(1, max(n_tokens, 1) + 1))


def test_containment_catches_excerpt_jaccard_misses(spark):
    """A short doc fully contained in a long doc: containment fires in
    the quote's direction while Jaccard stays tiny."""
    from timeseries_spark.extensions.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    quote = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, quote), (2, quote + " " + filler)],
        "doc_id bigint, text string",
    )
    (c,) = containment_pairs(docs, n=3, threshold=0.8).collect()
    assert (c["id_a"], c["id_b"]) == (1, 2)
    assert c["containment_a"] == 1.0  # every quote shingle is in doc 2
    assert c["containment_b"] < 0.05
    assert jaccard_pairs(docs, n=3, threshold=0.5).count() == 0


def test_simhash_bucket_cap_binds_and_preserves_cold_pairs(spark):
    """The max_bucket cap drops only hot-band candidates: a twin pair
    living in small buckets survives the cap; a boilerplate mega-cluster
    whose every band bucket exceeds the cap emits no pairs. Capped
    output is always a subset of uncapped output."""
    from timeseries_spark.extensions.dedup import simhash_pairs

    twins = [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")]
    boiler = [(100 + i, "lorem ipsum dolor sit amet") for i in range(12)]
    docs = spark.createDataFrame(
        twins + boiler, "doc_id bigint, text string"
    )
    uncapped = {
        (r.id_a, r.id_b)
        for r in simhash_pairs(docs, max_hamming=6).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in simhash_pairs(docs, max_hamming=6, max_bucket=4).collect()
    }
    assert capped <= uncapped
    # identical twins share every band; their buckets hold 2 docs (< cap)
    assert (1, 2) in capped
    # the 12-doc boilerplate cluster busts every one of its band buckets
    assert not any(a >= 100 and b >= 100 for a, b in capped)
    assert any(a >= 100 and b >= 100 for a, b in uncapped)
