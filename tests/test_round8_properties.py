"""Hypothesis property tests for round-8 operators: invariants that
hand-picked examples cannot pin (relabeling invariance, weight
monotonicity, statistic bounds)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=30,
)


def _ref_triangles(edges):
    und = {
        (min(a, b), max(a, b)) for a, b in edges if a != b
    }
    nodes = sorted({n for e in und for n in e})
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tri = {n: 0 for n in nodes}
    import itertools

    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return tri


@given(edges=edge_lists)
@settings(**SETTINGS)
def test_triangle_counts_match_bruteforce_reference(spark, edges):
    """Degree-oriented wedge counting equals the O(n^3) reference on
    arbitrary small graphs (dups, loops, both directions included)."""
    from timeseries_spark.extensions.graph import triangle_counts

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    ref = _ref_triangles(edges)
    if not ref:
        return
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == ref


@given(
    edges=edge_lists,
    shift=st.integers(min_value=1, max_value=1000),
)
@settings(**SETTINGS)
def test_triangle_counts_relabel_invariant(spark, edges, shift):
    """Shifting every node id leaves per-node counts unchanged (the
    degree orientation depends on ids only through a total order, and
    a constant shift preserves it)."""
    from timeseries_spark.extensions.graph import triangle_counts

    df1 = spark.createDataFrame(edges, "src bigint, dst bigint")
    df2 = spark.createDataFrame(
        [(a + shift, b + shift) for a, b in edges], "src bigint, dst bigint"
    )
    g1 = {r["node"]: r["triangles"] for r in triangle_counts(df1).collect()}
    g2 = {
        r["node"] - shift: r["triangles"]
        for r in triangle_counts(df2).collect()
    }
    assert g1 == g2


@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_weighted_median_bounds_and_expansion(spark, vals):
    """The weighted median lies within [min, max] of the values and
    equals the plain lower median of the weight-expanded multiset."""
    from timeseries_spark.operators.timeseries import weighted_median

    rows = [("k", float(v), float(w)) for v, w in vals]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    got = weighted_median(df, ["k"], "v", "w").collect()[0][
        "weighted_median"
    ]
    expanded = sorted(v for v, w in vals for _ in range(w))
    # lower weighted median == element where cumulative count first
    # reaches half the total (ties included)
    total = len(expanded)
    cum = 0
    ref = None
    for v in expanded:
        cum += 1
        if 2 * cum >= total:
            ref = v
            break
    assert got == float(ref)
    assert min(expanded) <= got <= max(expanded)


@given(
    a=st.lists(
        st.integers(min_value=-20, max_value=20), min_size=2, max_size=15
    ),
    b=st.lists(
        st.integers(min_value=-20, max_value=20), min_size=2, max_size=15
    ),
)
@settings(**SETTINGS)
def test_mann_whitney_u_complement_and_symmetry(spark, a, b):
    """U_a + U_b == n_a*n_b always, and swapping the groups swaps the
    U values and negates z."""
    from timeseries_spark.extensions.dataquality import mann_whitney_u

    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    fwd = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    rev = mann_whitney_u(df, "g", "v", "b", "a").collect()[0]
    assert fwd["u_a"] + fwd["u_b"] == len(a) * len(b)
    assert fwd["u_a"] == rev["u_b"] and fwd["u_b"] == rev["u_a"]
    assert abs(fwd["z_stat"] + rev["z_stat"]) < 2e-6


@given(
    a=st.lists(
        st.integers(min_value=-20, max_value=20), min_size=1, max_size=15
    ),
    b=st.lists(
        st.integers(min_value=-20, max_value=20), min_size=1, max_size=15
    ),
)
@settings(**SETTINGS)
def test_ks_stat_bounds_and_identical_zero(spark, a, b):
    """0 <= D <= 1 always; D == 0 iff the two samples have identical
    ECDFs (checked via the identical-sample case)."""
    from timeseries_spark.extensions.dataquality import ks_two_sample

    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    assert 0.0 <= got["ks_stat"] <= 1.0
    same = spark.createDataFrame(
        [("a", float(v)) for v in a] + [("b", float(v)) for v in a],
        "g string, v double",
    )
    ident = ks_two_sample(same, "g", "v", "a", "b").collect()[0]
    assert ident["ks_stat"] == 0.0


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=3,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
@settings(**SETTINGS)
def test_theil_sen_shift_equivariance(spark, pts):
    """Adding a constant to every y leaves the slope unchanged and
    shifts the intercept by exactly that constant."""
    from timeseries_spark.operators.timeseries import theil_sen_trend

    base = [("k", x, float(y)) for x, y in pts]
    shifted = [("k", x, float(y) + 10.0) for x, y in pts]
    d1 = spark.createDataFrame(base, "k string, x int, y double")
    d2 = spark.createDataFrame(shifted, "k string, x int, y double")
    r1 = theil_sen_trend(d1, ["k"], "x", "y").collect()[0]
    r2 = theil_sen_trend(d2, ["k"], "x", "y").collect()[0]
    assert abs(r1["slope"] - r2["slope"]) < 2e-6
    assert abs((r2["intercept"] - r1["intercept"]) - 10.0) < 2e-6


@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=3,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_stl_identity_and_seasonal_periodicity(spark, vals):
    """For ANY series: value == trend + seasonal + residual exactly
    (the residual is defined as the difference), and the seasonal
    component takes at most `period` distinct values per key."""
    from timeseries_spark.operators.timeseries import stl_decompose

    rows = [("k", d + 1, float(v) / 4) for d, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, day int, v double")
    got = stl_decompose(df, ["k"], "day", "v", period=7, half_window=3)
    out = got.collect()
    assert len(out) == len(vals)
    for r in out:
        assert (
            abs(r["value"] - (r["trend"] + r["seasonal"] + r["residual"]))
            < 1e-9
        )
    assert len({r["seasonal"] for r in out}) <= 7


@given(
    prefix=st.lists(
        st.sampled_from("abcdefgh"), min_size=0, max_size=6
    ),
    suffix=st.lists(
        st.sampled_from("qrstuvwx"), min_size=0, max_size=6
    ),
    shared=st.lists(
        st.sampled_from("ijklmnop"), min_size=6, max_size=10
    ),
)
@settings(**SETTINGS)
def test_winnowing_shared_run_guarantee(spark, prefix, suffix, shared):
    """The winnowing guarantee: two docs sharing a run of at least
    k + window - 1 = 6 tokens ALWAYS share at least one fingerprint —
    for any surrounding context."""
    from timeseries_spark.extensions.dedup import winnow_pairs

    d1 = " ".join(prefix + shared)
    d2 = " ".join(shared + suffix)
    df = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id bigint, text string"
    )
    pairs = winnow_pairs(
        df, k=3, window=4, min_shared=1, max_doc_freq=10
    ).collect()
    assert any(r["doc_a"] == 1 and r["doc_b"] == 2 for r in pairs)


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["x", "y", "z"]),
            st.lists(
                st.sampled_from("abcdef"), min_size=1, max_size=5
            ),
        ),
        min_size=2,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_token_label_mi_nonnegative(spark, docs):
    """Mutual information is non-negative for every token on any
    corpus (up to the 6dp output rounding)."""
    from timeseries_spark.extensions.text import token_label_mi

    rows = [
        (i, lbl, " ".join(toks)) for i, (lbl, toks) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = token_label_mi(df, top_k=50).collect()
    assert all(r["mi_nats"] >= -1e-6 for r in out)
