"""Declarative data-quality constraint suite (Deequ-style), compiled to
a SINGLE aggregate scan.

A 100 TB ingestion pipeline wants its validation pass to cost one read:
every declared constraint — completeness, uniqueness, bounds, set
membership, row count — lowers to an aggregate expression over the same
``groupBy().agg(...)`` so the whole suite is ONE scan + ONE single-row
reduce (the only SinglePartition exchange carries |constraints| partial
aggregates, never data rows). Referential-integrity checks are the one
shape that genuinely needs a second input; they compile to a left-anti
equi join whose violation COUNT reduces map-side before the final
single-row union.

The output is the long-form report a quality dashboard ingests:
``(check_name, metric, threshold, passed)`` — one row per declared
constraint, metric rounded to 6dp so cross-engine replay is exact.

The reference has no validation surface at all (its scripts trust their
inputs; cf. the unchecked ``os.path.exists`` on gs:// discussed in
SURVEY §2.1/S9) — this is part of the beyond-parity training-pipeline
layer, modeled on the public Deequ/Great-Expectations check taxonomy.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


@dataclass(frozen=True)
class Check:
    """One declared constraint: ``name`` labels the report row,
    ``metric`` is the aggregate expression evaluated in the shared
    single-pass agg, ``passed`` is a predicate over that metric's
    value. ``threshold`` is echoed into the report for dashboards."""

    name: str
    metric: Column
    threshold: float
    # direction: metric >= threshold passes when ge=True, else <=
    ge: bool = True


def completeness(col: str, min_ratio: float = 1.0) -> Check:
    """Fraction of rows with a non-null ``col`` (0.0 for an empty
    input, which fails any positive threshold — loud, not vacuous)."""
    m = F.coalesce(
        F.avg(F.when(F.col(col).isNotNull(), 1.0).otherwise(0.0)), F.lit(0.0)
    )
    return Check(f"completeness({col})", m, min_ratio)


def uniqueness(col: str, min_ratio: float = 1.0) -> Check:
    """count(distinct col) / count(col) over non-null values."""
    m = F.when(F.count(col) == 0, 0.0).otherwise(
        F.countDistinct(col).cast("double") / F.count(col)
    )
    return Check(f"uniqueness({col})", m, min_ratio)


def uniqueness_approx(col: str, min_ratio: float = 0.95) -> Check:
    """approx_count_distinct(col) / count(col) — the STREAMABLE twin of
    ``uniqueness`` (exact distinct aggregation is not supported on
    streaming DataFrames; HLL merges are). Default threshold leaves
    headroom for the sketch's ~2% relative error; at small
    cardinalities the sketch is exact."""
    m = F.when(F.count(col) == 0, 0.0).otherwise(
        F.approx_count_distinct(col).cast("double") / F.count(col)
    )
    return Check(f"uniqueness_approx({col})", m, min_ratio)


def min_value(col: str, at_least: float) -> Check:
    """Empty input yields a NULL metric, which ``run_checks`` reports
    as passed=false (the NULL metric is kept — it tells the dashboard
    WHY: no rows, vs. a real bound violation)."""
    return Check(f"min({col})", F.min(col).cast("double"), at_least)


def max_value(col: str, at_most: float) -> Check:
    """Empty-input contract as ``min_value``: NULL metric, passed=false."""
    return Check(f"max({col})", F.max(col).cast("double"), at_most, ge=False)


def in_set(col: str, allowed: Sequence[str], min_ratio: float = 1.0) -> Check:
    """Fraction of rows whose ``col`` is one of ``allowed`` (nulls
    count as violations — declare a separate completeness check if
    nulls are legal)."""
    m = F.coalesce(
        F.avg(F.when(F.col(col).isin(list(allowed)), 1.0).otherwise(0.0)),
        F.lit(0.0),
    )
    return Check(f"in_set({col})", m, min_ratio)


def row_count(at_least: int) -> Check:
    return Check("row_count", F.count(F.lit(1)).cast("double"), float(at_least))


def matches_regex(col: str, pattern: str, min_ratio: float = 1.0) -> Check:
    m = F.coalesce(
        F.avg(
            F.when(F.col(col).rlike(pattern), 1.0).otherwise(0.0)
        ),
        F.lit(0.0),
    )
    return Check(f"matches({col})", m, min_ratio)


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Compile every declared check into ONE aggregate pass and return
    the long-form report. The wide→long unpivot happens on the single
    aggregated row (|constraints| columns), so it is free at any scale.
    """
    if not checks:
        raise ValueError("run_checks requires at least one Check")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {sorted(names)}")
    agged = df.agg(
        *[c.metric.cast("double").alias(f"__m{i}") for i, c in enumerate(checks)]
    )
    rows = [
        F.struct(
            F.lit(c.name).alias("check_name"),
            (F.round(F.col(f"__m{i}"), 6)).alias("metric"),
            F.lit(float(c.threshold)).alias("threshold"),
            # NULL metric (e.g. min/max over zero rows) must FAIL, not
            # propagate NULL — the suite's empty-input loud-fail contract
            F.coalesce(
                (
                    F.col(f"__m{i}") >= F.lit(float(c.threshold))
                    if c.ge
                    else F.col(f"__m{i}") <= F.lit(float(c.threshold))
                ),
                F.lit(False),
            ).alias("passed"),
        )
        for i, c in enumerate(checks)
    ]
    return agged.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.check_name", "r.metric", "r.threshold", "r.passed")


def referential_check(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    """Referential integrity as a report row: count of non-null child
    keys with no matching parent (left-anti equi join — at 100 TB both
    sides shuffle on the key once; no broadcast assumption because the
    parent of a fact table is routinely large too). Passes iff zero
    orphans. Same report schema as ``run_checks`` so callers union."""
    label = name or f"referential({child_key})"
    orphans = (
        child.where(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            on=child_key,
            how="left_anti",
        )
        .agg(F.count(F.lit(1)).cast("double").alias("__m"))
    )
    return orphans.select(
        F.lit(label).alias("check_name"),
        F.round(F.col("__m"), 6).alias("metric"),
        F.lit(0.0).alias("threshold"),
        (F.col("__m") <= 0.0).alias("passed"),
    )


def key_skew_report(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Join/aggregation-key skew audit — the pre-flight a 100 TB
    pipeline runs before keying a shuffle on a column: per key column,
    row count, distinct count, the heaviest key with its frequency, and
    ``skew_ratio`` = top count / mean count (1.0 = perfectly uniform;
    the salting threshold in operators/skew.py is typically ~8-10).

    One groupBy per audited column (each scan prunes to that single
    column) and a TakeOrdered top-1 — no column's histogram is ever
    collected. Ties on the top count break to the LARGEST key string
    (struct-max ordering) so the report is deterministic."""
    if not key_cols:
        raise ValueError("key_skew_report requires at least one key column")
    parts = []
    for c in key_cols:
        per_key = (
            df.select(F.col(c).cast("string").alias("k"))
            .where(F.col("k").isNotNull())
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        stats = per_key.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.max(F.struct(F.col("n"), F.col("k"))).alias("top"),
        )
        parts.append(
            stats.select(
                F.lit(c).alias("key_col"),
                "n_rows",
                "n_distinct",
                F.col("top.k").alias("top_key"),
                F.col("top.n").cast("bigint").alias("top_count"),
                # the ratio is computed in floating point: top_count *
                # n_distinct as bigint*bigint wraps silently in
                # non-ANSI Spark at the scales this report targets
                # (top_count ~1e9 x ~1e10 distinct keys > 2^63)
                F.round(
                    F.col("top.n").cast("double")
                    * F.col("n_distinct").cast("double")
                    / F.col("n_rows").cast("double"),
                    4,
                ).alias("skew_ratio"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def gini_by_group(
    df: DataFrame,
    group_cols,
    unit_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group Gini concentration of ``value_col`` across units —
    the inequality audit (0 = uniform, →1 = one unit holds everything)
    a pipeline runs over revenue-per-customer, tokens-per-source,
    bytes-per-shard. Uses the exact rank formula over ascending values

        G = 2·Σᵢ i·yᵢ / (n·Σ yᵢ) − (n+1)/n

    with the total order (value, unit) making ranks — and therefore G —
    engine-deterministic under ties. Values are summed in
    DECIMAL(18,2) (exact, order-independent) per unit first; the rank
    window and the i·yᵢ sum run at unit grain WITHIN each group (the
    group is the window partition, never a global window), and the
    final expression is double arithmetic over exact decimal sums.
    Returns (groups…, n_units, total_value, gini 6dp). Negative values
    violate the Lorenz construction and raise at runtime via an ANSI
    guard column instead of emitting a silently-wrong coefficient."""
    groups = list(group_cols)
    per_unit = (
        df.select(
            *groups,
            F.col(unit_col).alias("unit"),
            F.col(value_col).cast("decimal(18,2)").alias("v"),
        )
        .groupBy(*groups, "unit")
        .agg(F.sum("v").alias("y"))
    )
    # the negative-value guard is folded INTO the ranked value (not a
    # side column): an unused guard aggregate would be pruned by
    # Catalyst and never evaluated
    guarded_y = F.when(
        F.col("y") < 0,
        F.raise_error(
            F.concat(
                F.lit("gini_by_group: negative unit total for unit "),
                F.col("unit").cast("string"),
            )
        ).cast("decimal(18,2)"),
    ).otherwise(F.col("y"))
    w = Window.partitionBy(*groups).orderBy("y", "unit")
    ranked = per_unit.withColumn("i", F.row_number().over(w)).withColumn(
        "y", guarded_y
    )
    agg = ranked.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum("y").alias("sy"),
        F.sum(F.col("i").cast("decimal(20,0)") * F.col("y")).alias("siy"),
    )
    n = F.col("n_units").cast("double")
    return agg.select(
        *groups,
        "n_units",
        F.col("sy").cast("double").alias("total_value"),
        F.round(
            2.0 * F.col("siy").cast("double") / (n * F.col("sy").cast("double"))
            - (n + 1.0) / n,
            6,
        ).alias("gini"),
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic between two
    groups — the A/B metric comparison that does not assume equal
    variances (Welch 1947, public). Returns ONE row (n_a, n_b, mean_a,
    mean_b, mean_diff, t_stat, dof) with the Welch–Satterthwaite
    degrees of freedom; statistics snapped at 1e-6 (the moment sums
    are order-dependent doubles; the snap absorbs last-ulp drift, the
    standardize/acf idiom).

    One filtered scan → one two-row aggregate (count/sum/sumsq per
    group, map-side combined) → a single-row expression. Degenerate
    inputs fail LOUD, not wrong: fewer than 2 samples in either group
    or two exactly-constant groups raise at runtime via an ANSI guard
    folded into the statistic (an unused guard column would be pruned
    by Catalyst)."""
    stats = (
        df.where(F.col(group_col).isin([group_a, group_b]))
        .groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.col(value_col).cast("double")).alias("s"),
            F.sum(
                F.col(value_col).cast("double")
                * F.col(value_col).cast("double")
            ).alias("ss"),
        )
    )
    one = stats.groupBy().pivot("g", [group_a, group_b]).agg(
        F.first("n").alias("n"), F.first("s").alias("s"),
        F.first("ss").alias("ss"),
    )
    snap6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("double") / 1e6  # noqa: E731
    # a group absent from the input pivots to NULL n/s/ss; NULL would
    # make the guard predicate itself NULL (falls through to
    # otherwise(0.0)) and the function would silently return all-NULL —
    # coalesce to 0.0 so the n<2 guard fires loudly instead
    na = F.coalesce(F.col(f"{group_a}_n"), F.lit(0.0))
    nb = F.coalesce(F.col(f"{group_b}_n"), F.lit(0.0))
    ma = F.coalesce(F.col(f"{group_a}_s"), F.lit(0.0)) / F.greatest(
        na, F.lit(1.0)
    )
    mb = F.coalesce(F.col(f"{group_b}_s"), F.lit(0.0)) / F.greatest(
        nb, F.lit(1.0)
    )
    # unbiased sample variance from the raw moments; denominators are
    # clamped so the n<2 case reaches the EXPLICIT guard below instead
    # of an anonymous ANSI DIVIDE_BY_ZERO
    va = (
        F.coalesce(F.col(f"{group_a}_ss"), F.lit(0.0)) - na * ma * ma
    ) / F.greatest(na - 1, F.lit(1.0))
    vb = (
        F.coalesce(F.col(f"{group_b}_ss"), F.lit(0.0)) - nb * mb * mb
    ) / F.greatest(nb - 1, F.lit(1.0))
    # SE denominators are clamped like the variance ones: with na=0 the
    # raw va / na is an ANSI DIVIDE_BY_ZERO raised while evaluating the
    # guard's own predicate, i.e. before raise_error can fire
    sea = va / F.greatest(na, F.lit(1.0))
    seb = vb / F.greatest(nb, F.lit(1.0))
    bad = (na < 2) | (nb < 2) | (sea + seb <= 0)
    err = F.raise_error(
        F.lit(
            "welch_ttest: needs >=2 samples per group and non-zero "
            "combined variance"
        )
    ).cast("double")
    # divisions by sqrt(sea+seb) live in the otherwise() branch —
    # CaseWhen evaluates branches lazily, so the degenerate case reaches
    # the explicit error instead of an anonymous ANSI DIVIDE_BY_ZERO
    t = F.when(bad, err).otherwise((ma - mb) / F.sqrt(sea + seb))
    dof = F.when(bad, err).otherwise(
        (sea + seb)
        * (sea + seb)
        / (
            sea * sea / F.greatest(na - 1, F.lit(1.0))
            + seb * seb / F.greatest(nb - 1, F.lit(1.0))
        )
    )
    return one.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        snap6(ma).alias("mean_a"),
        snap6(mb).alias("mean_b"),
        snap6(ma - mb).alias("mean_diff"),
        snap6(t).alias("t_stat"),
        snap6(dof).alias("dof"),
    )


def _value_axis_cumulative(
    per_val: DataFrame,
    sum_cols: Sequence[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Distributed inclusive cumulative sums over the ordered value
    axis ``v`` — the scale-safe replacement for a partition-less
    ``Window.orderBy("v")`` (which funnels the whole value-grain table
    through ONE task when the metric is continuous).

    Shape: (1) approx-quantile boundaries over the distinct values
    (one tiny broadcast row — placement affects only load balance,
    never the result, so sketch merge-order nondeterminism is
    harmless); (2) monotone bucket id via a boundary-count fold;
    (3) per-BUCKET cumulative window (partitioned — parallel);
    (4) per-bucket totals packed into ONE sorted array whose prefix
    sums become bucket offsets via an O(B²) HOF over ≤``n_buckets``
    rows — no window, no collect; (5) broadcast the ≤B-row offsets
    back and add.  cum(v) = offset(bucket(v)) + local_cum(v) because
    bucketing is monotone in v and each distinct v lands in exactly
    one bucket.  Every exchange is keyed; B scales with the cluster,
    not the data.

    Single-scan contract: ``per_val`` must carry exactly ``v`` plus
    ``sum_cols``, and every branch here (bounds, window, per-bucket
    totals) references ALL of ``sum_cols`` — the bounds percentile
    adds a zero-weighted reference so column pruning cannot diverge
    the partial-aggregate subtrees, which lets AQE's exchange reuse
    collapse the branches onto ONE source scan + ONE value-grain
    shuffle (verified in the executed plan: 1 scan, 3 ReusedExchange)."""
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    # always-true data predicate (counts are >= 0, but Catalyst cannot
    # prove it, so the sum_cols references survive optimization — a
    # `+ 0 * c` term gets folded away and the branches diverge again)
    touch = F.lit(0)
    for c in sum_cols:
        touch = touch + F.col(c)
    anchor = F.when(touch >= 0, F.col("v"))
    bounds = per_val.groupBy().agg(
        F.percentile_approx(
            anchor, F.array(*[F.lit(f) for f in fracs]), F.lit(10000)
        ).alias("_bounds")
    )
    bucketed = (
        per_val.crossJoin(F.broadcast(bounds))
        .withColumn(
            "_bkt",
            # coalesce: when EVERY pooled value is NULL the percentile
            # returns a NULL _bounds array and the fold yields NULL —
            # an un-coalesced NULL bucket id would silently DROP every
            # row at the offsets equi-join below, turning the degenerate
            # all-null input into an empty result instead of a row of
            # NULL statistics
            F.coalesce(
                F.aggregate(
                    "_bounds",
                    F.lit(0),
                    lambda acc, b: acc
                    + F.when(F.col("v") > b, 1).otherwise(0),
                ),
                F.lit(0),
            ),
        )
        .drop("_bounds")
    )
    w_loc = (
        Window.partitionBy("_bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in sum_cols:
        bucketed = bucketed.withColumn(f"_cum_{c}", F.sum(c).over(w_loc))
    per_bkt = bucketed.groupBy("_bkt").agg(
        *[F.sum(c).alias(f"_tot_{c}") for c in sum_cols]
    )
    packed = per_bkt.groupBy().agg(
        F.array_sort(
            F.collect_list(
                F.struct("_bkt", *[f"_tot_{c}" for c in sum_cols])
            )
        ).alias("_bks")
    )

    # closure factory — a default-arg lambda would bind the HOF's
    # second (index) parameter instead of the column name
    def _prefix(col_name):
        return lambda acc, y: acc + y[f"_tot_{col_name}"]

    offsets = (
        packed.select(
            F.explode(
                F.transform(
                    "_bks",
                    lambda x, i: F.struct(
                        x["_bkt"].alias("_bkt"),
                        *[
                            F.aggregate(
                                F.slice("_bks", F.lit(1), i),
                                F.lit(0).cast("bigint"),
                                _prefix(c),
                            ).alias(f"_off_{c}")
                            for c in sum_cols
                        ],
                    ),
                )
            ).alias("_o")
        )
        .select("_o.*")
    )
    out = bucketed.join(F.broadcast(offsets), "_bkt")
    for c in sum_cols:
        out = out.withColumn(
            f"_cum_{c}", F.col(f"_off_{c}") + F.col(f"_cum_{c}")
        )
    return out.drop("_bkt", *[f"_off_{c}" for c in sum_cols])


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    quantize_decimals: int | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between two groups — the
    distribution-free A/B test: U_a = R_a − n_a(n_a+1)/2 with R_a the
    tie-averaged rank sum of group a in the pooled ordering, plus the
    large-sample normal approximation z = (U_a − n_a·n_b/2) / σ_U
    WITHOUT tie correction (documented; exact for continuous metrics,
    conservative under heavy ties). Returns ONE row (n_a, n_b, u_a,
    u_b, z_stat 1e-6-snapped).

    Scale shape: ranks depend only on the VALUE order, so the pooled
    relation first collapses to per-distinct-value group counts (one
    hash aggregate); tie-averaged midranks are then cumulative counts
    over the DISTINCT-VALUE axis — midrank = below + (ties+1)/2,
    exact integers-or-halves in decimal — and the rank sum is
    Σ cnt_a·midrank. The cumulation is DISTRIBUTED via
    ``_value_axis_cumulative`` (quantile-bucketed local windows +
    broadcast bucket offsets — no partition-less window, so a
    continuous metric with distinct values ≈ rows still ranks in
    parallel). ``quantize_decimals`` remains available to shrink the
    value axis itself (the statistic is then exact for the quantized
    metric); ``n_buckets`` sizes the ranking parallelism."""
    v = F.col(value_col).cast("double")
    if quantize_decimals is not None:
        v = F.round(v, quantize_decimals)
    pooled = df.where(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).alias("g"),
        v.alias("v"),
    )
    per_val = pooled.groupBy("v").agg(
        F.count(F.when(F.col("g") == group_a, 1)).alias("ca"),
        F.count(F.when(F.col("g") == group_b, 1)).alias("cb"),
    )
    ranked = _value_axis_cumulative(per_val, ["ca", "cb"], n_buckets)
    cnt = (F.col("ca") + F.col("cb")).cast("decimal(20,1)")
    below = (
        F.col("_cum_ca") + F.col("_cum_cb") - F.col("ca") - F.col("cb")
    ).cast("decimal(20,1)")
    midrank = below + (cnt + 1) / 2
    agg = ranked.select(
        "ca", "cb", midrank.alias("mr")
    ).groupBy().agg(
        F.sum(F.col("ca").cast("decimal(20,1)") * F.col("mr")).alias("ra"),
        F.sum("ca").cast("double").alias("na"),
        F.sum("cb").cast("double").alias("nb"),
    )
    snap6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("double") / 1e6  # noqa: E731
    na, nb = F.col("na"), F.col("nb")
    # empty-group guard folded into the statistic (an unused guard
    # column would be pruned): a missing group is a caller bug, not a
    # z of 0
    guard = F.when(
        (na < 1) | (nb < 1),
        F.raise_error(
            F.lit("mann_whitney_u: both groups need at least one row")
        ).cast("double"),
    ).otherwise(F.lit(0.0))
    ua = F.col("ra").cast("double") - na * (na + 1) / 2 + guard
    ub = na * nb - ua
    sigma = F.sqrt(na * nb * (na + nb + 1) / 12)
    z = F.when(
        sigma > 0, (ua - na * nb / 2) / sigma
    ).otherwise(F.lit(0.0))
    return agg.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        ua.alias("u_a"),
        ub.alias("u_b"),
        snap6(z).alias("z_stat"),
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    quantize_decimals: int | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic D = max_v |ECDF_a(v) −
    ECDF_b(v)| — the distribution-shape A/B test completing the
    Welch (means) / Mann–Whitney (ranks) trio. Returns ONE row (n_a,
    n_b, ks_stat 6dp, ks_at — the value where the maximum gap occurs,
    smallest such value under ties, so the witness is deterministic).

    Same value-grain shape as the U statistic: one hash aggregate to
    per-distinct-value group counts, then DISTRIBUTED cumulative
    counts over the value axis via ``_value_axis_cumulative``
    (quantile-bucketed local windows + broadcast bucket offsets — no
    partition-less window; exact integer cumulative counts, so the
    ECDF difference is a ratio of exact ints, bit-identical across
    engines), one single-row argmax via max on a (gap, -value)
    struct. ``quantize_decimals`` optionally shrinks the value axis
    for continuous metrics (D of the quantized ECDFs differs from
    exact D by at most the ECDF mass inside one bin); ``n_buckets``
    sizes the ranking parallelism."""
    v = F.col(value_col).cast("double")
    if quantize_decimals is not None:
        v = F.round(v, quantize_decimals)
    pooled = df.where(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).alias("g"),
        v.alias("v"),
    )
    per_val = pooled.groupBy("v").agg(
        F.count(F.when(F.col("g") == group_a, 1)).alias("ca"),
        F.count(F.when(F.col("g") == group_b, 1)).alias("cb"),
    )
    cum = _value_axis_cumulative(per_val, ["ca", "cb"], n_buckets).select(
        "v",
        F.col("_cum_ca").alias("cca"),
        F.col("_cum_cb").alias("ccb"),
    )
    totals = per_val.groupBy().agg(
        F.sum("ca").cast("double").alias("na"),
        F.sum("cb").cast("double").alias("nb"),
    )
    # empty-group guard: the WHEN branch evaluates before the division
    # (an additive guard term would lose the race to ANSI
    # DIVIDE_BY_ZERO), so a missing group raises THIS message
    gaps = cum.crossJoin(F.broadcast(totals)).select(
        "v",
        "na",
        "nb",
        F.when(
            (F.col("na") < 1) | (F.col("nb") < 1),
            F.raise_error(
                F.lit("ks_two_sample: both groups need at least one row")
            ).cast("double"),
        )
        .otherwise(
            F.abs(
                F.col("cca") / F.col("na") - F.col("ccb") / F.col("nb")
            )
        )
        .alias("gap"),
    )
    agg = gaps.groupBy().agg(
        F.first("na").alias("na"),
        F.first("nb").alias("nb"),
        F.max(
            F.struct(F.col("gap"), (-F.col("v")).alias("neg_v"))
        ).alias("best"),
    )
    snap6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("double") / 1e6  # noqa: E731
    return agg.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        snap6(F.col("best.gap")).alias("ks_stat"),
        (-F.col("best.neg_v")).alias("ks_at"),
    )
