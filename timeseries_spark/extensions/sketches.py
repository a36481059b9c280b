"""Engine-reproducible approximate-distinct sketches.

At 100 TB, exact distinct counts (A3) shuffle every value to its group;
the scalable alternative is a mergeable sketch. Spark's builtin
``approx_count_distinct`` is a black-box HLL++ whose registers are
engine-private — fine for one engine, but unauditable and impossible to
cross-check. This HyperLogLog derives its registers from the same md5
discipline as the dedup/sampling operators (``hashing.md5_long``), so
the sketch — registers AND estimate — is bit-reproducible on any engine:
the DuckDB oracle replays it exactly, and two systems hashing the same
corpus produce byte-identical sketches that merge by register-max.

Register math (classic Flajolet HLL with linear-counting small-range
correction): h = 60-bit md5; the top ``p`` bits pick one of m = 2^p
registers; rho = position of the first 1-bit in the remaining 60-p bits
(bit length via ``bin()``, identical in Spark and DuckDB — no float
log2 edge); each register keeps max(rho). Estimate = alpha_m * m^2 /
sum(2^-M_j) with empty registers contributing 2^0, switching to
m * ln(m / zeros) when E <= 2.5m and zeros > 0.

Determinism discipline: the only float reduction (sum of 2^-M_j) folds
a register array SORTED by register id — aggregation order, the one
distributed-sum nondeterminism, is pinned — and the estimate rounds to
2dp. Plan shape: one (keys, register) groupBy whose output is at most
m rows per group, then a per-key fold over the broadcastably-tiny
register set — the value stream is touched once and never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_spark.extensions.hashing import md5_long
from timeseries_spark.functions.inline import inline_rows

_HASH_BITS = 60


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    if m == 64:
        return 0.709
    if m == 32:
        return 0.697
    return 0.673


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 8,
) -> DataFrame:
    """The mergeable sketch: (group_cols..., reg, max_rho) — at most
    2^p rows per group. Two sketches over different shards merge by
    ``groupBy(reg).agg(max(max_rho))``; the estimate is a pure function
    of this table."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    rem_bits = _HASH_BITS - p
    h = md5_long(F.col(value_col).cast("string"))
    reg = F.shiftright(h, rem_bits).cast("int")
    rem = h.bitwiseAND(F.lit((1 << rem_bits) - 1))
    # rho = leading zeros in the rem_bits-wide remainder + 1; bin() gives
    # the bit length of a positive bigint identically in both engines
    rho = F.when(
        rem > 0, F.lit(rem_bits) - F.length(F.bin(rem)) + 1
    ).otherwise(F.lit(rem_bits + 1))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: tuple[str, ...] = (),
    p: int = 8,
) -> DataFrame:
    """Fold a register table to the distinct-count estimate per group.
    Output: (group_cols..., hll_est 2dp). The fold sorts registers by id
    so the float sum has one order in every engine."""
    m = 1 << p
    alpha = _alpha(m)
    rs = F.array_sort(F.collect_list(F.struct("reg", "max_rho")))
    present = F.size(F.col("__rs"))
    sumpow = F.aggregate(
        F.col("__rs"),
        F.lit(0.0),
        lambda a, t: a + F.pow(F.lit(2.0), -t["max_rho"].cast("double")),
    ) + (F.lit(m) - present).cast("double")  # empty registers add 2^0
    zeros = (F.lit(m) - present).cast("double")
    raw = F.lit(alpha * m * m) / sumpow
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return (
        registers.groupBy(*group_cols)
        .agg(rs.alias("__rs"))
        .select(*group_cols, F.round(est, 2).alias("hll_est"))
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 8,
) -> DataFrame:
    """Approximate distinct count of ``value_col`` per group — relative
    error ~1.04/sqrt(2^p) (~6.5% at p=8), reproducible to the bit on
    any engine. NULL values are excluded (matching COUNT(DISTINCT))."""
    return hll_estimate(
        hll_registers(df, value_col, group_cols, p), group_cols, p
    )


def hll_sql(
    value_expr: str, group_by: str, source: str, p: int = 8
) -> str:
    """DuckDB replay of registers + estimate (kept adjacent to the Spark
    implementation so the two evolve together)."""
    from timeseries_spark.extensions.hashing import md5_long_sql

    m = 1 << p
    alpha = _alpha(m)
    rem_bits = _HASH_BITS - p
    mask = (1 << rem_bits) - 1
    h = md5_long_sql(f"CAST({value_expr} AS VARCHAR)")
    return f"""
    WITH hashed AS (
      SELECT {group_by} AS grp,
             CAST(({h}) >> {rem_bits} AS INT) AS reg,
             ({h}) & {mask} AS rem
      FROM {source}
      WHERE {value_expr} IS NOT NULL
    ),
    regs AS (
      SELECT grp, reg,
             max(CASE WHEN rem > 0
                      THEN {rem_bits} - length(bin(rem)) + 1
                      ELSE {rem_bits + 1} END) AS max_rho
      FROM hashed GROUP BY grp, reg
    ),
    folded AS (
      SELECT grp,
             list(struct_pack(reg := reg, max_rho := max_rho)
                  ORDER BY reg, max_rho) AS rs
      FROM regs GROUP BY grp
    ),
    est AS (
      SELECT grp, len(rs) AS present,
             list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(rs, t -> power(2.0, -CAST(t.max_rho AS DOUBLE)))),
               (a, b) -> a + b)
             + ({m} - len(rs)) AS sumpow
      FROM folded
    )
    SELECT grp, round(CASE
      WHEN (({alpha}::DOUBLE) * {m} * {m} / sumpow) <= 2.5 * {m}
           AND ({m} - present) > 0
      THEN {m}.0::DOUBLE * ln({m}.0 / ({m} - present))
      ELSE ({alpha}::DOUBLE) * {m} * {m} / sumpow END, 2) AS hll_est
    FROM est
    """


def _km_positions(v, k: int, modulus: int) -> list:
    """The Kirsch-Mitzenmacher probe positions ``(h1 + i*h2) mod modulus``
    for i in [0, k) — ONE definition shared by the CMS counters/probes
    and the Bloom bits/probes so sketch and probe can never drift (the
    DuckDB oracle spellings mirror this expression)."""
    from timeseries_spark.extensions.hashing import md5_h1, md5_h2

    return [
        F.pmod(md5_h1(v) + i * md5_h2(v), F.lit(modulus)).cast("int")
        for i in range(k)
    ]


def cms_counters(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch: ``depth`` independent hash rows of ``width``
    counters — frequency estimation in fixed space (heavy-hitter /
    hot-token detection at corpus scale, where exact per-token counts
    are the full vocabulary). Output: (row, cell, n) — at most
    depth*width rows total, mergeable by summing counters.

    Hash family is Kirsch-Mitzenmacher over one md5 (h1 + row*h2, the
    same family as the MinHash signatures), so the sketch is
    integer-exact and bit-reproducible on any engine."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    v = F.col(value_col).cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(i).alias("row"), pos.alias("cell"))
            for i, pos in enumerate(_km_positions(v, depth, width))
        ]
    )
    return (
        df.filter(v.isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    queries: DataFrame,
    counters: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each query value's frequency: min over the depth
    counters its hashes land in (the CMS guarantee: est >= true count,
    overestimate bounded by collisions). The counter table broadcasts
    (depth*width rows); the min folds per value."""
    v = F.col(value_col).cast("string")
    probes = queries.select(
        F.col(value_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row"), pos.alias("cell"))
                    for i, pos in enumerate(_km_positions(v, depth, width))
                ]
            )
        ).alias("c"),
    ).select(value_col, F.col("c.row").alias("row"), F.col("c.cell").alias("cell"))
    return (
        probes.join(F.broadcast(counters), ["row", "cell"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("cms_est"))
    )


def bloom_bits(
    df: DataFrame,
    value_col: str,
    m_bits: int = 4096,
    k_hashes: int = 5,
) -> DataFrame:
    """Bloom filter as a table of SET BIT positions (distinct, at most
    ``m_bits`` rows — the broadcastable form): bit ``(h1 + i*h2) mod m``
    set for each of the ``k_hashes`` hash functions. The membership
    pre-filter for incremental dedup: a new doc probing all-set bits is
    a MAYBE (confirm exactly), any unset bit is a definite NO (skip the
    expensive check) — zero false negatives by construction. Integer
    md5 math: the same filter bits on any engine."""
    if m_bits < 1 or k_hashes < 1:
        raise ValueError(
            f"m_bits/k_hashes must be >= 1, got {m_bits}/{k_hashes}"
        )
    v = F.col(value_col).cast("string")
    bits = F.array(*_km_positions(v, k_hashes, m_bits))
    return (
        df.filter(v.isNotNull())
        .select(F.explode(bits).alias("bit"))
        .distinct()
    )


def bloom_maybe(
    df: DataFrame,
    bloom: DataFrame,
    value_col: str,
    m_bits: int = 4096,
    k_hashes: int = 5,
) -> DataFrame:
    """Probe the filter: adds ``bloom_maybe`` (true iff ALL k bit
    positions are set). One broadcast left join per hash function
    against the (distinct) bit table, AND-folded — row-preserving, so
    duplicate input rows (the pre-dedup ingest stream) pass through
    unchanged, unlike an explode + group-by-all-columns reassembly
    which would silently collapse them."""
    v = F.col(value_col).cast("string")
    out = df
    flags = []
    for i, pos in enumerate(_km_positions(v, k_hashes, m_bits)):
        b_i = bloom.select(
            F.col("bit").alias(f"__b{i}")
        ).withColumn(f"__s{i}", F.lit(1))
        out = out.join(
            F.broadcast(b_i), pos == F.col(f"__b{i}"), "left"
        ).drop(f"__b{i}")
        flags.append(F.col(f"__s{i}").isNotNull())
    maybe = flags[0]
    for fl in flags[1:]:
        maybe = maybe & fl
    return out.withColumn("bloom_maybe", maybe).drop(
        *[f"__s{i}" for i in range(k_hashes)]
    )


def profile_columns(
    df: DataFrame, columns: tuple[str, ...]
) -> DataFrame:
    """Single-pass column profile — the data-quality report a pipeline
    runs before trusting a 100 TB table: per column, row/null counts,
    exact distinct count, and min/max (as strings, so one long-format
    schema covers every column type). ALL columns profile in ONE table
    scan, then unpivot to long rows. Honest scale note: the multiple
    exact DISTINCTs compile to an Expand, so the shuffled row count is
    ~rows x (distinct columns + 1) — the scan is single, the shuffle is
    not. When that bites, swap the exact distincts for
    :func:`hll_registers`-based estimates (fixed 2^p state per column,
    no expand). Output: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value), one row per profiled column."""
    if not columns:
        raise ValueError("columns must be non-empty")
    float_types = {"double", "float"}
    dtypes = dict(df.dtypes)

    def rendered(agg_col, c):
        # min/max on the NATIVE type (casting first would make numeric
        # ranges lexicographic), rendered AFTER: float/double go through
        # a fixed-scale decimal because engines disagree on raw
        # double-to-string (Spark '1.00000005E7' vs DuckDB '10000000.5')
        if dtypes.get(c) in float_types:
            return agg_col.cast("decimal(30,6)").cast("string")
        return agg_col.cast("string")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            rendered(F.min(F.col(c)), c).alias(f"__mn_{c}"),
            rendered(F.max(F.col(c)), c).alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def histogram_counts(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    keys: tuple = (),
) -> DataFrame:
    """Fixed-grid histogram: (keys..., bin, n) counts over ``[lo, hi)``
    with values clamped into the edge bins. The sketch is MERGEABLE —
    two shards' histograms combine by adding counts per (keys, bin) —
    which is what makes it the 100 TB quantile path: one
    map-side-combined groupBy whose output is ≤ n_bins rows per key,
    vs an exact quantile's full sort. NULLs are excluded (they have no
    place on the value axis)."""
    if n_bins < 1 or not hi > lo:
        raise ValueError(f"need hi > lo and n_bins >= 1, got [{lo}, {hi}) x {n_bins}")
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    b = F.floor((v - lo) / width).cast("int")
    b = F.when(b < 0, 0).when(b > n_bins - 1, n_bins - 1).otherwise(b)
    # NaN passes isNotNull and would land in bin 0 via the non-ANSI
    # int cast — it has no place on the value axis either
    return (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .select(*keys, b.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_quantiles(
    bins: DataFrame,
    qs: list,
    lo: float,
    hi: float,
    n_bins: int,
    keys: tuple = (),
) -> DataFrame:
    """Quantile estimates from a histogram sketch by within-bin linear
    interpolation: for target t = q·N, the first bin whose running
    count reaches t contributes est = lo + width·(bin + (t - cum_prev)
    / bin_n). Error is bounded by one bin width — the knob a pipeline
    turns is n_bins, not data volume. With ``keys`` the cumulative
    window partitions per key (fully parallel); unkeyed it runs over
    ≤ n_bins sketch rows, so its SinglePartition is as cheap as the SQ8
    stat rows. Every estimate is integer-count arithmetic in a fixed
    order — engine-exact."""
    from pyspark.sql import Window

    for q in qs:
        if not 0.0 < q <= 1.0:
            # q > 1 would silently vanish from the output (no bin's
            # running count ever reaches q·N) — fail loudly instead
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
    width = (hi - lo) / n_bins
    spark = bins.sparkSession
    if keys:
        w = Window.partitionBy(*keys).orderBy("bin").rowsBetween(
            Window.unboundedPreceding, 0
        )
        wt = Window.partitionBy(*keys)
    else:
        w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        wt = Window.partitionBy()
    # total as a window sum over the (tiny) sketch itself — a separate
    # aggregate would re-run the bins lineage, scanning the data twice
    cum = (
        bins.withColumn("total", F.sum("n").over(wt))
        .withColumn("cum", F.sum("n").over(w))
        .withColumn("cum_prev", F.col("cum") - F.col("n"))
    )
    qdf = inline_rows(spark, [(float(q),) for q in qs], "q double")
    est = (
        F.lit(lo)
        + F.lit(width)
        * (
            F.col("bin")
            + (F.col("q") * F.col("total") - F.col("cum_prev")) / F.col("n")
        )
    )
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.col("cum") >= F.col("q") * F.col("total"))
        .withColumn("est_raw", est)
    )
    return (
        hit.groupBy(*keys, "q")
        .agg(
            F.min_by(
                F.struct(
                    F.col("bin"),
                    (
                        F.floor(F.col("est_raw") * 10000 + F.lit(0.5)).cast(
                            "double"
                        )
                        / 10000
                    ).alias("est"),
                ),
                F.col("bin"),
            ).alias("pick")
        )
        .select(
            *keys,
            "q",
            F.col("pick.bin").alias("bin"),
            F.col("pick.est").alias("est"),
        )
    )
