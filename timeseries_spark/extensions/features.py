"""Per-entity feature extraction for downstream ML — the aggregate
feature-matrix step a training pipeline runs over behavioral / order
history (count, spend, tenure, linear trend) before model training.

Determinism across engines is the design constraint: every sum feeding
the least-squares slope runs in DECIMAL (exact, order-independent — a
double sum's value depends on partial-aggregation order, which no
rounding can fully mask), and the slope itself is then one double
expression over exact inputs, identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def trend_features(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key linear-trend feature row: (key, n, y_total, y_avg,
    x_first, x_last, slope) with slope the closed-form least-squares
    fit of y over integer x (0.0 for a single distinct x — a constant
    feature, not a NULL to poison downstream matrices).

    One key-grain shuffle; the moment sums (Σx, Σy, Σxy, Σx²) are
    map-side partial aggregates in decimal, so the feature matrix is
    bit-identical on any partitioning.

    Numeric contract: every x moment runs in DECIMAL, never bigint —
    for a natural generic x such as epoch seconds, x² ≈ 4e18 and a
    bigint Σx² silently wraps after a handful of rows in non-ANSI
    Spark, yielding a garbage slope with no error. In decimal the
    moments are exact for |x| ≤ ~1e9 (epoch-second scale) with up to
    ~1e9 rows per key (Σx² ≤ 4e27, n·Σx² and (Σx)² ≤ 4e36 < 10^38);
    beyond that decimal overflow surfaces as NULL, not a wrapped
    value. y is quantized to decimal(18,2) on entry — callers feeding
    finer-grained y should pre-round to 2 decimal places (the
    quantization is what makes Σy order-independent across engines)."""
    x = F.col("__x").cast("decimal(19,0)")
    y = F.col("__y").cast("decimal(18,2)")
    g = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(x_col).alias("__x"),
            F.col(y_col).alias("__y"),
        )
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(y).alias("sy"),
            # decimal(29,0): exact for any realistic key cardinality
            F.sum(x).alias("sx"),
            # x*x is decimal(38,0) — exact up to 10^38, vs bigint's
            # silent wrap at 9.2e18
            F.sum(x * x).alias("sxx"),
            F.sum(y * x).alias("sxy"),
            F.min(x).cast("int").alias("x_first"),
            F.max(x).cast("int").alias("x_last"),
        )
    )
    denom = (
        g["n"].cast("decimal(20,0)") * g["sxx"]
        - g["sx"] * g["sx"]
    )
    slope = F.when(denom == 0, F.lit(0.0)).otherwise(
        (
            g["n"].cast("double") * g["sxy"].cast("double")
            - g["sx"].cast("double") * g["sy"].cast("double")
        )
        / denom.cast("double")
    )
    # y_avg and slope are emitted as RAW doubles, not rounded: both
    # engines compute the identical IEEE result from the exact decimal
    # moment sums, whereas rounding them differs at half-way boundaries
    # (Spark rounds the shortest decimal rendering, DuckDB the binary
    # double — observed at sf0.01: sum 2250795.51 / 8 = .43875 exactly)
    return g.select(
        F.col("key").alias(key_col),
        "n",
        F.col("sy").cast("double").alias("y_total"),
        (g["sy"].cast("double") / g["n"]).alias("y_avg"),
        "x_first",
        "x_last",
        slope.alias("slope"),
    )
