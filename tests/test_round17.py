"""Round-17 pins.

VERDICT r16 item 8: the covariance kernel (batched X^T·X partial sums)
is the one kernel swap justified by 6dp-rounding headroom rather than
bit-identity — it needs an adversarial fixture showing the 6dp surface
is stable on ill-conditioned input, i.e. that batch-order summation and
the old sequential fold land on the same rounded covariance.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F


def _spark_round6(x: float) -> float:
    """Spark's F.round on doubles: BigDecimal.valueOf (shortest repr)
    then setScale(6, HALF_UP) — Decimal(repr(x)) replays it exactly."""
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def test_covariance_kernel_6dp_stable_on_ill_conditioned_vectors(spark):
    """Adversarial fixture: per-dim magnitudes spanning 1e3 .. 1e-3,
    near-duplicate rows, an alternating-sign dim and a near-constant
    dim — the shapes that stress E[xy] − E[x]E[y] cancellation. The
    batched-matmul operator must agree at the 6dp surface with a
    driver-side SEQUENTIAL replay (one row at a time in input order,
    float64 — the old fold's op order)."""
    from timeseries_spark.extensions.embeddings import covariance_pairs

    dims, n = 8, 400
    mags = [1e3, 250.0, 1.0, 1e-3, 40.0, 7.5, 1e2, 0.02]

    def vec(r: int) -> list[float]:
        v = []
        for d in range(dims):
            base = mags[d]
            if d == 2:
                # alternating sign, near-cancelling mean
                x = base * (1.0 if r % 2 == 0 else -1.0) + r * 1e-7
            elif d == 3:
                # near-constant dim: variance ~1e-12 of the magnitude
                x = base + (r % 3) * 1e-9
            else:
                # near-duplicate pairs of rows (r, r+1 share the bulk)
                x = base * (1.0 + ((r // 2) % 17) * 1e-4) + (r % 2) * 1e-8
            v.append(float(x))
        return v

    rows = [(r, vec(r)) for r in range(n)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_pairs(df, dims).collect()
    }
    assert len(got) == dims * (dims + 1) // 2

    # sequential replay: accumulate row by row in input order
    sij = [[0.0] * dims for _ in range(dims)]
    si = [0.0] * dims
    for _, v in rows:
        for i in range(dims):
            si[i] += v[i]
            for j in range(i, dims):
                sij[i][j] += v[i] * v[j]
    for i in range(dims):
        for j in range(i, dims):
            want = _spark_round6(
                sij[i][j] / n - (si[i] / n) * (sj := si[j] / n)
            )
            assert got[(i, j)] == want, (i, j, got[(i, j)], want, sj)
