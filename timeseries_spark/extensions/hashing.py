"""Deterministic, engine-portable hashing primitives.

All dedup/fingerprint operators hash through md5 → first 15 hex digits →
60-bit bigint. md5 is identical everywhere, so every derived signature
(minhash, simhash, rolling fingerprints) is reproducible bit-for-bit in
any engine — which is what makes the DuckDB oracles exact instead of
approximate. Spark's native ``hash``/``xxhash64`` would be faster but
engine-private; swap via ``hash64 = F.xxhash64`` when cross-engine
reproducibility isn't required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD_PRIME = 1_000_000_007


def md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_long_sql(expr: str) -> str:
    """DuckDB spelling of :func:`md5_long` (kept adjacent so they evolve
    together)."""
    return f"('0x' || substring(md5({expr}), 1, 15))::BIGINT"


def md5_h1(col: Column) -> Column:
    """md5 hex digits 1-13 as a 52-bit bigint (double-hashing base)."""
    return F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast("bigint")


def md5_h2(col: Column) -> Column:
    """md5 hex digits 14-26 as a 52-bit bigint (double-hashing step).

    ``h_i(s) = h1(s) + i * h2(s)`` (Kirsch-Mitzenmacher) gives ``i``
    independent-enough hash functions from ONE md5 evaluation — the
    standard trick that makes a 32-hash MinHash signature cost one digest
    per shingle instead of 32. Both halves are < 2^52, so
    ``h1 + 31 * h2 < 2^58`` never overflows bigint in any engine."""
    return F.conv(F.substring(F.md5(col), 14, 13), 16, 10).cast("bigint")


def md5_h1_sql(expr: str) -> str:
    return f"('0x' || substring(md5({expr}), 1, 13))::BIGINT"


def md5_h2_sql(expr: str) -> str:
    return f"('0x' || substring(md5({expr}), 14, 13))::BIGINT"


def rolling_fingerprint(tokens: Column) -> Column:
    """Order-sensitive polynomial rolling hash over a token array:
    ``acc = (acc * 31 + md5_long(token)) % 1e9+7`` folded left.

    A content fingerprint that distinguishes permutations (unlike bag-of-
    words hashes); stays in one HOF pass, no shuffle.
    """
    return F.aggregate(
        tokens,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * 31 + md5_long(t)) % MOD_PRIME,
    )


def rolling_fingerprint_sql(tokens_expr: str) -> str:
    """DuckDB left-fold equivalent (list_reduce needs the seed prepended)."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform({tokens_expr}, "
        f"t -> {md5_long_sql('t')})), (acc, x) -> (acc * 31 + x) % {MOD_PRIME})"
    )
