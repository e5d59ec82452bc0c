"""Portable deterministic hashing: identical values in Spark and DuckDB.

Spark's builtin ``hash()`` (murmur3) and DuckDB's ``hash()`` disagree, so
every hash that must survive the oracle comparison is derived from md5 hex
(identical in both engines): the first 15 hex digits as a non-negative
60-bit BIGINT.

  Spark : conv(substr(md5(s), 1, 15), 16, 10)::bigint
  DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

Verified bit-equal across engines (tests/test_hashing.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31 - 1; reduce 60-bit hashes into a range safe for index-weighted sums
MERSENNE31 = 2_147_483_647


def hash60(c: Column) -> Column:
    """Non-negative 60-bit hash of a string column, portable across engines."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """DuckDB fragment computing the same value as :func:`hash60`."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def hash31(c: Column) -> Column:
    return hash60(c) % MERSENNE31


def hash31_sql(expr: str) -> str:
    return f"({hash60_sql(expr)} % {MERSENNE31})"


def minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash family
    h_j(x) = (a_j * x + b_j) mod MERSENNE31, generated with a seeded LCG so
    the Spark pipeline and the generated oracle SQL share the exact family.
    """
    params = []
    state = seed
    for _ in range(num_hashes):
        # Numerical Recipes LCG constants; only determinism matters here
        state = (state * 1664525 + 1013904223) % (1 << 32)
        a = state % (MERSENNE31 - 1) + 1
        state = (state * 1664525 + 1013904223) % (1 << 32)
        b = state % MERSENNE31
        params.append((a, b))
    return params
