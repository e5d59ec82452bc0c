"""Cross-engine hash parity: the md5-derived 60-bit hash must be identical
in Spark and DuckDB -- every dedup operator depends on it."""

import duckdb
from pyspark.sql import functions as F

from vector_db_from_scratch_spark.functions.hashing import (
    hash31,
    hash31_sql,
    hash60,
    hash60_sql,
    minhash_params,
)

SAMPLES = ["abc", "hello world", "", "Ünïcode ẞtring", "a" * 500]


def test_hash60_matches_duckdb(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    got = [r["h"] for r in df.select(hash60(F.col("s")).alias("h")).collect()]
    want = [
        duckdb.sql(f"SELECT {hash60_sql('?')}", params=[s]).fetchone()[0]
        for s in SAMPLES
    ]
    assert got == want


def test_hash31_in_range(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    got = [r["h"] for r in df.select(hash31(F.col("s")).alias("h")).collect()]
    want = [
        duckdb.sql(f"SELECT {hash31_sql('?')}", params=[s]).fetchone()[0]
        for s in SAMPLES
    ]
    assert got == want
    assert all(0 <= h < 2**31 for h in got)


def test_minhash_params_deterministic():
    assert minhash_params(4) == minhash_params(4)
    assert len({p for p in minhash_params(12)}) == 12
    assert all(a >= 1 for a, _ in minhash_params(12))
