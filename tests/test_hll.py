"""Portable HyperLogLog: register state and estimate pinned against an
independent Python implementation of the same layout (md5 60-bit hash,
P=8, rho = 53 - bitlength), plus the merge and accuracy contracts."""

import hashlib
import math

from vector_db_from_scratch_spark.operators.hll import (
    ALPHA_M,
    LC_THRESHOLD,
    M,
    TWO52,
    hll_by_group,
    hll_distinct,
    hll_merge_shards,
)


def _py_hll(values):
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        j = h // TWO52
        w = h % TWO52
        rho = 53 if w == 0 else 53 - w.bit_length()
        regs[j] = max(regs.get(j, 0), rho)
    obs = len(regs)
    v_zero = M - obs
    z = float(v_zero) + sum(1.0 / (1 << r) for r in regs.values())
    raw = ALPHA_M * float(M * M) / z
    if raw <= LC_THRESHOLD and v_zero > 0:
        est = float(M) * math.log(float(M) / v_zero)
    else:
        est = raw
    return regs, round(est, 6)


def test_hll_distinct_matches_python_reference(spark, sf_dir):
    row = hll_distinct(spark, sf_dir).collect()[0]
    users = [
        r["user_id"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .collect()
    ]
    regs, est = _py_hll(users)
    assert row["m"] == M
    assert row["obs"] == len(regs)
    assert row["reg_fingerprint"] == sum((j + 1) * r for j, r in regs.items())
    assert row["v_zero"] == M - len(regs)
    assert abs(row["est_distinct"] - est) < 1e-9
    assert row["exact_distinct"] == len(set(users))
    # documented accuracy: ~1.04/sqrt(256) = 6.5% sigma; LC mode is tighter
    assert row["rel_err"] < 0.2


def test_hll_merge_of_shards_equals_whole(spark, sf_dir):
    row = hll_merge_shards(spark, sf_dir).collect()[0]
    assert row["register_diff_rows"] == 0
    assert row["sketch_equal"] is True
    assert row["merged_obs"] == row["whole_obs"]
    assert row["merged_reg_fingerprint"] == row["whole_reg_fingerprint"]
    assert row["merged_est"] == row["whole_est"]
    # shards genuinely split the registers (strictly more shard-register
    # rows than merged registers would be vacuous otherwise)
    assert row["shard_register_rows"] >= row["merged_obs"]


def test_hll_by_group_covers_groups_and_is_accurate(spark, sf_dir):
    rows = hll_by_group(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg({"user_id": "approx_count_distinct"})
        .withColumnRenamed("approx_count_distinct(user_id)", "n")
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.selectExpr("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert {r["event_type"] for r in rows} == set(want)
    for r in rows:
        assert r["exact_distinct"] == exact[r["event_type"]]
        assert r["rel_err"] < 0.2
        # each group's sketch is the python reference of that group's users
        users = [
            x["user_id"]
            for x in ev.filter(ev.event_type == r["event_type"])
            .select("user_id")
            .collect()
        ]
        regs, est = _py_hll(users)
        assert r["obs"] == len(regs)
        assert abs(r["est_distinct"] - est) < 1e-9


def test_hll_set_ops_inclusion_exclusion_and_union_dominance(spark, sf_dir):
    from vector_db_from_scratch_spark.operators.hll import hll_set_ops

    row = hll_set_ops(spark, sf_dir).collect()[0]
    # inclusion-exclusion identity holds exactly on the reported estimates
    assert row["inter_est"] == round(
        row["a_est"] + row["b_est"] - row["union_est"], 6
    )
    # union registers dominate element-wise, so observed count can't shrink
    assert row["u_obs"] >= max(row["a_obs"], row["b_obs"])
    assert row["exact_union"] >= row["exact_inter"] >= 0


def test_hll_stream_drain_equals_batch_registers(spark, sf_dir):
    from vector_db_from_scratch_spark.operators.hll import _registers
    from vector_db_from_scratch_spark.functions.hashing import hash60
    from vector_db_from_scratch_spark.streaming.windows import hll_ingest_drained
    from pyspark.sql import functions as F

    drained = [(r["j"], r["reg"]) for r in hll_ingest_drained(spark, sf_dir).collect()]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = (
        _registers(ev.select(hash60(F.col("user_id").cast("string")).alias("h")))
        .orderBy("j")
        .collect()
    )
    assert drained == [(r["j"], r["reg"]) for r in batch]
    assert len(drained) <= 256
