"""Count-min frequency sketch -- the third member of the deterministic
sketch toolkit (Bloom = membership, KMV = distinct count, CM = per-key
frequency), all built on the portable md5-derived hash so the sketch
STRUCTURES themselves hash-gate against DuckDB.

A d x w counter grid: every key increments one counter per row (bucket =
hash_i(key) mod w); a point query reads the MIN of its d counters --
never an underestimate, overestimate bounded by collisions (Cormode &
Muthukrishnan 2005). Build is d shuffled (row, bucket) partial-count
aggregates -- at most d*w counter rows leave each partition regardless
of corpus size, and grids from disjoint shards merge by cell-wise
addition: the frequency-rollup shape for heavy-key monitoring at 100 TB
(the exact per-key groupBy this approximates is what the sketch REPLACES
when the key space no longer fits anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash60_sql
from ..sources.tables import load_table

CM_DEPTH = 4
CM_WIDTH = 512
PROBE_MOD = 11  # probe users: user_id % PROBE_MOD == 0 (deterministic sample)


def _bucket_expr(key, i: int):
    return hash60(F.concat(key.cast("string"), F.lit(f"#cm{i}"))) % CM_WIDTH


def _bucket_sql(expr: str, i: int) -> str:
    hashed = hash60_sql(expr + f" || '#cm{i}'")
    return f"({hashed} % {CM_WIDTH})"


def _events_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select("user_id")


def cm_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The d x w counter grid over per-user event frequencies as a
    (row, bucket, counter) table, hash-gated: a wrong hash salt, modulus,
    or depth flips counters."""
    ev = _events_keyed(spark, sf_dir)
    cells = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket_expr(F.col("user_id"), i).alias("bucket"),
                    )
                    for i in range(CM_DEPTH)
                ]
            )
        ).alias("c")
    )
    return (
        cells.select("c.row", "c.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("counter"))
        .orderBy("row", "bucket")
    )


def cm_counters_oracle() -> str:
    cells = ", ".join(
        f"struct_pack(r := {i}, b := {_bucket_sql('user_id::VARCHAR', i)})"
        for i in range(CM_DEPTH)
    )
    return f"""
WITH cells AS (
  SELECT c.r AS row, c.b AS bucket
  FROM (SELECT unnest([{cells}]) AS c FROM events))
SELECT row, bucket, count(*) AS counter
FROM cells
GROUP BY row, bucket
ORDER BY row, bucket
""".strip()


N_SHARDS = 4


def cm_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability under the gate: build an independent d x w grid per
    disjoint shard (user_id % N_SHARDS), merge by CELL-WISE ADDITION (the
    CM merge rule), and emit the merged grid full-outer-joined with the
    whole-corpus grid cell by cell -- (row, bucket, merged_counter,
    whole_counter, diff). Every diff must be 0; a missing cell on either
    side coalesces to 0 and shows up as a nonzero diff. This gates the
    rollup protocol itself (shared salts, bucket alignment, additive
    merge), which is how per-shard frequency grids combine at 100 TB
    without the raw keys ever co-shuffling."""
    ev = _events_keyed(spark, sf_dir)
    cells = ev.select(
        (F.col("user_id") % N_SHARDS).alias("shard"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket_expr(F.col("user_id"), i).alias("bucket"),
                    )
                    for i in range(CM_DEPTH)
                ]
            )
        ).alias("c"),
    ).select("shard", "c.row", "c.bucket")
    shard_grids = cells.groupBy("shard", "row", "bucket").agg(
        F.count(F.lit(1)).alias("counter")
    )
    merged = shard_grids.groupBy("row", "bucket").agg(
        F.sum("counter").alias("merged_counter")
    )
    whole = cm_counters(spark, sf_dir).withColumnRenamed("counter", "whole_counter")
    return (
        merged.join(whole, ["row", "bucket"], "full_outer")
        .select(
            "row",
            "bucket",
            F.coalesce("merged_counter", F.lit(0)).alias("merged_counter"),
            F.coalesce("whole_counter", F.lit(0)).alias("whole_counter"),
            (
                F.coalesce("merged_counter", F.lit(0))
                - F.coalesce("whole_counter", F.lit(0))
            ).alias("diff"),
        )
        .orderBy("row", "bucket")
    )


def cm_merge_shards_oracle() -> str:
    cells = ", ".join(
        f"struct_pack(r := {i}, b := {_bucket_sql('user_id::VARCHAR', i)})"
        for i in range(CM_DEPTH)
    )
    return f"""
WITH cells AS (
  SELECT user_id % {N_SHARDS} AS shard, c.r AS row, c.b AS bucket
  FROM (SELECT user_id, unnest([{cells}]) AS c FROM events)),
shard_grids AS (
  SELECT shard, row, bucket, count(*) AS counter
  FROM cells GROUP BY shard, row, bucket),
merged AS (
  SELECT row, bucket, sum(counter) AS merged_counter
  FROM shard_grids GROUP BY row, bucket),
whole AS (
  SELECT c.r AS row, c.b AS bucket, count(*) AS whole_counter
  FROM (SELECT unnest([{cells}]) AS c FROM events)
  GROUP BY row, bucket)
SELECT coalesce(m.row, w.row) AS row,
       coalesce(m.bucket, w.bucket) AS bucket,
       coalesce(merged_counter, 0)::BIGINT AS merged_counter,
       coalesce(whole_counter, 0)::BIGINT AS whole_counter,
       (coalesce(merged_counter, 0) - coalesce(whole_counter, 0))::BIGINT AS diff
FROM merged m FULL OUTER JOIN whole w ON m.row = w.row AND m.bucket = w.bucket
ORDER BY 1, 2
""".strip()


def cm_point_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-query the sketch for a deterministic probe set and gate the
    estimates against the exact per-user counts: (user_id, est, exact,
    overcount) with overcount >= 0 ALWAYS (the CM guarantee -- a negative
    value anywhere means the sketch or the probe path is broken)."""
    ev = _events_keyed(spark, sf_dir)
    counters = cm_counters(spark, sf_dir)
    probes = ev.filter(F.col("user_id") % PROBE_MOD == 0).select("user_id").distinct()
    probe_cells = probes.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket_expr(F.col("user_id"), i).alias("bucket"),
                    )
                    for i in range(CM_DEPTH)
                ]
            )
        ).alias("c"),
    ).select("user_id", "c.row", "c.bucket")
    est = (
        probe_cells.join(F.broadcast(counters), ["row", "bucket"])
        .groupBy("user_id")
        .agg(F.min("counter").alias("est"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    return (
        est.join(exact, "user_id")
        .select(
            "user_id", "est", "exact", (F.col("est") - F.col("exact")).alias("overcount")
        )
        .orderBy("user_id")
    )


def cm_point_estimates_oracle() -> str:
    cells = ", ".join(
        f"struct_pack(r := {i}, b := {_bucket_sql('user_id::VARCHAR', i)})"
        for i in range(CM_DEPTH)
    )
    return f"""
WITH grid AS (
  SELECT c.r AS row, c.b AS bucket, count(*) AS counter
  FROM (SELECT unnest([{cells}]) AS c FROM events)
  GROUP BY row, bucket),
probes AS (SELECT DISTINCT user_id FROM events WHERE user_id % {PROBE_MOD} = 0),
probe_cells AS (
  SELECT user_id, c.r AS row, c.b AS bucket
  FROM (SELECT user_id, unnest([{cells}]) AS c FROM probes)),
est AS (
  SELECT pc.user_id, min(g.counter) AS est
  FROM probe_cells pc JOIN grid g ON pc.row = g.row AND pc.bucket = g.bucket
  GROUP BY pc.user_id),
exact AS (SELECT user_id, count(*) AS exact FROM events GROUP BY user_id)
SELECT e.user_id, e.est, x.exact, e.est - x.exact AS overcount
FROM est e JOIN exact x ON e.user_id = x.user_id
ORDER BY e.user_id
""".strip()
