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
    or depth flips counters. The CM_DEPTH salted digests per row come from
    the shared hashed-events frame (operators/_evhash.py) instead of being
    re-computed per query — same expressions, one materialization."""
    from ._evhash import cm_cells, events_hashed

    cells = cm_cells(events_hashed(spark, sf_dir))
    return (
        cells.groupBy("row", "bucket")
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
    from ._evhash import cm_cells, events_hashed

    cells = cm_cells(events_hashed(spark, sf_dir), "shard")
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


HH_RATIO = 1.2  # heavy = estimated frequency >= HH_RATIO x the mean


def cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection composed ENTIRELY from sketches -- the
    production frequency-monitoring read path: the count-min grid supplies
    per-key frequency estimates and the KMV sketch supplies the distinct
    count, so the threshold (HH_RATIO x n / est_distinct, i.e. keys
    estimated at >= 1.2x the mean frequency) needs no exact per-key
    groupBy anywhere on the sketch side. Emits every key whose CM estimate
    clears the threshold with its exact count (gate side only) and two
    gated guarantees: ``guarantee_ok`` (est >= exact -- CM never
    underestimates) and ``is_true_hh``. Because est >= exact always, every
    TRUE heavy hitter is in the output -- the no-false-negative guarantee
    heavy-hitter monitoring rests on (Cormode & Muthukrishnan 2005 §4.2).

    The threshold is mean-relative, not a fixed phi*n, so the query stays
    non-trivial at every scale factor. Candidates here are the distinct
    keys (bounded at gate scale); at 100 TB the candidate set comes from
    per-partition pre-aggregation -- any key with global count >= t has
    local count >= t/P in some partition (pigeonhole), so mappers emit
    only locally-frequent keys and the grid prunes the rest.

    Precision degrades gracefully as key cardinality approaches CM_WIDTH
    (collision inflation admits more false positives -- visible at sf0.1,
    where 1500 keys over a 512-wide grid push most keys past the
    threshold); a deployment sizes w ~ e/eps for the tolerated
    overestimate eps*n (the standard CM sizing rule). The guarantee gated
    here (no false NEGATIVES) holds at any width."""
    from ._evhash import CM_DEPTH as _D, cm_cells, events_hashed
    from .kmv import HASH_SPACE, K_MIN

    ev = events_hashed(spark, sf_dir)
    counters = cm_counters(spark, sf_dir)
    hashes = ev.select("h").distinct()
    est_d = F.when(F.col("k") < K_MIN, F.col("k").cast("double")).otherwise(
        (F.col("k") - 1).cast("double") * F.lit(HASH_SPACE) / F.col("kth_min")
    )
    thresh = (
        hashes.orderBy("h")
        .limit(K_MIN)
        .agg(F.count(F.lit(1)).alias("k"), F.max("h").alias("kth_min"))
        .crossJoin(ev.agg(F.count(F.lit(1)).alias("n_total")))
        .select("n_total", est_d.alias("est_distinct"))
        .select(
            "n_total",
            "est_distinct",
            (F.lit(HH_RATIO) * F.col("n_total") / F.col("est_distinct")).alias(
                "thresh"
            ),
        )
    )
    probes = ev.select("user_id", *[f"b{i}" for i in range(_D)]).distinct()
    probe_cells = cm_cells(probes, "user_id")
    est = (
        probe_cells.join(F.broadcast(counters), ["row", "bucket"])
        .groupBy("user_id")
        .agg(F.min("counter").alias("est"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    return (
        est.crossJoin(F.broadcast(thresh))
        .filter(F.col("est") >= F.col("thresh"))
        .join(exact, "user_id")
        .select(
            "user_id",
            "est",
            "exact",
            (F.col("est") - F.col("exact")).alias("overcount"),
            "n_total",
            F.round("est_distinct", 6).alias("est_distinct"),
            F.round("thresh", 6).alias("hh_thresh"),
            (F.col("exact") >= F.col("thresh")).alias("is_true_hh"),
            (F.col("est") >= F.col("exact")).alias("guarantee_ok"),
        )
        .orderBy("user_id")
    )


def cm_heavy_hitters_oracle() -> str:
    from ..functions.hashing import hash60_sql
    from .kmv import HASH_SPACE, K_MIN

    h = hash60_sql("user_id::VARCHAR")
    cells = ", ".join(
        f"struct_pack(r := {i}, b := {_bucket_sql('user_id::VARCHAR', i)})"
        for i in range(CM_DEPTH)
    )
    est_d = (
        f"CASE WHEN k < {K_MIN} THEN k::DOUBLE "
        f"ELSE (k - 1) * {HASH_SPACE!r} / kth_min END"
    )
    return f"""
WITH hs AS (SELECT DISTINCT {h} AS h FROM events),
topk AS (SELECT h FROM hs ORDER BY h LIMIT {K_MIN}),
kk AS (SELECT count(*) AS k, max(h) AS kth_min FROM topk),
tot AS (SELECT count(*) AS n_total FROM events),
kv AS (SELECT n_total, {est_d} AS est_distinct FROM kk, tot),
th AS (SELECT n_total, est_distinct,
              {HH_RATIO!r} * n_total / est_distinct AS thresh
       FROM kv),
grid AS (
  SELECT c.r AS row, c.b AS bucket, count(*) AS counter
  FROM (SELECT unnest([{cells}]) AS c FROM events)
  GROUP BY row, bucket),
probes AS (SELECT DISTINCT user_id FROM events),
probe_cells AS (
  SELECT user_id, c.r AS row, c.b AS bucket
  FROM (SELECT user_id, unnest([{cells}]) AS c FROM probes)),
est AS (
  SELECT pc.user_id, min(g.counter) AS est
  FROM probe_cells pc JOIN grid g ON pc.row = g.row AND pc.bucket = g.bucket
  GROUP BY pc.user_id),
exact AS (SELECT user_id, count(*) AS exact FROM events GROUP BY user_id)
SELECT e.user_id, e.est, x.exact, e.est - x.exact AS overcount,
       th.n_total, round(th.est_distinct, 6) AS est_distinct,
       round(th.thresh, 6) AS hh_thresh,
       x.exact >= th.thresh AS is_true_hh,
       e.est >= x.exact AS guarantee_ok
FROM est e
JOIN exact x ON e.user_id = x.user_id
CROSS JOIN th
WHERE e.est >= th.thresh
ORDER BY e.user_id
""".strip()


def cm_point_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-query the sketch for a deterministic probe set and gate the
    estimates against the exact per-user counts: (user_id, est, exact,
    overcount) with overcount >= 0 ALWAYS (the CM guarantee -- a negative
    value anywhere means the sketch or the probe path is broken)."""
    from ._evhash import cm_cells, events_hashed

    ev = events_hashed(spark, sf_dir)
    counters = cm_counters(spark, sf_dir)
    probes = (
        ev.filter(F.col("user_id") % PROBE_MOD == 0)
        .select("user_id", *[f"b{i}" for i in range(CM_DEPTH)])
        .distinct()
    )
    probe_cells = cm_cells(probes, "user_id")
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


def cm_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP count-min: one independent d x w grid per event_type over
    per-user frequencies -- the per-source frequency monitor a 100 TB
    data-quality rollup keeps (which key is hot WITHIN each source), and
    the per-group leg of the CM member's matrix (KMV/hist/AMS already have
    theirs). Same salts and width as the global grid, so per-group grids
    roll up to it by cell-wise addition; output is nonzero cells only,
    bounded by groups x d x w regardless of corpus size."""
    from ._evhash import cm_cells, events_hashed

    cells = cm_cells(events_hashed(spark, sf_dir), "grp")
    return (
        cells.groupBy("grp", "row", "bucket")
        .agg(F.count(F.lit(1)).alias("counter"))
        .orderBy("grp", "row", "bucket")
    )


def cm_by_group_oracle() -> str:
    cells = ", ".join(
        f"struct_pack(r := {i}, b := {_bucket_sql('user_id::VARCHAR', i)})"
        for i in range(CM_DEPTH)
    )
    return f"""
SELECT grp, c.r AS row, c.b AS bucket, count(*) AS counter
FROM (SELECT event_type AS grp, unnest([{cells}]) AS c FROM events)
GROUP BY grp, row, bucket
ORDER BY grp, row, bucket
""".strip()


def cm_by_group_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability per group: per-(event_type, shard) grids merged by
    cell-wise addition must equal each group's whole grid -- the rollup
    protocol under the gate WITHIN a grouping key, i.e. per-source shards
    combine without their raw keys ever co-shuffling. Emits the cell-wise
    full-outer diff (all zeros) like cm_merge_shards."""
    from ._evhash import cm_cells, events_hashed

    cells = cm_cells(events_hashed(spark, sf_dir), "grp", "shard")
    shard_grids = cells.groupBy("grp", "shard", "row", "bucket").agg(
        F.count(F.lit(1)).alias("counter")
    )
    merged = shard_grids.groupBy("grp", "row", "bucket").agg(
        F.sum("counter").alias("merged_counter")
    )
    whole = cm_by_group(spark, sf_dir).withColumnRenamed("counter", "whole_counter")
    return (
        merged.join(whole, ["grp", "row", "bucket"], "full_outer")
        .select(
            "grp",
            "row",
            "bucket",
            F.coalesce("merged_counter", F.lit(0)).alias("merged_counter"),
            F.coalesce("whole_counter", F.lit(0)).alias("whole_counter"),
            (
                F.coalesce("merged_counter", F.lit(0))
                - F.coalesce("whole_counter", F.lit(0))
            ).alias("diff"),
        )
        .orderBy("grp", "row", "bucket")
    )


def cm_by_group_merge_oracle() -> str:
    cells = ", ".join(
        f"struct_pack(r := {i}, b := {_bucket_sql('user_id::VARCHAR', i)})"
        for i in range(CM_DEPTH)
    )
    return f"""
WITH cells AS (
  SELECT event_type AS grp, user_id % {N_SHARDS} AS shard, c.r AS row, c.b AS bucket
  FROM (SELECT event_type, user_id, unnest([{cells}]) AS c FROM events)),
shard_grids AS (
  SELECT grp, shard, row, bucket, count(*) AS counter
  FROM cells GROUP BY grp, shard, row, bucket),
merged AS (
  SELECT grp, row, bucket, sum(counter) AS merged_counter
  FROM shard_grids GROUP BY grp, row, bucket),
whole AS (
  SELECT grp, row, bucket, count(*) AS whole_counter
  FROM cells GROUP BY grp, row, bucket)
SELECT coalesce(m.grp, w.grp) AS grp,
       coalesce(m.row, w.row) AS row,
       coalesce(m.bucket, w.bucket) AS bucket,
       coalesce(merged_counter, 0)::BIGINT AS merged_counter,
       coalesce(whole_counter, 0)::BIGINT AS whole_counter,
       (coalesce(merged_counter, 0) - coalesce(whole_counter, 0))::BIGINT AS diff
FROM merged m FULL OUTER JOIN whole w
  ON m.grp = w.grp AND m.row = w.row AND m.bucket = w.bucket
ORDER BY 1, 2, 3
""".strip()
