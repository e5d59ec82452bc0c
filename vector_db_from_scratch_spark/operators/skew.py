"""Skew-mitigation operators: salted aggregation and salted broadcast-side
replication join.

At 100 TB a handful of hot keys (one celebrity user, one dominant
event_type) serializes a shuffle stage onto one task. The two standard
fixes, both expressed as plain DataFrame transformations so Catalyst/AQE
still optimize around them:

  - salted_aggregate: key -> (key, salt) two-stage aggregation. Stage 1
    spreads each hot key over S partial aggregates; stage 2 combines S rows
    per key. Exactness is preserved by accumulating integral micro-unit
    longs (relational._micros pattern): integer addition is associative,
    so the two-stage sum is bit-identical to the one-stage sum.
  - salted_join: the big side gets a deterministic salt in [0, S); the
    small side is replicated S times; the join key becomes (key, salt) --
    every hot key's rows spread over S tasks.

Salts must be DETERMINISTIC (derived from a row id, never rand()) or
retries/speculative tasks produce different results.

(AQE's skewedJoin handles the join case automatically when statistics
expose the skew; the explicit form is for aggregations and for engines/
versions where AQE cannot see it.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import MICRO, osum
from ..sources.tables import load_table

NUM_SALTS = 8
MAX_SALTS = 16  # clamp for the sketch-derived salt factor


def _salt(id_col: Column) -> Column:
    return F.pmod(id_col, F.lit(NUM_SALTS))


def salted_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation of a (deliberately low-cardinality,
    skew-prone) key. Result is bit-identical to the direct groupBy."""
    ev = load_table(spark, sf_dir, "events")
    # partials carry integral micro-unit longs (same per-row rounding as
    # relational._micros, so two-stage == one-stage == oracle exactly)
    stage1 = (
        ev.withColumn("salt", _salt(F.col("event_id")))
        .groupBy("event_type", "salt")
        .agg(
            F.sum(F.round(F.col("value") * F.lit(float(MICRO)), 0).cast("long")).alias("pmicros"),
            F.count(F.lit(1)).alias("pn"),
        )
    )
    return (
        stage1.groupBy("event_type")
        .agg(
            (F.sum("pmicros").cast("double") / F.lit(float(MICRO)))
            .alias("total_value"),
            F.sum("pn").alias("n_events"),
        )
        .withColumn("total_value", F.col("total_value") + F.lit(0.0))
        .orderBy("event_type")
    )


def salted_event_totals_oracle() -> str:
    return f"""
SELECT event_type, {osum('value')} AS total_value, count(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
""".strip()


def salted_weighted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join: every events row joins a tiny event_type dimension.
    The dimension is replicated NUM_SALTS times and the join key is
    (event_type, salt), so one hot event_type spreads over NUM_SALTS tasks.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "salt", _salt(F.col("event_id"))
    )
    from ..sources.tables import arrow_local_df

    weights = arrow_local_df(
        spark,
        {"event_type": ["click", "view", "purchase", "signup", "error"],
         "weight": [1.0, 0.5, 10.0, 5.0, 0.0]},
        "event_type string, weight double",
    )
    replicated = weights.crossJoin(
        spark.range(NUM_SALTS).select(F.col("id").cast("int").alias("salt"))
    )
    joined = ev.join(F.broadcast(replicated), ["event_type", "salt"])
    weighted = F.col("value") * F.col("weight")
    return (
        joined.groupBy("event_type")
        .agg(
            (F.sum(F.round(weighted * F.lit(float(MICRO)), 0).cast("long")).cast("double")
             / F.lit(float(MICRO)) + F.lit(0.0)).alias("weighted_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def salted_weighted_join_oracle() -> str:
    return f"""
WITH w AS (SELECT * FROM (VALUES ('click', 1.0), ('view', 0.5), ('purchase', 10.0),
                                 ('signup', 5.0), ('error', 0.0)) t(event_type, weight))
SELECT event_type, {osum('value * weight')} AS weighted_value, count(*) AS n_events
FROM events JOIN w USING (event_type)
GROUP BY event_type ORDER BY event_type
""".strip()

def skew_salt_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch toolkit driving the engine's own SKEW decision -- the
    join/aggregation twin of quantiles.range_bounds_sketch's layout
    planning: no exact per-key statistics feed the plan, only sketches.

      est_max       -- heaviest key's frequency upper bound, read from the
                       count-min grid (min-of-rows per key, max over keys;
                       never an underestimate, so the derived salt factor
                       never under-provisions)
      est_distinct  -- KMV bottom-k estimate
      target        -- tolerated rows per (key, salt) task
                       = ceil(2 x mean frequency) from the two estimates
      salt_s        -- ceil(est_max / target), clamped to [1, MAX_SALTS]

    The salted two-stage aggregation then runs WITH that data-derived S
    inside the same lazy plan (S arrives as a broadcast 1-row cross join;
    the salt column is pmod(event_id, salt_s) -- no driver-side branching,
    no collect). Gated columns: the decision inputs/outputs themselves,
    the salted checksum == the direct checksum (two-stage integral sums
    are associative), max_partial (the biggest per-(key,salt) slice the
    chosen S actually produced), and the exact max_count it relieved.
    At 100 TB the candidate set for est_max comes from per-partition
    pre-aggregation (pigeonhole, as in countmin.cm_heavy_hitters); the
    exact per-key groupBy on the gate side is what the sketches replace.
    """
    from ._evhash import cm_cells, events_hashed
    from .countmin import CM_DEPTH, cm_counters
    from .kmv import HASH_SPACE, K_MIN

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    # every sketch input (CM grid, probe buckets, KMV hashes, n_total) reads
    # the shared hashed-events frame -- the raw table is scanned only by the
    # salted/direct aggregation branches the decision actually drives
    evh = events_hashed(spark, sf_dir)
    counters = cm_counters(spark, sf_dir)
    probes = evh.select("user_id", *[f"b{i}" for i in range(CM_DEPTH)]).distinct()
    probe_cells = cm_cells(probes, "user_id")
    est_max = (
        probe_cells.join(F.broadcast(counters), ["row", "bucket"])
        .groupBy("user_id")
        .agg(F.min("counter").alias("est"))
        .agg(F.max("est").alias("est_max"))
    )
    hashes = evh.select("h").distinct()
    est_d = F.when(F.col("k") < K_MIN, F.col("k").cast("double")).otherwise(
        (F.col("k") - 1).cast("double") * F.lit(HASH_SPACE) / F.col("kth_min")
    )
    decision = (
        hashes.orderBy("h")
        .limit(K_MIN)
        .agg(F.count(F.lit(1)).alias("k"), F.max("h").alias("kth_min"))
        .crossJoin(evh.agg(F.count(F.lit(1)).alias("n_total")))
        .crossJoin(est_max)
        .select("n_total", "est_max", est_d.alias("est_distinct"))
        .select(
            "n_total",
            "est_max",
            "est_distinct",
            F.ceil(F.lit(2.0) * F.col("n_total") / F.col("est_distinct"))
            .cast("long")
            .alias("target"),
        )
        .select(
            "*",
            F.least(
                F.greatest(
                    F.ceil(F.col("est_max") / F.col("target").cast("double")).cast(
                        "long"
                    ),
                    F.lit(1).cast("long"),
                ),
                F.lit(MAX_SALTS).cast("long"),
            ).alias("salt_s"),
        )
    )
    salted = ev.crossJoin(F.broadcast(decision.select("salt_s")))
    stage1 = (
        salted.withColumn("salt", F.pmod(F.col("event_id"), F.col("salt_s")))
        .groupBy("user_id", "salt")
        .agg(
            F.sum(
                F.round(F.col("value") * F.lit(float(MICRO)), 0).cast("long")
            ).alias("pmicros"),
            F.count(F.lit(1)).alias("pn"),
        )
    )
    stage2 = stage1.groupBy("user_id").agg(
        F.sum("pmicros").alias("micros"), F.sum("pn").alias("n")
    )
    direct = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * F.lit(float(MICRO)), 0).cast("long")).alias(
            "dmicros"
        ),
        F.count(F.lit(1)).alias("dn"),
    )
    checks = (
        stage2.agg(
            F.sum("micros").alias("salted_micros"), F.max("n").alias("salted_max_n")
        )
        .crossJoin(
            direct.agg(
                F.sum("dmicros").alias("direct_micros"),
                F.max("dn").alias("max_count"),
            )
        )
        .crossJoin(stage1.agg(F.max("pn").alias("max_partial")))
    )
    return decision.crossJoin(F.broadcast(checks)).select(
        "n_total",
        F.round("est_distinct", 6).alias("est_distinct"),
        "est_max",
        "target",
        "salt_s",
        "max_count",
        "max_partial",
        (F.col("est_max") >= F.col("max_count")).alias("est_never_under"),
        (F.col("salted_micros") - F.col("direct_micros")).alias("checksum_diff"),
        (F.col("salted_max_n") - F.col("max_count")).alias("regroup_diff"),
    )


def skew_salt_auto_oracle() -> str:
    from .countmin import CM_DEPTH, _bucket_sql
    from .kmv import HASH_SPACE, K_MIN
    from ..functions.hashing import hash60_sql

    cells = ", ".join(
        f"struct_pack(r := {i}, b := {_bucket_sql('user_id::VARCHAR', i)})"
        for i in range(CM_DEPTH)
    )
    h = hash60_sql("user_id::VARCHAR")
    est_d = (
        f"CASE WHEN k < {K_MIN} THEN k::DOUBLE "
        f"ELSE (k - 1) * {HASH_SPACE!r} / kth_min END"
    )
    return f"""
WITH grid AS (
  SELECT c.r AS row, c.b AS bucket, count(*) AS counter
  FROM (SELECT unnest([{cells}]) AS c FROM events)
  GROUP BY row, bucket),
probe_cells AS (
  SELECT user_id, c.r AS row, c.b AS bucket
  FROM (SELECT user_id, unnest([{cells}]) AS c
        FROM (SELECT DISTINCT user_id FROM events))),
est AS (
  SELECT pc.user_id, min(g.counter) AS est
  FROM probe_cells pc JOIN grid g ON pc.row = g.row AND pc.bucket = g.bucket
  GROUP BY pc.user_id),
em AS (SELECT max(est) AS est_max FROM est),
hs AS (SELECT DISTINCT {h} AS h FROM events),
kk AS (SELECT count(*) AS k, max(h) AS kth_min
       FROM (SELECT h FROM hs ORDER BY h LIMIT {K_MIN})),
tot AS (SELECT count(*) AS n_total FROM events),
dec0 AS (SELECT n_total, est_max, {est_d} AS est_distinct FROM kk, tot, em),
dec1 AS (SELECT *, ceil(2.0 * n_total / est_distinct)::BIGINT AS target FROM dec0),
dec AS (SELECT *, least(greatest(ceil(est_max / target::DOUBLE)::BIGINT, 1),
                        {MAX_SALTS}) AS salt_s
        FROM dec1),
stage1 AS (
  SELECT user_id, event_id % (SELECT salt_s FROM dec) AS salt,
         sum(round(value * {float(MICRO)!r}, 0)::BIGINT) AS pmicros,
         count(*) AS pn
  FROM events GROUP BY user_id, salt),
stage2 AS (
  SELECT user_id, sum(pmicros) AS micros, sum(pn) AS n
  FROM stage1 GROUP BY user_id),
direct AS (
  SELECT user_id, sum(round(value * {float(MICRO)!r}, 0)::BIGINT) AS dmicros,
         count(*) AS dn
  FROM events GROUP BY user_id),
checks AS (
  SELECT (SELECT sum(micros) FROM stage2) AS salted_micros,
         (SELECT max(n) FROM stage2) AS salted_max_n,
         (SELECT sum(dmicros) FROM direct) AS direct_micros,
         (SELECT max(dn) FROM direct) AS max_count,
         (SELECT max(pn) FROM stage1) AS max_partial)
SELECT n_total, round(est_distinct, 6) AS est_distinct, est_max, target, salt_s,
       max_count, max_partial,
       est_max >= max_count AS est_never_under,
       (salted_micros - direct_micros)::BIGINT AS checksum_diff,
       (salted_max_n - max_count)::BIGINT AS regroup_diff
FROM dec CROSS JOIN checks
""".strip()
