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
    weights = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0), ("signup", 5.0), ("error", 0.0)],
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