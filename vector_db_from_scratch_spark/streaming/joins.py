"""Stream-stream join: purchases joined to each user's clicks within a
bounded event-time window, with watermarks on both sides.

The interval condition + two watermarks are what make the state bounded:
Spark buffers each side only until the watermark passes the join window --
the canonical pattern for correlating two event streams at scale (state
scales with (active users x window), not stream length).

The batch twin is the same inequality join expressed statically; the test
drains the stream and compares exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .windows import events_stream

WINDOW = "10 minutes"


def _sides(ev: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return clicks, purchases


def _join_cond():
    return (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {WINDOW}"))
    )


def click_purchase_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_stream(spark, sf_dir)
    clicks, purchases = _sides(ev)
    clicks = clicks.withWatermark("click_ts", "1 hour")
    purchases = purchases.withWatermark("purchase_ts", "1 hour")
    return clicks.join(purchases, _join_cond()).select(
        F.col("p_user").alias("user_id"), "purchase_id", "click_id",
        "purchase_ts", "click_ts",
    )


def click_purchase_batch_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks, purchases = _sides(ev)
    return clicks.join(purchases, _join_cond()).select(
        F.col("p_user").alias("user_id"), "purchase_id", "click_id",
        "purchase_ts", "click_ts",
    )


def run_join_once(spark: SparkSession, sf_dir: str, name: str = "t_ssjoin") -> DataFrame:
    from .windows import drain_conf

    with drain_conf(spark):
        q = (
            click_purchase_stream_join(spark, sf_dir)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def click_purchase_join_drained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL stream-stream interval join (two watermarked sides, bounded
    join state) drained through an append-mode memory sink and put under
    the oracle gate -- the batch twin above checks the join algebra, this
    checks the streaming engine executing it. Timestamps surface as
    strings for the same dtype-bridge reason as the drained windows."""
    res = run_join_once(spark, sf_dir, "t_gate_ssjoin")
    return res.select(
        "user_id",
        "purchase_id",
        "click_id",
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    ).orderBy("user_id", "purchase_id", "click_id")


def click_purchase_join_drained_oracle() -> str:
    return """
WITH c AS (SELECT user_id AS c_user, event_id AS click_id, ts::TIMESTAMP AS click_ts
           FROM events WHERE event_type = 'click'),
p AS (SELECT user_id AS p_user, event_id AS purchase_id, ts::TIMESTAMP AS purchase_ts
      FROM events WHERE event_type = 'purchase')
SELECT p_user AS user_id, purchase_id, click_id,
       strftime(purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts
FROM c JOIN p ON c_user = p_user
             AND click_ts <= purchase_ts
             AND click_ts >= purchase_ts - INTERVAL 10 MINUTE
ORDER BY user_id, purchase_id, click_id
""".strip()


def click_purchase_join_oracle() -> str:
    """Oracle for the batch twin (CTEs cast ts to microsecond TIMESTAMP so
    the interval comparisons happen at Spark's precision)."""
    return """
WITH c AS (SELECT user_id AS c_user, event_id AS click_id, ts::TIMESTAMP AS click_ts
           FROM events WHERE event_type = 'click'),
p AS (SELECT user_id AS p_user, event_id AS purchase_id, ts::TIMESTAMP AS purchase_ts
      FROM events WHERE event_type = 'purchase')
SELECT p_user AS user_id, purchase_id, click_id, purchase_ts, click_ts
FROM c JOIN p ON c_user = p_user
             AND click_ts <= purchase_ts
             AND click_ts >= purchase_ts - INTERVAL 10 MINUTE
""".strip()
