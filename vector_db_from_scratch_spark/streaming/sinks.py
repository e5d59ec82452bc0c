"""Streaming sinks: checkpointed parquet append and foreachBatch sinks --
the production patterns for streaming writes Spark has no native sink
for. The S7 analog for streams: exactly-once file-sink semantics come
from the checkpoint (source offsets + file manifest); foreachBatch is
the escape hatch -- each micro-batch arrives as a batch DataFrame with
an epoch id for idempotence, against which arbitrary batch jobs run
(merge/upsert, multi-table fan-out, JDBC).

The gated flagship is a keyed UPSERT sink. Each micro-batch reduces to one row per
user_id (the latest event by (ts, event_id)) and merges it into a parquet
state table -- insert new keys, replace beaten rows. After the drain, the
state table must equal the batch "latest event per key" argmax, which is
the oracle. This is the streaming half of the reference's stored-counter
idea (O8) generalized to arbitrary per-key state, and the lifecycle a
real pipeline runs against Delta/Iceberg MERGE (unavailable in this
container -- plain parquet swap stands in, same dataflow).

Scale notes: the per-batch merge is one groupBy on user_id (the batch
side, small) + one outer-join-shaped combine against the state table;
with a table format this is MERGE INTO with file skipping on the key.
The swap is atomic via rename, so a concurrent reader sees old or new
state, never a torn write.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windows import events_stream


def write_events_parquet(
    spark: SparkSession, sf_dir: str, out_dir: str, checkpoint_dir: str
):
    """Checkpointed append of the raw stream to a parquet sink; returns the
    query (caller drains/stops). Restart-safe: rerunning with the same
    checkpoint emits nothing new for already-committed source files."""
    ev = events_stream(spark, sf_dir)
    return (
        ev.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def aggregate_via_foreach_batch(
    spark: SparkSession, sf_dir: str, out_dir: str, checkpoint_dir: str
):
    """foreachBatch: per-micro-batch custom sink logic (here: overwrite an
    aggregate snapshot keyed by batch -- the idempotent-upsert shape)."""
    ev = events_stream(spark, sf_dir)
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    return (
        counts.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _latest_per_key(df: DataFrame) -> DataFrame:
    """(user_id, m=struct(ts, event_id, event_type)) argmax reduction --
    max(struct) orders by (ts, event_id) with event_id unique, so the
    result is deterministic."""
    return df.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type")).alias("m")
    )


def upsert_sink_drained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the replayed events stream through a foreachBatch upsert into
    a parquet state table; return the final state (latest event per user),
    gated against the batch argmax oracle."""
    from ..sources.artifacts import scratch_dir
    from .joins import _left_join_replay_dir
    from .windows import drain_conf, events_stream_from

    replay = _left_join_replay_dir(spark, sf_dir)  # memoized slices + sentinels
    state = os.path.join(scratch_dir("upsert-state-"), "state")

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        # sentinels (user_id < 0) are watermark fuel for the join drain
        # that shares this replay dir; the upsert ignores them
        batch_latest = _latest_per_key(batch_df.filter(F.col("user_id") >= 0))
        if os.path.exists(os.path.join(state, "_SUCCESS")):
            cur = batch_df.sparkSession.read.parquet(state)
            merged = _latest_per_key(
                cur.unionByName(batch_latest).select(
                    "user_id", F.col("m.ts").alias("ts"),
                    F.col("m.event_id").alias("event_id"),
                    F.col("m.event_type").alias("event_type"),
                )
            )
        else:
            merged = batch_latest
        tmp = state + f".tmp-{batch_id}"
        merged.coalesce(4).write.mode("overwrite").parquet(tmp)
        old = state + f".old-{batch_id}"
        if os.path.exists(state):
            os.rename(state, old)
        os.rename(tmp, state)  # atomic swap: readers see old or new, never torn
        shutil.rmtree(old, ignore_errors=True)

    ev = events_stream_from(spark, replay, files_per_trigger=1)
    with drain_conf(spark):
        q = (
            ev.writeStream.foreachBatch(merge)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    final = spark.read.parquet(state)
    return final.select(
        "user_id",
        F.date_format("m.ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.col("m.event_id").alias("last_event_id"),
        F.col("m.event_type").alias("last_event_type"),
    ).orderBy("user_id")


def upsert_sink_drained_oracle() -> str:
    return """
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       event_id AS last_event_id,
       event_type AS last_event_type
FROM (SELECT user_id, ts, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
ORDER BY user_id
""".strip()
