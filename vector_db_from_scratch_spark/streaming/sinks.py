"""Streaming sinks: checkpointed parquet append and foreachBatch upsert.

The S7 analog for streams: exactly-once file-sink semantics come from the
checkpoint (source offsets + file manifest); restarting a query with the
same checkpoint resumes without duplicating output. foreachBatch is the
escape hatch for sinks Spark lacks (MERGE targets, JDBC) -- each micro-batch
arrives as a batch DataFrame with an epoch id for idempotence.
"""

from __future__ import annotations

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
