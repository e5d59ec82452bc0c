"""Table maintenance operators: compaction and partitioned layout rewrite.

The operational side of a 100 TB lake: streaming ingestion and per-batch
appends leave thousands of small files per partition; compaction rewrites
them into target-sized files (repartition + maxRecordsPerFile), and layout
rewrite re-partitions a table by the columns its queries prune on. Both are
pure DataFrame writes -- no engine magic -- and both preserve row-level
content exactly (asserted in tests).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def compact(
    df: DataFrame,
    out_dir: str,
    target_files: int = 4,
    max_records_per_file: int | None = None,
) -> None:
    """Rewrite ``df`` as ~target_files parquet files (coalesce avoids a
    shuffle when reducing; repartition when growing for parallelism)."""
    n_current = df.rdd.getNumPartitions()
    out = df.coalesce(target_files) if target_files <= n_current else df.repartition(target_files)
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(out_dir)


def rewrite_partitioned(df: DataFrame, out_dir: str, *cols: str) -> None:
    """Re-layout a table partitioned by its pruning columns (the batch
    equivalent of choosing a hypertable chunking key)."""
    df.write.mode("overwrite").partitionBy(*cols).parquet(out_dir)


def parquet_file_count(path: str) -> int:
    return len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))


# --------------------------------------------------------------------------
# Range-partition planning: exact range boundaries + balance audit for a
# sorted layout (the report you run before repartitionByRange / sorted
# parquet writes to verify the chosen key yields even file sizes).
# ``repartitionByRange`` picks boundaries by SAMPLING -- this is its exact,
# auditable twin, computed WITHOUT a global single-task window: a range
# repartition on (value, key) makes partitions contiguous in the total
# order, so exact global rank = per-partition row_number (parallel window,
# one partition per task) + a broadcast cumulative offset (one bounded row
# per shuffle partition). The ntile bucket id is then a closed-form
# expression of (rank, N) and the per-range min/max/count is an ordinary
# parallel aggregation. Scales: the only driver-side state is one count per
# shuffle partition; nothing funnels through a single task.
# --------------------------------------------------------------------------

RANGE_BUCKETS = 8

# (applicationId, sf_dir) -> (persisted range-partitioned orders, pid counts)
from ._memo import register as _register_memo

_RANGED_ORDERS = _register_memo({})


def range_partition_report(
    spark: SparkSession, sf_dir: str, n_ranges: int = RANGE_BUCKETS
) -> DataFrame:
    """(range_id, n_rows, lo, hi): per-range row count and value bounds of
    orders.o_totalprice under an ntile(n) split with the deterministic
    (o_totalprice, o_orderkey) total order. min/max/count involve no float
    accumulation, so the report is bit-portable without rounding.

    ntile(n) over N rows gives the first ``N % n`` buckets ``N//n + 1``
    rows and the rest ``N//n``; with the exact 1-based rank ``r`` the
    bucket id is computed in closed form below, reproducing the window
    function's output distributively.
    """
    from pyspark.sql import Window, functions as F

    from ..sources.tables import load_table

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    if memo_key not in _RANGED_ORDERS:
        orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        n_parts = max(spark.sparkContext.defaultParallelism, n_ranges)
        part = (
            orders.repartitionByRange(n_parts, "o_totalprice", "o_orderkey")
            .withColumn("pid", F.spark_partition_id())
            .persist()
        )
        # Bounded driver-side state: one (pid, count) row per shuffle partition.
        counts = {
            r["pid"]: r["cnt"]
            for r in part.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        _RANGED_ORDERS[memo_key] = (part, counts)
    part, counts = _RANGED_ORDERS[memo_key]
    total = sum(counts.values())
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    offsets = offsets or [(0, 0)]
    from ..sources.tables import arrow_local_df

    off_df = arrow_local_df(
        spark,
        {"pid": [o[0] for o in offsets], "off": [o[1] for o in offsets]},
        "pid int, off long",
    )

    q, rem = divmod(total, n_ranges)
    threshold = rem * (q + 1)  # ranks <= threshold land in the fat buckets
    w = Window.partitionBy("pid").orderBy("o_totalprice", "o_orderkey")
    r = (F.row_number().over(w) + F.col("off")).alias("rank")
    ranked = part.join(F.broadcast(off_df), "pid").select("o_totalprice", r)
    rk = F.col("rank")
    range_id = (
        F.when(rk <= F.lit(threshold), F.floor((rk - 1) / F.lit(q + 1)) + 1)
        .otherwise(F.lit(rem) + F.floor((rk - 1 - F.lit(threshold)) / F.lit(max(q, 1))) + 1)
        .cast("long")
    )
    return (
        ranked.withColumn("range_id", range_id)
        .groupBy("range_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("range_id")
    )


def range_partition_report_oracle(n_ranges: int = RANGE_BUCKETS) -> str:
    return f"""
WITH ranged AS (
  SELECT o_totalprice,
         ntile({n_ranges}) OVER (ORDER BY o_totalprice, o_orderkey)::BIGINT AS range_id
  FROM orders)
SELECT range_id, count(*) AS n_rows,
       min(o_totalprice) AS lo, max(o_totalprice) AS hi
FROM ranged
GROUP BY range_id
ORDER BY range_id
""".strip()
