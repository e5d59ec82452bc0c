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
# auditable twin: ntile over the total order (value, key) gives each row a
# target range, and per-range min/max/count is the skew report. At 100 TB
# the exact form is a one-off audit (a global sort of just the key column,
# ~1% of table bytes); the sampled form plans the actual write.
# --------------------------------------------------------------------------

RANGE_BUCKETS = 8


def range_partition_report(
    spark: SparkSession, sf_dir: str, n_ranges: int = RANGE_BUCKETS
) -> DataFrame:
    """(range_id, n_rows, lo, hi): per-range row count and value bounds of
    orders.o_totalprice under an ntile(n) split with the deterministic
    (o_totalprice, o_orderkey) total order. min/max/count involve no float
    accumulation, so the report is bit-portable without rounding."""
    from pyspark.sql import Window, functions as F

    from ..sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    ranged = orders.withColumn("range_id", F.ntile(n_ranges).over(w).cast("long"))
    return (
        ranged.groupBy("range_id")
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
