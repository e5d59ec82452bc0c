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
