"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the configuration below is chosen so the
same logical plans scale to a real cluster: AQE enabled (runtime re-plan,
skew-join splitting, partition coalescing), Arrow enabled for the few
pandas-UDF paths, and a modest shuffle-partition default that AQE coalesces
further when inputs are small.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(app_name: str = "vector-db-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        # overridable for robustness sweeps: every gated query must produce
        # identical hashes at ANY partition count (the determinism contract
        # forbids float-order-dependent results), and a deployment tunes
        # this to its cluster
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
        )
        # pin the session zone: streaming event-time columns must be cast
        # NTZ->TIMESTAMP for watermarks, and only under UTC is that cast the
        # identity on rendered values (keeps stream twins equal to the
        # NTZ-based batch/oracle forms on any host)
        .config("spark.sql.session.timeZone", "UTC")
        # overridable for robustness sweeps: every gated query must be
        # CORRECT with AQE off too (AQE is a performance lever -- runtime
        # coalescing, empty-relation propagation, skew splits -- never a
        # semantics dependency); tools/check.py runs the full gate with
        # SPARK_GRAFT_AQE=false to pin that
        .config(
            "spark.sql.adaptive.enabled",
            os.environ.get("SPARK_GRAFT_AQE", "true"),
        )
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # keep managed/bucketed tables out of the repo working dir
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", tempfile.mkdtemp(prefix="spark-wh-")),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # events.parquet stores ts as TIMESTAMP(NANOS), which Spark 4 rejects;
        # read as long and convert in sources.tables.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
