"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``vector_db_from_scratch_spark``; this module only
adapts the registry to the driver's three-function contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vector_db_from_scratch_spark.registry import build as _build_registry

_REGISTRY = _build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: metadata-filtered exact
    cosine k-NN (the reference's POST /libraries/{id}/search)."""
    from vector_db_from_scratch_spark.operators.knn import flat_knn

    return flat_knn(
        spark, "/root/testdata/sf0.001", "cosine", k=10, query_vec_id=0, label_filter=5
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
