"""Query registry: every implemented operator from SURVEY.md §2 as a named
(spark_callable, oracle_sql) pair consumed by ``__spark_entry__``.

Each Spark callable takes (spark, sf_dir) -> DataFrame; the oracle is the
equivalent DuckDB SQL (None for genuinely non-SQL-expressible ops, which the
driver checks rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import knn

Entry = tuple[Callable[[SparkSession, str], DataFrame], "str | None"]

ZERO64 = [0.0] * 64


def build() -> dict[str, Entry]:
    reg: dict[str, Entry] = {}

    # --- flagship: exact (flat) k-NN, all three metrics (SURVEY §2.9 Q1/Q2) ---
    reg["knn_cosine_flat"] = (
        lambda spark, sf: knn.flat_knn(spark, sf, "cosine", k=10, query_vec_id=0),
        knn.flat_knn_oracle("cosine", k=10, query_vec_id=0),
    )
    reg["knn_euclidean_flat"] = (
        lambda spark, sf: knn.flat_knn(spark, sf, "euclidean", k=10, query_vec_id=0),
        knn.flat_knn_oracle("euclidean", k=10, query_vec_id=0),
    )
    reg["knn_dot_product_flat"] = (
        lambda spark, sf: knn.flat_knn(spark, sf, "dot_product", k=10, query_vec_id=0),
        knn.flat_knn_oracle("dot_product", k=10, query_vec_id=0),
    )
    # metadata-equality pre-filter (F1/F2; label plays the metadata tag)
    reg["knn_filtered"] = (
        lambda spark, sf: knn.flat_knn(spark, sf, "cosine", k=10, query_vec_id=0, label_filter=5),
        knn.flat_knn_oracle("cosine", k=10, query_vec_id=0, label_filter=5),
    )
    # empty candidate set short-circuits to [] (vector_store.py:256-257)
    reg["knn_filtered_empty"] = (
        lambda spark, sf: knn.flat_knn(spark, sf, "cosine", k=10, query_vec_id=0, label_filter=-1),
        knn.flat_knn_oracle("cosine", k=10, query_vec_id=0, label_filter=-1),
    )
    # zero-norm query -> every cosine distance is +inf, rows still returned
    # sorted by the (distance, vec_id) tie-break (indexes.py:112-113 trap)
    reg["knn_zero_vector"] = (
        lambda spark, sf: knn.flat_knn(spark, sf, "cosine", k=5, query_literal=ZERO64),
        knn.flat_knn_oracle("cosine", k=5, query_literal=ZERO64),
    )
    # multi-query batch (beyond-reference; two-phase distributed top-k)
    reg["knn_batch"] = (
        lambda spark, sf: knn.batch_knn(spark, sf, "cosine", k=5, num_queries=8),
        knn.batch_knn_oracle("cosine", k=5, num_queries=8),
    )
    return reg
