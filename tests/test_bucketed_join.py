"""Co-located (bucketed) join: pre-bucketing both fact tables on the join
key eliminates the exchange from the join plan entirely -- the 100 TB
repeated-join strategy (pay one shuffle at write time, never again)."""

import pytest
from pyspark.sql import functions as F

from vector_db_from_scratch_spark.plans import plan_string


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir):
    # session warehouse already points at a temp dir (session.py)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
       .sortBy("l_orderkey").format("parquet").saveAsTable("li_bucketed"))
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
       .sortBy("o_orderkey").format("parquet").saveAsTable("orders_bucketed"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_exchange(warehouse):
    spark = warehouse
    # at test scale the dim side auto-broadcasts, which would bypass the
    # bucketed path; disable broadcast to exercise the big-big join shape
    # this strategy exists for
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("li_bucketed")
        orders = spark.table("orders_bucketed")
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = plan_string(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketed join must not shuffle"
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_correct(warehouse, spark, sf_dir):
    li = spark.table("li_bucketed")
    orders = spark.table("orders_bucketed")
    n_bucketed = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
    n_plain = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(spark.read.parquet(f"{sf_dir}/orders.parquet"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert n_bucketed == n_plain


def test_registered_bucketed_join_plan_colocated(spark, sf_dir):
    """join_bucketed_colocated: the registered query's JOIN subtree must
    be a bucket-aligned SortMergeJoin with no hashpartitioning exchange
    feeding it (the only exchange in the full plan is the tiny status
    aggregate)."""
    from vector_db_from_scratch_spark.operators.relational import (
        _bucketed_pair,
        bucketed_join_revenue,
    )
    from pyspark.sql import functions as F

    res = bucketed_join_revenue(spark, sf_dir)
    rows = res.collect()
    assert rows and all(r["n_lines"] > 0 for r in rows)
    # the bare join (pre-aggregate) must plan with zero exchanges
    on, ln = _bucketed_pair(spark, sf_dir)
    joined = (
        spark.table(ln)
        .select("l_orderkey")
        .hint("merge")
        .join(
            spark.table(on).select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    plan = plan_string(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, "bucketed join must not shuffle"
    assert "Bucketed: true" in plan


def test_bucketed_point_lookup_prunes_buckets(spark, sf_dir):
    """The CRUD-at-scale guard path: an equality lookup on the key-bucketed
    entity table scans ONE bucket, not the table (SCALE.md "CRUD at
    scale"; EntityStore guards at fixture scale are full filter-collects,
    this is their production layout)."""
    from vector_db_from_scratch_spark.operators.entity import (
        bucketed_documents_table,
        bucketed_point_lookup,
    )

    auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(auto_key)
    try:
        # the planner falls back to a plain scan when no join/agg wants the
        # bucketing; a lookup service pins this off so equality guards
        # get bucket pruning (SelectedBucketsCount) instead of full scans
        spark.conf.set(auto_key, "false")
        bucketed_documents_table(spark, sf_dir, buckets=8, table="docs_b_test")
        looked = bucketed_point_lookup(spark, 17, table="docs_b_test")
        plan = plan_string(looked)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        rows = looked.collect()
        assert [r["doc_id"] for r in rows] == [17]
    finally:
        spark.conf.set(auto_key, old)
        spark.sql("DROP TABLE IF EXISTS docs_b_test")
