"""Plan-property regression tests: the 100 TB-relevant physical plan shapes
must not silently degrade (pushdown reaching the scan, top-k without global
sort, broadcast joins for dims)."""

from vector_db_from_scratch_spark.operators.knn import flat_knn
from vector_db_from_scratch_spark.operators.relational import (
    hierarchy_rollup,
    scan_filter_project,
    shipping_priority,
)
from vector_db_from_scratch_spark.plans import (
    count_shuffles,
    plan_string,
    pushed_filters,
    uses_take_ordered,
)


def test_knn_uses_take_ordered_and_pushdown(spark, sf_dir):
    df = flat_knn(spark, sf_dir, "cosine", k=10, label_filter=5)
    assert uses_take_ordered(df), "top-k must compile to TakeOrderedAndProject"
    assert any("label" in f for f in pushed_filters(df)), "label filter must reach the scan"


def test_knn_no_shuffle_before_topk(spark, sf_dir):
    # scan -> broadcast query -> distance -> TakeOrdered: zero exchanges
    # besides the final single-partition gather
    df = flat_knn(spark, sf_dir, "cosine", k=10)
    assert count_shuffles(df) == 0


def test_scan_prunes_columns(spark, sf_dir):
    df = scan_filter_project(spark, sf_dir)
    plan = plan_string(df)
    scan_line = next(l for l in plan.split("\n") if "FileScan" in l and "documents" in l)
    assert "text" not in scan_line, "unused text column must not be read"


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = plan_string(shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_hierarchy_join_broadcasts_customer(spark, sf_dir):
    plan = plan_string(hierarchy_rollup(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_plan_fingerprint_stable_and_discriminating(spark, sf_dir):
    """Same logical query -> same fingerprint across builds (expression ids
    differ per analysis, so normalization must strip them); different plan
    shapes -> different fingerprints."""
    from vector_db_from_scratch_spark.operators.knn import flat_knn
    from vector_db_from_scratch_spark.plans import plan_fingerprint

    a = plan_fingerprint(flat_knn(spark, sf_dir, "cosine", k=10))
    b = plan_fingerprint(flat_knn(spark, sf_dir, "cosine", k=10))
    assert a == b
    c = plan_fingerprint(flat_knn(spark, sf_dir, "euclidean", k=10))
    assert a != c
