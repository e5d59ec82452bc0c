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


def test_decontaminate_broadcasts_benchmark_ngrams(spark, sf_dir):
    """The benchmark shingle set must broadcast (it is eval-suite-sized at
    100 TB); a sort-merge join here would shuffle the full training corpus."""
    from vector_db_from_scratch_spark.operators.corpus import corpus_decontaminate

    plan = plan_string(corpus_decontaminate(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_sequences_single_wide_exchange(spark, sf_dir):
    """Packing = one hash exchange on the window partition key; the
    groupBy reuses that partitioning (partial agg only), so the static
    plan carries at most 2 exchanges and no global sort."""
    from vector_db_from_scratch_spark.operators.corpus import corpus_pack_sequences
    from vector_db_from_scratch_spark.plans.audit import count_shuffles

    df = corpus_pack_sequences(spark, sf_dir)
    # exchanges: window hash-partitioning (+ final orderBy range exchange)
    assert count_shuffles(df) <= 3
    plan = plan_string(df)
    assert "Window" in plan


def test_point_lookup_prunes_text_and_pushes_ids(spark, sf_dir):
    """GET-by-id projection (P3 analog): the text column must not be read
    and the id predicate must reach the parquet scan."""
    from vector_db_from_scratch_spark.operators.entity import point_lookup_documents

    df = point_lookup_documents(spark, sf_dir)
    plan = plan_string(df)
    scan_line = next(l for l in plan.split("\n") if "FileScan" in l and "documents" in l)
    assert "text" not in scan_line, "embedding-analog column must be pruned"
    assert any("doc_id" in f for f in pushed_filters(df)), "id filter must reach the scan"


def test_persisted_lsh_probe_prunes_bucket_partition(spark, sf_dir):
    """The saved-artifact probe must read only the query's bucket partition
    (partition pruning on the bucket directory key)."""
    from vector_db_from_scratch_spark.operators.lsh import lsh_index_persisted_knn

    df = lsh_index_persisted_knn(spark, sf_dir, "cosine", k=3, query_vec_id=0)
    plan = plan_string(df)
    scan = next(l for l in plan.split("\n") if "FileScan" in l and "lsh-index" in l)
    assert "PartitionFilters: [" in scan
    # the pruned scan carries a bucket equality in its partition filters
    pf = scan.split("PartitionFilters:", 1)[1]
    assert "bucket" in pf


def test_minhash_plan_has_no_cartesian_and_broadcast_prefilter(spark, sf_dir):
    """The round-4 scale guards must stay in the physical plan: no
    CartesianProduct anywhere (all pair spaces are equi-joins), and the
    plan's exchange count stays bounded (the r3 plan carried 12)."""
    from vector_db_from_scratch_spark.operators import _memo
    from vector_db_from_scratch_spark.operators.dedup import minhash_lsh_pairs
    from vector_db_from_scratch_spark.plans import count_shuffles, plan_string

    # fresh-artifact plan: suite-populated memo caches swap scan subtrees
    # for InMemoryTableScans whose partitioning adds exchanges, making the
    # count order-dependent
    _memo.clear()
    spark.catalog.clearCache()
    df = minhash_lsh_pairs(spark, sf_dir)
    assert "CartesianProduct" not in plan_string(df)
    assert count_shuffles(df) <= 11, count_shuffles(df)


def test_dfcap_jaccard_broadcasts_rare_shingles(spark, sf_dir):
    """The df-capped flagship's candidate generation joins the shingle
    index against a BROADCAST rare-shingle set (the cap filter must never
    shuffle the index to apply it), and carries no cartesian product."""
    from vector_db_from_scratch_spark.operators.dedup import (
        ngram_jaccard_pairs_dfcap,
    )
    from vector_db_from_scratch_spark.plans import plan_string

    plan = plan_string(ngram_jaccard_pairs_dfcap(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_asof_join_single_user_shuffle(spark, sf_dir):
    """The as-of join must stay the one-shuffle merged-stream form: no
    range join (BroadcastNestedLoop/Cartesian), and at most the user_id
    window exchange plus the presentation sort."""
    from vector_db_from_scratch_spark.operators.analytics import asof_last_click
    from vector_db_from_scratch_spark.plans import count_shuffles, plan_string

    df = asof_last_click(spark, sf_dir)
    plan = plan_string(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert count_shuffles(df) <= 2, count_shuffles(df)


def test_recommend_and_discovery_are_zero_shuffle_take_ordered(spark, sf_dir):
    """The bounded request (examples / context pairs) must pivot into
    literal columns: no exchange before the top-k, TakeOrderedAndProject."""
    from vector_db_from_scratch_spark.operators.knn import (
        knn_discovery,
        knn_recommend,
    )

    for df in (knn_recommend(spark, sf_dir), knn_discovery(spark, sf_dir)):
        assert uses_take_ordered(df)
        assert count_shuffles(df) == 0


def test_distance_matrix_broadcasts_the_sample(spark, sf_dir):
    """The capped sample must meet itself via a broadcast nested loop --
    never a shuffled cartesian."""
    from vector_db_from_scratch_spark.operators.knn import knn_distance_matrix

    plan = plan_string(knn_distance_matrix(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_group_topk_attaches_group_ranks_by_broadcast(spark, sf_dir):
    from vector_db_from_scratch_spark.operators.knn import knn_group_topk

    plan = plan_string(knn_group_topk(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
