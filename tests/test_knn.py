"""k-NN operator behavior tests (reference scenarios from
tests/test_indexes.py and tests/test_vector_store.py -- ordering, filter
restriction, empty-filter short-circuit, k truncation, k<=0 rejection)."""

import pytest

from vector_db_from_scratch_spark.operators.knn import batch_knn, flat_knn


def test_self_is_nearest_cosine(spark, sf_dir):
    rows = flat_knn(spark, sf_dir, "cosine", k=3, query_vec_id=0).collect()
    assert rows[0]["vec_id"] == 0
    assert rows[0]["distance"] == pytest.approx(0.0, abs=1e-6)
    dists = [r["distance"] for r in rows]
    assert dists == sorted(dists)


def test_k_truncates(spark, sf_dir):
    assert flat_knn(spark, sf_dir, "euclidean", k=7).count() == 7


def test_filter_restricts_results(spark, sf_dir):
    rows = flat_knn(spark, sf_dir, "cosine", k=10, label_filter=5).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    allowed = {r["vec_id"] for r in emb.filter("label = 5").select("vec_id").collect()}
    assert rows and all(r["vec_id"] in allowed for r in rows)


def test_empty_filter_short_circuits(spark, sf_dir):
    assert flat_knn(spark, sf_dir, "cosine", k=10, label_filter=-1).count() == 0


def test_k_nonpositive_raises(spark, sf_dir):
    with pytest.raises(ValueError):
        flat_knn(spark, sf_dir, "cosine", k=0)


def test_batch_knn_matches_single(spark, sf_dir):
    batch = batch_knn(spark, sf_dir, "cosine", k=5, num_queries=3).collect()
    by_query = {}
    for r in batch:
        by_query.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for qid, hits in by_query.items():
        single = flat_knn(spark, sf_dir, "cosine", k=5, query_vec_id=qid).collect()
        assert [v for _, v in sorted(hits)] == [r["vec_id"] for r in single]


def test_fast_knn_matches_expression_path(spark, sf_dir):
    from vector_db_from_scratch_spark.operators.knn import flat_knn_fast

    for metric in ("cosine", "euclidean", "dot_product"):
        slow = flat_knn(spark, sf_dir, metric, k=10).collect()
        fast = flat_knn_fast(spark, sf_dir, metric, k=10).collect()
        assert [(r["vec_id"], r["distance"]) for r in slow] == [
            (r["vec_id"], r["distance"]) for r in fast
        ], metric


def test_knn_per_label_covers_every_label_and_matches_filtered(spark, sf_dir):
    """Per-tenant top-k: one row set per label, each equal to the
    label-filtered flat k-NN over that tenant's slice."""
    from vector_db_from_scratch_spark.operators.knn import knn_per_label

    rows = knn_per_label(spark, sf_dir, "cosine", k=3, query_vec_id=0).collect()
    labels = sorted({r["label"] for r in rows})
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert labels == sorted(r["label"] for r in emb.select("label").distinct().collect())
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append((r["rnk"], r["vec_id"], r["distance"]))
    lbl = labels[0]
    single = flat_knn(spark, sf_dir, "cosine", k=3, query_vec_id=0, label_filter=lbl).collect()
    assert [(v, d) for _, v, d in sorted(by_label[lbl])] == [
        (r["vec_id"], r["distance"]) for r in single
    ]


def test_batch_knn_fast_matches_expression_path(spark, sf_dir):
    """The GEMM batch kernel must agree with the declarative two-phase
    window form on every metric -- same rows, distances, and ranks."""
    from vector_db_from_scratch_spark.operators.knn import batch_knn, batch_knn_fast

    for metric in ("cosine", "euclidean", "dot_product"):
        slow = batch_knn(spark, sf_dir, metric, k=5, num_queries=4).collect()
        fast = batch_knn_fast(spark, sf_dir, metric, k=5, num_queries=4).collect()
        key = lambda r: (r["query_id"], r["rank"])
        assert sorted(
            [(r["query_id"], r["rank"], r["vec_id"], r["distance"]) for r in slow]
        ) == sorted(
            [(r["query_id"], r["rank"], r["vec_id"], r["distance"]) for r in fast]
        ), metric
