"""Matryoshka truncated-dim funnel: full-prefix degeneracy equals the
exact scan, guards raise, and recall improves with the shortlist width."""

import pytest

from vector_db_from_scratch_spark.operators.knn import flat_knn
from vector_db_from_scratch_spark.operators.matryoshka import (
    matryoshka_knn,
    matryoshka_recall,
)


def test_full_prefix_degenerates_to_exact(spark, sf_dir):
    """prefix_dim = full dimension makes stage 1 the exact distance, so the
    funnel must return exactly the flat top-k (ids AND distances)."""
    exact = flat_knn(spark, sf_dir, "cosine", k=10, query_vec_id=3).collect()
    got = matryoshka_knn(
        spark, sf_dir, "cosine", k=10, query_vec_id=3, prefix_dim=64
    ).collect()
    assert [(r["vec_id"], r["distance"]) for r in got] == [
        (r["vec_id"], r["distance"]) for r in exact
    ]


def test_guards(spark, sf_dir):
    with pytest.raises(ValueError):
        matryoshka_knn(spark, sf_dir, k=0)
    with pytest.raises(ValueError):
        matryoshka_knn(spark, sf_dir, prefix_dim=0)


def test_dim_sweep_degeneracy_and_bounds(spark, sf_dir):
    """The curve has one row per width, full-dimension truncation is the
    exact scan (recall exactly 1.0), and the narrowest width is
    informative on this corpus (recall < 1)."""
    from vector_db_from_scratch_spark.operators.matryoshka import (
        SWEEP_DIMS,
        matryoshka_dim_sweep,
    )

    rows = matryoshka_dim_sweep(spark, sf_dir, "cosine", k=10, query_vec_id=0).collect()
    assert [r["prefix_dim"] for r in rows] == sorted(SWEEP_DIMS)
    assert rows[-1]["prefix_dim"] == 64 and rows[-1]["recall_at_k"] == 1.0
    assert all(0.0 <= r["recall_at_k"] <= 1.0 for r in rows)
    assert rows[0]["recall_at_k"] < 1.0


def test_recall_grows_with_oversample(spark, sf_dir):
    def recall(ov):
        r = matryoshka_recall(
            spark, sf_dir, "cosine", k=10, query_vec_id=0, oversample=ov
        ).collect()[0]
        return r["recall_at_k"]

    r3, r10 = recall(3), recall(10)
    print(f"matryoshka recall@10: 3x={r3} 10x={r10}")
    assert 0.0 <= r3 <= 1.0
    assert r10 >= r3
    assert r10 >= 0.5
