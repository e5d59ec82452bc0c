"""Property-based top-k correctness: on randomized corpora the Spark
brute-force k-NN pipeline (distance expression + orderBy + limit) returns
exactly a valid top-k under each metric -- every returned distance is <=
the true k-th smallest (float tolerance), result size is min(k, n), and
distances arrive ascending. Hypothesis generates the corpora; the Spark
comparison runs one job per metric."""

import numpy as np
from hypothesis import given, settings, strategies as st

_CORPORA: list[tuple[list[list[float]], list[float]]] = []

_DIM = 6


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(-10, 10, allow_nan=False, width=32), min_size=_DIM, max_size=_DIM),
        min_size=1,
        max_size=20,
    ),
    st.lists(st.floats(-10, 10, allow_nan=False, width=32), min_size=_DIM, max_size=_DIM),
)
def test_collect_corpora(vecs, q):
    _CORPORA.append((vecs, q))


def _np_distances(metric, vecs, q):
    v = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    qq = np.asarray(q, dtype=np.float32).astype(np.float64)
    if metric == "euclidean":
        return np.linalg.norm(v - qq, axis=1)
    dots = v @ qq
    if metric == "dot_product":
        return -dots
    norms = np.linalg.norm(v, axis=1) * np.linalg.norm(qq)
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.where(norms == 0, np.inf, 1.0 - dots / np.where(norms == 0, 1.0, norms))
    return cos


def test_topk_is_valid_under_all_metrics(spark):
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.functions.vector import distance_expr

    corpora = _CORPORA or [([[1.0] * _DIM, [2.0] * _DIM], [1.5] * _DIM)]
    k = 3
    for metric in ("cosine", "euclidean", "dot_product"):
        rows = []
        for ci, (vecs, q) in enumerate(corpora):
            for vi, v in enumerate(vecs):
                rows.append((ci, vi, v, q))
        df = spark.createDataFrame(
            rows, "corpus long, id long, v array<float>, q array<float>"
        )
        from pyspark.sql import Window

        dist = distance_expr(metric, F.col("v"), F.col("q"), round_to=None)
        w = Window.partitionBy("corpus").orderBy("dist", "id")
        out = (
            df.select("corpus", "id", dist.alias("dist"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .collect()
        )
        by_corpus: dict[int, list] = {}
        for r in out:
            by_corpus.setdefault(r["corpus"], []).append(r)
        for ci, (vecs, q) in enumerate(corpora):
            got = sorted(by_corpus.get(ci, []), key=lambda r: r["rn"])
            nd = np.sort(_np_distances(metric, vecs, q))
            assert len(got) == min(k, len(vecs))
            kth = nd[min(k, len(vecs)) - 1]
            prev = -np.inf
            for r in got:
                assert r["dist"] >= prev  # ascending
                prev = r["dist"]
                tol = 1e-9 * max(1.0, abs(kth)) if np.isfinite(kth) else 0.0
                assert r["dist"] <= kth + tol, (
                    f"{metric}: returned distance {r['dist']} beyond true kth {kth}"
                )
