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


_RECO_REQUESTS: list[tuple[list[int], list[int]]] = []


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(0, 49), min_size=1, max_size=4, unique=True),
    st.lists(st.integers(50, 99), min_size=0, max_size=3, unique=True),
)
def test_collect_recommend_requests(pos, neg):
    _RECO_REQUESTS.append((pos, neg))


def test_recommend_matches_python_replica_on_random_requests(spark, sf_dir):
    """Property fuzz through the REAL knn_recommend path: for randomized
    positive/negative example sets, the Spark result equals an
    independent Python replica (round-6dp half-up distances, best-score,
    exclusion, (score, id) order)."""
    import math
    from decimal import Decimal, ROUND_HALF_UP

    from vector_db_from_scratch_spark.operators.knn import knn_recommend

    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def cos6(v, q):
        dot = sum(a * b for a, b in zip(v, q))
        nv = math.sqrt(sum(a * a for a in v))
        nq = math.sqrt(sum(b * b for b in q))
        if nv * nq == 0:
            return float("inf")
        return float(
            Decimal(1.0 - dot / (nv * nq)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    # de-dup generated requests, keep a bounded number of Spark jobs
    seen, picked = set(), []
    for pos, neg in _RECO_REQUESTS:
        key = (tuple(sorted(pos)), tuple(sorted(neg)))
        if key not in seen:
            seen.add(key)
            picked.append((pos, neg))
        if len(picked) == 6:
            break
    picked = picked or [([0, 3], [7])]

    for pos, neg in picked:
        rows = knn_recommend(
            spark, sf_dir, "cosine", k=8, positives=pos, negatives=neg
        ).collect()
        excluded = set(pos) | set(neg)
        want = []
        for vid, v in emb.items():
            if vid in excluded:
                continue
            dp = min(cos6(v, emb[p]) for p in pos)
            if neg:
                dn = min(cos6(v, emb[n]) for n in neg)
                score = math.inf if math.isinf(dp) else dp - dn
            else:
                score = dp
            want.append((score, vid))
        want = sorted(want)[:8]
        got = [(r["reco_distance"], r["vec_id"]) for r in rows]
        assert got == want, (pos, neg)
