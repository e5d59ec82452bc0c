"""Property-based check: the SQL distance expressions agree with NumPy on
randomized vectors (hypothesis generates the cases; one Spark job total)."""

import numpy as np
from hypothesis import given, settings, strategies as st

_CASES = []


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.floats(-100, 100, allow_nan=False, width=32), min_size=2, max_size=8),
    st.lists(st.floats(-100, 100, allow_nan=False, width=32), min_size=2, max_size=8),
)
def test_collect_cases(v, q):
    # hypothesis only builds the corpus; the Spark comparison runs once below
    n = min(len(v), len(q))
    _CASES.append((v[:n], q[:n]))


def test_distances_match_numpy_on_corpus(spark):
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.functions.vector import distance_expr

    cases = [c for c in _CASES if c] or [([1.0, 2.0], [3.0, 4.0])]
    rows = [(i, v, q) for i, (v, q) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i long, v array<float>, q array<float>")
    out = df.select(
        "i",
        *[
            distance_expr(m, F.col("v"), F.col("q"), round_to=None).alias(m)
            for m in ("cosine", "euclidean", "dot_product")
        ],
    ).collect()
    for r in out:
        v = np.asarray(cases[r["i"]][0], dtype=np.float32).astype(np.float64)
        q = np.asarray(cases[r["i"]][1], dtype=np.float32).astype(np.float64)
        nv, nq = np.linalg.norm(v), np.linalg.norm(q)
        want_cos = float("inf") if nv * nq == 0 else 1.0 - float(v @ q) / (nv * nq)
        assert r["cosine"] == np.float64(want_cos) or abs(r["cosine"] - want_cos) < 1e-9 * max(1, abs(want_cos))
        assert abs(r["euclidean"] - float(np.linalg.norm(v - q))) < 1e-9 * max(1, np.linalg.norm(v - q))
        assert abs(r["dot_product"] - (-float(v @ q))) < 1e-6 * max(1, abs(float(v @ q)))
