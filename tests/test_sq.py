"""SQ8 scalar quantization: range shape, reconstruction bounds, and recall
of the asymmetric-distance search vs the exact flat scan."""

import numpy as np
from pyspark.sql import functions as F

from vector_db_from_scratch_spark.operators.knn import flat_knn
from vector_db_from_scratch_spark.operators.sq import DIM, sq8_knn, sq8_ranges


def test_ranges_cover_corpus(spark, sf_dir):
    row = sq8_ranges(spark, sf_dir).collect()[0]
    mins, maxs = np.array(row["mins"]), np.array(row["maxs"])
    assert mins.shape == (DIM,) and maxs.shape == (DIM,)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x = np.array(emb.select("embedding").toPandas()["embedding"].tolist(), dtype=np.float64)
    assert np.allclose(mins, x.min(axis=0)) and np.allclose(maxs, x.max(axis=0))


def test_sq8_reconstruction_error_bounded(spark, sf_dir):
    """Bucket-center reconstruction error is bounded by half a bucket per
    dimension: |v - r|_inf <= (max-min)/256/2 elementwise."""
    row = sq8_ranges(spark, sf_dir).collect()[0]
    mins, maxs = np.array(row["mins"]), np.array(row["maxs"])
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x = np.array(emb.select("embedding").toPandas()["embedding"].tolist(), dtype=np.float64)
    span = maxs - mins
    frac = np.where(span == 0, 0.0, (x - mins) / np.where(span == 0, 1.0, span))
    codes = np.minimum(np.floor(frac * 256.0), 255.0)
    recon = np.where(span == 0, mins, mins + (codes + 0.5) / 256.0 * span)
    assert np.abs(x - recon).max() <= (span.max() / 256.0) / 2 + 1e-12


def test_sq8_recall_vs_flat(spark, sf_dir):
    """Asymmetric SQ8 top-10 vs exact top-10 over 10 queries: 8-bit
    per-dimension quantization is near-exact, so demand high recall."""
    k, n_q, hits = 10, 10, 0
    for qid in range(n_q):
        exact = {r["vec_id"] for r in flat_knn(spark, sf_dir, "cosine", k=k, query_vec_id=qid).collect()}
        approx = {r["vec_id"] for r in sq8_knn(spark, sf_dir, "cosine", k=k, query_vec_id=qid).collect()}
        hits += len(exact & approx)
    recall = hits / (n_q * k)
    print(f"sq8 recall@10 = {recall:.2f}")
    assert recall >= 0.9
