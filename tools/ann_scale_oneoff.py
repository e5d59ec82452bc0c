"""One-off ANN scale measurement: exact scan vs LSH/IVF probes at KX
embeddings (default 1000x the sf0.1 table -> 2M vectors), recorded in
SCALE.md. Embeddings-only twin of the minhash 100x one-off.

Generation mirrors tools/scale_gen.py's label-conditional Gaussian (fresh
vectors per label, cluster structure preserved, every vector distinct) but
builds the arrow list column vectorized (offsets + flat values), so
millions of rows take seconds, and writes ONLY embeddings.parquet -- the
ANN queries read nothing else.

Protocol (symmetric, per SCALE.md "Scale ratios lie"): per side, clear the
memo registry + block cache, run each query twice, keep the min (first
pass builds that side's index artifacts, second measures warm).

Usage: python tools/ann_scale_oneoff.py [sf_dir] [k]
"""

from __future__ import annotations

import hashlib
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SEED = 20260814


def gen_embeddings_dir(sf_dir: str, k: int) -> str:
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    tag = hashlib.md5(f"{os.path.abspath(src)}:{st.st_mtime}:{st.st_size}:{k}:{SEED}".encode()).hexdigest()[:12]
    root = os.environ.get(
        "SPARK_GRAFT_ARTIFACT_DIR",
        os.path.join(tempfile.gettempdir(), "spark-graft-artifacts"),
    )
    out = os.path.join(root, f"ann-scale{k}x-{tag}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out

    emb = duckdb.sql(f"SELECT vec_id, label, embedding FROM '{src}' ORDER BY vec_id").fetch_arrow_table()
    vec = np.vstack([np.asarray(x, dtype=np.float64) for x in emb["embedding"].to_pylist()])
    labels = np.asarray(emb["label"].to_pylist())
    n, dim = vec.shape
    uniq = sorted(set(labels.tolist()))
    means = {l: vec[labels == l].mean(axis=0) for l in uniq}
    stds = {l: float(vec[labels == l].std(axis=0).mean()) for l in uniq}

    rng = np.random.default_rng(SEED)
    blocks, ids = [], []
    for copy in range(k):
        noise = rng.standard_normal((n, dim))
        new = np.empty((n, dim), dtype=np.float32)
        for l in uniq:
            m = labels == l
            new[m] = (means[l] + stds[l] * noise[m]).astype(np.float32)
        blocks.append(new)
        ids.append(np.arange(n, dtype=np.int64) + copy * n)
    flat = np.concatenate(blocks).reshape(-1)
    total = n * k
    offsets = pa.array(np.arange(0, (total + 1) * dim, dim, dtype=np.int32))
    values = pa.array(flat, type=pa.float32())
    col = pa.ListArray.from_arrays(offsets, values)
    table = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids)),
            "embedding": col,
            "label": pa.array(np.tile(labels, k), type=pa.int32()),
        }
    )
    tmp = out + f".tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(table, os.path.join(tmp, "embeddings.parquet"))
    open(os.path.join(tmp, "_DONE"), "w").close()
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

    from vector_db_from_scratch_spark.operators import _memo, ivf, knn, lsh
    from vector_db_from_scratch_spark.session import get_spark

    spark = get_spark("ann-scale")
    t0 = time.perf_counter()
    scaled = gen_embeddings_dir(sf_dir, k)
    print(f"scaled dir ({k}x): {scaled} [{time.perf_counter() - t0:.1f}s]")

    QUERIES = {
        "knn_cosine_flat_fast": lambda s, d: knn.flat_knn_fast(s, d, "cosine", k=10),
        "knn_batch_gemm": lambda s, d: knn.batch_knn_fast(s, d, "cosine", k=5, num_queries=8),
        "lsh_knn": lambda s, d: lsh.lsh_knn(s, d, "cosine", k=10),
        "lsh_index_persisted_knn": lambda s, d: lsh.lsh_index_persisted_knn(s, d, "cosine", k=10),
        "ivf_knn": lambda s, d: ivf.ivf_knn(s, d, "cosine", k=10),
    }
    sides = {}
    for label, d in (("1x", sf_dir), (f"{k}x", scaled)):
        _memo.clear()
        spark.catalog.clearCache()
        side = {}
        for name, fn in QUERIES.items():
            samples = []
            for _ in range(2):
                t1 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t1)
            side[name] = round(min(samples), 3)
        sides[label] = side
        print(label, side)
    for name in QUERIES:
        a, b = sides["1x"][name], sides[f"{k}x"][name]
        print(f"{name}: {a}s -> {b}s  ratio {b / a:.1f}x on {k}x vectors")
    spark.stop()


if __name__ == "__main__":
    main()
