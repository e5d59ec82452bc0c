"""Generate a KX-scaled copy of the driver testdata's embeddings +
documents tables, for the scale proof-point section of the bench.

Scaling by row DUPLICATION would corrupt the workload: identical copies
multiply near-duplicate pair density quadratically inside LSH buckets and
shingle groups, so "10x data" would measure a different problem. Instead:

* embeddings -- fresh vectors drawn per label from a Gaussian fitted to
  the base table (per-label per-dimension mean, pooled per-label scalar
  std), float32, labels replicated in the base proportions: the cluster
  structure the ANN paths exploit is preserved, every vector is distinct.
* documents -- base rows replicated K times with the copy index appended
  to the text (so exact/near-dup structure per copy matches the base
  corpus instead of exploding) and doc_ids shifted by copy*N.

events / lineitem / orders are replicated K times with their id columns
shifted past the base maxima (per-key structure and value distributions
preserved -- no hot keys invented, windows gain K x rows not K x
windows). The scale section runs only queries that read the scaled
tables. Deterministic (seeded) and memoized on disk: regenerated only
when the base tables change (GEN bump covers derivation changes).

Usage: from bench.py (scale_dir(sf_dir, k)) or
       python tools/scale_gen.py [sf_dir] [k]
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile

SEED = 20260814
GEN = 4  # bump when the set of scaled tables or their derivation changes


def _target_dir(sf_dir: str, k: int) -> str:
    ident = []
    for t in ("embeddings", "documents"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        # mtime+size alone can collide across regenerated files (cp -p,
        # deterministic regeneration); hash the tail 64 KiB (parquet
        # footer) so content changes always change the tag
        st = os.stat(p)
        with open(p, "rb") as fh:
            fh.seek(max(0, st.st_size - 65536))
            fp = hashlib.md5(fh.read()).hexdigest()[:12]
        ident.append(f"{os.path.abspath(p)}:{st.st_mtime}:{st.st_size}:{fp}")
    tag = hashlib.md5(f"{':'.join(ident)}:{k}:{SEED}:{GEN}".encode()).hexdigest()[:12]
    root = os.environ.get(
        "SPARK_GRAFT_ARTIFACT_DIR",
        os.path.join(tempfile.gettempdir(), "spark-graft-artifacts"),
    )
    return os.path.join(root, f"scale{k}x-{tag}")


def scale_dir(sf_dir: str, k: int = 10) -> str:
    """Path to the scaled dir, generating it if absent."""
    out = _target_dir(sf_dir, k)
    if os.path.exists(os.path.join(out, "_DONE")):
        return out

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = out + f".tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)

    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, label, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetch_arrow_table()
    vec = np.vstack([np.asarray(x, dtype=np.float64) for x in emb["embedding"].to_pylist()])
    labels = np.asarray(emb["label"].to_pylist())
    n, dim = vec.shape

    rng = np.random.default_rng(SEED)
    uniq = sorted(set(labels.tolist()))
    means = {l: vec[labels == l].mean(axis=0) for l in uniq}
    stds = {l: float(vec[labels == l].std(axis=0).mean()) for l in uniq}

    out_ids, out_labels, out_vecs = [], [], []
    for copy in range(k):
        new_labels = labels  # base label proportions, replicated
        noise = rng.standard_normal((n, dim))
        new = np.empty((n, dim), dtype=np.float32)
        for l in uniq:
            m = new_labels == l
            new[m] = (means[l] + stds[l] * noise[m]).astype(np.float32)
        out_ids.append(np.arange(n, dtype=np.int64) + copy * n)
        out_labels.append(new_labels)
        out_vecs.append(new)
    table = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids)),
            "embedding": pa.array(
                [row for block in out_vecs for row in block.tolist()],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(np.concatenate(out_labels), type=pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(tmp, "embeddings.parquet"))

    docs_sql = " UNION ALL ".join(
        f"SELECT doc_id + {copy} * (SELECT count(*) FROM d) AS doc_id, "
        f"text || ' copy{copy}' AS text, lang, source, "
        f"n_chars + {len(f' copy{copy}')} AS n_chars FROM d"
        for copy in range(k)
    )
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM '{sf_dir}/documents.parquet';"
        f"COPY ({docs_sql}) TO '{tmp}/documents.parquet' (FORMAT PARQUET);"
    )

    # events + lineitem: replicate K times with id columns shifted past the
    # base maxima -- per-user event structure and per-order line structure
    # are preserved (no hot keys invented), the event-time range is
    # unchanged (windows gain K x rows, not K x windows). This extends the
    # scale proof-point to the relational/window/streaming families.
    import os as _os
    if _os.path.exists(f"{sf_dir}/events.parquet"):
        ev_sql = " UNION ALL ".join(
            f"SELECT * REPLACE ("
            f"event_id + {copy} * (SELECT max(event_id) + 1 FROM ev) AS event_id, "
            f"user_id + {copy} * (SELECT max(user_id) + 1 FROM ev) AS user_id"
            f") FROM ev"
            for copy in range(k)
        )
        con.execute(
            f"CREATE VIEW ev AS SELECT * FROM '{sf_dir}/events.parquet';"
            f"COPY ({ev_sql}) TO '{tmp}/events.parquet' (FORMAT PARQUET);"
        )
    if _os.path.exists(f"{sf_dir}/lineitem.parquet"):
        li_sql = " UNION ALL ".join(
            f"SELECT * REPLACE ("
            f"l_orderkey + {copy} * (SELECT max(l_orderkey) + 1 FROM li) AS l_orderkey"
            f") FROM li"
            for copy in range(k)
        )
        con.execute(
            f"CREATE VIEW li AS SELECT * FROM '{sf_dir}/lineitem.parquet';"
            f"COPY ({li_sql}) TO '{tmp}/lineitem.parquet' (FORMAT PARQUET);"
        )
    # orders: replicate K times with o_orderkey shifted past the base max;
    # the o_totalprice distribution (what the quantile/range sketches bin)
    # is preserved exactly, so sketch grids stay comparable across scales.
    if _os.path.exists(f"{sf_dir}/orders.parquet"):
        od_sql = " UNION ALL ".join(
            f"SELECT * REPLACE ("
            f"o_orderkey + {copy} * (SELECT max(o_orderkey) + 1 FROM od) AS o_orderkey"
            f") FROM od"
            for copy in range(k)
        )
        con.execute(
            f"CREATE VIEW od AS SELECT * FROM '{sf_dir}/orders.parquet';"
            f"COPY ({od_sql}) TO '{tmp}/orders.parquet' (FORMAT PARQUET);"
        )
    # customer: copied UNCHANGED -- the realistic scale scenario is facts
    # growing while dimensions stay put (join_strategy_auto's broadcast
    # decision measures exactly that asymmetry at 10x)
    if _os.path.exists(f"{sf_dir}/customer.parquet"):
        shutil.copyfile(
            f"{sf_dir}/customer.parquet", f"{tmp}/customer.parquet"
        )
    con.close()

    open(os.path.join(tmp, "_DONE"), "w").close()
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # concurrent generator won
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    print(scale_dir(sf, k))
