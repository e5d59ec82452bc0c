"""One-off 10x scale measurement for the graph family (quantized
PageRank / HITS). Two claims to separate:

1. The RANK LOOP is linear in edges: each iteration is one equi-join
   rank⋈edges + one groupBy(dst) sum over one row per node. Measured by
   feeding the loop the LSH-BLOCKED edge builder (knn_graph_blocked's
   bucket equi-join shape) at 1x and 10x embeddings -- the 100 TB path.
2. The GATE-side exact edge build is quadratic in the node subset BY
   DESIGN (it exists so the DuckDB oracle can replay it bounded); it is
   not the scale path and is measured here only to document that.

Same symmetric warm/warm protocol as the other one-offs: per side, clear
memos, run twice, keep the min.

Usage: python tools/graph_scale_oneoff.py [sf_dir] [k]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def blocked_edges(spark, sf_dir):
    """LSH-bucketed approximate k-NN edges -- the 100 TB edge builder
    (knn_graph_blocked's plan shape): bucket equi-join instead of the
    all-pairs subset join, per-node bounded window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.functions.vector import distance_expr
    from vector_db_from_scratch_spark.operators.lsh import bucket_expr
    from vector_db_from_scratch_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    b = emb.select("vec_id", "v", bucket_expr(F.col("v")).alias("bkt"))
    a, c = b.alias("a"), b.alias("c")
    pairs = a.join(
        c,
        (F.col("a.bkt") == F.col("c.bkt")) & (F.col("a.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("a.vec_id").alias("src"),
        F.col("c.vec_id").alias("dst"),
        distance_expr("cosine", F.col("a.v"), F.col("c.v")).alias("d"),
    )
    rn = F.row_number().over(Window.partitionBy("src").orderBy("d", "dst"))
    return (
        pairs.withColumn("rn", rn).filter(F.col("rn") <= 4).select("src", "dst")
    )


def rank_loop(spark, edges, iters: int = 3) -> int:
    """The quantized PageRank loop over a given edge table (builder-
    agnostic, exactly graph._rank_chain's per-iteration shape)."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.operators.graph import (
        DAMP_DEN,
        DAMP_NUM,
        MICRO,
        PR_K,
        _halfup,
    )

    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("vec_id"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint()
    )
    n_df = nodes.agg(F.count(F.lit(1)).alias("n"))
    r = nodes.crossJoin(F.broadcast(n_df)).select(
        "vec_id", _halfup(F.lit(MICRO), F.col("n")).alias("rank"), "n"
    ).localCheckpoint()
    for _ in range(iters):
        contrib = edges.join(
            r.select(F.col("vec_id").alias("src"), "rank"), "src"
        ).select("dst", _halfup(F.col("rank"), F.lit(PR_K)).alias("c"))
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        r = (
            nodes.crossJoin(F.broadcast(n_df))
            .join(sums, nodes["vec_id"] == sums["dst"], "left")
            .select(
                "vec_id",
                (
                    _halfup(F.lit(15 * MICRO), F.lit(DAMP_DEN) * F.col("n"))
                    + _halfup(
                        F.lit(DAMP_NUM) * F.coalesce(F.col("s"), F.lit(0)),
                        F.lit(DAMP_DEN),
                    )
                ).alias("rank"),
                "n",
            )
            .localCheckpoint()
        )
    return r.count()


def measure(fn, n: int = 2) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import scale_gen

    from vector_db_from_scratch_spark.operators import _memo, graph
    from vector_db_from_scratch_spark.session import get_spark

    spark = get_spark("graph-scale")
    scaled = scale_gen.scale_dir(sf_dir, k)
    print(f"scaled dir ({k}x): {scaled}")

    results = {}
    for side, d in (("1x", sf_dir), (f"{k}x", scaled)):
        _memo.clear()
        spark.catalog.clearCache()
        # materialize the edge table once so the loop measurement is the
        # LOOP, not the builder (builders have their own scale dials: at a
        # fixed bucket count the within-bucket pair space grows with bucket
        # occupancy -- a real deployment adds projections to rebound it)
        edges = blocked_edges(spark, d).localCheckpoint()
        n_edges = edges.count()
        build_sec = measure(lambda: blocked_edges(spark, d).count())
        loop_sec = measure(lambda: rank_loop(spark, edges))
        exact_sec = measure(lambda: graph._edges(spark, d).count())
        results[side] = (n_edges, build_sec, loop_sec, exact_sec)
        print(
            f"{side}: blocked_edges={n_edges} edge_build={build_sec:.2f}s "
            f"rank_loop={loop_sec:.2f}s exact_gate_build={exact_sec:.2f}s"
        )
    e1, b1, l1, x1 = results["1x"]
    ek, bk, lk, xk = results[f"{k}x"]
    print(
        f"ratios at {k}x: edges {ek / e1:.1f}x, "
        f"edge_build wall {bk / b1:.2f}x (bucket-occupancy bound; "
        f"re-dial projections at scale), "
        f"rank_loop wall {lk / l1:.2f}x, "
        f"rank_loop sec-per-edge {lk / ek / (l1 / e1):.3f}x, "
        f"exact gate build wall {xk / x1:.2f}x (quadratic by design, not the scale path)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
