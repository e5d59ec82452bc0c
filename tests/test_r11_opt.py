"""Round-11 optimization equivalence pins.

Each optimization that changed an operator's internals gets a focused test
asserting the new shape produces the SAME values as the direct computation
it replaced (the oracle gate already pins end-to-end outputs; these pin
the refactored building blocks so a future edit cannot drift a consumer
silently). Discipline shared with tests/test_r10_opt.py.
"""

from pyspark.sql import functions as F


def _rows(df, cols):
    return [tuple(r[c] for c in cols) for r in df.select(*cols).collect()]


def test_mmr_driver_greedy_matches_iterative_jobs(spark, sf_dir):
    """knn_mmr_rerank's driver-side greedy selection must be bit-identical
    to the pre-round-11 per-iteration Spark-job form (anti-join + penalty
    join + union + localCheckpoint per step), including scores and
    tie-breaks."""
    from vector_db_from_scratch_spark.functions.vector import distance_expr
    from vector_db_from_scratch_spark.operators import knn
    from vector_db_from_scratch_spark.sources.tables import load_table

    k, shortlist_n, lam, query_vec_id = knn.MMR_K, knn.MMR_N, knn.MMR_LAMBDA, 0

    # --- the replaced iterative form, verbatim ---
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") != query_vec_id
    )
    q = knn.query_vector_df(spark, sf_dir, query_vec_id)
    short = (
        emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            (
                F.lit(1.0)
                - distance_expr("cosine", F.col("embedding"), F.col("q"))
            ).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(shortlist_n)
        .cache()
    )
    a = short.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = short.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            (
                F.lit(1.0) - distance_expr("cosine", F.col("va"), F.col("vb"))
            ).alias("sim"),
        )
    )
    sel = (
        short.orderBy(F.col("rel").desc(), "vec_id")
        .limit(1)
        .select(
            F.lit(1).alias("rank"),
            "vec_id",
            "rel",
            (F.lit(lam) * F.col("rel")).alias("score"),
        )
        .localCheckpoint()
    )
    for i in range(2, k + 1):
        chosen = sel.select("vec_id")
        rem = short.join(chosen, "vec_id", "left_anti").select("vec_id", "rel")
        pen = (
            pairs.join(chosen.withColumnRenamed("vec_id", "b"), "b")
            .groupBy(F.col("a").alias("vec_id"))
            .agg(F.max("sim").alias("maxsim"))
        )
        scores = rem.join(pen, "vec_id").select(
            "vec_id",
            "rel",
            (
                F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.col("maxsim")
            ).alias("score"),
        )
        pick = (
            scores.orderBy(F.col("score").desc(), "vec_id")
            .limit(1)
            .select(F.lit(i).alias("rank"), "vec_id", "rel", "score")
        )
        sel = sel.unionAll(pick).localCheckpoint()
    iterative = sel.select(
        F.col("rank").cast("long").alias("rank"),
        "vec_id",
        (F.round("rel", 6) + F.lit(0.0)).alias("relevance"),
        (F.round("score", 6) + F.lit(0.0)).alias("mmr_score"),
    ).orderBy("rank")

    cols = ["rank", "vec_id", "relevance", "mmr_score"]
    got = _rows(knn.knn_mmr_rerank(spark, sf_dir), cols)
    want = _rows(iterative, cols)
    short.unpersist()
    assert got == want


def test_streaming_ams_fused_agg_matches_exploded_cells(spark, sf_dir):
    """The drained fused 48-sum AMS stream must equal the pre-round-11
    exploded (j, sign) streaming shape, counter for counter (associative
    integer sums -- bit equality expected, not approximate)."""
    from vector_db_from_scratch_spark.functions.hashing import hash60
    from vector_db_from_scratch_spark.operators.ams import (
        AMS_COUNTERS,
        _sign_expr,
    )
    from vector_db_from_scratch_spark.streaming import windows as w

    # the replaced exploded streaming shape, drained the same way
    ev = w.events_stream(spark, sf_dir)
    hashed = ev.select(hash60(F.col("user_id").cast("string")).alias("h"))
    cells = hashed.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), _sign_expr(F.col("h"), j).alias("s"))
                    for j in range(AMS_COUNTERS)
                ]
            )
        ).alias("c")
    ).select("c.j", "c.s")
    exploded_stream = cells.groupBy("j").agg(F.sum("s").alias("counter"))
    exploded = w.run_stream_once(exploded_stream, "t_r11_ams_exploded").orderBy("j")

    cols = ["j", "counter"]
    got = _rows(w.ams_ingest_drained.__wrapped__(spark, sf_dir), cols)
    want = _rows(exploded, cols)
    assert got == want


def test_restart_replay_files_are_time_ordered_slices(spark, sf_dir):
    """The shared restart-replay fixture must hold the whole events table
    split into arrival-ordered, time-contiguous slices (the invariant the
    four checkpoint-restart gates rely on: no phase-2 row behind the
    recovered watermark)."""
    from vector_db_from_scratch_spark.sources.tables import load_table
    from vector_db_from_scratch_spark.streaming import windows as w

    files = w.restart_replay_files(spark, sf_dir, n_files=2)
    assert len(files) == 2
    ev = load_table(spark, sf_dir, "events")
    parts = [spark.read.parquet(f) for f in files]
    assert sum(p.count() for p in parts) == ev.count()
    # arrival order == event-time order: max ts of slice i <= min ts of i+1
    hi = parts[0].agg(F.max("ts")).collect()[0][0]
    lo = parts[1].agg(F.min("ts")).collect()[0][0]
    assert hi <= lo
    # identical multiset of rows overall
    union = parts[0].unionByName(parts[1])
    assert union.exceptAll(ev).count() == 0
    assert ev.exceptAll(union).count() == 0
