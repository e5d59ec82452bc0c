"""Structured Streaming: the streaming forms of the window queries must
agree with their batch forms after draining all input (Dataflow-model
batch/stream equivalence), and the O8-analog running counter must match a
batch groupBy count."""

from vector_db_from_scratch_spark.streaming.windows import (
    counter_stream,
    run_stream_once,
    session_stats,
    session_stats_stream,
    tumbling_counts,
    tumbling_counts_stream,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream_res = run_stream_once(
        tumbling_counts_stream(spark, sf_dir), "t_tumble"
    )
    batch = tumbling_counts(spark, sf_dir)
    cols = ["window_start", "event_type", "n"]
    assert _rows(stream_res, cols) == _rows(batch.select(*cols), cols)


def test_streaming_sessions_equal_batch(spark, sf_dir):
    stream_res = run_stream_once(
        session_stats_stream(spark, sf_dir), "t_session"
    )
    batch = session_stats(spark, sf_dir)
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(stream_res, cols) == _rows(batch.select(*cols), cols)


def test_streaming_sketches_equal_batch(spark, sf_dir):
    """Streaming sketch maintenance == the batch sketch, cell for cell:
    the count-min grid and the Bloom bitmap drained from continuous
    aggregations must reproduce their batch builds exactly (the Dataflow
    equivalence applied to sketch rollup)."""
    from vector_db_from_scratch_spark.operators import bloom, countmin
    from vector_db_from_scratch_spark.streaming import windows as w

    cm_stream = w.cm_ingest_drained.__wrapped__(spark, sf_dir)
    cm_batch = countmin.cm_counters(spark, sf_dir)
    cols = ["row", "bucket", "counter"]
    assert _rows(cm_stream, cols) == _rows(cm_batch.select(*cols), cols)

    bl_stream = w.bloom_ingest_drained.__wrapped__(spark, sf_dir)
    bl_batch = bloom.bloom_bitmap(spark, sf_dir)
    cols = ["word_idx", "word"]
    assert _rows(bl_stream, cols) == _rows(bl_batch.select(*cols), cols)


def test_streaming_hist_and_kmv_equal_batch(spark, sf_dir):
    """The remaining two sketch members stream: the histogram grid as a
    pure aggregation (== the batch sketch bin for bin) and KMV as bounded
    per-shard bottom-k state whose merged drain equals the batch sketch
    at the same k."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.functions.hashing import hash60
    from vector_db_from_scratch_spark.operators import kmv, quantiles
    from vector_db_from_scratch_spark.sources.tables import load_table
    from vector_db_from_scratch_spark.streaming import stateful
    from vector_db_from_scratch_spark.streaming import windows as w

    h_stream = w.hist_ingest_drained.__wrapped__(spark, sf_dir)
    h_batch = quantiles.hist_sketch(spark, sf_dir)
    cols = ["bin", "n_bin"]
    assert _rows(h_stream, cols) == _rows(h_batch.select(*cols), cols)

    grp_rows = stateful.kmv_by_group_ingest_drained.__wrapped__(
        spark, sf_dir
    ).collect()
    batch_grp = {
        r["grp"]: (r["k"], r["kth_min"], r["est_distinct"])
        for r in kmv.kmv_by_group(spark, sf_dir).collect()
    }
    assert {
        r["grp"]: (r["k"], r["kth_min"], r["est_distinct"]) for r in grp_rows
    } == batch_grp

    row = stateful.kmv_ingest_drained.__wrapped__(spark, sf_dir).collect()[0]
    # batch twin at the same k: bottom-K_MERGE over the same portable hash
    batch = (
        load_table(spark, sf_dir, "events")
        .select(hash60(F.col("user_id").cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(kmv.K_MERGE)
        .agg(F.count(F.lit(1)).alias("k"), F.max("h").alias("kth_min"))
        .collect()[0]
    )
    assert (row["k"], row["kth_min"]) == (batch["k"], batch["kth_min"])
    if row["k"] < kmv.K_MERGE:
        assert row["est_distinct"] == row["exact_distinct"] == row["k"]


def test_kmv_bottom_k_state_is_slicing_invariant():
    """The streaming KMV state transition must be invariant to how the
    input is sliced into micro-batches and to arrival order: bottom-k of
    (bottom-k(S1) ∪ S2) == bottom-k(S1 ∪ S2). Drive the actual
    applyInPandasWithState body with a fake GroupState over random
    multisets under random slicings (hypothesis) and pin the final state
    to the sorted-distinct bottom-k of everything seen."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vector_db_from_scratch_spark.operators.kmv import K_MERGE
    from vector_db_from_scratch_spark.streaming.stateful import _bottom_k

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=2**60 - 1), min_size=1, max_size=200),
        st.integers(min_value=1, max_value=7),
        st.randoms(),
    )
    def run(hashes, n_batches, rng):
        rng.shuffle(hashes)
        cuts = sorted(rng.randrange(len(hashes) + 1) for _ in range(n_batches - 1))
        batches, prev = [], 0
        for c in cuts + [len(hashes)]:
            batches.append(hashes[prev:c])
            prev = c
        state = FakeState()
        for b in batches:
            list(_bottom_k((0,), iter([pd.DataFrame({"h": b})]), state))
        expect = sorted(set(hashes))[:K_MERGE]
        assert list(state.get[0]) == expect

    run()


def test_range_bounds_deviation_bound_holds_on_random_data():
    """The sketch_range_bounds construction guarantee -- each range's
    deviation from its ideal share is at most the mass of its two
    boundary bins -- must hold across value-like distributions (prices,
    sizes, scores: 2-dp decimals, bounded ratio), not just o_totalprice.
    Replicate the arithmetic in NumPy over hypothesis inputs and assert
    the bound. (Unbounded float ranges can break the two-bin bound via
    IEEE edge ties -- documented caveat in range_bounds_sketch; this fuzz
    pins the bound on the op's actual domain.)"""
    import math

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vector_db_from_scratch_spark.operators.quantiles import N_BINS, N_RANGES

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.decimals(
                min_value=0, max_value=10**6, places=2, allow_nan=False
            ).map(float),
            min_size=N_RANGES,
            max_size=400,
        )
    )
    def run(xs):
        xs = np.asarray(xs, dtype=np.float64)
        lo, hi, n = xs.min(), xs.max(), len(xs)
        w = (hi - lo) / N_BINS
        if w == 0.0:
            return  # degenerate constant column: grid undefined, skip
        bins = np.minimum(np.floor((xs - lo) / w), N_BINS - 1).astype(int)
        counts = np.bincount(bins, minlength=N_BINS)
        cum_before = np.concatenate([[0], np.cumsum(counts)[:-1]])
        bounds, idxs, masses = [], [], []
        for i in range(1, N_RANGES):
            idx = math.ceil(i * n / N_RANGES)
            b = int(np.argmax(cum_before + counts >= idx))
            est = lo + w * (b + (idx - cum_before[b]) / counts[b])
            bounds.append(est)
            idxs.append(idx)
            masses.append(counts[b])
        bounds_arr = np.sort(np.asarray(bounds))
        rid = (xs[:, None] >= bounds_arr[None, :]).sum(axis=1)
        n_range = np.bincount(rid, minlength=N_RANGES)
        idx_ext = [0] + idxs + [n]
        for r in range(N_RANGES):
            ideal = idx_ext[r + 1] - idx_ext[r]
            dev_bound = (masses[r - 1] if r > 0 else 0) + (
                masses[r] if r < N_RANGES - 1 else 0
            )
            assert abs(int(n_range[r]) - ideal) <= dev_bound, (
                r, n_range[r], ideal, dev_bound)

    run()


def test_session_restart_merges_boundary_sessions(spark, sf_dir):
    """stream_session_restart_drained must actually exercise MERGING state
    across the restart: the replay splits the timeline in half, so at
    least one emitted session must span the phase boundary (start at or
    before the median event time, end after it) -- otherwise the gate
    would be vacuous for the recovery claim."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.sources.tables import load_table
    from vector_db_from_scratch_spark.streaming import sinks

    res = sinks.session_restart_drained(spark, sf_dir).collect()
    assert res
    ev = load_table(spark, sf_dir, "events")
    med_ts = (
        ev.select(F.col("ts").cast("string").alias("t"))
        .orderBy("t")
        .collect()[ev.count() // 2 - 1]["t"][:19]
    )
    spanning = [
        r for r in res if r["session_start"] <= med_ts < r["session_end"]
    ]
    assert spanning, f"no session spans the phase boundary {med_ts}"


def test_streaming_counter_matches_batch(spark, sf_dir):
    stream_res = run_stream_once(counter_stream(spark, sf_dir), "t_counter")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = ev.groupBy("event_type").count()
    got = {r["event_type"]: r["n"] for r in stream_res.collect()}
    want = {r["event_type"]: r["count"] for r in batch.collect()}
    assert got == want


def test_stateful_first_event_matches_batch(spark, sf_dir):
    """applyInPandasWithState first-occurrence tracking == batch groupBy."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.sources.tables import load_table
    from vector_db_from_scratch_spark.streaming.stateful import run_first_event_once

    res = run_first_event_once(spark, sf_dir)
    got = {
        (r["user_id"], r["event_type"]): (r["first_event_id"], r["n"])
        for r in res.collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r["user_id"], r["event_type"]): (r["first"], r["n"])
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("first"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_stream_static_join_matches_batch(spark, sf_dir):
    """Stream-static enrichment join drained == the batch salted join's
    totals (same weights dimension)."""
    from vector_db_from_scratch_spark.operators.skew import salted_weighted_join
    from vector_db_from_scratch_spark.streaming.windows import enriched_stream, run_stream_once

    res = run_stream_once(enriched_stream(spark, sf_dir), "t_enrich")
    got = {r["event_type"]: (r["n"], r["weighted_value"]) for r in res.collect()}
    want = {r["event_type"]: (r["n_events"], r["weighted_value"])
            for r in salted_weighted_join(spark, sf_dir).collect()}
    assert got == want


def test_stream_bq_bit_population_matches_batch_codes(spark, sf_dir):
    """Drained per-dimension set-bit populations == popcounts of the batch
    code table: sum over low-half dims of n_set equals the total popcount
    of every lo word (and likewise hi), and every population is in [0, N]."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.operators.bq import _codes
    from vector_db_from_scratch_spark.streaming.windows import bq_ingest_drained

    rows = bq_ingest_drained(spark, sf_dir).collect()
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == 64
    assert all(0 <= r["n_set"] <= n for r in rows)
    pops = _codes(spark, sf_dir).select(
        F.sum(F.bit_count("lo")).alias("lo"), F.sum(F.bit_count("hi")).alias("hi")
    ).collect()[0]
    assert sum(r["n_set"] for r in rows if r["dim"] < 32) == pops["lo"]
    assert sum(r["n_set"] for r in rows if r["dim"] >= 32) == pops["hi"]


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Watermarked stream-stream interval join drained == the static
    inequality join over the same data."""
    from vector_db_from_scratch_spark.streaming.joins import (
        click_purchase_batch_join,
        run_join_once,
    )

    got = sorted(
        (r["user_id"], r["purchase_id"], r["click_id"])
        for r in run_join_once(spark, sf_dir).collect()
    )
    want = sorted(
        (r["user_id"], r["purchase_id"], r["click_id"])
        for r in click_purchase_batch_join(spark, sf_dir).collect()
    )
    assert got == want and got


def test_streaming_dedup_one_per_key(spark, sf_dir):
    from vector_db_from_scratch_spark.streaming.windows import dedup_stream

    q = (
        dedup_stream(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")  # dropDuplicates streams append, not complete
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    res = spark.sql("SELECT * FROM t_dedup")
    rows = res.groupBy("user_id", "event_type").count().collect()
    assert rows and all(r["count"] == 1 for r in rows)
    # every key present
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert len(rows) == ev.select("user_id", "event_type").distinct().count()


def test_multibatch_replay_advances_watermark(spark, sf_dir, tmp_path):
    """Rate-limited file replay (maxFilesPerTrigger=1 over time-sliced
    files) must run multiple micro-batches, advance the event-time
    watermark between them, carry state-store rows, and still converge to
    the batch answer."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.streaming.windows import (
        events_stream_from,
        replay_events_dir,
        run_stream_collect_progress,
    )

    import os

    from vector_db_from_scratch_spark.streaming.windows import checkpoint_batches

    out = str(tmp_path / "replay_events")
    replay_events_dir(spark, sf_dir, out, n_files=4)

    ckpt = str(tmp_path / "ckpt")
    src = events_stream_from(spark, out, files_per_trigger=1).withWatermark(
        "ts", "10 minutes"
    )
    agg = src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    res, _progress = run_stream_collect_progress(
        agg.select(F.col("w.start").alias("window_start"), "event_type", "n"),
        "t_replay",
        checkpoint_dir=ckpt,
    )

    # the checkpoint offsets log is the durable per-batch record (the async
    # recentProgress buffer drops entries under load): one committed batch
    # per replay file, watermark strictly advancing across batches
    batches = checkpoint_batches(ckpt)
    assert len(batches) >= 2, f"expected multi-batch replay, got {batches}"
    moving = {b["watermark_ms"] for b in batches if b["watermark_ms"] > 0}
    assert len(moving) >= 2, f"watermark never advanced: {batches}"
    # state store materialized on disk for the windowed aggregation
    assert os.path.isdir(os.path.join(ckpt, "state"))

    batch = (
        spark.read.parquet(out)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    cols = ["window_start", "event_type", "n"]
    assert _rows(res, cols) == _rows(batch, cols)


def test_streaming_dedup_keys_match_batch_twin(spark, sf_dir):
    """dedup_stream's surviving key set == the oracle-checked batch twin
    (stream keeps an arbitrary arrival-order row per key, so rows are not
    comparable -- the key set is)."""
    from vector_db_from_scratch_spark.operators.analytics import first_event_per_key
    from vector_db_from_scratch_spark.streaming.windows import dedup_stream

    q = (
        dedup_stream(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("t_dedup_twin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    stream_keys = {
        (r["user_id"], r["event_type"])
        for r in spark.sql("SELECT user_id, event_type FROM t_dedup_twin").collect()
    }
    batch_keys = {
        (r["user_id"], r["event_type"])
        for r in first_event_per_key(spark, sf_dir).collect()
    }
    assert stream_keys == batch_keys and stream_keys


def test_streaming_sliding_equals_batch(spark, sf_dir):
    from vector_db_from_scratch_spark.streaming.windows import (
        sliding_counts,
        sliding_counts_stream,
    )

    stream_res = run_stream_once(sliding_counts_stream(spark, sf_dir), "t_slide")
    batch = sliding_counts(spark, sf_dir)
    cols = ["window_start", "n", "total_value"]
    assert _rows(stream_res, cols) == _rows(batch.select(*cols), cols)


def test_late_event_dropped_beyond_watermark(spark, tmp_path):
    """The POSITIVE late-data case: an event arriving after the watermark
    passed its window's end is DROPPED by the streaming aggregation
    (append mode) while the batch twin still counts it -- the Dataflow
    trade-off the watermark exists to make, pinned explicitly instead of
    only ever testing the no-late-data equivalence.

    Two engine subtleties this pins (observed on this Spark build):
    the window-finalization boundary is exclusive (watermark must be
    STRICTLY past the window end), and the late-record filter uses the
    watermark with one batch of lag relative to state eviction -- so the
    late file arrives two batches after the watermark-advancing event."""
    import datetime as dt
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.streaming.windows import events_stream_from

    src_dir = str(tmp_path / "late_replay")
    os.makedirs(src_dir)

    def write(name, rows, mtime):
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
        p = os.path.join(src_dir, name)
        pq.write_table(t, p)
        os.utime(p, (mtime, mtime))

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    m = time.time() - 1000
    # batch 0: three on-time events in the [10:00, 11:00) window
    write("f1.parquet", [(1, base), (2, base + dt.timedelta(minutes=10)),
                         (3, base + dt.timedelta(minutes=20))], m)
    # batch 1: 13:00 event -> watermark 12:00 (delay 1h), strictly past
    # the window end, so the window finalizes and emits n=3
    write("f2.parquet", [(4, base + dt.timedelta(hours=3))], m + 10)
    # batch 2: keeps the stream moving so the 12:00 watermark is in force
    # for the NEXT batch's late filter
    write("f3.parquet", [(5, base + dt.timedelta(hours=3, minutes=5))], m + 20)
    # batch 3: a LATE event back in the closed window -- must be dropped
    write("f4.parquet", [(6, base + dt.timedelta(minutes=5))], m + 30)

    stream = events_stream_from(spark, src_dir, files_per_trigger=1).withWatermark(
        "ts", "1 hour"
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    q.stop()
    got = {
        r["window_start"]: r["n"]
        for r in spark.sql("SELECT * FROM t_late_drop").collect()
    }
    assert got.get(base) == 3, f"late event must NOT be counted: {got}"
    assert dropped == 1, f"exactly the late row is dropped by the watermark: {dropped}"

    batch = {
        r["window_start"]: r["n"]
        for r in spark.read.parquet(src_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
        .collect()
    }
    assert batch[base] == 4, "batch counts the late row the stream dropped"


def test_observed_metrics_match_batch(spark, sf_dir):
    """df.observe() on the streaming source: per-query data-quality
    metrics (row count + exact integral value sum) accumulated by the
    engine during the drain must equal the batch aggregate -- the
    zero-extra-pass observability hook a production stream would export."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.operators.relational import MICRO
    from vector_db_from_scratch_spark.streaming.windows import events_stream

    micros = F.round(F.col("value") * F.lit(float(MICRO)), 0).cast("long")
    observed = events_stream(spark, sf_dir).observe(
        "quality", F.count(F.lit(1)).alias("n"), F.sum(micros).alias("value_micros")
    )
    q = (
        observed.writeStream.format("noop")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    got_n = got_sum = 0
    for p in q.recentProgress:
        m = p["observedMetrics"].get("quality") if p["observedMetrics"] else None
        if m is not None:
            got_n += m["n"]
            got_sum += m["value_micros"]
    q.stop()

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = ev.agg(
        F.count(F.lit(1)).alias("n"), F.sum(micros).alias("s")
    ).collect()[0]
    assert got_n == want["n"]
    assert got_sum == want["s"]


def test_left_outer_interval_join_null_emission(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join: the null-padded row for an
    unmatched left row is emitted only after the GLOBAL watermark (the MIN
    across both sides' watermarks) strictly passes its join window --
    three engine semantics pinned at once:
      1. outer stream-stream joins require an equality key alongside the
         time-interval condition;
      2. the watermark that closes join state is min(left, right), so a
         stalled right side blocks null emission forever;
      3. unmatched rows whose windows never close are (correctly) absent
         from the drained result -- the batch twin reports them, which is
         the documented streaming/batch divergence for outer joins."""
    import datetime as dt
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.streaming.windows import events_stream_from

    src_dir = str(tmp_path / "outer_replay")
    os.makedirs(src_dir)

    def write(name, rows, mtime):
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "kind": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            }
        )
        p = os.path.join(src_dir, name)
        pq.write_table(t, p)
        os.utime(p, (mtime, mtime))

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    m = time.time() - 1000
    # user 1 clicks and purchases within the 30-minute window; user 2
    # clicks and never purchases
    write("f1.parquet", [(1, 1, "click", base),
                         (2, 2, "click", base + dt.timedelta(minutes=1))], m)
    write("f2.parquet", [(3, 1, "purchase", base + dt.timedelta(minutes=10))], m + 10)
    # BOTH sides must advance for the min-watermark to move; the trailing
    # batches also absorb the one-batch emission lag
    for i, mins in enumerate((0, 1, 2)):
        write(
            f"f{3 + i}.parquet",
            [
                (4 + i, 3 + i, "click", base + dt.timedelta(hours=5, minutes=mins)),
                (7 + i, 9, "purchase", base + dt.timedelta(hours=5, minutes=mins)),
            ],
            m + 20 + 10 * i,
        )

    ev = events_stream_from(spark, src_dir, files_per_trigger=1)
    clicks = (
        ev.filter(F.col("kind") == "click")
        .select(F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "10 minutes")
    )
    buys = (
        ev.filter(F.col("kind") == "purchase")
        .select(F.col("user_id").alias("bu"), F.col("event_id").alias("buy_id"),
                F.col("ts").alias("buy_ts"))
        .withWatermark("buy_ts", "10 minutes")
    )
    j = clicks.join(
        buys,
        (F.col("cu") == F.col("bu"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    )
    q = (
        j.writeStream.format("memory")
        .queryName("t_outer_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r["click_id"], r["buy_id"])
        for r in spark.sql("SELECT click_id, buy_id FROM t_outer_join").collect()
    )
    # matched pair + the closed-window null; the 15:00+ clicks' windows
    # never close before the stream ends, so they are absent
    assert got == [(1, 3), (2, None)], got


def test_left_join_drained_emits_null_rows(spark, sf_dir):
    """The gated left-outer drain must actually exercise the outer path:
    at least one click has no purchase in its window (null-padded row),
    and no watermark-sentinel rows leak into the result."""
    from vector_db_from_scratch_spark.streaming.joins import (
        click_purchase_left_join_drained,
    )

    rows = click_purchase_left_join_drained(spark, sf_dir).collect()
    assert any(r["purchase_id"] is None for r in rows)
    assert any(r["purchase_id"] is not None for r in rows)
    assert all(r["user_id"] >= 0 for r in rows)


def test_upsert_sink_deterministic(spark, sf_dir):
    """Two independent drains (fresh state dirs) produce identical final
    state -- the upsert merge is deterministic under replay. Uses the
    UNDECORATED drain (__wrapped__): the registry-facing form memoizes per
    (application, sf_dir), which would make a second call vacuous here."""
    from vector_db_from_scratch_spark.streaming.sinks import upsert_sink_drained

    drain = upsert_sink_drained.__wrapped__
    a = [tuple(r) for r in drain(spark, sf_dir).collect()]
    b = [tuple(r) for r in drain(spark, sf_dir).collect()]
    assert a == b and len(a) > 0


def test_memoized_drain_repeat_reads_pinned_result(spark, sf_dir):
    """The drain memo returns the SAME pinned result object on repeat
    calls (the continuous-query-sink discipline) and the pinned rows
    still equal a fresh re-execution of the engine."""
    from vector_db_from_scratch_spark.streaming.windows import counter_drained

    first = counter_drained(spark, sf_dir)
    again = counter_drained(spark, sf_dir)
    assert first is again
    fresh = counter_drained.__wrapped__(spark, sf_dir)
    assert [tuple(r) for r in first.collect()] == [tuple(r) for r in fresh.collect()]


def test_upsert_sink_versioned_pointer_swap(tmp_path, spark):
    """The upsert sink's atomicity mechanism: each committed version is a
    complete directory, CURRENT always names one that exists (never a
    missing path mid-swap), and GC keeps exactly the new version plus its
    immediate predecessor as the in-flight-reader grace window."""
    import os

    from vector_db_from_scratch_spark.streaming.sinks import (
        _commit_version,
        current_state_path,
    )

    root = str(tmp_path)
    assert current_state_path(root) is None
    for batch_id in range(4):
        vdir = os.path.join(root, f"v{batch_id}")
        os.makedirs(vdir)
        with open(os.path.join(vdir, "_SUCCESS"), "w"):
            pass
        _commit_version(root, vdir, batch_id)
        cur = current_state_path(root)
        assert cur == vdir and os.path.exists(cur)
        versions = sorted(n for n in os.listdir(root) if n.startswith("v"))
        expect = [f"v{i}" for i in (batch_id - 1, batch_id) if i >= 0]
        assert versions == expect, versions


def test_upsert_restart_recovers_exactly_once(spark, sf_dir):
    """The two-phase checkpoint-recovery drain: final state equals the
    batch latest-per-key argmax, and the per-epoch ingest accounting sums
    to exactly the corpus row count -- a re-processed file after restart
    would overcount, a lost file would drop keys or undercount."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.sources.tables import load_table
    from vector_db_from_scratch_spark.streaming.sinks import upsert_restart_drained

    rows = upsert_restart_drained.__wrapped__(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    assert rows and all(r["total_ingested"] == n_events for r in rows)
    exact = {
        r["user_id"]: (r["last_event_id"], r["last_event_type"])
        for r in ev.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type")).alias("m"))
        .select(
            "user_id",
            F.col("m.event_id").alias("last_event_id"),
            F.col("m.event_type").alias("last_event_type"),
        )
        .collect()
    }
    got = {r["user_id"]: (r["last_event_id"], r["last_event_type"]) for r in rows}
    assert got == exact


def test_tumbling_restart_recovers_state_store(spark, sf_dir):
    """State-store recovery: the restarted complete-mode query's final
    emission equals the batch tumbling aggregation, and the two replay
    phases genuinely split at least one hourly window (so the gate
    fails unless aggregation state survived the restart)."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.sources.tables import load_table
    from vector_db_from_scratch_spark.streaming.sinks import tumbling_restart_drained

    rows = tumbling_restart_drained.__wrapped__(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    batch = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.date_format(F.window("ts", "1 hour").getField("start"),
                          "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(r["window_start"], r["event_type"]): r["n"] for r in rows}
    assert got == batch
    # sharpness: the replay's first half owns at least one window absent
    # from the second half's input -- such a window can appear in phase
    # 2's complete-mode emission ONLY via the recovered state store, so a
    # lost checkpoint would drop it and flip the gate
    n = ev.count()
    ordered = ev.orderBy("ts", "event_id").select("ts").collect()
    hours = [t["ts"].replace(minute=0, second=0, microsecond=0) for t in ordered]
    phase1, phase2 = set(hours[: n // 2]), set(hours[n // 2 :])
    assert phase1 - phase2, "no phase-1-only window; recovery gate degenerates"


def test_streaming_ams_equals_batch(spark, sf_dir):
    """The AMS counter vector is a pure sum aggregation, so its drained
    streaming form must equal the batch sketch counter for counter."""
    from vector_db_from_scratch_spark.operators import ams
    from vector_db_from_scratch_spark.streaming import windows as w

    cols = ["j", "counter"]
    s = w.ams_ingest_drained.__wrapped__(spark, sf_dir)
    b = ams.ams_counters(spark, sf_dir)
    assert _rows(s, cols) == _rows(b, cols)


def test_streaming_column_stats_equal_batch_recount(spark, sf_dir):
    """Streaming ANALYZE: the drained per-column stats must equal a batch
    recount over the same events table, column for column, including the
    typed min/max canonicalization (nulled for the wrong type)."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.streaming import windows as w

    got = {
        r["col"]: r.asDict()
        for r in w.stats_ingest_drained.__wrapped__(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert set(got) == {c for c, _ in w.EVENT_STATS_COLUMNS}
    n = ev.count()
    for col, kind in w.EVENT_STATS_COLUMNS:
        row = got[col]
        assert row["n_rows"] == n
        assert row["n_null"] == ev.filter(F.col(col).isNull()).count()
        if kind in ("key", "num"):
            agg = ev.agg(
                F.min(F.col(col).cast("double")), F.max(F.col(col).cast("double"))
            ).collect()[0]
            assert row["min_num"] == round(agg[0], 6)
            assert row["max_num"] == round(agg[1], 6)
            assert row["min_str"] is None and row["max_str"] is None
        else:
            assert row["min_num"] is None and row["max_num"] is None
            assert row["min_str"] is not None and row["max_str"] is not None
            assert row["min_str"] <= row["max_str"]


def test_dedup_restart_exercises_cross_phase_keys(spark, sf_dir):
    """stream_dedup_restart_drained is only a recovery gate if some
    (user_id, event_type) key occurs in BOTH timeline halves -- a lost
    state row would then re-emit in phase 2. Pin that overlap, and pin
    the drained result equal to the batch distinct counts."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.sources.tables import load_table
    from vector_db_from_scratch_spark.streaming import sinks

    ev = load_table(spark, sf_dir, "events")
    halves = ev.withColumn("half", F.ntile(2).over(W.orderBy("ts", "event_id")))
    keys = (
        halves.groupBy("user_id", "event_type")
        .agg(F.count_distinct("half").alias("n_halves"))
    )
    overlap = keys.filter(F.col("n_halves") == 2).count()
    assert overlap > 0, "no dedup key spans the phase boundary"

    res = {
        r["user_id"]: r["n_event_types"]
        for r in sinks.dedup_restart_drained(spark, sf_dir).collect()
    }
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("n"))
        .collect()
    }
    assert res == exact


def test_stream_audit_fires_and_matches_batch_recount(spark, sf_dir):
    """The drained streaming audit's tolerance check must FIRE (non-zero
    violations) and every counter must equal a direct batch recount."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.sources.tables import load_table
    from vector_db_from_scratch_spark.streaming.windows import (
        AUDIT_EVENT_VALUE_CAP,
        audit_ingest_drained,
    )

    rows = {r["check_name"]: r for r in audit_ingest_drained(spark, sf_dir).collect()}
    assert len(rows) == 6
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    fired = rows["events_value_le_cap"]
    assert fired["checked"] == n
    assert fired["violations"] == ev.filter(
        F.col("value") > AUDIT_EVENT_VALUE_CAP
    ).count()
    assert fired["violations"] > 0 and not fired["passed"]
    for name in ("events_ts_nonnull", "events_value_nonneg", "events_user_id_nonneg"):
        assert rows[name]["violations"] == 0 and rows[name]["passed"], name


def test_join_restart_exercises_cross_boundary_pairs(spark, sf_dir):
    """stream_join_restart_drained is only a recovery gate if some emitted
    pair STRADDLES the phase boundary: the replay splits at the earliest
    strictly-ordered pair's click (phase 1 ends with it buffered, phase 2
    delivers its purchase), so that pair exists in the output only
    because the click's join-buffer row survived the restart."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.sources.tables import load_table
    from vector_db_from_scratch_spark.streaming import sinks
    from vector_db_from_scratch_spark.streaming.joins import _join_cond, _sides

    res = sinks.join_restart_drained(spark, sf_dir).collect()
    assert res
    ev = load_table(spark, sf_dir, "events")
    clicks, purchases = _sides(ev)
    anchor = (
        clicks.join(purchases, _join_cond())
        .filter(F.col("click_ts") < F.col("purchase_ts"))
        .orderBy("purchase_ts", "click_ts", "purchase_id", "click_id")
        .limit(1)
        .collect()
    )
    boundary = str(anchor[0]["click_ts"])[:19]
    straddling = [
        r for r in res if r["click_ts"] <= boundary < r["purchase_ts"]
    ]
    assert straddling, f"no join pair straddles the phase boundary {boundary}"


def test_streaming_knn_ingest_equals_batch_exact_scan(spark, sf_dir):
    """The standing retrieval query: drained per-shard bottom-k state
    merged on read must equal the batch flat scan exactly."""
    from vector_db_from_scratch_spark.operators.knn import flat_knn
    from vector_db_from_scratch_spark.streaming.stateful import (
        KNN_STREAM_K,
        knn_ingest_drained,
    )

    drained = [
        (r["vec_id"], r["distance"])
        for r in knn_ingest_drained(spark, sf_dir).collect()
    ]
    batch = [
        (r["vec_id"], r["distance"])
        for r in flat_knn(spark, sf_dir, "cosine", k=KNN_STREAM_K).collect()
    ]
    assert drained == batch
