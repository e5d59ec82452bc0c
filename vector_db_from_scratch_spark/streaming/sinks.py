"""Streaming sinks: checkpointed parquet append and foreachBatch sinks --
the production patterns for streaming writes Spark has no native sink
for. The S7 analog for streams: exactly-once file-sink semantics come
from the checkpoint (source offsets + file manifest); foreachBatch is
the escape hatch -- each micro-batch arrives as a batch DataFrame with
an epoch id for idempotence, against which arbitrary batch jobs run
(merge/upsert, multi-table fan-out, JDBC).

The gated flagship is a keyed UPSERT sink. Each micro-batch reduces to one row per
user_id (the latest event by (ts, event_id)) and merges it into a parquet
state table -- insert new keys, replace beaten rows. After the drain, the
state table must equal the batch "latest event per key" argmax, which is
the oracle. This is the streaming half of the reference's stored-counter
idea (O8) generalized to arbitrary per-key state, and the lifecycle a
real pipeline runs against Delta/Iceberg MERGE (unavailable in this
container -- plain parquet swap stands in, same dataflow).

Scale notes: the per-batch merge is one groupBy on user_id (the batch
side, small) + one outer-join-shaped combine against the state table;
with a table format this is MERGE INTO with file skipping on the key.
Each batch writes a NEW versioned directory and then atomically renames
a pointer file (CURRENT) over the old one, so a concurrent reader that
resolves the pointer sees a complete old or new snapshot -- there is no
instant with no state path (the defect of the previous two-rename swap).
The immediately-previous version is retained until the next swap as a
grace window for in-flight readers; a table format's snapshot GC is the
production form of the same idea.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windows import events_stream, memoize_drain


def write_events_parquet(
    spark: SparkSession, sf_dir: str, out_dir: str, checkpoint_dir: str
):
    """Checkpointed append of the raw stream to a parquet sink; returns the
    query (caller drains/stops). Restart-safe: rerunning with the same
    checkpoint emits nothing new for already-committed source files."""
    ev = events_stream(spark, sf_dir)
    return (
        ev.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def aggregate_via_foreach_batch(
    spark: SparkSession, sf_dir: str, out_dir: str, checkpoint_dir: str
):
    """foreachBatch: per-micro-batch custom sink logic (here: overwrite an
    aggregate snapshot keyed by batch -- the idempotent-upsert shape)."""
    ev = events_stream(spark, sf_dir)
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    return (
        counts.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _latest_per_key(df: DataFrame) -> DataFrame:
    """(user_id, m=struct(ts, event_id, event_type)) argmax reduction --
    max(struct) orders by (ts, event_id) with event_id unique, so the
    result is deterministic."""
    return df.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type")).alias("m")
    )


def current_state_path(state_root: str) -> str | None:
    """Resolve the live snapshot directory via the CURRENT pointer file;
    None before the first committed version."""
    ptr = os.path.join(state_root, "CURRENT")
    try:
        with open(ptr) as fh:
            return os.path.join(state_root, fh.read().strip())
    except OSError:
        return None


def _commit_version(state_root: str, version_dir: str, batch_id: int) -> None:
    """Atomically repoint CURRENT at ``version_dir`` (rename over an
    existing file is atomic on POSIX), then GC every version except the
    new one and its immediate predecessor -- the grace window for readers
    that resolved the pointer just before the swap. The predecessor is
    read from the pointer's prior contents, not derived as v{batch_id-1}:
    batch ids need not be consecutive (empty batches may skip a commit)."""
    ptr = os.path.join(state_root, "CURRENT")
    prev = None
    try:
        with open(ptr) as fh:
            prev = fh.read().strip()
    except OSError:
        pass  # first commit: no predecessor to retain
    tmp_ptr = ptr + f".tmp-{batch_id}"
    with open(tmp_ptr, "w") as fh:
        fh.write(os.path.basename(version_dir))
    os.rename(tmp_ptr, ptr)
    keep = {os.path.basename(version_dir)}
    if prev:
        keep.add(prev)
    for name in os.listdir(state_root):
        if name.startswith("v") and name not in keep:
            shutil.rmtree(os.path.join(state_root, name), ignore_errors=True)


@memoize_drain
def upsert_sink_drained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the replayed events stream through a foreachBatch upsert into
    a versioned parquet state table (CURRENT-pointer swap, see module
    docstring); return the final state (latest event per user), gated
    against the batch argmax oracle."""
    from ..sources.artifacts import scratch_dir
    from .joins import _left_join_replay_dir
    from .windows import drain_conf, events_stream_from

    replay = _left_join_replay_dir(spark, sf_dir)  # memoized slices + sentinels
    state_root = scratch_dir("upsert-state-")

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        # sentinels (user_id < 0) are watermark fuel for the join drain
        # that shares this replay dir; the upsert ignores them
        batch_latest = _latest_per_key(batch_df.filter(F.col("user_id") >= 0))
        cur_path = current_state_path(state_root)
        if cur_path is not None:
            cur = batch_df.sparkSession.read.parquet(cur_path)
            merged = _latest_per_key(
                cur.unionByName(batch_latest).select(
                    "user_id", F.col("m.ts").alias("ts"),
                    F.col("m.event_id").alias("event_id"),
                    F.col("m.event_type").alias("event_type"),
                )
            )
        else:
            merged = batch_latest
        version_dir = os.path.join(state_root, f"v{batch_id}")
        merged.coalesce(4).write.mode("overwrite").parquet(version_dir)
        _commit_version(state_root, version_dir, batch_id)

    ev = events_stream_from(spark, replay, files_per_trigger=1)
    with drain_conf(spark):
        q = (
            ev.writeStream.foreachBatch(merge)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    final_path = current_state_path(state_root)
    if final_path is None:
        raise RuntimeError(
            f"upsert sink committed no state under {state_root}: the drain "
            "produced no micro-batch (empty/missing replay dir?)"
        )
    final = spark.read.parquet(final_path)
    return final.select(
        "user_id",
        F.date_format("m.ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.col("m.event_id").alias("last_event_id"),
        F.col("m.event_type").alias("last_event_type"),
    ).orderBy("user_id")


def upsert_sink_drained_oracle() -> str:
    return """
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       event_id AS last_event_id,
       event_type AS last_event_type
FROM (SELECT user_id, ts, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
ORDER BY user_id
""".strip()


@memoize_drain
def upsert_restart_drained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-RECOVERY equivalence under the gate (VERDICT r8 item 4
    -- the exactly-once restart claim a cluster deployment rests on):
    drain HALF the replayed events through the versioned upsert sink,
    STOP the query, then restart a fresh query from the SAME checkpoint
    over the full directory (now holding the remaining files) and drain
    to completion. The recovered query must process each source file
    exactly once: the final state must equal the batch latest-per-key
    argmax AND the cumulative ingested-row count (appended per committed
    micro-batch, keyed by epoch id -- epoch ids continue across restarts)
    must equal the corpus row count. Re-processing a phase-1 file after
    restart overcounts; losing one undercounts or drops keys -- either
    flips the hash."""
    import glob

    from ..sources.artifacts import scratch_dir
    from .windows import drain_conf, events_stream_from, restart_replay_files

    files = restart_replay_files(spark, sf_dir, n_files=2)
    assert len(files) >= 2, files
    stream_dir = scratch_dir("upsert-restart-stream-")
    ckpt = scratch_dir("upsert-restart-ckpt-")
    state_root = scratch_dir("upsert-restart-state-")
    ingest_log = scratch_dir("upsert-restart-ingest-")

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        real = batch_df.filter(F.col("user_id") >= 0)
        n_rows = real.count()
        batch_latest = _latest_per_key(real)
        cur_path = current_state_path(state_root)
        if cur_path is not None:
            cur = batch_df.sparkSession.read.parquet(cur_path)
            merged = _latest_per_key(
                cur.unionByName(batch_latest).select(
                    "user_id", F.col("m.ts").alias("ts"),
                    F.col("m.event_id").alias("event_id"),
                    F.col("m.event_type").alias("event_type"),
                )
            )
        else:
            merged = batch_latest
        version_dir = os.path.join(state_root, f"v{batch_id}")
        merged.coalesce(4).write.mode("overwrite").parquet(version_dir)
        _commit_version(state_root, version_dir, batch_id)
        # per-epoch ingest accounting: epoch ids are monotonic across
        # restarts, so a re-processed file would land a NEW count file
        # and inflate the gated total
        with open(os.path.join(ingest_log, f"ingest-{batch_id}.txt"), "w") as fh:
            fh.write(str(n_rows))

    def drain_phase(new_files: list[str]) -> None:
        for f in new_files:
            shutil.copy(f, os.path.join(stream_dir, os.path.basename(f)))
        ev = events_stream_from(spark, stream_dir, files_per_trigger=1)
        with drain_conf(spark):
            q = (
                ev.writeStream.foreachBatch(merge)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()

    half = len(files) // 2
    drain_phase(files[:half])   # phase 1: first half, then a clean stop
    drain_phase(files[half:])   # phase 2: SAME checkpoint, remaining files
    final_path = current_state_path(state_root)
    if final_path is None:
        raise RuntimeError(
            f"restart drain committed no state under {state_root}: the "
            "replay produced no micro-batch (empty/missing replay dir?)"
        )
    total = sum(
        int(open(p).read())
        for p in glob.glob(os.path.join(ingest_log, "ingest-*.txt"))
    )
    final = spark.read.parquet(final_path)
    return final.select(
        "user_id",
        F.date_format("m.ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.col("m.event_id").alias("last_event_id"),
        F.col("m.event_type").alias("last_event_type"),
        F.lit(total).cast("long").alias("total_ingested"),
    ).orderBy("user_id")


def upsert_restart_drained_oracle() -> str:
    return """
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       event_id AS last_event_id,
       event_type AS last_event_type,
       (SELECT count(*) FROM events) AS total_ingested
FROM (SELECT user_id, ts, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
ORDER BY user_id
""".strip()


@memoize_drain
def tumbling_restart_drained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATE-STORE checkpoint recovery under the gate (the companion to
    :func:`upsert_restart_drained`, which covers source-offset recovery
    of a stateless foreachBatch sink): a complete-mode windowed
    aggregation drains the FIRST time slice, stops, and a new query
    restarts from the same checkpoint over the remainder. The replay
    slices split mid-hour, so the boundary window's count combines events
    from BOTH phases -- it is correct in the final complete-mode emission
    only if the aggregation state genuinely survived the restart. Output
    hash-gates against the batch tumbling oracle."""
    from ..sources.artifacts import scratch_dir
    from .windows import drain_conf, events_stream_from, restart_replay_files

    files = restart_replay_files(spark, sf_dir, n_files=2)
    assert len(files) >= 2, files
    stream_dir = scratch_dir("tumble-restart-stream-")
    ckpt = scratch_dir("tumble-restart-ckpt-")

    def run_phase(new_files: list[str], qname: str) -> DataFrame:
        for f in new_files:
            shutil.copy(f, os.path.join(stream_dir, os.path.basename(f)))
        ev = events_stream_from(spark, stream_dir, files_per_trigger=1)
        agg = ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
            F.count(F.lit(1)).alias("n")
        )
        with drain_conf(spark):
            q = (
                agg.writeStream.format("memory")
                .queryName(qname)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
        return spark.table(qname)

    half = len(files) // 2
    run_phase(files[:half], "t_gate_tumble_restart_p1")
    res = run_phase(files[half:], "t_gate_tumble_restart_p2")
    return res.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
    ).orderBy("window_start", "event_type")


def tumbling_restart_drained_oracle() -> str:
    from .windows import tumbling_counts_drained_oracle

    return tumbling_counts_drained_oracle()


@memoize_drain
def session_restart_drained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint recovery for session-window MERGING state -- the third
    state type under a mid-stream restart (tumbling_restart covers fixed
    window buckets, upsert_restart covers source offsets + a foreachBatch
    sink). The replay slices split the event timeline in half, so every
    user whose session straddles the boundary can only emit ONE merged
    session if the recovered state's open sessions genuinely merge with
    phase-2 arrivals -- a lost or duplicated state row splits a session
    or doubles n_events, and either flips the hash against the batch
    gaps-and-islands oracle."""
    from ..sources.artifacts import scratch_dir
    from .windows import GAP, drain_conf, events_stream_from, restart_replay_files

    files = restart_replay_files(spark, sf_dir, n_files=2)
    assert len(files) >= 2, files
    stream_dir = scratch_dir("session-restart-stream-")
    ckpt = scratch_dir("session-restart-ckpt-")

    def run_phase(new_files: list[str], qname: str) -> DataFrame:
        for f in new_files:
            shutil.copy(f, os.path.join(stream_dir, os.path.basename(f)))
        ev = events_stream_from(spark, stream_dir, files_per_trigger=1)
        agg = ev.groupBy(
            F.session_window("ts", GAP).alias("w"), "user_id"
        ).agg(F.count(F.lit(1)).alias("n_events"))
        with drain_conf(spark):
            q = (
                agg.writeStream.format("memory")
                .queryName(qname)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
        return spark.table(qname)

    half = len(files) // 2
    run_phase(files[:half], "t_gate_session_restart_p1")
    res = run_phase(files[half:], "t_gate_session_restart_p2")
    return res.select(
        "user_id",
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    ).orderBy("user_id", "session_start")


def session_restart_drained_oracle() -> str:
    from .windows import session_stats_drained_oracle

    return session_stats_drained_oracle()


@memoize_drain
def dedup_restart_drained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint recovery for dropDuplicates KEY state -- the fourth
    state type under a mid-stream restart (tumbling_restart: fixed window
    buckets; session_restart: merging sessions; upsert_restart: source
    offsets + foreachBatch). Phase 1 drains the first time slice and
    stops; phase 2 restarts from the SAME checkpoint over the remainder.
    dropDuplicates emits each (user_id, event_type) key at most once
    ACROSS the whole stream only if the seen-key state survived the
    restart: a lost state row re-emits its key in phase 2, the
    union-of-phases then counts that event_type twice for its user, and
    the per-user distinct-count reduction (shared verbatim with
    dedup_drained's oracle) hash-mismatches. Late-drop hazards don't
    apply: replay slices are contiguous time-ordered, so no phase-2 row
    is behind the recovered watermark."""
    from ..sources.artifacts import scratch_dir
    from .windows import drain_conf, events_stream_from, restart_replay_files

    files = restart_replay_files(spark, sf_dir, n_files=2)
    assert len(files) >= 2, files
    stream_dir = scratch_dir("dedup-restart-stream-")
    ckpt = scratch_dir("dedup-restart-ckpt-")
    # append-mode memory sinks refuse checkpoint recovery, so the emission
    # goes through the real FILE sink: its _spark_metadata commit log is
    # what makes the output exactly-once across the restart, which is
    # itself part of what this gate verifies
    out_dir = scratch_dir("dedup-restart-out-")

    def run_phase(new_files: list[str]) -> None:
        for f in new_files:
            shutil.copy(f, os.path.join(stream_dir, os.path.basename(f)))
        deduped = (
            events_stream_from(spark, stream_dir, files_per_trigger=1)
            .withWatermark("ts", "1 hour")
            .dropDuplicates(["user_id", "event_type"])
            .select("user_id", "event_type")
        )
        with drain_conf(spark):
            q = (
                deduped.writeStream.format("parquet")
                .option("path", out_dir)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()

    half = len(files) // 2
    run_phase(files[:half])
    run_phase(files[half:])
    # the manifest-governed read sees both phases' emissions exactly once;
    # exactly-once-per-key across the restart makes the per-user row count
    # equal the batch distinct count
    return (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_event_types"))
        .orderBy("user_id")
    )


def dedup_restart_drained_oracle() -> str:
    from .windows import dedup_drained_oracle

    return dedup_drained_oracle()


@memoize_drain
def join_restart_drained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint recovery for stream-stream JOIN buffer state -- the
    FIFTH recovered state type (tumbling: window buckets; session:
    merging sessions; dedup: seen keys; upsert: source offsets +
    foreachBatch sink). The watermarked interval join buffers each side
    until the watermark passes its join window; splitting the replay in
    half mid-timeline means every click arriving shortly before the
    boundary can only pair with a phase-2 purchase if its buffered row
    SURVIVED the restart. A lost buffer row silently drops those pairs,
    a re-read phase-1 file duplicates them -- either flips the hash
    against the batch interval-join oracle (shared verbatim with
    stream_join_drained). Emission goes through the real parquet file
    sink (append-mode memory sinks refuse recovery), so its
    _spark_metadata exactly-once commit log is under the same gate."""
    import glob
    import time as _time

    from ..sources.artifacts import scratch_dir
    from ..sources.tables import load_table
    from .joins import _join_cond, _sides
    from .windows import drain_conf, events_stream_from

    # Split the replay AT a join pair, not at the row-count median: the
    # corpus is sparse enough (1 matched pair at sf0.001) that an
    # arbitrary split can leave zero pairs straddling the boundary --
    # which would make the recovery gate vacuous. Anchor the boundary at
    # the earliest strictly-ordered pair's click: phase 1 ends with that
    # click buffered, phase 2 delivers its purchase, so >= 1 emitted pair
    # exists ONLY IF the buffer survived the restart (pinned in tests).
    ev = load_table(spark, sf_dir, "events")
    bclicks, bpurchases = _sides(ev)
    anchor = (
        bclicks.join(bpurchases, _join_cond())
        .filter(F.col("click_ts") < F.col("purchase_ts"))
        .orderBy("purchase_ts", "click_ts", "purchase_id", "click_id")
        .limit(1)
        .collect()
    )
    if not anchor:
        raise RuntimeError(
            "no strictly-ordered click->purchase pair in the corpus: the "
            "join-restart gate cannot be made non-vacuous at this SF"
        )
    boundary = anchor[0]["click_ts"]
    replay = scratch_dir("ssjoin-restart-replay-")
    for i, part in enumerate(
        (ev.filter(F.col("ts") <= F.lit(boundary)),
         ev.filter(F.col("ts") > F.lit(boundary)))
    ):
        part.coalesce(1).write.mode("overwrite" if i == 0 else "append").parquet(
            replay
        )
        _time.sleep(0.1)  # distinct mtimes -> deterministic arrival order
    files = sorted(
        glob.glob(os.path.join(replay, "part-*.parquet")), key=os.path.getmtime
    )  # mtime IS the arrival order (sequential writes, 0.1s apart);
    # lexical sort would order by random part-file uuid
    assert len(files) >= 2, files
    stream_dir = scratch_dir("ssjoin-restart-stream-")
    ckpt = scratch_dir("ssjoin-restart-ckpt-")
    out_dir = scratch_dir("ssjoin-restart-out-")

    def run_phase(new_files: list[str]) -> None:
        for f in new_files:
            shutil.copy(f, os.path.join(stream_dir, os.path.basename(f)))
        ev = events_stream_from(spark, stream_dir, files_per_trigger=1)
        clicks, purchases = _sides(ev)
        clicks = clicks.withWatermark("click_ts", "1 hour")
        purchases = purchases.withWatermark("purchase_ts", "1 hour")
        j = clicks.join(purchases, _join_cond()).select(
            F.col("p_user").alias("user_id"), "purchase_id", "click_id",
            "purchase_ts", "click_ts",
        )
        # 2 state partitions: the two-sided join's per-batch state-store
        # commit dominates the bounded drain (the left-join lesson)
        with drain_conf(spark, 2):
            q = (
                j.writeStream.format("parquet")
                .option("path", out_dir)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()

    half = len(files) // 2
    run_phase(files[:half])
    run_phase(files[half:])
    return (
        spark.read.parquet(out_dir)
        .select(
            "user_id",
            "purchase_id",
            "click_id",
            F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        )
        .orderBy("user_id", "purchase_id", "click_id")
    )


def join_restart_drained_oracle() -> str:
    from .joins import click_purchase_join_drained_oracle

    return click_purchase_join_drained_oracle()
