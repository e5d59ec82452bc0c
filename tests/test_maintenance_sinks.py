"""Compaction / layout-rewrite / streaming-sink behavior."""

from pyspark.sql import functions as F

from vector_db_from_scratch_spark.operators.maintenance import (
    compact,
    parquet_file_count,
    rewrite_partitioned,
)
from vector_db_from_scratch_spark.streaming.sinks import (
    aggregate_via_foreach_batch,
    write_events_parquet,
)


def test_compact_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(16)
    frag = str(tmp_path / "fragmented")
    li.write.parquet(frag)
    assert parquet_file_count(frag) >= 16
    compacted = str(tmp_path / "compacted")
    compact(spark.read.parquet(frag), compacted, target_files=2)
    assert parquet_file_count(compacted) <= 2
    a = spark.read.parquet(frag).orderBy("l_orderkey", "l_linenumber").collect()
    b = spark.read.parquet(compacted).orderBy("l_orderkey", "l_linenumber").collect()
    assert a == b


def test_rewrite_partitioned_prunes(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "by_lang")
    rewrite_partitioned(docs, out, "lang")
    reloaded = spark.read.parquet(out)
    plan = reloaded.filter(F.col("lang") == "en")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert reloaded.count() == docs.count()


def test_streaming_parquet_sink_checkpoint_idempotent(spark, sf_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = write_events_parquet(spark, sf_dir, out, ckpt)
    q.processAllAvailable(); q.stop()
    n1 = spark.read.parquet(out).count()
    assert n1 == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # restart with the same checkpoint: no new input -> no duplicate output
    q2 = write_events_parquet(spark, sf_dir, out, ckpt)
    q2.processAllAvailable(); q2.stop()
    assert spark.read.parquet(out).count() == n1


def test_foreach_batch_snapshot(spark, sf_dir, tmp_path):
    out, ckpt = str(tmp_path / "agg"), str(tmp_path / "ckpt2")
    q = aggregate_via_foreach_batch(spark, sf_dir, out, ckpt)
    q.processAllAvailable(); q.stop()
    got = {r["event_type"]: r["n"] for r in spark.read.parquet(out).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {r["event_type"]: r["count"] for r in ev.groupBy("event_type").count().collect()}
    assert got == want


def test_partition_pruned_stats_plan_prunes(spark, sf_dir):
    """The registry's sink_partition_pruned query must resolve its lang
    filter to directory pruning (a real PartitionFilters entry), and the
    interchange round-trips must preserve row counts exactly."""
    from vector_db_from_scratch_spark.plans import plan_string
    from vector_db_from_scratch_spark.sources.csvio import (
        PRUNE_LANGS,
        partition_pruned_stats,
        read_documents_csv,
        documents_csv_dir,
    )
    from vector_db_from_scratch_spark.sources.jsonl import (
        documents_jsonl_dir,
        read_documents_jsonl,
    )

    plan = plan_string(partition_pruned_stats(spark, sf_dir))
    assert "PartitionFilters" in plan and "lang" in plan
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert read_documents_csv(spark, documents_csv_dir(spark, sf_dir)).count() == n
    assert read_documents_jsonl(spark, documents_jsonl_dir(spark, sf_dir)).count() == n
    assert len(PRUNE_LANGS) == 2


def test_range_pruned_scan_plan_prunes(spark, sf_dir):
    """sink_range_pruned: the range_id filter over the sketch-partitioned
    layout must resolve to directory pruning, the scanned ranges must
    cover exactly the rows the boundary assignment puts there, and every
    range's extrema must respect its boundaries."""
    from vector_db_from_scratch_spark.operators import quantiles
    from vector_db_from_scratch_spark.plans import plan_string

    res = quantiles.range_pruned_scan(spark, sf_dir)
    plan = plan_string(res)
    assert "PartitionFilters" in plan and "range_id" in plan
    rows = {r["range_id"]: r for r in res.collect()}
    assert set(rows) <= set(quantiles.RANGE_PRUNE_IDS)
    # ranges are value-contiguous: max of range r <= min of range r+1
    ordered = [rows[i] for i in sorted(rows)]
    for a, b in zip(ordered, ordered[1:]):
        assert a["max_price"] <= b["min_price"]


def test_schema_evolution_merged_read(spark, sf_dir):
    """mergeSchema read over the two shard generations: the unified schema
    is the union (late v2 columns surface as NULL for v1 rows), the
    gen=... directory names surface as a partition column, and no rows are
    lost across generations."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.sources.evolution import (
        evolved_documents_dir,
    )

    import os

    root = evolved_documents_dir(spark, sf_dir)
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", root)
        .parquet(os.path.join(root, "gen=v1"), os.path.join(root, "gen=v2"))
    )
    fields = {f.name for f in merged.schema.fields}
    assert {"doc_id", "lang", "text", "source", "n_chars", "gen"} <= fields
    n_total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert merged.count() == n_total
    v1_nulls = merged.filter(F.col("gen") == "v1").filter(
        F.col("n_chars").isNotNull()
    ).count()
    assert v1_nulls == 0, "v1 shards lack n_chars; merge must NULL-fill"
    assert merged.filter(
        (F.col("gen") == "v2") & F.col("n_chars").isNull()
    ).count() == 0


def test_column_stats_analyze_surface(spark, sf_dir):
    """ANALYZE stats: one row per declared column, key-column NDV equals
    the row count (o_orderkey is unique), typed min/max populated by
    kind, and the KMV NDV estimate is exact below the sketch's k."""
    from vector_db_from_scratch_spark.operators import maintenance
    from vector_db_from_scratch_spark.operators.kmv import K_MIN

    rows = {r["col"]: r for r in maintenance.column_stats(spark, sf_dir).collect()}
    assert set(rows) == {c for c, _ in maintenance.STATS_COLUMNS}
    ok = rows["o_orderkey"]
    assert ok["ndv_exact"] == ok["n_rows"] and ok["n_null"] == 0
    for col, kind in maintenance.STATS_COLUMNS:
        r = rows[col]
        assert r["n_rows"] == ok["n_rows"]
        if kind in ("key", "num"):
            assert r["min_num"] is not None and r["min_num"] <= r["max_num"]
            assert r["min_str"] is None
        else:
            assert r["min_str"] is not None and r["min_str"] <= r["max_str"]
            assert r["min_num"] is None
        if r["ndv_exact"] < K_MIN:
            assert r["ndv_est"] == float(r["ndv_exact"])
        assert r["ndv_est"] > 0


def test_column_stats_merge_is_lossless(spark, sf_dir):
    """Partition stats folded to table stats must equal a direct ANALYZE:
    counts, bounds, and the merged KMV NDV estimate all match (bottom-k of
    the union of per-partition bottom-ks IS the global bottom-k)."""
    from vector_db_from_scratch_spark.operators import maintenance

    rows = maintenance.column_stats_merge(spark, sf_dir).collect()
    assert len(rows) == len(maintenance.STATS_MERGE_COLUMNS)
    for r in rows:
        assert r["counts_match"] and r["bounds_match"] and r["ndv_match"], r
        assert r["m_n_rows"] == r["w_n_rows"]
        assert r["m_ndv_est"] == r["w_ndv_est"]


def test_zorder_pruned_scan_plan_prunes_and_interleave_sound(spark, sf_dir):
    """sink_zorder_pruned: the static partition IN-list must resolve to
    directory pruning; morton2 must be a bijection on the cell grid whose
    prefix squares are axis-aligned; and every returned cell must lie
    inside the gated bucket-space box with its partition id equal to its
    cell's high bits."""
    from vector_db_from_scratch_spark.operators import zorder
    from vector_db_from_scratch_spark.plans import plan_string

    # curve properties (pure Python): bijective on the 2^ZBITS square, and
    # each ZPART_SHIFT-prefix covers a contiguous 2x2 bucket square
    cells = {
        zorder.morton2(bx, by): (bx, by)
        for bx in range(zorder.ZSIDE)
        for by in range(zorder.ZSIDE)
    }
    assert len(cells) == zorder.ZSIDE * zorder.ZSIDE
    for part in range(zorder.ZSIDE * zorder.ZSIDE >> zorder.ZPART_SHIFT):
        sq = [cells[z] for z in range(part << zorder.ZPART_SHIFT,
                                      (part + 1) << zorder.ZPART_SHIFT)]
        xs = {bx for bx, _ in sq}
        ys = {by for _, by in sq}
        assert len(xs) == 2 and len(ys) == 2  # an aligned 2x2 square
        assert max(xs) - min(xs) == 1 and max(ys) - min(ys) == 1

    res = zorder.zorder_pruned_scan(spark, sf_dir)
    plan = plan_string(res)
    assert "PartitionFilters" in plan and "zpart" in plan
    rows = res.collect()
    assert rows, "box must be non-empty at every SF"
    for r in rows:
        assert r["zpart"] in zorder.box_partitions()
        assert r["zpart"] == r["zcell"] >> zorder.ZPART_SHIFT
        bx, by = cells[r["zcell"]]
        assert zorder.BOX_BX[0] <= bx <= zorder.BOX_BX[1]
        assert zorder.BOX_BY[0] <= by <= zorder.BOX_BY[1]


def test_join_strategy_auto_decisions_and_forced_plan_shapes(spark, sf_dir):
    """join_strategy_auto: the width-model decision must pick broadcast
    for the small build side and shuffle for the fact table at the test
    SFs; the forced subtrees must actually plan as BroadcastHashJoin /
    SortMergeJoin; and the emitted join aggregates must equal a direct
    recount (the flag-guarded union leaks nothing)."""
    from pyspark.sql import functions as F
    from vector_db_from_scratch_spark.operators import maintenance as m
    from vector_db_from_scratch_spark.plans import plan_string

    rows = {r["probe"]: r for r in m.join_strategy_auto(spark, sf_dir).collect()}
    assert rows[1]["build_side"] == "customer" and rows[1]["strategy"] == "broadcast"
    assert rows[2]["build_side"] == "lineitem" and rows[2]["strategy"] == "shuffle"
    for r in rows.values():
        assert r["est_bytes"] >= r["n_build_rows"] * 8  # width model floor

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # forced branch shapes: the hint the decision selects must take effect
    bcast = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    assert "BroadcastHashJoin" in plan_string(bcast)
    shuf = orders.join(li.hint("merge"), orders.o_orderkey == li.l_orderkey)
    p = plan_string(shuf)
    assert "SortMergeJoin" in p and "BroadcastHashJoin" not in p
    # aggregates equal a direct recount
    assert rows[1]["n_join"] == orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).count()
    assert rows[2]["n_join"] == orders.join(
        li, orders.o_orderkey == li.l_orderkey
    ).count()


def test_constraint_audit_non_vacuous_and_consistent(spark, sf_dir):
    """The audit must (a) fire its tolerance checks on this corpus
    (non-zero violations, passed=False) so the counting arithmetic is
    exercised, (b) report zero violations with passed=True for the
    invariants the generator guarantees, and (c) agree with direct
    recounts for one zero and one non-zero check."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.operators.maintenance import (
        AUDIT_MAX_PRICE,
        constraint_audit,
    )
    from vector_db_from_scratch_spark.sources.tables import load_table

    rows = {r["check_name"]: r for r in constraint_audit(spark, sf_dir).collect()}
    assert len(rows) == 19

    # tolerance checks fire on the test corpus
    fired = rows["orders_price_le_cap"]
    assert fired["violations"] > 0 and not fired["passed"]
    assert rows["documents_text_min_chars"]["violations"] > 0

    # generator-guaranteed invariants hold
    for name in (
        "orders_pk_unique",
        "orders_fk_customer",
        "lineitem_fk_orders",
        "customer_fk_nation",
        "embeddings_dim_consistent",
        "documents_nchars_consistent",
    ):
        assert rows[name]["violations"] == 0 and rows[name]["passed"], name

    # counts agree with direct recounts
    orders = load_table(spark, sf_dir, "orders")
    assert (
        rows["orders_price_le_cap"]["violations"]
        == orders.filter(F.col("o_totalprice") > AUDIT_MAX_PRICE).count()
    )
    assert rows["orders_pk_unique"]["checked"] == orders.count()


def test_column_correlations_match_numpy(spark, sf_dir):
    """Pearson r from the exact decimal/HUGEINT integer moments must
    agree with NumPy's float64 corrcoef to the 6dp display grain, be
    symmetric-complete (all C(4,2) pairs), and bounded in [-1, 1]."""
    import numpy as np
    import pyarrow.parquet as pq

    from vector_db_from_scratch_spark.operators.maintenance import (
        CORR_COLS,
        column_correlations,
    )

    rows = column_correlations(spark, sf_dir).collect()
    assert len(rows) == len(CORR_COLS) * (len(CORR_COLS) - 1) // 2
    tbl = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=list(CORR_COLS)
    ).to_pydict()
    cents = {
        c: np.round(np.asarray(tbl[c], dtype=np.float64) * 100.0) for c in CORR_COLS
    }
    for r in rows:
        assert -1.0 <= r["r"] <= 1.0
        expect = np.corrcoef(cents[r["col_x"]], cents[r["col_y"]])[0, 1]
        assert abs(r["r"] - expect) < 2e-6, (r, expect)


def test_hist2d_conserves_rows_and_bounds_cells(spark, sf_dir):
    from vector_db_from_scratch_spark.operators.quantiles import HIST2D_BINS, hist2d
    from vector_db_from_scratch_spark.sources.tables import load_table

    rows = hist2d(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r["n_cell"] for r in rows) == n
    assert len(rows) <= HIST2D_BINS * HIST2D_BINS
    assert all(
        0 <= r["bx"] < HIST2D_BINS and 0 <= r["by"] < HIST2D_BINS for r in rows
    )
