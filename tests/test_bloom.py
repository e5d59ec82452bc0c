"""Bloom-filter join pruning: semantics + plan shape.

The oracle gate pins exact values (tools/check.py); these tests pin the
INVARIANTS that make the operator a correct runtime filter -- no false
negatives, bounded false-positive rate at the 10-bits/key sizing, a
non-negative packed bitmap, and broadcast (never shuffled) membership
probes.
"""

import pyspark.sql.functions as F

from vector_db_from_scratch_spark.operators import bloom
from vector_db_from_scratch_spark.plans import plan_string
from vector_db_from_scratch_spark.sources.tables import load_table


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    """revenue/count through the Bloom pre-filter + exact re-check must
    equal the plain semi-join: a Bloom filter can only over-approximate."""
    row = bloom.bloom_prefiltered_join(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    plain = li.join(
        F.broadcast(keys), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    ).count()
    assert row["n_exact"] == plain
    assert row["false_positives"] >= 0
    assert row["n_prefilter"] == row["n_exact"] + row["false_positives"]


def test_bloom_false_positive_rate_bounded(spark, sf_dir):
    """At ~10 bits/key with K=3 the theoretical fp rate is ~1.7%; assert
    an order-of-magnitude guard so a sizing or hashing regression (which
    would push the filter toward all-pass) fails loudly."""
    row = bloom.bloom_prefiltered_join(spark, sf_dir).collect()[0]
    li_total = load_table(spark, sf_dir, "lineitem").count()
    non_members = li_total - row["n_exact"]
    if non_members:
        assert row["false_positives"] / non_members < 0.2


def test_bloom_bitmap_packing(spark, sf_dir):
    """Words are non-negative (63-bit packing), word indexes are inside
    the sized filter, and total set bits never exceed K * n_keys."""
    rows = bloom.bloom_bitmap(spark, sf_dir).collect()
    stats = bloom.bloom_prefiltered_join(spark, sf_dir).collect()[0]
    assert rows, "empty bitmap"
    assert all(r["word"] > 0 for r in rows)
    assert all(0 <= r["word_idx"] < stats["m_bits"] // bloom.BITS_PER_WORD for r in rows)
    set_bits = sum(bin(r["word"]).count("1") for r in rows)
    assert 0 < set_bits <= bloom.K_HASHES * stats["n_keys"]


def test_bloom_membership_probes_broadcast(spark, sf_dir):
    """The K membership probes must be broadcast left-semi joins -- the
    fact table may not shuffle before it is pruned."""
    plan = plan_string(bloom.bloom_prefiltered_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # BroadcastNestedLoopJoin may appear ONLY as the broadcast-1-row Cross
    # assembling the stats row -- never as a degraded membership probe
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line, line
    # K semi-probes; the exact re-check rides the same single pass as a
    # broadcast LEFT join flag (round 8: the separate semi-join subtree
    # scanned lineitem twice)
    assert plan.count("LeftSemi") >= bloom.K_HASHES
    assert "LeftOuter" in plan


def test_kmv_exact_regime_and_estimator_math(spark, sf_dir):
    """Below K_MIN distinct values the sketch IS the exact set (estimate =
    k = exact, rel_err 0); the bottom-k estimator formula itself is
    validated driver-side on 5000 synthetic md5 hashes (error well under
    the ~1/sqrt(k) band)."""
    import hashlib

    from vector_db_from_scratch_spark.operators import kmv

    row = kmv.kmv_distinct(spark, sf_dir).collect()[0]
    if row["exact_distinct"] < kmv.K_MIN:
        assert row["k"] == row["exact_distinct"]
        assert row["est_distinct"] == float(row["k"])
        assert row["rel_err"] == 0.0
    else:
        assert row["rel_err"] < 0.25

    n = 5000
    hashes = sorted(
        int(hashlib.md5(f"{i}#x".encode()).hexdigest()[:15], 16) for i in range(n)
    )
    kth = hashes[kmv.K_MIN - 1]
    est = (kmv.K_MIN - 1) * kmv.HASH_SPACE / kth
    assert abs(est - n) / n < 0.25


def test_kmv_set_ops_invariants(spark, sf_dir):
    """Sketch set algebra: intersection estimate never exceeds the union
    estimate, sample counts are bounded by the sketch size, and in the
    small regime (both sets under K_MIN, theta = full hash space) the
    estimates ARE the exact counts."""
    from vector_db_from_scratch_spark.operators import kmv

    row = kmv.kmv_set_ops(spark, sf_dir).collect()[0]
    assert row["est_inter"] <= row["est_union"]
    assert row["n_inter"] <= row["n_union"] <= 2 * kmv.K_MIN
    assert row["exact_inter"] <= row["exact_union"]
    if row["theta"] == 2**60:
        assert row["est_union"] == float(row["exact_union"])
        assert row["est_inter"] == float(row["exact_inter"])


def test_kmv_merge_equals_whole(spark, sf_dir):
    """Per-shard bottom-k sketches merged by k-smallest-of-union must
    equal the whole-corpus sketch element-wise -- the rollup protocol."""
    from vector_db_from_scratch_spark.operators import kmv

    row = kmv.kmv_merge_shards(spark, sf_dir).collect()[0]
    assert row["sketch_equal"] and row["sketch_diff_rows"] == 0
    assert row["merged_k"] == row["whole_k"]
    assert row["merged_kth_min"] == row["whole_kth_min"]
    assert row["merged_est"] == row["whole_est"]
    assert row["merged_k"] <= kmv.K_MERGE
    # shards partition the key space, so each shard sketch holds at most
    # K_MERGE rows and the union is bounded by N_SHARDS * K_MERGE
    assert row["shard_sketch_rows"] <= kmv.N_SHARDS * kmv.K_MERGE


def test_cm_merge_equals_whole(spark, sf_dir):
    """Cell-wise-added per-shard grids must reproduce the whole-corpus
    grid exactly: every diff 0, no cell present on only one side."""
    from vector_db_from_scratch_spark.operators import countmin

    rows = countmin.cm_merge_shards(spark, sf_dir).collect()
    assert rows, "empty merged grid"
    assert all(r["diff"] == 0 for r in rows)
    assert all(r["merged_counter"] == r["whole_counter"] > 0 for r in rows)


def test_bloom_merge_equals_whole(spark, sf_dir):
    """Per-shard bitmaps (same m) ORed word-wise must reproduce the
    whole-corpus bitmap exactly -- the distributed filter-build protocol."""
    rows = bloom.bloom_merge_shards(spark, sf_dir).collect()
    assert rows, "empty merged bitmap"
    assert all(r["xor_diff"] == 0 for r in rows)
    assert all(r["merged_word"] == r["whole_word"] != 0 for r in rows)


def test_hist_quantile_sketch_guarantees(spark, sf_dir):
    """Histogram quantile sketch invariants: every estimate within one
    bin width of the exact ranked value (the construction guarantee),
    the sketch bounded by N_BINS rows, counts summing to the corpus, and
    shard-merge reproducing the whole histogram exactly."""
    from vector_db_from_scratch_spark.operators import quantiles
    from vector_db_from_scratch_spark.sources.tables import load_table

    rows = quantiles.hist_quantiles(spark, sf_dir).collect()
    assert len(rows) == len(quantiles.QS)
    assert all(r["within_bound"] for r in rows)
    # estimates must be monotone in q (cumulative reads off one histogram)
    ests = [r["est"] for r in sorted(rows, key=lambda r: r["q"])]
    assert ests == sorted(ests)

    hist = quantiles.hist_sketch(spark, sf_dir).collect()
    assert 0 < len(hist) <= quantiles.N_BINS
    total = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_bin"] for r in hist) == total

    merged = quantiles.hist_merge_shards(spark, sf_dir).collect()
    assert merged and all(r["diff"] == 0 for r in merged)


def test_count_min_guarantees(spark, sf_dir):
    """CM invariants: every point estimate >= its exact count (min over
    rows can only overestimate), and each grid row's counters sum to the
    total event count (every event increments exactly one counter per
    row)."""
    from vector_db_from_scratch_spark.operators import countmin
    from vector_db_from_scratch_spark.sources.tables import load_table

    rows = countmin.cm_point_estimates(spark, sf_dir).collect()
    assert rows, "empty probe set"
    assert all(r["overcount"] >= 0 for r in rows)
    # at gate scales the 2048-cell grid is sparse enough that at least one
    # probe lands collision-free (an all-overestimate probe set would mean
    # the probe path reads the wrong cells)
    assert any(r["est"] == r["exact"] for r in rows)
    total = load_table(spark, sf_dir, "events").count()
    grid = countmin.cm_counters(spark, sf_dir).collect()
    per_row = {}
    for g in grid:
        per_row[g["row"]] = per_row.get(g["row"], 0) + g["counter"]
    assert all(v == total for v in per_row.values()), per_row


def test_bloom_sizing_guard_rejects_oversized_filters():
    """_m_bits must fail loudly once the filter would exceed the
    Carter-Wegman modulus (positions are taken mod M31 first, so larger
    filters would silently leave all high bits unset)."""
    import pytest

    from vector_db_from_scratch_spark.operators import bloom

    assert bloom._m_bits(1000) < bloom._M31
    with pytest.raises(ValueError, match="Carter-Wegman"):
        bloom._m_bits(250_000_000)


def test_per_group_sketches_guarantees(spark, sf_dir):
    """Per-group sketch invariants: each group's KMV k is capped and its
    estimate exact in the small-cardinality mode; the per-group shard
    merge equals the per-group whole sketch; every per-group quantile
    estimate is within one bin width of the exact per-group value."""
    from vector_db_from_scratch_spark.operators import kmv, quantiles

    for r in kmv.kmv_by_group(spark, sf_dir).collect():
        assert r["k"] <= kmv.K_MERGE
        if r["k"] < kmv.K_MERGE:
            assert r["est_distinct"] == r["exact_distinct"] == r["k"]
    merge = kmv.kmv_by_group_merge(spark, sf_dir).collect()
    assert merge and all(r["sketch_equal"] for r in merge)
    assert all(r["diff_rows"] == 0 for r in merge)
    hm = quantiles.hist_by_group_merge(spark, sf_dir).collect()
    assert hm and all(r["sketch_equal"] for r in hm)
    assert all(r["merged_rows"] == r["whole_rows"] > 0 for r in hm)
    assert all(r["n_cells"] <= quantiles.N_BINS for r in hm)
    hq = quantiles.hist_quantiles_by_group(spark, sf_dir).collect()
    assert len(hq) == 5 * len(quantiles.QS)
    assert all(r["within_bound"] for r in hq)
    assert all(r["abs_err"] >= 0 for r in hq)


def test_cm_heavy_hitters_guarantees(spark, sf_dir):
    """Sketch-composed heavy hitters: CM never underestimates, so the
    emitted set contains EVERY true heavy hitter (no false negatives) --
    verified against the exact per-key counts -- and every per-row
    guarantee column must hold."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.operators import countmin
    from vector_db_from_scratch_spark.sources.tables import load_table

    rows = countmin.cm_heavy_hitters(spark, sf_dir).collect()
    assert rows, "threshold selected nothing"
    assert all(r["guarantee_ok"] for r in rows)
    assert all(r["overcount"] >= 0 for r in rows)
    thresh = rows[0]["hh_thresh"]
    emitted = {r["user_id"] for r in rows}
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    true_hh = {r["user_id"] for r in exact if r["c"] >= thresh}
    assert true_hh <= emitted, true_hh - emitted
    # the per-row verdicts agree with the recomputed truth
    assert {r["user_id"] for r in rows if r["is_true_hh"]} == true_hh


def test_range_bounds_sketch_guarantees(spark, sf_dir):
    """Sketch-driven range partitioner: exactly N_RANGES ranges covering
    every row, boundaries monotone, and each range's deviation from its
    ideal share within the gated bound (the two boundary bins' mass)."""
    from vector_db_from_scratch_spark.operators import quantiles
    from vector_db_from_scratch_spark.sources.tables import load_table

    rows = quantiles.range_bounds_sketch(spark, sf_dir).collect()
    assert [r["range_id"] for r in rows] == list(range(quantiles.N_RANGES))
    assert all(r["within_bound"] for r in rows)
    total = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_range"] for r in rows) == total
    assert sum(r["ideal"] for r in rows) == total
    bounds = [r["lo_bound"] for r in rows if r["lo_bound"] is not None]
    assert bounds == sorted(bounds)
    assert rows[0]["lo_bound"] is None and rows[-1]["hi_bound"] is None
    # interior ranges share boundaries: hi of r == lo of r+1
    for a, b in zip(rows, rows[1:]):
        assert a["hi_bound"] == b["lo_bound"]


def test_ams_counters_invariants(spark, sf_dir):
    """AMS counter vector: exactly AMS_COUNTERS rows, every counter's
    magnitude bounded by n (a sum of n signs) and its PARITY equal to
    n's parity (each event contributes exactly +/-1 to every counter, so
    counter == n mod 2 -- a broken explode/sign path flips this)."""
    from vector_db_from_scratch_spark.operators import ams
    from vector_db_from_scratch_spark.sources.tables import load_table

    rows = ams.ams_counters(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "events").count()
    assert [r["j"] for r in rows] == list(range(ams.AMS_COUNTERS))
    assert all(abs(r["counter"]) <= n for r in rows)
    assert all(r["counter"] % 2 == n % 2 for r in rows)


def test_ams_f2_estimator_math_and_skew_bound(spark, sf_dir):
    """The emitted estimate must equal the median-of-means recomputed
    from the counter vector in plain Python, exact_f2 >= n (counts >= 1),
    and skew_ratio >= 1 (Cauchy-Schwarz: sum(c^2) * d >= (sum c)^2)."""
    from vector_db_from_scratch_spark.operators import ams

    row = ams.ams_f2(spark, sf_dir).collect()[0]
    counters = [r["counter"] for r in ams.ams_counters(spark, sf_dir).collect()]
    gs = sorted(
        sum(
            c * c
            for c in counters[g * ams.AMS_GROUP_SIZE : (g + 1) * ams.AMS_GROUP_SIZE]
        )
        for g in range(ams.AMS_GROUPS)
    )
    est = gs[ams.AMS_GROUPS // 2] / ams.AMS_GROUP_SIZE
    assert row["est_f2"] == round(est, 6)
    assert row["exact_f2"] >= row["n_total"]
    assert row["skew_ratio"] >= 0.999999
    assert row["rel_err"] == round(abs(est - row["exact_f2"]) / row["exact_f2"], 6)


def test_ams_merge_equals_whole(spark, sf_dir):
    """Per-shard AMS vectors merged by element-wise addition must equal
    the whole-corpus vector on every counter (diff == 0 everywhere)."""
    from vector_db_from_scratch_spark.operators import ams

    rows = ams.ams_merge_shards(spark, sf_dir).collect()
    assert len(rows) == ams.AMS_COUNTERS
    assert all(r["diff"] == 0 for r in rows)
    assert all(r["merged_counter"] == r["whole_counter"] for r in rows)


def test_ams_by_group_invariants(spark, sf_dir):
    """Per-group AMS: one row per event_type, per-group Cauchy-Schwarz
    bound (skew_ratio >= 1), and group n_totals summing to the corpus."""
    from vector_db_from_scratch_spark.operators import ams
    from vector_db_from_scratch_spark.sources.tables import load_table

    rows = ams.ams_by_group(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert len(rows) == ev.select("event_type").distinct().count()
    assert all(r["skew_ratio"] >= 0.999999 for r in rows)
    assert sum(r["n_total"] for r in rows) == ev.count()
    assert all(r["exact_f2"] >= r["n_total"] for r in rows)


def test_ams_join_size_estimator_sanity(spark, sf_dir):
    """AGMS join-size estimate: the exact side must equal the lineitem
    count (FK integrity -- every line matches an order), and the sketch
    estimate must land within an order of magnitude with a non-negative
    error column (a sign-family bug or a cross-sketch salt mismatch blows
    the estimate far outside this band or makes it negative)."""
    from vector_db_from_scratch_spark.operators.ams import ams_join_size

    row = ams_join_size(spark, sf_dir).collect()[0]
    li_count = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert row["exact_join_size"] == li_count
    assert row["n_right"] == li_count
    assert 0.05 * row["exact_join_size"] <= row["est_join_size"] <= 20 * row["exact_join_size"]
    assert row["rel_err"] >= 0.0


def test_cm_by_group_rolls_up_to_global_grid(spark, sf_dir):
    """Per-group grids share the global grid's salts and width, so summing
    them over groups must reproduce cm_counters cell by cell -- the
    additivity that makes the per-group form a real aggregation state."""
    from vector_db_from_scratch_spark.operators import countmin

    by_group = countmin.cm_by_group(spark, sf_dir)
    rolled = {
        (r["row"], r["bucket"]): r["total"]
        for r in by_group.groupBy("row", "bucket")
        .agg(F.sum("counter").alias("total"))
        .collect()
    }
    whole = {
        (r["row"], r["bucket"]): r["counter"]
        for r in countmin.cm_counters(spark, sf_dir).collect()
    }
    assert rolled == whole


def test_cm_by_group_merge_all_diffs_zero(spark, sf_dir):
    from vector_db_from_scratch_spark.operators import countmin

    rows = countmin.cm_by_group_merge(spark, sf_dir).collect()
    assert rows and all(r["diff"] == 0 for r in rows)


def test_bloom_by_group_rolls_up_to_whole(spark, sf_dir):
    """Per-year bitmaps share the global m, so OR-ing them word-wise must
    reproduce the whole-corpus bitmap exactly -- the rollup that lets a
    partition-local filter fold into the global one without re-reading
    keys. Also pins that the groups genuinely partition the key set
    (every word of every group is a subset of the whole word)."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.operators import bloom

    per = bloom.bloom_by_group(spark, sf_dir)
    whole = {
        r["word_idx"]: r["word"] for r in bloom.bloom_bitmap(spark, sf_dir).collect()
    }
    rolled: dict[int, int] = {}
    for r in per.collect():
        rolled[r["word_idx"]] = rolled.get(r["word_idx"], 0) | r["word"]
        # subset: a group can never set a bit the whole filter lacks
        assert r["word"] & ~whole[r["word_idx"]] == 0
    assert rolled == whole
    # non-vacuous: more than one group exists
    n_groups = per.select("grp_year").distinct().count()
    assert n_groups >= 2
