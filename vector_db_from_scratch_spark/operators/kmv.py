"""KMV (k-minimum-values) distinct-count sketch -- the deterministic
sketch family member.

HLL's register internals differ per engine, so its estimates can only be
gated as within-tolerance verdicts (relational.sketch_accuracy_report).
KMV has no such limitation when built on the repo's portable md5-derived
hash: the k smallest hash values -- and therefore the estimate
(k-1) * 2^60 / h_(k), the classic bottom-k estimator (Bar-Yossef et al.
2002) -- are bit-identical in Spark and DuckDB, so the SKETCH ITSELF is
under the hash gate, including its measured relative error against the
exact distinct count.

Scale posture: the sketch is a TakeOrdered over the hashed-distinct keys
-- each partition surfaces at most k candidate hashes, k rows reach the
driver regardless of corpus size, and sketches from disjoint shards merge
by keeping the k smallest of the union (the standard mergeability
argument), which is exactly how a 100 TB distinct-count rolls up per
partition -> per shard -> global. The exact count exists here only to
gate the error; production runs the sketch alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60_sql

K_MIN = 256
HASH_SPACE = float(2**60)
# merge-gate sketch size: small enough that sf0.01 (150 distinct users)
# actually exercises the k-limited merge path (per-shard sketches full,
# global bottom-k a strict subset of the union), while sf0.001 (15
# distinct) covers the exact-set small-cardinality mode of the same query
K_MERGE = 32
N_SHARDS = 4


def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One gated row: (k, kth_min, est_distinct, exact_distinct, rel_err)
    for the distinct user_id count of events. Fewer than K_MIN distinct
    hashes means the sketch IS the exact set (estimate = k, the standard
    small-cardinality rule)."""
    from ._evhash import events_hashed

    ev = events_hashed(spark, sf_dir)
    hashes = ev.select("h").distinct()
    topk = hashes.orderBy("h").limit(K_MIN)
    est = F.when(
        F.col("k") < K_MIN, F.col("k").cast("double")
    ).otherwise((F.col("k") - 1).cast("double") * F.lit(HASH_SPACE) / F.col("kth_min"))
    return (
        topk.agg(F.count(F.lit(1)).alias("k"), F.max("h").alias("kth_min"))
        .crossJoin(ev.agg(F.countDistinct("user_id").alias("exact_distinct")))
        .select(
            "k",
            "kth_min",
            F.round(est, 6).alias("est_distinct"),
            "exact_distinct",
            F.round(
                F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 6
            ).alias("rel_err"),
        )
    )


def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-style SET ALGEBRA on two KMV sketches -- the production
    reason mergeable sketches exist: estimate |A ∪ B| and |A ∩ B| from
    the per-set sketches alone (A = click users, B = purchase users).

    theta = min of the two sketch thresholds (kth min when the sketch is
    full, the whole hash space otherwise); hashes below theta inside the
    union / intersection of the two k-sets are uniform samples of the
    respective true sets, so n * 2^60 / theta estimates each cardinality
    (Dasgupta et al., the theta-sketch framework). Every input to the
    estimate is integer-deterministic on the portable hash, so the whole
    row -- thresholds, sample counts, estimates, exact counts -- is under
    the hash gate. At 100 TB only the two k-row sketches meet; the raw
    sets never co-shuffle."""
    from ._evhash import events_hashed

    ev = events_hashed(spark, sf_dir)

    def hashes(event_type: str) -> DataFrame:
        return ev.filter(F.col("grp") == event_type).select("h").distinct()

    space = 2**60
    a, b = hashes("click"), hashes("purchase")
    sa, sb = a.orderBy("h").limit(K_MIN), b.orderBy("h").limit(K_MIN)
    th_a = sa.agg(
        F.when(F.count(F.lit(1)) < K_MIN, F.lit(space)).otherwise(F.max("h")).alias("th_a")
    )
    th_b = sb.agg(
        F.when(F.count(F.lit(1)) < K_MIN, F.lit(space)).otherwise(F.max("h")).alias("th_b")
    )
    theta = th_a.crossJoin(th_b).select(F.least("th_a", "th_b").alias("theta"))
    union_n = (
        sa.union(sb).distinct().crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_union"))
    )
    inter_n = (
        sa.join(sb, "h").crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    exact_union = (
        ev.filter(F.col("grp").isin("click", "purchase"))
        .agg(F.countDistinct("user_id").alias("exact_union"))
    )
    exact_inter = (
        a.join(b, "h").agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    est = lambda n: F.round(n.cast("double") * F.lit(HASH_SPACE) / F.col("theta"), 6)
    return (
        theta.crossJoin(union_n)
        .crossJoin(inter_n)
        .crossJoin(exact_union)
        .crossJoin(exact_inter)
        .select(
            "theta",
            "n_union",
            "n_inter",
            est(F.col("n_union")).alias("est_union"),
            est(F.col("n_inter")).alias("est_inter"),
            "exact_union",
            "exact_inter",
        )
    )


def kmv_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability under the gate -- the 100 TB rollup claim itself:
    build an independent KMV sketch per disjoint shard (user_id % N_SHARDS,
    the per-source / per-partition rollup shape), merge them by keeping the
    k smallest of the deduplicated union, and gate that the merged sketch
    EQUALS the whole-corpus sketch -- same k, same kth_min, same estimate,
    and element-wise set equality (sketch_equal counts symmetric-difference
    rows; it must be 0). Every column is integer-deterministic on the
    portable hash except the 6dp-rounded estimates.

    Scale posture: this is the protocol a 1000-executor run uses -- each
    shard ships at most K_MERGE longs; the merge never touches raw keys.
    """
    from pyspark.sql import Window

    from ._evhash import events_hashed

    ev = events_hashed(spark, sf_dir)
    hashes = ev.select("shard", "h").distinct()
    w = Window.partitionBy("shard").orderBy("h")
    shard_sketches = (
        hashes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= K_MERGE)
    ).select("shard", "h")
    merged = (
        shard_sketches.select("h").distinct().orderBy("h").limit(K_MERGE)
    )
    whole = ev.select("h").distinct().orderBy("h").limit(K_MERGE)

    def agg(df: DataFrame, prefix: str) -> DataFrame:
        est = F.when(
            F.col(f"{prefix}_k") < K_MERGE, F.col(f"{prefix}_k").cast("double")
        ).otherwise(
            (F.col(f"{prefix}_k") - 1).cast("double")
            * F.lit(HASH_SPACE)
            / F.col(f"{prefix}_kth_min")
        )
        return df.agg(
            F.count(F.lit(1)).alias(f"{prefix}_k"),
            F.max("h").alias(f"{prefix}_kth_min"),
        ).select("*", F.round(est, 6).alias(f"{prefix}_est"))

    sym_diff = (
        merged.exceptAll(whole).union(whole.exceptAll(merged))
        .agg(F.count(F.lit(1)).alias("sketch_diff_rows"))
    )
    shard_rows = shard_sketches.agg(F.count(F.lit(1)).alias("shard_sketch_rows"))
    return (
        agg(merged, "merged")
        .crossJoin(agg(whole, "whole"))
        .crossJoin(sym_diff)
        .crossJoin(shard_rows)
        .select(
            F.lit(N_SHARDS).alias("n_shards"),
            "shard_sketch_rows",
            "merged_k",
            "merged_kth_min",
            "merged_est",
            "whole_k",
            "whole_kth_min",
            "whole_est",
            "sketch_diff_rows",
            (F.col("sketch_diff_rows") == 0).alias("sketch_equal"),
        )
    )


def kmv_merge_shards_oracle() -> str:
    h = hash60_sql("user_id::VARCHAR")

    def est(prefix: str) -> str:
        return (
            f"CASE WHEN {prefix}_k < {K_MERGE} THEN {prefix}_k::DOUBLE "
            f"ELSE ({prefix}_k - 1) * {HASH_SPACE!r} / {prefix}_kth_min END"
        )

    return f"""
WITH hashes AS (
  SELECT DISTINCT user_id % {N_SHARDS} AS shard, {h} AS h FROM events),
shard_sketches AS (
  SELECT shard, h FROM (
    SELECT shard, h, row_number() OVER (PARTITION BY shard ORDER BY h) AS rn
    FROM hashes)
  WHERE rn <= {K_MERGE}),
merged AS (
  SELECT h FROM (SELECT DISTINCT h FROM shard_sketches) ORDER BY h LIMIT {K_MERGE}),
whole AS (
  SELECT h FROM (SELECT DISTINCT {h} AS h FROM events) ORDER BY h LIMIT {K_MERGE}),
m AS (SELECT count(*) AS merged_k, max(h) AS merged_kth_min FROM merged),
w AS (SELECT count(*) AS whole_k, max(h) AS whole_kth_min FROM whole),
d AS (SELECT count(*) AS sketch_diff_rows FROM (
        (SELECT h FROM merged EXCEPT ALL SELECT h FROM whole)
        UNION ALL
        (SELECT h FROM whole EXCEPT ALL SELECT h FROM merged))),
s AS (SELECT count(*) AS shard_sketch_rows FROM shard_sketches)
SELECT {N_SHARDS} AS n_shards, shard_sketch_rows,
       merged_k, merged_kth_min, round({est("merged")}, 6) AS merged_est,
       whole_k, whole_kth_min, round({est("whole")}, 6) AS whole_est,
       sketch_diff_rows, sketch_diff_rows = 0 AS sketch_equal
FROM m, w, d, s
""".strip()


def kmv_set_ops_oracle() -> str:
    h = hash60_sql("user_id::VARCHAR")
    space = 2**60
    return f"""
WITH a AS (SELECT DISTINCT {h} AS h FROM events WHERE event_type = 'click'),
b AS (SELECT DISTINCT {h} AS h FROM events WHERE event_type = 'purchase'),
sa AS (SELECT h FROM a ORDER BY h LIMIT {K_MIN}),
sb AS (SELECT h FROM b ORDER BY h LIMIT {K_MIN}),
theta AS (
  SELECT least(
    (SELECT CASE WHEN count(*) < {K_MIN} THEN {space} ELSE max(h) END FROM sa),
    (SELECT CASE WHEN count(*) < {K_MIN} THEN {space} ELSE max(h) END FROM sb)
  ) AS theta),
u AS (SELECT count(*) AS n_union
      FROM (SELECT h FROM sa UNION SELECT h FROM sb)
      WHERE h < (SELECT theta FROM theta)),
i AS (SELECT count(*) AS n_inter
      FROM (SELECT h FROM sa INTERSECT SELECT h FROM sb)
      WHERE h < (SELECT theta FROM theta)),
exu AS (SELECT count(DISTINCT user_id) AS exact_union FROM events
        WHERE event_type IN ('click', 'purchase')),
exi AS (SELECT count(*) AS exact_inter
        FROM (SELECT h FROM a INTERSECT SELECT h FROM b))
SELECT theta, n_union, n_inter,
       round(n_union * {HASH_SPACE!r} / theta, 6) AS est_union,
       round(n_inter * {HASH_SPACE!r} / theta, 6) AS est_inter,
       exact_union, exact_inter
FROM theta, u, i, exu, exi
""".strip()


def kmv_distinct_oracle(k: int = K_MIN) -> str:
    h = hash60_sql("user_id::VARCHAR")
    est = (
        f"CASE WHEN k < {k} THEN k::DOUBLE "
        f"ELSE (k - 1) * {HASH_SPACE!r} / kth_min END"
    )
    return f"""
WITH h AS (SELECT DISTINCT {h} AS h FROM events),
topk AS (SELECT h FROM h ORDER BY h LIMIT {k}),
agg AS (SELECT count(*) AS k, max(h) AS kth_min FROM topk),
ex AS (SELECT count(DISTINCT user_id) AS exact_distinct FROM events)
SELECT k, kth_min,
       round({est}, 6) AS est_distinct,
       exact_distinct,
       round(abs(({est}) - exact_distinct) / exact_distinct, 6) AS rel_err
FROM agg, ex
""".strip()


# --------------------------------------------------------------------------
# Per-group sketches (VERDICT r8 item 3): a 100 TB data-quality rollup is
# per-source/per-domain, not global -- the GROUP BY form of the same
# mergeable sketch. The bottom-k-per-group filter (row_number <= k over a
# group window) hits Spark's WindowGroupLimit optimization, which keeps at
# most k rows per group on each mapper BEFORE the shuffle -- the same
# partial-rollup shape the global TakeOrdered has, now keyed.
# --------------------------------------------------------------------------


def kmv_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type KMV distinct-user sketch, gated against the exact
    per-group distinct counts: (grp, k, kth_min, est_distinct,
    exact_distinct, rel_err). K_MERGE-sized so sf0.01 exercises the
    k-limited estimator and sf0.001 the exact-set small-cardinality mode
    of the SAME query."""
    from pyspark.sql import Window

    from ._evhash import events_hashed

    ev = events_hashed(spark, sf_dir)
    hashes = ev.select("grp", "h").distinct()
    w = Window.partitionBy("grp").orderBy("h")
    topk = hashes.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= K_MERGE
    )
    agg = topk.groupBy("grp").agg(
        F.count(F.lit(1)).alias("k"), F.max("h").alias("kth_min")
    )
    exact = ev.groupBy("grp").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    est = F.when(F.col("k") < K_MERGE, F.col("k").cast("double")).otherwise(
        (F.col("k") - 1).cast("double") * F.lit(HASH_SPACE) / F.col("kth_min")
    )
    return (
        agg.join(exact, "grp")
        .select(
            "grp",
            "k",
            "kth_min",
            F.round(est, 6).alias("est_distinct"),
            "exact_distinct",
            F.round(
                F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 6
            ).alias("rel_err"),
        )
        .orderBy("grp")
    )


def kmv_by_group_oracle() -> str:
    h = hash60_sql("user_id::VARCHAR")
    est = (
        f"CASE WHEN k < {K_MERGE} THEN k::DOUBLE "
        f"ELSE (k - 1) * {HASH_SPACE!r} / kth_min END"
    )
    return f"""
WITH hashes AS (
  SELECT DISTINCT event_type AS grp, {h} AS h FROM events),
topk AS (
  SELECT grp, h FROM (
    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
    FROM hashes)
  WHERE rn <= {K_MERGE}),
agg AS (SELECT grp, count(*) AS k, max(h) AS kth_min FROM topk GROUP BY grp),
ex AS (SELECT event_type AS grp, count(DISTINCT user_id) AS exact_distinct
       FROM events GROUP BY event_type)
SELECT grp, k, kth_min,
       round({est}, 6) AS est_distinct,
       exact_distinct,
       round(abs(({est}) - exact_distinct) / exact_distinct, 6) AS rel_err
FROM agg JOIN ex USING (grp)
ORDER BY grp
""".strip()


def kmv_by_group_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-group ROLLUP protocol under the gate: an independent
    bottom-k sketch per (group, shard) merges -- k smallest of the union,
    per group -- into exactly the whole-corpus per-group sketch. One row
    per group with a per-group symmetric-difference count that must be 0;
    mergeability per group is what makes the sketch a real aggregation
    state (kmv_merge_shards is the grand-total special case)."""
    from pyspark.sql import Window

    from ._evhash import events_hashed

    hashes = events_hashed(spark, sf_dir).select("grp", "shard", "h").distinct()
    ws = Window.partitionBy("grp", "shard").orderBy("h")
    shard_sk = hashes.withColumn("rn", F.row_number().over(ws)).filter(
        F.col("rn") <= K_MERGE
    ).select("grp", "h")
    wg = Window.partitionBy("grp").orderBy("h")
    merged = (
        shard_sk.distinct()
        .withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") <= K_MERGE)
        .select("grp", "h")
    )
    whole = (
        hashes.select("grp", "h")
        .distinct()
        .withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") <= K_MERGE)
        .select("grp", "h")
    )
    diff = (
        merged.exceptAll(whole)
        .union(whole.exceptAll(merged))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("diff_rows"))
    )
    m = merged.groupBy("grp").agg(
        F.count(F.lit(1)).alias("merged_k"), F.max("h").alias("merged_kth_min")
    )
    w = whole.groupBy("grp").agg(
        F.count(F.lit(1)).alias("whole_k"), F.max("h").alias("whole_kth_min")
    )
    return (
        m.join(w, "grp")
        .join(diff, "grp", "left")
        .select(
            "grp",
            "merged_k",
            "merged_kth_min",
            "whole_k",
            "whole_kth_min",
            F.coalesce("diff_rows", F.lit(0)).alias("diff_rows"),
            (F.coalesce("diff_rows", F.lit(0)) == 0).alias("sketch_equal"),
        )
        .orderBy("grp")
    )


def kmv_by_group_merge_oracle() -> str:
    h = hash60_sql("user_id::VARCHAR")
    return f"""
WITH hashes AS (
  SELECT DISTINCT event_type AS grp, user_id % {N_SHARDS} AS shard, {h} AS h
  FROM events),
shard_sk AS (
  SELECT grp, h FROM (
    SELECT grp, h,
           row_number() OVER (PARTITION BY grp, shard ORDER BY h) AS rn
    FROM hashes)
  WHERE rn <= {K_MERGE}),
merged AS (
  SELECT grp, h FROM (
    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
    FROM (SELECT DISTINCT grp, h FROM shard_sk))
  WHERE rn <= {K_MERGE}),
whole AS (
  SELECT grp, h FROM (
    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
    FROM (SELECT DISTINCT grp, h FROM hashes))
  WHERE rn <= {K_MERGE}),
d AS (
  SELECT grp, count(*) AS diff_rows FROM (
    (SELECT grp, h FROM merged EXCEPT ALL SELECT grp, h FROM whole)
    UNION ALL
    (SELECT grp, h FROM whole EXCEPT ALL SELECT grp, h FROM merged))
  GROUP BY grp),
m AS (SELECT grp, count(*) AS merged_k, max(h) AS merged_kth_min FROM merged GROUP BY grp),
w AS (SELECT grp, count(*) AS whole_k, max(h) AS whole_kth_min FROM whole GROUP BY grp)
SELECT grp, merged_k, merged_kth_min, whole_k, whole_kth_min,
       coalesce(diff_rows, 0) AS diff_rows,
       coalesce(diff_rows, 0) = 0 AS sketch_equal
FROM m JOIN w USING (grp) LEFT JOIN d USING (grp)
ORDER BY grp
""".strip()
