"""Bloom-filter join pruning: the explicit, gate-checkable form of the
runtime-filter / dynamic-partition-pruning lever that carries selective
big-fact joins at 100 TB.

The pattern: a selective predicate lands on a dimension (here urgent
orders); instead of shuffling the full fact table into the semi-join, a
Bloom filter of the surviving dimension keys is BROADCAST and the fact is
pre-filtered by membership before any exchange -- false positives are
re-checked by the exact join, false negatives are impossible, so the
result is identical to the plain semi-join while the shuffle carries only
the Bloom survivors. Spark applies this implicitly via runtime row-group
filters / DPP on partitioned tables; this module makes the mechanism
explicit and puts BOTH the filter's bitmap and the end-to-end pruned join
under the DuckDB-oracle gate (the false-positive count is part of the
gated row, so the filter's quality is measured every round, not assumed).

Portability: bit positions come from a seeded Carter-Wegman universal
family on the integer key, ((a_i*k + b_i) mod M31) mod m -- pure long
arithmetic, bit-equal and overflow-safe in both engines, ~free per fact
row (see BLOOM_HASH_PARAMS for why not md5 here); the bitmap packs 63
bits per BIGINT word (shifts stay in non-negative territory in Java and
DuckDB alike), and the filter is sized at ~10 bits/key with pure integer
arithmetic both engines reproduce exactly: m = 63 * ((10*n + 62) // 63).

Scale posture: build = one scan of the filtered dimension emitting
(word_idx, word) partial aggregates (<= m/63 rows per partition);
membership = K broadcast left-semi joins against the <= 3n-row position
set (no fact-row explosion, no regroup); the fact table never shuffles
until after pruning. At a billion keys the same plan ships the bitmap as
a broadcast variable; the position-set join here is the bounded local
stand-in with the identical plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import minhash_params
from ..sources.tables import load_table
from . import _memo
from .relational import dsum, osum

K_HASHES = 3
BITS_PER_WORD = 63  # keep shifted words non-negative in both engines
BITS_PER_KEY = 10  # ~1.7% false-positive rate at K=3


def _m_bits(n_keys: int) -> int:
    m = BITS_PER_WORD * ((BITS_PER_KEY * n_keys + BITS_PER_WORD - 1) // BITS_PER_WORD)
    # the Carter-Wegman positions are taken mod M31 FIRST, so any filter
    # sized past M31 would silently never set bits above it (degrading the
    # fp rate with the oracle mirroring the bug); fail loudly instead --
    # crossing this (~214M build keys) means switching to the md5 base
    # hashes, which is a code change, not a runtime fallback
    if m >= _M31:
        raise ValueError(
            f"bloom filter of {m} bits exceeds the Carter-Wegman modulus "
            f"{_M31}; use the md5 string-hash path for filters this large"
        )
    return m


def _urgent_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )


# Seeded universal-hash family h_i(k) = ((a_i*k + b_i) mod M31) mod m for
# INTEGER keys (Carter-Wegman): the md5-derived hash is the repo's device
# for cross-engine determinism on STRINGS, but evaluating a digest + base
# conversion per fact row per probe dominated the probe pass (~0.7s per
# evaluation over 600k rows, round-8 profile: the 3 broadcast semi joins
# themselves cost 0.2s). Pure long arithmetic is ~free, identical in both
# engines, and overflow-safe: a < 2^31, so a*k + b stays under 2^63 for
# keys up to ~4e9. Universality gives the standard Bloom fp bound.
# Requires m < M31 (~2.1e9 bits); larger filters or string keys fall back
# to the md5 base hashes, whose cost amortizes across cluster tasks.
BLOOM_HASH_PARAMS = minhash_params(K_HASHES, seed=97)
_M31 = 2_147_483_647


def _pos_expr(key, i: int, m_bits: int):
    """Bit position of hash i for an integer key column."""
    a, b = BLOOM_HASH_PARAMS[i]
    return (F.lit(a) * key.cast("long") + F.lit(b)) % _M31 % m_bits


def _pos_sql(expr: str, i: int) -> str:
    """DuckDB twin of :func:`_pos_expr`; ``m`` comes from the params CTE."""
    a, b = BLOOM_HASH_PARAMS[i]
    return f"((({a} * ({expr}) + {b}) % {_M31}) % (SELECT m FROM params))"


_ORACLE_PARAMS = f"""
urgent AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
params AS (SELECT {BITS_PER_WORD} * (({BITS_PER_KEY} * count(*) + {BITS_PER_WORD - 1})
                                     // {BITS_PER_WORD}) AS m
           FROM urgent)
""".strip()


def _positions_df(keys: DataFrame, m_bits: int) -> DataFrame:
    """One ``pos`` row per (key, hash): the Bloom filter as a position set."""
    return keys.select(
        F.explode(
            F.array(*[_pos_expr(F.col("o_orderkey"), i, m_bits) for i in range(K_HASHES)])
        ).alias("pos")
    )


# The filter is a content-keyed artifact like the LSH/IVF index tables
# (VERDICT r7 "what's wrong" #1: rebuilding it per call -- a keys.count()
# sizing job plus the position-set recompute -- was the slowest warm
# query's entire cost). Built once per (application, sf_dir, sizing
# params), cached, shared by bloom_bitmap and bloom_prefiltered_join.
_FILTER_MEMO: dict[tuple[str, str, int, int, int], tuple[int, DataFrame, DataFrame]] = (
    _memo.register({})
)


def _bloom_filter(spark: SparkSession, sf_dir: str) -> tuple[int, DataFrame, DataFrame]:
    """(m_bits, keys, distinct position set) for the urgent-orders filter,
    memoized per application -- the cluster analog is building the filter
    once and broadcasting it to every probe stage."""
    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        K_HASHES,
        BITS_PER_KEY,
        BITS_PER_WORD,
    )
    if key not in _FILTER_MEMO:
        keys = _urgent_keys(spark, sf_dir).cache()
        m_bits = _m_bits(keys.count())
        bits = _positions_df(keys, m_bits).distinct().cache()
        bits.count()  # materialize: probes must never re-run the build
        _FILTER_MEMO[key] = (m_bits, keys, bits)
    return _FILTER_MEMO[key]


def bloom_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom filter's packed bitmap as a (word_idx, word) table -- the
    artifact a cluster run broadcasts. Build is one narrow scan + one
    aggregation on word_idx (partial bit_or map-side); only set words are
    emitted. Fully hash-gated: a wrong hash, modulus, packing width, or
    sizing rule flips a word."""
    m_bits, _keys, pos = _bloom_filter(spark, sf_dir)
    return (
        pos.select(
            F.expr(f"pos div {BITS_PER_WORD}").alias("word_idx"),
            F.expr(f"shiftleft(1L, cast(pos % {BITS_PER_WORD} as int))").alias("w"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("w").alias("word"))
        .orderBy("word_idx")
    )


def bloom_bitmap_oracle() -> str:
    hashes = ", ".join(_pos_sql("o_orderkey", i) for i in range(K_HASHES))
    return f"""
WITH {_ORACLE_PARAMS},
pos AS (SELECT pos FROM (SELECT unnest([{hashes}]) AS pos FROM urgent))
SELECT pos // {BITS_PER_WORD} AS word_idx,
       bit_or(1::BIGINT << (pos % {BITS_PER_WORD})::INT) AS word
FROM pos
GROUP BY word_idx
ORDER BY word_idx
""".strip()


N_SHARDS = 4


def bloom_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability under the gate for the third sketch family member
    (KMV merges by k-smallest-of-union, CM by cell-wise addition, Bloom
    by bitwise OR): build an independent bitmap per disjoint key shard
    (o_orderkey % N_SHARDS) -- each sized with the SAME m as the whole
    filter, the precondition for merging -- OR them word-wise, and emit
    the merged bitmap full-outer-joined with the whole-corpus bitmap:
    (word_idx, merged_word, whole_word, xor_diff). Every xor_diff must be
    0. This is the rollup protocol for a distributed filter build: each
    executor ORs its partition's words locally, shards merge without ever
    exchanging keys."""
    m_bits, keys, _bits = _bloom_filter(spark, sf_dir)
    cells = keys.select(
        (F.col("o_orderkey") % N_SHARDS).alias("shard"),
        F.explode(
            F.array(*[_pos_expr(F.col("o_orderkey"), i, m_bits) for i in range(K_HASHES)])
        ).alias("pos"),
    )
    words = cells.select(
        "shard",
        F.expr(f"pos div {BITS_PER_WORD}").alias("word_idx"),
        F.expr(f"shiftleft(1L, cast(pos % {BITS_PER_WORD} as int))").alias("w"),
    )
    shard_bitmaps = words.groupBy("shard", "word_idx").agg(F.bit_or("w").alias("word"))
    merged = shard_bitmaps.groupBy("word_idx").agg(F.bit_or("word").alias("merged_word"))
    whole = bloom_bitmap(spark, sf_dir).withColumnRenamed("word", "whole_word")
    return (
        merged.join(whole, "word_idx", "full_outer")
        .select(
            "word_idx",
            F.coalesce("merged_word", F.lit(0)).alias("merged_word"),
            F.coalesce("whole_word", F.lit(0)).alias("whole_word"),
            F.expr(
                "coalesce(merged_word, 0L) ^ coalesce(whole_word, 0L)"
            ).alias("xor_diff"),
        )
        .orderBy("word_idx")
    )


def bloom_merge_shards_oracle() -> str:
    hashes = ", ".join(_pos_sql("o_orderkey", i) for i in range(K_HASHES))
    return f"""
WITH {_ORACLE_PARAMS},
cells AS (
  SELECT o_orderkey % {N_SHARDS} AS shard, pos
  FROM (SELECT o_orderkey, unnest([{hashes}]) AS pos FROM urgent)),
shard_bitmaps AS (
  SELECT shard, pos // {BITS_PER_WORD} AS word_idx,
         bit_or(1::BIGINT << (pos % {BITS_PER_WORD})::INT) AS word
  FROM cells GROUP BY shard, word_idx),
merged AS (
  SELECT word_idx, bit_or(word) AS merged_word
  FROM shard_bitmaps GROUP BY word_idx),
whole AS (
  SELECT pos // {BITS_PER_WORD} AS word_idx,
         bit_or(1::BIGINT << (pos % {BITS_PER_WORD})::INT) AS whole_word
  FROM (SELECT unnest([{hashes}]) AS pos FROM urgent)
  GROUP BY word_idx)
SELECT coalesce(m.word_idx, w.word_idx) AS word_idx,
       coalesce(merged_word, 0)::BIGINT AS merged_word,
       coalesce(whole_word, 0)::BIGINT AS whole_word,
       xor(coalesce(merged_word, 0), coalesce(whole_word, 0))::BIGINT AS xor_diff
FROM merged m FULL OUTER JOIN whole w ON m.word_idx = w.word_idx
ORDER BY 1
""".strip()


def bloom_prefiltered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end Bloom-pruned semi-join, gated with its false-positive
    accounting: lineitem rows pass the K membership probes (broadcast
    left-semi joins against the position set -- set bit <=> position
    present, the exact bitmap semantics without driver-side bit math),
    then the exact semi-join against the urgent keys removes the false
    positives. revenue_exact must equal the plain semi-join's revenue (no
    false negatives possible); n_prefilter - n_exact IS the measured
    false-positive mass, recorded in the gated row."""
    m_bits, keys, bits = _bloom_filter(spark, sf_dir)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    pre = li
    for i in range(K_HASHES):
        pre = pre.join(
            F.broadcast(bits),
            _pos_expr(F.col("l_orderkey"), i, m_bits) == F.col("pos"),
            "left_semi",
        )
    # ONE pass over the prefiltered fact: the exact re-check rides as a
    # broadcast LEFT join flag (o_orderkey is the orders PK, so no row
    # duplication) and both counts + the exact revenue come out of a
    # single aggregate -- the previous two-subtree form (pre.agg +
    # exact.agg) scanned lineitem twice and paid the K md5 probes twice
    # (round-8 bench: warm 1.49s, half of it the duplicate pass).
    flagged = pre.join(
        F.broadcast(keys), F.col("l_orderkey") == F.col("o_orderkey"), "left"
    ).withColumn("is_exact", F.col("o_orderkey").isNotNull())
    return (
        keys.agg(F.count(F.lit(1)).alias("n_keys"))
        .crossJoin(
            flagged.agg(
                F.count(F.lit(1)).alias("n_prefilter"),
                F.count(F.when(F.col("is_exact"), F.lit(1))).alias("n_exact"),
                dsum(
                    F.when(
                        F.col("is_exact"),
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    )
                ).alias("revenue_exact"),
            )
        )
        .select(
            "n_keys",
            F.lit(m_bits).alias("m_bits"),
            "n_prefilter",
            "n_exact",
            (F.col("n_prefilter") - F.col("n_exact")).alias("false_positives"),
            "revenue_exact",
        )
    )


def bloom_prefiltered_join_oracle() -> str:
    bits_member = " AND ".join(
        f"{_pos_sql('l_orderkey', i)} IN (SELECT pos FROM bits)"
        for i in range(K_HASHES)
    )
    hashes = ", ".join(_pos_sql("o_orderkey", i) for i in range(K_HASHES))
    return f"""
WITH {_ORACLE_PARAMS},
bits AS (SELECT DISTINCT pos FROM (SELECT unnest([{hashes}]) AS pos FROM urgent)),
pre AS (SELECT l_orderkey, l_extendedprice, l_discount FROM lineitem
        WHERE {bits_member}),
ex AS (SELECT * FROM pre WHERE l_orderkey IN (SELECT o_orderkey FROM urgent))
SELECT (SELECT count(*) FROM urgent) AS n_keys,
       (SELECT m FROM params) AS m_bits,
       (SELECT count(*) FROM pre) AS n_prefilter,
       count(*) AS n_exact,
       (SELECT count(*) FROM pre) - count(*) AS false_positives,
       {osum('l_extendedprice * (1 - l_discount)')} AS revenue_exact
FROM ex
""".strip()


def bloom_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP Bloom bitmaps on the shared global sizing -- the
    per-group leg of the sketch matrix for the membership member (KMV /
    CM / histogram / AMS each have one): one filter per order YEAR over
    that year's urgent keys, every group using the SAME m as the whole
    filter. Sharing m is the rollup precondition: OR-ing the per-year
    bitmaps word-wise reproduces the whole-corpus bitmap exactly
    (pytest-pinned), so a year-partitioned fact scan can probe its
    partition's own filter -- the partition-local runtime-filter shape --
    while the corpus filter remains one fold away. Output is (grp_year,
    word_idx, word), bounded by groups x m/63."""
    m_bits, _keys, _bits = _bloom_filter(spark, sf_dir)
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            F.year("o_orderdate").cast("long").alias("grp_year"), "o_orderkey"
        )
    )
    cells = keys.select(
        "grp_year",
        F.explode(
            F.array(*[_pos_expr(F.col("o_orderkey"), i, m_bits) for i in range(K_HASHES)])
        ).alias("pos"),
    )
    return (
        cells.select(
            "grp_year",
            F.expr(f"pos div {BITS_PER_WORD}").alias("word_idx"),
            F.expr(f"shiftleft(1L, cast(pos % {BITS_PER_WORD} as int))").alias("w"),
        )
        .groupBy("grp_year", "word_idx")
        .agg(F.bit_or("w").alias("word"))
        .orderBy("grp_year", "word_idx")
    )


def bloom_by_group_oracle() -> str:
    hashes = ", ".join(_pos_sql("o_orderkey", i) for i in range(K_HASHES))
    return f"""
WITH {_ORACLE_PARAMS},
keys AS (SELECT year(o_orderdate) AS grp_year, o_orderkey
         FROM orders WHERE o_orderpriority = '1-URGENT'),
cells AS (SELECT grp_year, pos
          FROM (SELECT grp_year, unnest([{hashes}]) AS pos FROM keys))
SELECT grp_year::BIGINT AS grp_year, pos // {BITS_PER_WORD} AS word_idx,
       bit_or(1::BIGINT << (pos % {BITS_PER_WORD})::INT) AS word
FROM cells
GROUP BY grp_year, word_idx
ORDER BY grp_year, word_idx
""".strip()
