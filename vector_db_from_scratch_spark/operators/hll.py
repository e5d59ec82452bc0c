"""HyperLogLog distinct-count sketch -- portable, register-exact.

Engine-native HLLs (Spark/DuckDB ``approx_count_distinct``) keep private
register layouts, so they can only be tolerance-gated
(relational.sketch_accuracy_report). This HLL is built from scratch on the
repo's portable md5-derived hash (functions/hashing.py), so the REGISTER
STATE ITSELF is bit-identical in Spark and DuckDB and the whole sketch --
registers, estimate, measured relative error -- sits under the hash gate,
the same upgrade KMV made for the bottom-k estimator (operators/kmv.py).

Flajolet et al. 2007 layout on the 60-bit hash:

  register index j = top P bits            (h div 2^52, m = 2^P = 256)
  remainder     w  = low 52 bits           (h mod 2^52)
  rho(w)           = leading zeros of w within 52 bits, plus 1
                   = 53 - bitlength(w)     (53 when w = 0)
  M[j]             = max rho over keys hashing to j
  E                = alpha_m * m^2 / (V + sum over observed j of 2^-M[j])
                     with V = count of never-observed registers
  small range      : E <= 2.5m and V > 0 -> linear counting m * ln(m / V)

``bitlength`` is ``length(bin(w))`` -- both engines' ``bin()`` render the
minimal binary string (verified in tests/test_hashing.py) -- and 2^-M[j] is
computed as 1.0 / (1 << M[j]), an exact dyadic double, so the register sum
is order-free exact; the only transcendental is the linear-counting ``ln``
(the BM25 precedent, operators/search.py), behind a 6dp round.

Scale posture: registers are a 256-group map-side-combinable max -- each
executor ships at most 256 (j, rho) pairs per shard regardless of corpus
size, and shard sketches merge by element-wise register MAX (the classic
HLL merge), gated here against the whole-corpus build. The exact count
exists only to gate the error; production runs the sketch alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60_sql

P = 8
M = 1 << P  # 256 registers
TWO52 = 1 << 52  # register index = h div 2^52 (60 - P bits of remainder)
RHO_ZERO = 53  # rho when the 52-bit remainder is all zeros
# exact double literal shared by both engines (repr round-trips the value)
ALPHA_M = 0.7213 / (1.0 + 1.079 / 256.0)
LC_THRESHOLD = 2.5 * M  # below this, linear counting is the better estimator
N_SHARDS = 4


def _registers(keys: DataFrame) -> DataFrame:
    """(j, reg): observed HLL registers for a DataFrame with column ``h``
    (portable 60-bit hash). Map-side combinable max, <= M groups."""
    w = F.col("h") % TWO52
    rho = (
        F.when(w == 0, F.lit(RHO_ZERO))
        .otherwise(F.lit(RHO_ZERO) - F.length(F.bin(w)))
        .cast("long")
    )
    return (
        keys.select(F.expr(f"h div {TWO52}").alias("j"), rho.alias("rho"))
        .groupBy("j")
        .agg(F.max("rho").alias("reg"))
    )


def _estimate_cols(prefix: str = ""):
    """Columns (est) from an aggregate row holding ``obs`` (observed register
    count) and ``z_obs`` (sum of exact 2^-reg over observed registers)."""
    obs = F.col(f"{prefix}obs")
    z_obs = F.col(f"{prefix}z_obs")
    v = F.lit(M) - obs  # zero registers
    z = v.cast("double") + z_obs  # exact: dyadic terms, bounded count
    raw = F.lit(ALPHA_M) * F.lit(float(M * M)) / z
    lc = F.lit(float(M)) * F.log(F.lit(float(M)) / v.cast("double"))
    est = F.when((raw <= F.lit(LC_THRESHOLD)) & (v > 0), lc).otherwise(raw)
    return F.round(est, 6) + F.lit(0.0)


def _register_agg(regs: DataFrame, prefix: str = "") -> DataFrame:
    """One row: observed count, order-free register fingerprint, exact
    dyadic 2^-reg sum -- everything the estimator needs, all gateable."""
    return regs.agg(
        F.count(F.lit(1)).alias(f"{prefix}obs"),
        F.sum((F.col("j") + 1) * F.col("reg")).alias(f"{prefix}reg_fingerprint"),
        F.sum(F.lit(1.0) / F.expr("cast(shiftleft(cast(1 as bigint), reg) as double)")).alias(
            f"{prefix}z_obs"
        ),
    )


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One gated row: (m, obs, reg_fingerprint, v_zero, est_distinct,
    exact_distinct, rel_err) for the distinct user_id count of events."""
    from ._evhash import events_hashed

    ev = events_hashed(spark, sf_dir)
    keys = ev.select("h")
    agg = _register_agg(_registers(keys))
    est = _estimate_cols()
    return (
        agg.crossJoin(ev.agg(F.countDistinct("user_id").alias("exact_distinct")))
        .select(
            F.lit(M).alias("m"),
            "obs",
            "reg_fingerprint",
            (F.lit(M) - F.col("obs")).alias("v_zero"),
            est.alias("est_distinct"),
            "exact_distinct",
            (
                F.round(
                    F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 6
                )
                + F.lit(0.0)
            ).alias("rel_err"),
        )
    )


def _rho_sql(w: str) -> str:
    return f"CASE WHEN {w} = 0 THEN {RHO_ZERO} ELSE {RHO_ZERO} - length(bin({w})) END"


def _registers_sql(keys: str) -> str:
    """DuckDB fragment: (j, reg) registers from a relation with column h."""
    return f"""
  SELECT h // {TWO52} AS j, max({_rho_sql(f"(h % {TWO52})")})::BIGINT AS reg
  FROM {keys} GROUP BY j
""".strip()


def _est_sql(obs: str, z_obs: str) -> str:
    v = f"({M} - {obs})"
    z = f"({v}::DOUBLE + {z_obs})"
    raw = f"({ALPHA_M!r}::DOUBLE * {float(M * M)!r}::DOUBLE / {z})"
    lc = f"({float(M)!r}::DOUBLE * ln({float(M)!r}::DOUBLE / {v}::DOUBLE))"
    return (
        f"(round(CASE WHEN {raw} <= {LC_THRESHOLD!r}::DOUBLE AND {v} > 0 "
        f"THEN {lc} ELSE {raw} END, 6) + 0.0)"
    )


_AGG_SQL = (
    "count(*) AS obs, sum((j + 1) * reg)::BIGINT AS reg_fingerprint, "
    "sum(1.0 / (1::BIGINT << reg)::DOUBLE) AS z_obs"
)


def hll_distinct_oracle() -> str:
    h = hash60_sql("user_id::VARCHAR")
    est = _est_sql("obs", "z_obs")
    return f"""
WITH keys AS (SELECT {h} AS h FROM events),
regs AS ({_registers_sql("keys")}),
agg AS (SELECT {_AGG_SQL} FROM regs),
ex AS (SELECT count(DISTINCT user_id)::BIGINT AS exact_distinct FROM events)
SELECT {M} AS m, obs, reg_fingerprint, {M} - obs AS v_zero,
       {est} AS est_distinct, exact_distinct,
       round(abs({est} - exact_distinct) / exact_distinct, 6) + 0.0 AS rel_err
FROM agg, ex
""".strip()


def hll_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability under the gate: per-shard registers (user_id % N_SHARDS)
    merge by element-wise MAX; the merged sketch must EQUAL the whole-corpus
    sketch register-for-register (diff rows gated 0) and in estimate."""
    from ._evhash import events_hashed

    keys = events_hashed(spark, sf_dir).select("shard", "h")
    j = F.expr(f"h div {TWO52}")
    w = F.col("h") % TWO52
    rho = (
        F.when(w == 0, F.lit(RHO_ZERO))
        .otherwise(F.lit(RHO_ZERO) - F.length(F.bin(w)))
        .cast("long")
    )
    shard_regs = (
        keys.select("shard", j.alias("j"), rho.alias("rho"))
        .groupBy("shard", "j")
        .agg(F.max("rho").alias("reg"))
    )
    merged = shard_regs.groupBy("j").agg(F.max("reg").alias("reg"))
    whole = _registers(keys.select("h"))
    diff = (
        merged.alias("a")
        .join(whole.alias("b"), "j", "full_outer")
        .filter(
            F.col("a.reg").isNull()
            | F.col("b.reg").isNull()
            | (F.col("a.reg") != F.col("b.reg"))
        )
        .agg(F.count(F.lit(1)).alias("register_diff_rows"))
    )
    shard_rows = shard_regs.agg(F.count(F.lit(1)).alias("shard_register_rows"))
    m_agg = _register_agg(merged, "merged_")
    w_agg = _register_agg(whole, "whole_")
    return (
        m_agg.crossJoin(w_agg)
        .crossJoin(diff)
        .crossJoin(shard_rows)
        .select(
            F.lit(N_SHARDS).alias("n_shards"),
            "shard_register_rows",
            "merged_obs",
            "merged_reg_fingerprint",
            _estimate_cols("merged_").alias("merged_est"),
            "whole_obs",
            "whole_reg_fingerprint",
            _estimate_cols("whole_").alias("whole_est"),
            "register_diff_rows",
            (F.col("register_diff_rows") == 0).alias("sketch_equal"),
        )
    )


def hll_merge_shards_oracle() -> str:
    h = hash60_sql("user_id::VARCHAR")
    rho = _rho_sql(f"(h % {TWO52})")
    return f"""
WITH keys AS (SELECT user_id % {N_SHARDS} AS shard, {h} AS h FROM events),
shard_regs AS (
  SELECT shard, h // {TWO52} AS j, max({rho})::BIGINT AS reg
  FROM keys GROUP BY shard, j),
merged AS (SELECT j, max(reg) AS reg FROM shard_regs GROUP BY j),
whole AS ({_registers_sql("keys")}),
diff AS (
  SELECT count(*) AS register_diff_rows
  FROM merged a FULL OUTER JOIN whole b USING (j)
  WHERE a.reg IS NULL OR b.reg IS NULL OR a.reg != b.reg),
s AS (SELECT count(*) AS shard_register_rows FROM shard_regs),
ma AS (SELECT {_AGG_SQL.replace("AS obs", "AS merged_obs").replace("AS reg_fingerprint", "AS merged_reg_fingerprint").replace("AS z_obs", "AS merged_z_obs")} FROM merged),
wa AS (SELECT {_AGG_SQL.replace("AS obs", "AS whole_obs").replace("AS reg_fingerprint", "AS whole_reg_fingerprint").replace("AS z_obs", "AS whole_z_obs")} FROM whole)
SELECT {N_SHARDS} AS n_shards, shard_register_rows,
       merged_obs, merged_reg_fingerprint,
       {_est_sql("merged_obs", "merged_z_obs")} AS merged_est,
       whole_obs, whole_reg_fingerprint,
       {_est_sql("whole_obs", "whole_z_obs")} AS whole_est,
       register_diff_rows, register_diff_rows = 0 AS sketch_equal
FROM ma, wa, diff, s
""".strip()


def hll_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, obs, reg_fingerprint, est_distinct, exact_distinct,
    rel_err): one register-exact HLL per event type -- the per-source
    cardinality profile, bounded by group cardinality x M registers."""
    from ._evhash import events_hashed

    ev = events_hashed(spark, sf_dir)
    keys = ev.select(F.col("grp").alias("event_type"), "h")
    j = F.expr(f"h div {TWO52}")
    w = F.col("h") % TWO52
    rho = (
        F.when(w == 0, F.lit(RHO_ZERO))
        .otherwise(F.lit(RHO_ZERO) - F.length(F.bin(w)))
        .cast("long")
    )
    regs = (
        keys.select("event_type", j.alias("j"), rho.alias("rho"))
        .groupBy("event_type", "j")
        .agg(F.max("rho").alias("reg"))
    )
    agg = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("obs"),
        F.sum((F.col("j") + 1) * F.col("reg")).alias("reg_fingerprint"),
        F.sum(F.lit(1.0) / F.expr("cast(shiftleft(cast(1 as bigint), reg) as double)")).alias(
            "z_obs"
        ),
    )
    exact = ev.groupBy(F.col("grp").alias("event_type")).agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    est = _estimate_cols()
    return (
        agg.join(exact, "event_type")
        .select(
            "event_type",
            "obs",
            "reg_fingerprint",
            est.alias("est_distinct"),
            "exact_distinct",
            (
                F.round(
                    F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 6
                )
                + F.lit(0.0)
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


def hll_by_group_oracle() -> str:
    h = hash60_sql("user_id::VARCHAR")
    rho = _rho_sql(f"(h % {TWO52})")
    est = _est_sql("obs", "z_obs")
    return f"""
WITH keys AS (SELECT event_type, {h} AS h FROM events),
regs AS (
  SELECT event_type, h // {TWO52} AS j, max({rho})::BIGINT AS reg
  FROM keys GROUP BY event_type, j),
agg AS (
  SELECT event_type, {_AGG_SQL} FROM regs GROUP BY event_type),
ex AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_distinct
  FROM events GROUP BY event_type)
SELECT a.event_type AS event_type, obs, reg_fingerprint,
       {est} AS est_distinct, exact_distinct,
       round(abs({est} - exact_distinct) / exact_distinct, 6) + 0.0 AS rel_err
FROM agg a JOIN ex USING (event_type)
ORDER BY event_type
""".strip()


def hll_registers_oracle() -> str:
    """The raw register table (j, reg) for the events user_id HLL -- the
    oracle the STREAMING ingest twin drains against (the sketch state
    itself, not just its aggregate row)."""
    h = hash60_sql("user_id::VARCHAR")
    return f"""
WITH keys AS (SELECT {h} AS h FROM events),
regs AS ({_registers_sql("keys")})
SELECT j, reg FROM regs ORDER BY j
""".strip()


def hll_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra on two HLLs (A = click users, B = purchase users) -- the
    same production motivation as the theta-style KMV set ops
    (operators/kmv.py:66): estimate |A ∪ B| from the element-wise register
    MAX (the lossless HLL union) and |A ∩ B| by inclusion-exclusion
    est_A + est_B - est_union (HLL has no native intersection; this is the
    standard -- and noisier -- estimator, reported next to the exact counts
    so the gate also records its measured error). Every register and every
    estimate input is integer-deterministic on the portable hash, so the
    whole row is under the hash gate. At 100 TB only the <= 2m register
    rows meet; the raw user sets never co-shuffle."""
    from ._evhash import events_hashed

    ev = events_hashed(spark, sf_dir)

    def keys(event_type: str) -> DataFrame:
        return ev.filter(F.col("grp") == event_type).select("h")

    a_regs = _registers(keys("click"))
    b_regs = _registers(keys("purchase"))
    u_regs = a_regs.union(b_regs).groupBy("j").agg(F.max("reg").alias("reg"))

    est_a = _estimate_cols("a_")
    est_b = _estimate_cols("b_")
    est_u = _estimate_cols("u_")
    inter = F.round(est_a + est_b - est_u, 6) + F.lit(0.0)

    def users(event_type: str) -> DataFrame:
        return ev.filter(F.col("grp") == event_type).select("user_id")

    # exact counts for error context (bounded rows)
    ex = (
        users("click")
        .distinct()
        .withColumn("s", F.lit("a"))
        .union(users("purchase").distinct().withColumn("s", F.lit("b")))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sides"))
        .agg(
            F.count(F.lit(1)).alias("exact_union"),
            F.sum(F.when(F.col("n_sides") == 2, 1).otherwise(0)).alias(
                "exact_inter"
            ),
        )
    )
    return (
        _register_agg(a_regs, "a_")
        .crossJoin(_register_agg(b_regs, "b_"))
        .crossJoin(_register_agg(u_regs, "u_"))
        .crossJoin(ex)
        .select(
            "a_obs",
            est_a.alias("a_est"),
            "b_obs",
            est_b.alias("b_est"),
            "u_obs",
            est_u.alias("union_est"),
            inter.alias("inter_est"),
            "exact_union",
            "exact_inter",
        )
    )


def hll_set_ops_oracle() -> str:
    h = hash60_sql("user_id::VARCHAR")

    def regs(name: str, event_type: str) -> str:
        return (
            f"{name}k AS (SELECT {h} AS h FROM events "
            f"WHERE event_type = '{event_type}'),\n"
            f"{name} AS ({_registers_sql(f'{name}k')})"
        )

    def agg(name: str, prefix: str) -> str:
        cols = (
            _AGG_SQL.replace("AS obs", f"AS {prefix}obs")
            .replace("AS reg_fingerprint", f"AS {prefix}reg_fingerprint")
            .replace("AS z_obs", f"AS {prefix}z_obs")
        )
        return f"SELECT {cols} FROM {name}"

    ea = _est_sql("a_obs", "a_z_obs")
    eb = _est_sql("b_obs", "b_z_obs")
    eu = _est_sql("u_obs", "u_z_obs")
    return f"""
WITH {regs("ar", "click")},
{regs("br", "purchase")},
ur AS (SELECT j, max(reg) AS reg
       FROM (SELECT * FROM ar UNION ALL SELECT * FROM br) GROUP BY j),
aa AS ({agg("ar", "a_")}),
ba AS ({agg("br", "b_")}),
ua AS ({agg("ur", "u_")}),
ex AS (
  SELECT count(*)::BIGINT AS exact_union,
         sum(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END)::BIGINT AS exact_inter
  FROM (
    SELECT user_id, count(*) AS n_sides FROM (
      SELECT DISTINCT user_id, 'a' AS s FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT DISTINCT user_id, 'b' AS s FROM events WHERE event_type = 'purchase')
    GROUP BY user_id))
SELECT a_obs, {ea} AS a_est, b_obs, {eb} AS b_est,
       u_obs, {eu} AS union_est,
       round({ea} + {eb} - {eu}, 6) + 0.0 AS inter_est,
       exact_union, exact_inter
FROM aa, ba, ua, ex
""".strip()
