"""Property-based invariants for SQ8 quantization and the event-sequence
analytics (hypothesis drives pure-Python replicas of the column expressions;
Spark agreement is covered by the oracle gate, these pin the MATH).

Covered invariants:
  - SQ8 codes always land in [0, 255]; reconstruction error is bounded by
    half a bucket; v == min -> code 0 and v == max -> code 255;
    quantization is monotone non-decreasing per dimension
  - islands reconstruction: per-user island counts sum to the row count,
    every island is a maximal single-type run, and the number of islands
    equals 1 + (number of adjacent type changes)
  - funnel monotonicity: step cardinalities never increase along the funnel
    for ANY event sequence (checked on the real table, where the Spark/
    oracle pair already hash-matched)
"""

import math

from hypothesis import given, settings, strategies as st

LEVELS = 256


def _code(v: float, mn: float, mx: float) -> float:
    if mx == mn:
        return 0.0
    return min(math.floor((v - mn) / (mx - mn) * 256.0), 255.0)


def _recon(v: float, mn: float, mx: float) -> float:
    if mx == mn:
        return mn
    return mn + (_code(v, mn, mx) + 0.5) / 256.0 * (mx - mn)


finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64)


@settings(max_examples=200, deadline=None)
@given(st.lists(finite, min_size=1, max_size=32))
def test_sq8_code_bounds_and_error(vals):
    mn, mx = min(vals), max(vals)
    span = mx - mn
    for v in vals:
        c = _code(v, mn, mx)
        assert 0.0 <= c <= 255.0
        # half-bucket reconstruction bound (small float slack for the
        # round-trip through the fraction)
        assert abs(v - _recon(v, mn, mx)) <= span / LEVELS / 2 + 1e-9 * max(1.0, abs(span))
    assert _code(mn, mn, mx) == 0.0
    if span > 0:
        assert _code(mx, mn, mx) == 255.0


@settings(max_examples=200, deadline=None)
@given(st.lists(finite, min_size=2, max_size=32))
def test_sq8_quantization_monotone(vals):
    """Monotone over in-range values (the operator's domain: ranges ARE the
    corpus min/max, so every value lies inside [mn, mx] by construction)."""
    mn, mx = min(vals), max(vals)
    codes = [_code(v, mn, mx) for v in sorted(vals)]
    assert all(codes[i] <= codes[i + 1] for i in range(len(codes) - 1))


def _py_islands(types: list[str]) -> list[tuple[str, int]]:
    """Reference gaps-and-islands: maximal runs of equal adjacent values."""
    out: list[tuple[str, int]] = []
    for t in types:
        if out and out[-1][0] == t:
            out[-1] = (t, out[-1][1] + 1)
        else:
            out.append((t, 1))
    return out


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(["view", "click", "purchase"]), min_size=0, max_size=40))
def test_islands_reconstruction(types):
    islands = _py_islands(types)
    assert sum(n for _, n in islands) == len(types)
    # maximality: adjacent islands always differ in type
    assert all(islands[i][0] != islands[i + 1][0] for i in range(len(islands) - 1))
    changes = sum(1 for i in range(len(types) - 1) if types[i] != types[i + 1])
    assert len(islands) == (changes + 1 if types else 0)


def test_islands_spark_matches_python_reference(spark, sf_dir):
    """The Spark lag-flag/running-sum islands equal the sequential-scan
    reference on every user of the real table."""
    from collections import defaultdict

    from vector_db_from_scratch_spark.operators.analytics import event_islands
    from vector_db_from_scratch_spark.sources.tables import load_table

    got = defaultdict(list)
    for r in event_islands(spark, sf_dir).collect():  # ordered user, island
        got[r["user_id"]].append((r["event_type"], r["n_events"]))
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        seqs[r["user_id"]].append(r["event_type"])
    want = {u: _py_islands(ts) for u, ts in seqs.items()}
    assert dict(got) == want


def test_funnel_monotone(spark, sf_dir):
    from vector_db_from_scratch_spark.operators.analytics import funnel_conversion

    row = funnel_conversion(spark, sf_dir).collect()[0]
    assert row["step1_users"] >= row["step2_users"] >= row["step3_users"] >= 0
    assert row["step1_users"] > 0


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            # exact-ish 6dp decimals and half-way boundary seeds
            st.integers(-10**12, 10**12).map(lambda k: k / 1e6),
            st.integers(-10**9, 10**9).map(lambda k: (2 * k + 1) / 2e6),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_collect_micro_values(vals):
    _MICRO_VALS.extend(vals)


_MICRO_VALS: list[float] = []


def test_micro_rounding_contract_cross_engine(spark):
    """The exact-sum pattern rests on one premise: rounding an IDENTICAL
    double to integral micro-units agrees between Spark's F.round
    (HALF_UP) and DuckDB's round() (half away from zero) -- including
    values engineered to land on or near .5 boundaries after the *1e6
    multiply. A single divergent value would shift a micro-unit sum and
    hash-mismatch every dsum/osum gate."""
    import duckdb

    from pyspark.sql import functions as F

    vals = _MICRO_VALS or [0.0000005, -0.0000005, 1.0000005, 123.4567895]
    pdf_rows = [(i, float(v)) for i, v in enumerate(vals)]
    sdf = spark.createDataFrame(pdf_rows, "i long, x double")
    got_spark = {
        r["i"]: r["m"]
        for r in sdf.select(
            "i", F.round(F.col("x") * F.lit(1e6), 0).cast("long").alias("m")
        ).collect()
    }
    con = duckdb.connect()
    got_duck = {}
    for i, v in pdf_rows:
        (m,) = con.execute(
            "SELECT round(? * 1000000.0)::BIGINT", [v]
        ).fetchone()
        got_duck[i] = m
    assert got_spark == got_duck


def test_bootstrap_ci_statistics_are_sane(spark, sf_dir):
    """Poisson-bootstrap invariants: mean resample weight is ~1 (total
    n_eff within 10% of B * n_rows), the percentile CI brackets the plain
    corpus mean, bounds are ordered and constant across rows, and the
    replicate means actually vary (the weights are not degenerate)."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.operators import analytics
    from vector_db_from_scratch_spark.operators.relational import MICRO
    from vector_db_from_scratch_spark.sources.tables import load_table

    rows = analytics.bootstrap_ci(spark, sf_dir).collect()
    assert len(rows) == analytics.B_REPLICATES
    n = load_table(spark, sf_dir, "orders").count()
    total_eff = sum(r["n_eff"] for r in rows)
    assert abs(total_eff - analytics.B_REPLICATES * n) <= 0.1 * analytics.B_REPLICATES * n
    lo = {r["ci_lo_micros"] for r in rows}
    hi = {r["ci_hi_micros"] for r in rows}
    assert len(lo) == 1 and len(hi) == 1
    lo, hi = lo.pop(), hi.pop()
    assert lo < hi
    plain = (
        load_table(spark, sf_dir, "orders")
        .agg(F.avg("o_totalprice").alias("m"))
        .collect()[0]["m"]
    )
    assert lo <= plain * MICRO <= hi
    assert len({r["mean_micros"] for r in rows}) > 1


def test_resample_hourly_dense_grid_and_conservation(spark, sf_dir):
    """The resampled grid is dense (hours x types exactly), counts sum to
    the corpus row count, and the zero-fill is non-vacuous on this corpus
    (at least one (hour, type) bucket is empty)."""
    from vector_db_from_scratch_spark.operators import analytics
    from vector_db_from_scratch_spark.sources.tables import load_table

    rows = analytics.resample_hourly(spark, sf_dir).collect()
    hours = {r["hour"] for r in rows}
    types = {r["event_type"] for r in rows}
    assert len(rows) == len(hours) * len(types)
    ev = load_table(spark, sf_dir, "events")
    assert sum(r["n"] for r in rows) == ev.count()
    assert any(r["n"] == 0 for r in rows)


def test_bootstrap_ci_rejects_degenerate_replicate_count():
    """ADVICE r9: rk==2 / rk==b-1 percentile bounds are null or inverted
    below b=4, so the parameter is guarded at entry."""
    import pytest

    from vector_db_from_scratch_spark.operators.analytics import bootstrap_ci

    for bad in (0, 1, 2, 3):
        with pytest.raises(ValueError):
            bootstrap_ci(None, "unused", b=bad)
