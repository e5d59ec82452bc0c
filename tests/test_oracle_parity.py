"""The local replica of the driver's correctness gate: every queries() entry
must match its oracle_sql() twin on DuckDB at sf0.001 (driver runs sf0.01)."""

import sys

sys.path.insert(0, "/root/repo")

from tools.check import check_all  # noqa: E402


def test_all_queries_match_oracle(spark, sf_dir):
    results = check_all(spark, sf_dir)
    failures = [(n, m) for n, s, m in results if s == "FAIL"]
    assert not failures, f"oracle mismatches: {failures}"
    assert results, "no queries registered"


def test_approx_stats_error_bounds(spark, sf_dir):
    """Sketch aggregates have no cross-engine oracle; bound them against
    exact values instead (HLL rel err ~2% default, percentile accuracy by
    rank error)."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.operators.relational import approx_stats
    from vector_db_from_scratch_spark.sources.tables import load_table

    approx = {r["event_type"]: r for r in approx_stats(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"),
             F.expr("percentile(value, 0.5)").alias("p50"))
        .collect()
    }
    for et, a in approx.items():
        e = exact[et]
        assert abs(a["approx_users"] - e["users"]) <= max(2, 0.1 * e["users"])
        assert abs(a["value_p50"] - e["p50"]) <= 0.1 * max(1.0, abs(e["p50"]))
