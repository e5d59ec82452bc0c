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
