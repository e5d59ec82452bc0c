"""Rotation contract of the correctness-gate registry ordering: the
driver records only a prefix of queries(), so the order must put sentinels
first, then every gated entry without a recorded green driver row, then
the verified remainder, with rows-only entries last (VERDICT r3 finding:
a static prefix made consecutive rounds record identical windows)."""

import sys

sys.path.insert(0, "/root/repo")

from vector_db_from_scratch_spark import registry  # noqa: E402


def test_rotation_prioritizes_never_verified():
    reg = registry.build()
    seen = registry._driver_verified()
    names = list(reg)

    sent = [n for n in registry._SENTINELS if n in reg]
    assert names[: len(sent)] == sent, "sentinels lead every round"

    rest = names[len(sent):]
    gated_never = {n for n in rest if n not in seen and reg[n][1] is not None}
    if gated_never:
        prefix = rest[: len(gated_never)]
        assert set(prefix) == gated_never, (
            "the window after the sentinels must be drawn from queries "
            "without a green driver row"
        )

    # never-driver-recorded rows-only entries rotate in right after the
    # fresh gated pool (VERDICT r6 item 6: two persisted-ANN paths had
    # never appeared in any window); once recorded they sort last
    rows_only_never = {n for n in rest if n not in seen and reg[n][1] is None}
    if rows_only_never:
        start = len(gated_never)
        assert set(rest[start : start + len(rows_only_never)]) == rows_only_never, (
            "never-recorded rows-only entries follow the fresh gated pool"
        )
    # already-recorded rows-only entries sort last -- EXCEPT stale ones
    # (recorded >=2 rounds behind the newest recorded round), which
    # re-enter ahead of the verified gated pool (VERDICT r9 item 6)
    latest = max(seen.values(), default=0)
    rows_only_recent = [
        n for n in names
        if reg[n][1] is None and n in seen and seen[n] > latest - 2
    ]
    if rows_only_recent:
        assert all(
            reg[n][1] is None for n in names[-len(rows_only_recent):]
        ), "recently-recorded rows-only entries sort last"


def test_rotation_interleaves_families():
    """A capped window must touch many operator families, not exhaust one:
    no family may occupy more than ~a quarter of the first 50."""
    from collections import Counter

    reg = registry.build()
    fams = Counter(n.split("_", 1)[0] for n in list(reg)[:50])
    assert max(fams.values()) <= 13, fams
    assert len(fams) >= 10, fams


def test_driver_verified_ignores_failed_rows(tmp_path, monkeypatch):
    """Errored or hash-failed rows must NOT count as verified (they rotate
    back to the front of the next window)."""
    import json

    import vector_db_from_scratch_spark.registry as regmod

    root = tmp_path
    (root / "pkg").mkdir()
    fake_file = root / "pkg" / "registry.py"
    fake_file.write_text("")
    rows = {
        "green": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
        "rows_only_green": {"rows_match": True, "schema_match": None, "hash_match": None, "err": None},
        "hash_fail": {"rows_match": True, "schema_match": True, "hash_match": False, "err": None},
        "errored": {"rows_match": None, "schema_match": None, "hash_match": None, "err": "boom"},
    }
    (root / "CORRECTNESS_r09.json").write_text(json.dumps(rows))
    monkeypatch.setattr(regmod, "__file__", str(fake_file))
    seen = regmod._driver_verified()
    assert seen == {"green": 9, "rows_only_green": 9}


def test_driver_verified_keeps_newest_green_round(tmp_path, monkeypatch):
    """Staleness ordering needs the NEWEST green round per name: a query
    green in r1 and re-confirmed in r6 is fresher than one last seen r2."""
    import json

    import vector_db_from_scratch_spark.registry as regmod

    root = tmp_path
    (root / "pkg").mkdir()
    fake_file = root / "pkg" / "registry.py"
    fake_file.write_text("")
    green = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    (root / "CORRECTNESS_r01.json").write_text(json.dumps({"a": green, "b": green}))
    (root / "CORRECTNESS_r06.json").write_text(json.dumps({"a": green}))
    monkeypatch.setattr(regmod, "__file__", str(fake_file))
    assert regmod._driver_verified() == {"a": 6, "b": 1}


def test_rotation_orders_verified_tail_by_staleness():
    """With every gated query green at least once, the window tail is the
    re-verification channel: the verified-gated run must be ordered
    oldest-newest-green-round first (VERDICT r7 item 1), so r1/r2-verified
    rows re-enter a driver window before last round's rows do."""
    reg = registry.build()
    seen = registry._driver_verified()
    names = list(reg)
    verified_gated = [
        n for n in names
        if n in seen and reg[n][1] is not None and n not in registry._SENTINELS
    ]
    rounds = [seen[n] for n in verified_gated]
    # cohort boundaries must be non-decreasing (family interleave only
    # reorders WITHIN a same-round cohort)
    assert rounds == sorted(rounds), (
        "verified gated tail must be ordered by oldest green round first"
    )


def test_stale_rows_only_reenters_ahead_of_recent_gated(tmp_path, monkeypatch):
    """VERDICT r9 item 6: over a synthetic history, an r7 rows-only green
    must outrank r9-verified gated rows in window order (rows-only greens
    must decay back into the verification pool, not stay 'recorded once in
    r7' forever)."""
    import json

    import vector_db_from_scratch_spark.registry as regmod

    root = tmp_path
    (root / "pkg").mkdir()
    fake_file = root / "pkg" / "registry.py"
    fake_file.write_text("")
    green = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    rows_only = {"rows_match": None, "hash_match": None, "err": "no_oracle", "spark_rows": 5}
    (root / "CORRECTNESS_r07.json").write_text(
        json.dumps({"stale_rows_only": rows_only, "fresh_rows_only_r9": rows_only})
    )
    (root / "CORRECTNESS_r09.json").write_text(
        json.dumps({"gated_a": green, "gated_b": green, "fresh_rows_only_r9": rows_only})
    )
    monkeypatch.setattr(regmod, "__file__", str(fake_file))

    fn = lambda spark, sf: None  # noqa: E731
    reg = {
        "gated_a": (fn, "SELECT 1"),
        "gated_b": (fn, "SELECT 1"),
        "stale_rows_only": (fn, None),
        "fresh_rows_only_r9": (fn, None),
        "never_gated": (fn, "SELECT 1"),
    }
    ordered = list(regmod._reorder(reg))
    # never-recorded gated first, then the stale rows-only re-entry, then
    # the recently-verified gated pool, then recent rows-only last
    assert ordered.index("stale_rows_only") < ordered.index("gated_a")
    assert ordered.index("stale_rows_only") < ordered.index("gated_b")
    assert ordered.index("never_gated") < ordered.index("stale_rows_only")
    assert ordered[-1] == "fresh_rows_only_r9"
