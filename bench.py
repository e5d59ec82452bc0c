"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is executed with a noop sink (full plan computed, no driver
transfer) and timed wall-clock. The exclusion list holds only operators
that are intentionally quadratic at bench scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EXCLUDE = {
    "dedup_simhash_pairs",  # O(n^2) pair report; fine at sf0.01 gate, not a bench target
    "dedup_simhash_banded",  # 16-bit test fingerprint saturates its bands at sf0.1
    # (band cardinality 32 << docs); production form is 64-bit / 16-bit bands
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import __spark_entry__ as entrymod
    from vector_db_from_scratch_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM + parquet footers before timing
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    from vector_db_from_scratch_spark.plans import plan_fingerprint

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    plans: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        if name in EXCLUDE:
            continue
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        try:
            # fingerprint after execution (AQE-final plan shape); a timing
            # regression between rounds points at its plan diff
            plans[name] = plan_fingerprint(df)
        except Exception:
            plans[name] = "n/a"
        # warm re-run: same plan with codegen, parquet footers, broadcast
        # vars and any persisted subtrees hot -- the steady-state number a
        # long-lived cluster session would see. `queries`/`value` keep the
        # first-run (cold-ish) semantics for round-over-round comparability.
        t1 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm[name] = round(time.perf_counter() - t1, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "plans": plans,
                "queries_warm": warm,
                "value_warm": round(sum(warm.values()), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
