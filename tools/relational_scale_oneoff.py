"""One-off 100x relational/window scale measurement (VERDICT r6 item 7):
the relational leg's scale evidence previously stopped at the bench's 10x
ratios; this records 100x wall ratios for the agg / window / as-of /
funnel flagships, using the same scale_gen corpus (events + lineitem
replicated with shifted ids -- per-key structure preserved, no invented
hot keys) and the same symmetric warm/warm protocol as the ANN one-off.

Protocol (per SCALE.md "Scale ratios lie"): per side, clear the memo
registry + block cache, run each query twice with a noop sink, keep the
min (first pass warms that side's caches, second measures).

Usage: python tools/relational_scale_oneoff.py [sf_dir] [k]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import scale_gen

    from vector_db_from_scratch_spark.operators import _memo, analytics, relational
    from vector_db_from_scratch_spark.session import get_spark

    spark = get_spark("relational-scale")
    t0 = time.perf_counter()
    scaled = scale_gen.scale_dir(sf_dir, k)
    print(f"scaled dir ({k}x): {scaled} [{time.perf_counter() - t0:.1f}s]")

    QUERIES = {
        "tpch_pricing_summary": relational.pricing_summary,
        "window_event_islands": analytics.event_islands,
        "join_asof_last_click": analytics.asof_last_click,
        "funnel_view_click_purchase": analytics.funnel_conversion,
    }
    sides = {}
    for label, d in (("1x", sf_dir), (f"{k}x", scaled)):
        _memo.clear()
        spark.catalog.clearCache()
        side = {}
        for name, fn in QUERIES.items():
            samples = []
            for _ in range(2):
                t1 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t1)
            side[name] = round(min(samples), 3)
        sides[label] = side
        print(label, side)
    for name in QUERIES:
        a, b = sides["1x"][name], sides[f"{k}x"][name]
        print(f"{name}: {a}s -> {b}s  ratio {b / a:.1f}x on {k}x data")
    spark.stop()


if __name__ == "__main__":
    main()
