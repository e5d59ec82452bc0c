"""One-off 100x STREAMING scale measurement (VERDICT r7 item 7): the
stream_* family's scale evidence previously stopped at the bench's 10x
ratio for the tumbling drain; this records 100x wall ratios AND per-row
throughput for the tumbling-window drain and the watermarked
stream-stream join drain, over the scale_gen corpus (events replicated
with shifted event/user ids -- per-key structure preserved, event-time
range unchanged, so windows gain 100x rows, not 100x windows).

Protocol (per SCALE.md "Scale ratios lie"): per side, clear the memo
registry + block cache, run the UNDECORATED drain (fn.__wrapped__ --
the gated entries are memoized per (application, input), which is the
sink-read discipline, but the scale row must measure the engine
re-draining) twice, keep the min. Per-row throughput is reported
alongside the wall ratio because a bounded local drain pays a fixed
~0.5-0.8s per micro-batch (state-store setup/commit + availableNow
scheduling) that dominates small inputs: at 1x the drain is nearly all
floor, so the wall ratio understates how much of the 100x side is real
work -- rows/s is the number that must IMPROVE with scale for the
streaming claim to hold.

Usage: python tools/streaming_scale_oneoff.py [sf_dir] [k]
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

    from vector_db_from_scratch_spark.operators import _memo
    from vector_db_from_scratch_spark.session import get_spark
    from vector_db_from_scratch_spark.streaming import joins as stream_joins
    from vector_db_from_scratch_spark.streaming import windows as stream_windows

    spark = get_spark("streaming-scale")
    t0 = time.perf_counter()
    scaled = scale_gen.scale_dir(sf_dir, k)
    print(f"scaled dir ({k}x): {scaled} [{time.perf_counter() - t0:.1f}s]")

    QUERIES = {
        "stream_tumbling_drained": stream_windows.tumbling_counts_drained,
        "stream_join_drained": stream_joins.click_purchase_join_drained,
    }
    sides: dict[str, dict[str, float]] = {}
    rows: dict[str, int] = {}
    for label, d in (("1x", sf_dir), (f"{k}x", scaled)):
        _memo.clear()
        spark.catalog.clearCache()
        rows[label] = spark.read.parquet(os.path.join(d, "events.parquet")).count()
        side: dict[str, float] = {}
        for name, fn in QUERIES.items():
            fn = getattr(fn, "__wrapped__", fn)
            samples = []
            for _ in range(2):
                t1 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t1)
            side[name] = round(min(samples), 3)
        sides[label] = side
        print(label, side, f"events={rows[label]}")
    for name in QUERIES:
        a, b = sides["1x"][name], sides[f"{k}x"][name]
        tp_a, tp_b = rows["1x"] / a, rows[f"{k}x"] / b
        print(
            f"{name}: {a}s -> {b}s  wall ratio {b / a:.1f}x on {k}x data; "
            f"throughput {tp_a:,.0f} -> {tp_b:,.0f} rows/s ({tp_b / tp_a:.1f}x)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
