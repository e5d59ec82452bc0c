"""Optimization measurement harness (rounds 10-11).

Times individual registry queries with the noop sink (guide §1.4), prints
cold + warm min-of-N seconds, and writes each query's post-execution
``explain("formatted")`` to ``plans/$OPT_PLANS_DIR/<query>_<tag>.txt`` (default r11) so
before/after plan claims in OPTIMIZATION_r<n>.md are reproducible artifacts.

Usage:
    python tools/opt_measure.py --tag before query1 query2 ...
    python tools/opt_measure.py --tag after --no-builds query1 ...

Flags:
    --tag TAG       suffix for the plan file (before/after); omit to skip
                    writing plan files (pure timing run)
    --no-builds     skip builds.run_builds (faster when the measured
                    queries own their artifacts or need none)
    --samples N     warm samples (default 3)
    --sf-dir DIR    data dir (default $SPARK_GRAFT_SF_DIR or sf0.1)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default=None)
    ap.add_argument("--no-builds", action="store_true")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    import __spark_entry__ as entrymod
    from vector_db_from_scratch_spark.session import get_spark

    spark = get_spark("opt-measure")
    spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet")).count()
    all_queries = entrymod.queries()

    if not args.no_builds:
        from vector_db_from_scratch_spark.builds import run_builds

        t0 = time.perf_counter()
        run_builds(spark, args.sf_dir)
        print(f"builds: {time.perf_counter() - t0:.3f}s", flush=True)

    plans_dir = os.path.join(REPO, "plans", os.environ.get("OPT_PLANS_DIR", "r11"))
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in args.queries:
        fn = all_queries[name]
        fn = getattr(fn, "__wrapped__", fn)
        spark.sparkContext.setJobDescription(f"opt: {name}")
        t0 = time.perf_counter()
        df = fn(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        samples = []
        for _ in range(args.samples):
            t1 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t1)
        if args.tag:
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        out[name] = {
            "cold": round(cold, 3),
            "warm_min": round(min(samples), 3),
            "warm_all": [round(s, 3) for s in samples],
        }
        print(f"{name}: cold={cold:.3f} warm={min(samples):.3f} {samples}", flush=True)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
