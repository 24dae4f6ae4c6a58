"""Round-11 optimization profiler (guide §1: measure first).

For each named query (default: the bench headliners) this times, under the
exact bench methodology (1 warm run + min of N timed runs, collect()):

  - build_s: Python-side DataFrame construction + analysis time
  - cold_s:  the first (warm-up) execution — plan compile + JIT + any
             staged-frame materialization the steady state then reuses
  - collect_s: min over N timed collect() runs (bench parity)
  - noop_s:  min over N timed noop-sink runs (guide §1.4 — computation
             only, no result assembly / driver transfer)

and can dump .explain("formatted") to plans/r12/<name>_<tag>.txt (PLANS_ROUND overrides).

Usage:
  python tools/opt_profile.py [--sf DIR] [--reps N] [--plans TAG] [q ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_cdc_service_spark.plans import plan_string  # noqa: E402
from simple_cdc_service_spark.registry import REGISTRY  # noqa: E402
from simple_cdc_service_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dump plans/$PLANS_ROUND (default r12)/<q>_<TAG>.txt")
    ap.add_argument("--noop", action="store_true", help="also time the noop sink")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_spark("opt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    names = args.queries or [n for n, s in REGISTRY.items() if s.headline]

    # Same warmup as bench.py: JVM/codegen + the Python worker pool.
    REGISTRY[names[0]].fn(spark, args.sf).collect()
    spark.range(0, spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r12"))
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        spec = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = spec.fn(spark, args.sf)
        build_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        df.collect()
        cold_s = time.perf_counter() - t0

        collect_s = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            spec.fn(spark, args.sf).collect()
            collect_s = min(collect_s, time.perf_counter() - t0)

        noop_s = None
        if args.noop:
            noop_s = float("inf")
            for _ in range(args.reps):
                d2 = spec.fn(spark, args.sf)
                t0 = time.perf_counter()
                d2.write.format("noop").mode("overwrite").save()
                noop_s = min(noop_s, time.perf_counter() - t0)

        if args.plans:
            with open(os.path.join(plans_dir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(plan_string(df, "formatted").strip() + "\n")

        rec = {
            "build_s": round(build_s, 3),
            "cold_s": round(cold_s, 3),
            "collect_s": round(collect_s, 3),
        }
        if noop_s is not None:
            rec["noop_s"] = round(noop_s, 3)
        out[name] = rec
        print(name, json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)

    total = round(sum(r["collect_s"] for r in out.values()), 3)
    print(json.dumps({"total_collect_s": total, "n": len(out), "sf": args.sf}))
    spark.stop()


if __name__ == "__main__":
    main()
