"""Hot-key skew scale-proof (VERDICT r4 #6 / r5 #2): time per-user
operators on a uniform events table vs the make_skew.py replica where
ONE user owns ~10% of all events — the adversarial regime for every
groupBy(user_id) (real CDC keys are Zipfian; the reference's whole
semantics is per-key collapse).

For each (query, dir) the query runs twice and the best wall-time is
kept (discounts JVM/page-cache warmup). Degradation = skew_sec /
uniform_sec at the same sf; a per-user operator whose plan is
map-side-partial + single-shuffle should degrade ~1×, because the hot
key's rows still spread across input partitions and only the final
merge of ONE key's partials serializes.

Usage: python tools/skew_proof.py [uniform_dir skew_dir [label]] ...
       (default: sf0.1 and /tmp/sf1 pairs, writes SKEW_PROOF_r{N}.json)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from simple_cdc_service_spark.registry import REGISTRY  # noqa: E402
from simple_cdc_service_spark.session import get_spark  # noqa: E402

QUERIES = [
    "cdc_snapshot",
    "funnel_conversion",
    "user_event_sequences",
    "user_activity_gini",
    "sessionize",
    "retention_cohorts",
]

PAIRS = [
    ("/root/testdata/sf0.1", "/tmp/sf0.1_skew", "sf0.1"),
    ("/tmp/sf1", "/tmp/sf1_skew", "sf1"),
]


def best_time(fn, spark, sf_dir: str, runs: int = 2) -> tuple[float, int]:
    best, rows = float("inf"), 0
    for _ in range(runs):
        t0 = time.time()
        rows = REGISTRY[fn].fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
    return best, rows


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SKEW_PROOF_r06.json"
    spark = get_spark("skew-proof")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for uni, skew, label in PAIRS:
        for q in QUERIES:
            u_sec, u_rows = best_time(q, spark, uni)
            s_sec, s_rows = best_time(q, spark, skew)
            results[f"{label}:{q}"] = {
                "uniform_sec": round(u_sec, 3),
                "skew_sec": round(s_sec, 3),
                "ratio": round(s_sec / u_sec, 2) if u_sec else None,
                "uniform_rows": u_rows,
                "skew_rows": s_rows,
            }
            print(
                f"{label:6} {q:24} uniform {u_sec:6.2f}s  skew {s_sec:6.2f}s  "
                f"ratio {s_sec / u_sec:5.2f}  rows {u_rows}->{s_rows}",
                flush=True,
            )
    with open(out_json, "w") as f:
        json.dump(
            {
                "hot_key_share": 0.10,
                "method": "best-of-2 wall per (query, dir); make_skew.py "
                "reassigns event_id%10==7 to the min user_id",
                "queries": results,
            },
            f,
            indent=1,
        )
    print(f"wrote {out_json}")
    spark.stop()


if __name__ == "__main__":
    main()
