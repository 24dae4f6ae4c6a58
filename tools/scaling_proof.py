"""Scale-growth proof: engine wall time for the heavy operators across
sf0.001 -> sf0.01 -> sf0.1 -> sf1 (the /tmp/sf1 10x replica), each a 10x
data step.

Motivation (VERDICT r5 "would this survive 100x?"): the plan-invariant
sweep proves the SHAPES are scale-safe (no single-partition funnels, no
unbounded broadcast/cartesian); this tool measures the other half — that
wall time actually grows ~linearly over three decades of data, i.e. the
banded LSH candidate generation, bucketed pair joins, and partial-agg
pipelines do not hide a super-linear term that plan shapes can't show.

ENGINE TIME ONLY: each (query, sf) point runs the registry fn and fully
materializes it (collect), best-of-2 on a warmed JVM — no DuckDB oracle
in the loop (the correctness sweeps cover that). Interleaved by sf so
host-load drift hits all queries equally.

Usage: python tools/scaling_proof.py [out.json] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_cdc_service_spark.registry import REGISTRY  # noqa: E402
from simple_cdc_service_spark.session import get_spark  # noqa: E402

SF_DIRS = [
    ("/root/testdata/sf0.001", 0.001),
    ("/root/testdata/sf0.01", 0.01),
    ("/root/testdata/sf0.1", 0.1),
    ("/tmp/sf1", 1.0),
]

# The shuffle/candidate-generation heavies: every dedup family, the ANN
# stack, CDC collapse, and the big behavioral aggregations. Cheap scans
# are excluded on purpose — their growth is trivially the parquet read.
DEFAULT_QUERIES = [
    "cdc_snapshot",
    "dedup_exact",
    "dedup_minhash",
    "dedup_minhash_fast",
    "dedup_ngram_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "dedup_incremental",
    "dedup_clusters",
    "dedup_semantic",
    "knn_bruteforce",
    "knn_ivf",
    "knn_ivfpq",
    "q1_pricing_summary",
    "q9_product_profit",
    "sessionize",
    "user_activity_gini",
    "tfidf_top_terms",
]


def main() -> int:
    args = sys.argv[1:]
    out = args.pop(0) if args and args[0].endswith(".json") else "SCALING_r06.json"
    names = args or DEFAULT_QUERIES
    spark = get_spark("scaling-proof")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm JVM + python worker pool once.
    REGISTRY["q1_pricing_summary"].fn(spark, SF_DIRS[1][0]).collect()

    results: dict[str, dict] = {n: {"sf": {}, "rows": {}} for n in names}
    for sf_dir, sf in SF_DIRS:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_dir}: missing")
            continue
        for n in names:
            fn = REGISTRY[n].fn
            best, rows = None, None
            for _ in range(2):
                t0 = time.time()
                rows = len(fn(spark, sf_dir).collect())
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            results[n]["sf"][str(sf)] = round(best, 2)
            results[n]["rows"][str(sf)] = rows
            print(f"{n} @ sf{sf}: {best:.2f}s, {rows} rows", flush=True)

    for n in names:
        pts = results[n]["sf"]
        if "1.0" in pts and "0.1" in pts and pts["0.1"] > 0:
            results[n]["growth_10x_last_step"] = round(pts["1.0"] / max(pts["0.1"], 0.05), 1)

    payload = {
        "note": (
            "best-of-2 warmed-JVM engine wall (collect included), interleaved "
            "by sf; growth_10x_last_step = t(sf1)/t(sf0.1) for the final 10x "
            "data step — ~<=10 means at-worst-linear in data"
        ),
        "loadavg": os.getloadavg()[0],
        "queries": results,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
