"""100x scale evidence for the dedup/similarity family (VERDICT r6 #2).

Runs the candidate-generation heavies at sf0.1 -> sf1 -> sf10 (the
/tmp/sf1 and /tmp/sf10 replicas from tools/make_sf1.py) and records
engine wall + output rows per decade. ENGINE ONLY, no oracle — at
100x the point is survival and growth shape, not re-verification (the
hash evidence lives in the CORRECTNESS_FULL artifacts at <= sf1).

Materialization is .count(), not .collect(): the pair outputs are the
product being measured, and at sf10 the by-construction word-set clone
groups have 100 members each, so the within-group expansion alone is
~110x sf1's pair count (C(100,2)/C(10,2)) — billions of rows that must
flow through the full plan but never belong on the driver. count()
executes the identical generation plan and aggregates map-side.

Usage: python tools/scale100_proof.py [out.json] [query ...]
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
    ("/root/testdata/sf0.1", 0.1),
    ("/tmp/sf1", 1.0),
    ("/tmp/sf10", 10.0),
]

DEFAULT_QUERIES = [
    "dedup_minhash",
    "dedup_minhash_fast",
    "dedup_ngram_lsh",
    "dedup_ngram_jaccard",
    "text_simhash",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_embedding_lsh",
    "knn_ivfpq",
    "knn_ivf_kmeans",
]


def main() -> int:
    args = sys.argv[1:]
    out = args.pop(0) if args and args[0].endswith(".json") else "SCALE100_r07.json"
    names = args or DEFAULT_QUERIES
    spark = get_spark("scale100-proof")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["q1_pricing_summary"].fn(spark, SF_DIRS[0][0]).collect()  # warm

    results: dict[str, dict] = {n: {"sec": {}, "rows": {}} for n in names}
    for sf_dir, sf in SF_DIRS:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_dir}: missing")
            continue
        for n in names:
            fn = REGISTRY[n].fn
            t0 = time.time()
            rows = fn(spark, sf_dir).count()
            dt = time.time() - t0
            results[n]["sec"][str(sf)] = round(dt, 2)
            results[n]["rows"][str(sf)] = rows
            print(f"{n} @ sf{sf}: {dt:.2f}s, {rows} rows", flush=True)

    for n in names:
        pts = results[n]["sec"]
        for lo, hi in (("0.1", "1.0"), ("1.0", "10.0")):
            if lo in pts and hi in pts:
                results[n][f"growth_{lo}_to_{hi}"] = round(
                    pts[hi] / max(pts[lo], 0.05), 1
                )

    payload = {
        "note": (
            "single-run warmed-JVM engine wall, count() materialization "
            "(full plan executes, rows aggregate map-side); growth_a_to_b "
            "= t(b)/t(a) per 10x data step. Word-set clone groups grow "
            "10 -> 100 members between sf1 and sf10 by construction, so "
            "pair-emitting unigram entries are expected to grow "
            "super-linearly in OUTPUT (quadratic within-group expansion) "
            "while staying sub-quadratic in wall — that asymmetry is the "
            "factorization working, not failing."
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
