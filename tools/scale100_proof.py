"""100x scale evidence for the dedup/similarity family (VERDICT r6 #2)
and, with --all, the FULL registry (VERDICT r7 #1).

Runs registry entries at sf0.1 -> sf1 -> sf10 (the /tmp/sf1 and
/tmp/sf10 replicas from tools/make_sf1.py) and records engine wall +
output rows per decade. ENGINE ONLY, no oracle — at 100x the point is
survival and growth shape, not re-verification (the hash evidence lives
in the CORRECTNESS_FULL artifacts at <= sf1).

Materialization forces EVERY output column, not bare .count(): the pair
outputs are the product being measured, and at sf10 the by-construction
word-set clone groups have 100 members each, so the within-group
expansion alone is ~110x sf1's pair count (C(100,2)/C(10,2)) — billions
of rows that must flow through the full plan but never belong on the
driver. A bare count() lets Catalyst COLUMN-PRUNE map-only projections
(text_simhash's 64 fold expressions measured 6.8s "wall" at sf10 while
the real compute was ~80s — found r8), so the sweep aggregates
count + sum(xxhash64(*cols)) map-side: one extra hash per row, every
expression actually evaluated, nothing on the driver.

Survival-sweep mode (--all): every registry entry, results written
INCREMENTALLY after each (entry, sf) so a JVM death loses nothing;
re-running with the same out.json resumes past completed cells, and a
per-entry exception is recorded as {"error": ...} instead of killing
the sweep. --sf A,B limits the scales (e.g. --sf 1.0,10.0).

Usage: python tools/scale100_proof.py [out.json] [--all] [--sf 1.0,10.0] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_cdc_service_spark.registry import REGISTRY  # noqa: E402
from simple_cdc_service_spark.session import get_spark  # noqa: E402

SF_DIRS = [
    ("/root/testdata/sf0.1", 0.1),
    ("/tmp/sf1", 1.0),
    ("/tmp/sf10", 10.0),
    # r9: the first adaptive-engaged decade (600k vectors — past the
    # 262,144 LSH clamp and 3x past adaptive_n_centroids' sf10 k=196);
    # build with: python tools/make_sf1.py /root/testdata/sf0.1 /tmp/sf30 300
    ("/tmp/sf30", 30.0),
    # r9: the vector decade past the flat quantizer's k=1024 cap
    # (2M vectors, embeddings+documents only — similarity/dedup entries;
    # build with: python tools/make_vec_decade.py /tmp/sf100vec 1000)
    ("/tmp/sf100vec", 100.0),
    # r10: the DOCUMENTS decade (5M docs = sf100-documents, VERDICT r9
    # #4 — word-set clone groups of 1000 members, within-group pair
    # output ~2.5B; build with: python tools/make_doc_decade.py)
    ("/tmp/sf100docs", 1000.0),
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

NOTE = (
    "single-run warmed-JVM engine wall, count() materialization "
    "(full plan executes, rows aggregate map-side); growth_a_to_b "
    "= t(b)/t(a) per 10x data step. Word-set clone groups grow "
    "10 -> 100 members between sf1 and sf10 by construction, so "
    "pair-emitting unigram entries are expected to grow "
    "super-linearly in OUTPUT (quadratic within-group expansion) "
    "while staying sub-quadratic in wall — that asymmetry is the "
    "factorization working, not failing."
)


def _materialize(df) -> int:
    """Execute the full plan with every output column forced (see module
    doc) and return the row count. Falls back to count() for column
    types xxhash64 can't digest."""
    import pyspark.sql.functions as F

    try:
        # sum in double: the value is discarded, it exists only to force
        # every column's evaluation — a long sum overflows under ANSI
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(*[F.col(c) for c in df.columns]).cast("double")
            ).alias("h"),
        ).first()
        return int(row["n"])
    except Exception:
        return df.count()


def _flush(out: str, results: dict) -> None:
    payload = {"note": NOTE, "loadavg": os.getloadavg()[0], "queries": results}
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(tmp, out)


def main() -> int:
    args = sys.argv[1:]
    out = args.pop(0) if args and args[0].endswith(".json") else "SCALE100_r07.json"
    run_all = "--all" in args
    if run_all:
        args.remove("--all")
    sfs = None
    if "--sf" in args:
        i = args.index("--sf")
        sfs = {float(x) for x in args[i + 1].split(",")}
        del args[i : i + 2]
    names = list(REGISTRY) if run_all else (args or DEFAULT_QUERIES)

    # resume: completed (entry, sf) cells in an existing out.json are kept
    results: dict[str, dict] = {}
    if os.path.exists(out):
        with open(out) as f:
            results = json.load(f).get("queries", {})
        print(f"resuming from {out}: {len(results)} entries present")
    for n in names:
        results.setdefault(n, {"sec": {}, "rows": {}})

    def fresh_spark():
        s = get_spark("scale100-proof")
        s.sparkContext.setLogLevel("ERROR")
        REGISTRY["q1_pricing_summary"].fn(s, SF_DIRS[0][0]).collect()  # warm
        return s

    def session_alive(s) -> bool:
        try:
            return not s.sparkContext._jsc.sc().isStopped()
        except Exception:
            return False

    spark = fresh_spark()

    for sf_dir, sf in SF_DIRS:
        if sfs is not None and sf not in sfs:
            continue
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_dir}: missing")
            continue
        for n in names:
            cell = results[n]
            key = str(sf)
            if key in cell["sec"] or key in cell.get("error", {}):
                continue  # resumed
            fn = REGISTRY[n].fn
            from task_skew import max_stage_id, stage_skew

            watermark = max_stage_id(spark)
            t0 = time.time()
            try:
                rows = _materialize(fn(spark, sf_dir))
            except Exception as e:  # record, keep sweeping
                dt = time.time() - t0
                cell.setdefault("error", {})[key] = (
                    f"{type(e).__name__}: {str(e).splitlines()[0][:300]}"
                )
                print(f"{n} @ sf{sf}: ERROR after {dt:.2f}s — {type(e).__name__}",
                      flush=True)
                traceback.print_exc(limit=3)
                _flush(out, results)
                if not session_alive(spark):
                    # an entry that kills the JVM must not poison the
                    # rest of the sweep with instant dead-session errors
                    # (r8: interval_join_distinct_hll took 5 entries
                    # down with it). In local mode the py4j gateway dies
                    # with the JVM, so an in-process rebuild is
                    # impossible — exit with the error recorded; a rerun
                    # resumes past every completed cell.
                    print("SparkSession/JVM died — exiting for resume "
                          "(rerun the same command)", flush=True)
                    return 2
                continue
            dt = time.time() - t0
            cell["sec"][key] = round(dt, 2)
            cell["rows"][key] = rows
            # TRAP #31 invariant (VERDICT r9 #6): flag any stage this
            # cell ran whose busiest task carried >8x the mean records —
            # row-group-bound straggler scans masquerade as compute
            # ceilings and the plan gate can't see them (the r9 trap was
            # 1.05M records in one task vs 0 in thirty).
            hits = stage_skew(spark, since_stage=watermark)
            if hits:
                cell.setdefault("skew", {})[key] = hits[:5]
                print(f"{n} @ sf{sf}: SKEW {hits[0]['skew_ratio']}x "
                      f"(stage {hits[0]['stage_id']}, max "
                      f"{hits[0]['max_records']} records)", flush=True)
            print(f"{n} @ sf{sf}: {dt:.2f}s, {rows} rows", flush=True)
            _flush(out, results)

    for n in names:
        pts = results[n]["sec"]
        for lo, hi in (("0.1", "1.0"), ("1.0", "10.0")):
            if lo in pts and hi in pts:
                results[n][f"growth_{lo}_to_{hi}"] = round(
                    pts[hi] / max(pts[lo], 0.05), 1
                )

    _flush(out, results)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
