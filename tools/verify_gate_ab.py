"""A/B calibration for the in-bucket verify gate (r11, VERDICT r10 #6).

Runs dedup_minhash's direct-path verify in BOTH modes (join vs bucket,
forced via minhash_dedup_pairs(verify=...)) over word-shuffled document
corpora of increasing size and records wall + row counts + the measured
shingle-cell mass (docs × mean 3-gram set size) the r11 gate keys on.
Identical row counts double as a mode-equality check at scale.

The join mode is SKIPPED (recorded as modeled) where its candidate-pair
array shuffle is predicted to exceed the disk budget — the r10 death at
5M docs (≈450M pairs × ~2.5 KB re-exchanged ≈ TB-scale shuffle,
SCALE100DOCS_r10.json) anchors the upper end; the point of this A/B is
the CROSSOVER region below it.

Usage: python tools/verify_gate_ab.py OUT_JSON DIR [DIR ...]
       (add ":nojoin" to a dir to skip its join leg)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_json = sys.argv[1]
    dirs = sys.argv[2:]

    import duckdb

    from simple_cdc_service_spark.operators.dedup import minhash_dedup_pairs
    from simple_cdc_service_spark.session import get_spark

    spark = get_spark("verify-gate-ab")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    out: dict = {}
    if os.path.exists(out_json):
        out = json.load(open(out_json))
    for spec in dirs:
        d, _, flag = spec.partition(":")
        docs_pq = os.path.join(d, "documents.parquet")
        n_docs, avg_set = con.execute(
            f"SELECT count(*), avg(greatest(len(string_split(text,' ')) - 2, 0)) "
            f"FROM read_parquet('{docs_pq}')"
        ).fetchone()
        cell_mass = int(n_docs * avg_set)
        entry = {
            "n_docs": int(n_docs),
            "avg_shingles": round(float(avg_set), 1),
            "cell_mass": cell_mass,
        }
        df = spark.read.parquet(docs_pq).select("doc_id", "text")
        for mode in ("bucket", "join"):
            if mode == "join" and flag == "nojoin":
                entry["join"] = {
                    "skipped": "modeled: pair-array shuffle exceeds disk "
                    "budget (r10 5M-doc death, SCALE100DOCS_r10.json)"
                }
                continue
            t0 = time.perf_counter()
            rows = minhash_dedup_pairs(
                df, n=3, k=8, bands=4, verify=mode, factorize=False
            ).count()
            entry[mode] = {
                "sec": round(time.perf_counter() - t0, 1),
                "rows": rows,
            }
            print(f"{d} {mode}: {entry[mode]}", flush=True)
        if "join" in entry and "bucket" in entry and "rows" in entry["join"]:
            entry["rows_equal"] = entry["join"]["rows"] == entry["bucket"]["rows"]
        out[os.path.basename(d)] = entry
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)
    print(f"wrote {out_json}")
    spark.stop()


if __name__ == "__main__":
    main()
