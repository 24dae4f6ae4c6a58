"""Persisted-IMI-index build/serve A/B (r11 follow-through on the
build/serve split): measure that SERVING from the cell-partitioned
layout (knn_imi_indexed — probe → Catalyst partition pruning) beats
the in-memory path (knn_imi — full-corpus scan + assignment per call)
at decade scales, with BIT-IDENTICAL results.

Per corpus:
  build_sec   one-time: codebooks + assignment + partitioned write
  serve_sec   knn_imi_indexed over the persisted layout (cold: first
              call after build; warm: repeat call — the steady-state
              serving shape, codebook/meta reads cached by the OS)
  inmem_sec   knn_imi at the SAME (k_half, seed, nprobe) — what every
              query pays without the index
  identical   serve output == in-memory output (sorted rows)
  pruned      probed cells / total cells (the I/O bound the layout buys;
              the plan's PartitionFilters is pinned separately in
              tests/test_round11_ops.py)

The 100 TB reading: build is the once-per-corpus cost (the assignment
pass every ANN docstring says dominates); serving pays only the probed
directories. Break-even is ~build/(inmem−serve) queries.

Usage: python tools/imi_index_proof.py OUT_JSON CORPUS_DIR LABEL [CORPUS_DIR LABEL ...]

LABEL may carry a fixed probe as LABEL:NPROBE (e.g. clustered_2M:32 —
the recall-curves-justified low-probe regime for clustered corpora,
where RECALL_CURVES_r11 reads 0.98 at 1.6% of the grid). Default is
the adaptive probe; note adaptive = cells/4 makes the 5 queries' probe
UNION cover most of the grid, so pruning only pays when the workload's
union is sparse — exactly what the fixed-probe legs measure.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    out_json = sys.argv[1]
    pairs = list(zip(sys.argv[2::2], sys.argv[3::2]))

    from simple_cdc_service_spark.operators.similarity import (
        adaptive_imi_khalf,
        adaptive_imi_nprobe,
        build_imi_index,
        knn_imi,
        knn_imi_indexed,
    )
    from simple_cdc_service_spark.session import get_spark

    spark = get_spark("imi-index-proof")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    if os.path.exists(out_json):
        with open(out_json) as f:
            results = json.load(f)

    for corpus_dir, label in pairs:
        fixed_nprobe = None
        if ":" in label:
            label, np_s = label.rsplit(":", 1)
            fixed_nprobe = int(np_s)
            label = f"{label}_nprobe{fixed_nprobe}"
        emb = spark.read.parquet(os.path.join(corpus_dir, "embeddings.parquet"))
        corpus = emb.filter("vec_id >= 5").select("vec_id", "embedding")
        queries = emb.filter("vec_id < 5").select("vec_id", "embedding")
        n = corpus.count()
        k_half = adaptive_imi_khalf(n)
        cells = k_half * k_half
        nprobe = fixed_nprobe if fixed_nprobe is not None else adaptive_imi_nprobe(cells)

        index_dir = f"/tmp/imi_index_proof_{label}"
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.perf_counter()
        meta = build_imi_index(corpus, index_dir, k_half=k_half)
        build_sec = time.perf_counter() - t0

        def serve():
            return sorted(
                map(
                    tuple,
                    knn_imi_indexed(
                        spark, index_dir, queries, k=10, nprobe=nprobe
                    ).collect(),
                )
            )

        t0 = time.perf_counter()
        served = serve()
        serve_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        served_warm = serve()
        serve_warm = time.perf_counter() - t0
        assert served == served_warm

        t0 = time.perf_counter()
        inmem = sorted(
            map(
                tuple,
                knn_imi(
                    corpus, queries, k=10, k_half=k_half, nprobe=nprobe
                ).collect(),
            )
        )
        inmem_sec = time.perf_counter() - t0

        entry = {
            "n": n,
            "cells": cells,
            "nprobe": nprobe,
            "partition": meta["partition"],
            "build_sec": round(build_sec, 2),
            "serve_cold_sec": round(serve_cold, 2),
            "serve_warm_sec": round(serve_warm, 2),
            "inmem_sec": round(inmem_sec, 2),
            "identical": served == inmem,
            "speedup_warm": round(inmem_sec / serve_warm, 2) if serve_warm else None,
            "breakeven_queries": (
                round(build_sec / (inmem_sec - serve_warm), 1)
                if inmem_sec > serve_warm
                else None
            ),
            "loadavg": round(os.getloadavg()[0], 1),
        }
        results[label] = entry
        print(label, json.dumps(entry), flush=True)
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)

    spark.stop()


if __name__ == "__main__":
    main()
