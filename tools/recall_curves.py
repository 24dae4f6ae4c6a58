"""Recall-vs-nprobe curves for the IMI family (r11, VERDICT r10 #4).

The r10 recall numbers (0.90 at nprobe=cells/4 at the 2M decade) were
read on UNIFORM vectors — the structureless worst case where recall is
information-theoretically ≈ the probed fraction. The
adaptive_imi_nprobe docstring claims real (clustered) corpora reach the
same recall at far smaller probed fractions; this harness measures that
claim on mixture-of-Gaussians corpora (tools/make_vec_decade.py
--clustered) next to the uniform decades, for knn_imi (fixed nprobe
sweep + the adaptive default) and knn_ivfpq.

Ground truth is a DRIVER-SIDE numpy brute force (exact cosine top-k,
ties to the lowest id) — independent of every engine code path being
graded. recall@k = |approx ∩ exact| / k averaged over the 5 queries.

Usage:
  python tools/recall_curves.py CORPUS_DIR LABEL OUT_JSON [nprobe ...]
    (default nprobes: 8 32 64 128 256 512)

Appends/merges the LABEL entry into OUT_JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

K = 10


def ground_truth(vecs: np.ndarray, ids: np.ndarray, q_vecs: np.ndarray) -> list[set]:
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    out = []
    for q in q_vecs:
        qn = q / np.linalg.norm(q)
        cos = vn @ qn
        # exact top-K by (-cos, id): lexsort on (ids, -cos)
        order = np.lexsort((ids, -cos))[:K]
        out.append(set(int(ids[i]) for i in order))
    return out


def recall(df, truth: dict[int, set]) -> float:
    got: dict[int, set] = {}
    for r in df.collect():
        got.setdefault(int(r["query_id"]), set()).add(int(r["neighbor_id"]))
    vals = [len(got.get(q, set()) & t) / K for q, t in truth.items()]
    return round(sum(vals) / len(vals), 3)


def main() -> None:
    corpus_dir, label, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    nprobes = [int(x) for x in sys.argv[4:]] or [8, 32, 64, 128, 256, 512]

    from simple_cdc_service_spark.operators.similarity import (
        adaptive_imi_khalf,
        adaptive_imi_nprobe,
        knn_imi,
        knn_ivfpq,
    )
    from simple_cdc_service_spark.session import get_spark

    spark = get_spark("recall-curves")
    emb = spark.read.parquet(os.path.join(corpus_dir, "embeddings.parquet"))
    corpus = emb.filter("vec_id >= 5").select("vec_id", "embedding")
    queries = emb.filter("vec_id < 5").select("vec_id", "embedding")

    import pandas as pd  # noqa: F401 (arrow collect path)

    cp = corpus.toPandas()
    ids = cp["vec_id"].to_numpy()
    vecs = np.array(list(cp["embedding"]), dtype=np.float64)
    qp = queries.toPandas().sort_values("vec_id")
    q_ids = qp["vec_id"].to_numpy()
    q_vecs = np.array(list(qp["embedding"]), dtype=np.float64)
    n = len(ids)
    k_half = adaptive_imi_khalf(n)
    cells = k_half * k_half
    truth = dict(zip((int(i) for i in q_ids), ground_truth(vecs, ids, q_vecs)))
    del cp, vecs

    entry = {
        "n": n,
        "cells": cells,
        "adaptive_nprobe": adaptive_imi_nprobe(cells),
        "knn_imi": {},
        "knn_ivfpq": {},
    }
    import warnings

    for np_ in nprobes:
        if np_ > cells:
            continue
        t0 = time.perf_counter()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # fixed-probe cliff warning, on purpose
            r = recall(
                knn_imi(corpus, queries, k=K, k_half=k_half, nprobe=np_), truth
            )
        entry["knn_imi"][str(np_)] = {
            "recall": r,
            "sec": round(time.perf_counter() - t0, 2),
            "probed_fraction": round(np_ / cells, 4),
        }
        print(f"{label} knn_imi nprobe={np_}: recall={r}", flush=True)
    t0 = time.perf_counter()
    r = recall(knn_imi(corpus, queries, k=K, k_half=k_half), truth)
    entry["knn_imi"]["adaptive"] = {
        "recall": r,
        "sec": round(time.perf_counter() - t0, 2),
        "probed_fraction": round(entry["adaptive_nprobe"] / cells, 4),
    }
    print(f"{label} knn_imi adaptive({entry['adaptive_nprobe']}): recall={r}", flush=True)

    # ivfpq: sweep nprobe at the default rerank AND rerank at the
    # adaptive nprobe — on clustered corpora the PQ shortlist's
    # resolution (not probing) is the recall bottleneck: hundreds of
    # same-cluster candidates sit within the ADC quantization noise, so
    # the 50-candidate shortlist is near-random among them until rerank
    # grows past the per-cluster candidate mass.
    for np_, rr in ((8, 50), (64, 50), (entry["adaptive_nprobe"], 50),
                    (entry["adaptive_nprobe"], 200),
                    (entry["adaptive_nprobe"], 500)):
        if np_ > cells:
            continue
        t0 = time.perf_counter()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r = recall(
                knn_ivfpq(corpus, queries, k=K, nprobe=np_, rerank=rr), truth
            )
        entry["knn_ivfpq"][f"np{np_}_rr{rr}"] = {
            "recall": r,
            "sec": round(time.perf_counter() - t0, 2),
            "probed_fraction": round(np_ / cells, 4),
        }
        print(f"{label} knn_ivfpq nprobe={np_} rerank={rr}: recall={r}", flush=True)

    data = {}
    if os.path.exists(out_json):
        with open(out_json) as f:
            data = json.load(f)
    data[label] = entry
    with open(out_json, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {out_json} [{label}]")


if __name__ == "__main__":
    main()
