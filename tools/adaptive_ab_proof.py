"""Adaptive-parameter engagement proof (r8): the first corpus decade
where the scale-adaptive formulas actually CHANGE the plan, measured.

At every committed scale (N <= 262,144 vectors) adaptive_lsh_params
resolves to the historical (8, 8) and adaptive_n_centroids stays on its
small-k trajectory, so their effect is invisible in the committed hash
evidence BY DESIGN. This tool runs the similarity family on a 3x-decade
corpus (/tmp/sf30: 600k embeddings, 1.5M docs — the first scale past
the clamp) where:

  * embedding_dup_pairs_lsh resolves to (bands=10, rbits=10) — random
    buckets stay ~1k rows instead of growing to ~2.3k at fixed (8, 8);
  * A/B: the SAME corpus through explicit historical (8, 8) vs the
    adaptive default, walls + planted-pair recall both ways (planted
    exact duplicates MUST survive both shapes — the bands re-solve
    holds the recall floor, and at cos >= 0.98 planted pairs collide
    with ~0.999 probability in either shape);
  * dedup_semantic / knn_ivf_kmeans / knn_ivfpq run with the adaptive
    list count k = 586 (vs 196 at sf10, 16 at bench scale) — walls
    recorded engine-only with the same count+xxhash64 materialization
    as tools/scale100_proof.py (every output column evaluated).

Usage: python tools/adaptive_ab_proof.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from simple_cdc_service_spark.registry import REGISTRY  # noqa: E402
from simple_cdc_service_spark.session import get_spark  # noqa: E402


def materialize(df) -> tuple[int, float]:
    t0 = time.time()
    # sum in double: value discarded, exists only to force every output
    # column's evaluation (a long sum overflows under ANSI) — same
    # materialization as tools/scale100_proof.py
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*df.columns).cast("double")).alias("h"),
    ).collect()[0]
    return int(row["n"]), round(time.time() - t0, 2)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf30"
    out = sys.argv[2] if len(sys.argv) > 2 else "SCALE30_ADAPTIVE_r08.json"
    spark = get_spark("adaptive-ab")
    spark.sparkContext.setLogLevel("ERROR")

    from simple_cdc_service_spark.operators.dedup import (
        adaptive_lsh_params,
        embedding_dup_pairs_lsh,
    )
    from simple_cdc_service_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), F.col("embedding")
    )
    corpus = emb.unionByName(planted).localCheckpoint(eager=True)
    n = corpus.count()
    shape = adaptive_lsh_params(n, 0.98)
    results: dict = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "adaptive_shape": list(shape),
        "loadavg_start": round(os.getloadavg()[0], 1),
    }
    print(f"N={n}, adaptive (bands, rbits) = {shape}", flush=True)

    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).collect()  # warm JVM

    for tag, kw in [
        ("fixed_8_8", {"bands": 8, "rbits": 8}),
        ("adaptive", {}),
    ]:
        t0 = time.time()
        pairs = embedding_dup_pairs_lsh(corpus, threshold=0.98, **kw).collect()
        wall = round(time.time() - t0, 2)
        got = {(r.vec_id_a, r.vec_id_b) for r in pairs}
        planted_pairs = {(i, 1_000_000 + i) for i in range(50)}
        results[f"lsh_{tag}"] = {
            "wall_sec": wall,
            "n_pairs": len(got),
            "planted_recovered": len(planted_pairs & got),
            "planted_total": 50,
        }
        print(f"lsh {tag}: {wall}s, {len(got)} pairs, "
              f"{len(planted_pairs & got)}/50 planted", flush=True)

    for name in ("dedup_semantic", "knn_ivf_kmeans", "knn_ivfpq"):
        t0 = time.time()
        rows, _ = materialize(REGISTRY[name].fn(spark, sf_dir))
        results[name] = {"wall_sec": round(time.time() - t0, 2), "rows": rows}
        print(f"{name}: {results[name]}", flush=True)

    results["loadavg_end"] = round(os.getloadavg()[0], 1)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
