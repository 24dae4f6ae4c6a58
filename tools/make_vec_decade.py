"""Generate the /tmp/sf100vec VECTOR-decade replica: embeddings only,
``replicas`` seeded copies of /root/testdata/sf0.1/embeddings.parquet
(default 1000 -> 2,000,000 vectors) — the decade PAST the flat coarse
quantizer's k=1024 cap (N > 1,048,576), where adaptive_coarse_shape
switches the kmeans family to the IMI grid (VERDICT r8 #3).

Same recipe as tools/make_sf1.py's embeddings leg: replica 0 verbatim,
replicas 1..R-1 fresh seeded unit-norm gaussian directions (float32) with
key-shifted vec_ids — the ANN corpus grows without planted structure.
Written in chunks via pyarrow so the builder never holds the full frame.

Usage: python tools/make_vec_decade.py [dst_dir] [replicas] [src_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100vec"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
SRC = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    emb = pd.read_parquet(f"{SRC}/embeddings.parquet")
    v_span = int(emb["vec_id"].max()) + 1
    dim = len(emb["embedding"].iloc[0])
    writer = None
    try:
        for i in range(REPLICAS):
            rep = emb.copy()
            rep["vec_id"] = rep["vec_id"] + i * v_span
            if i > 0:
                rng = np.random.default_rng(1000 + i)
                mat = rng.standard_normal(size=(len(emb), dim))
                mat = (mat / np.linalg.norm(mat, axis=1, keepdims=True)).astype(
                    np.float32
                )
                rep["embedding"] = list(mat)
            tbl = pa.Table.from_pandas(rep, preserve_index=False)
            if writer is None:
                writer = pq.ParquetWriter(f"{DST}/embeddings.parquet", tbl.schema)
            writer.write_table(tbl)
    finally:
        if writer is not None:
            writer.close()
    n = pq.read_metadata(f"{DST}/embeddings.parquet").num_rows
    print(f"embeddings: {n} rows ({REPLICAS} replicas x {len(emb)}, dim {dim})")


if __name__ == "__main__":
    main()
