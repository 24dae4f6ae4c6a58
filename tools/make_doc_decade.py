"""Generate the /tmp/sf100docs DOCUMENTS-decade replica: documents only,
``replicas`` seeded copies of /root/testdata/sf0.1/documents.parquet
(default 1000 -> 5,000,000 docs) — the sf100-documents scale VERDICT r9
#4 asks dedup_minhash / dedup_ngram_jaccard to complete at, with the
clone-group heap requirement DOCUMENTED (word-set clone groups grow to
``replicas`` members by construction, so within-group pair output grows
quadratically in the replica count — the stress the set-identity
factorization and the chunked pair emit exist for).

Same documents recipe as tools/make_sf1.py: replica 0 verbatim,
replicas 1..R-1 word-shuffle each text with a seed of (doc_id, replica)
— same vocabulary/length statistics (identical word SETS, the clone
mass), not near-duplicates. Written in replica chunks via pyarrow so
the builder never holds the 5 GB frame; row groups at 100k rows so the
scan parallelizes without TRAP #31 help.

Usage: python tools/make_doc_decade.py [dst_dir] [replicas] [src_dir]
"""

from __future__ import annotations

import os
import random
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100docs"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
SRC = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    docs = pd.read_parquet(f"{SRC}/documents.parquet")
    d_span = int(docs["doc_id"].max()) + 1
    writer = None
    for i in range(REPLICAS):
        rep = docs.copy()
        rep["doc_id"] = rep["doc_id"] + i * d_span
        if i > 0:
            def shuf(row_text: str, rid: int, rep_i: int = i) -> str:
                ws = row_text.split(" ")
                random.Random((rid, rep_i).__hash__()).shuffle(ws)
                return " ".join(ws)

            rep["text"] = [
                shuf(t, rid) for t, rid in zip(docs["text"], docs["doc_id"])
            ]
            rep["n_chars"] = rep["text"].str.len()
        t = pa.Table.from_pandas(rep, preserve_index=False)
        if writer is None:
            writer = pq.ParquetWriter(f"{DST}/documents.parquet", t.schema)
        writer.write_table(t, row_group_size=100_000)
        if (i + 1) % 100 == 0:
            print(f"replica {i + 1}/{REPLICAS}", flush=True)
    if writer is not None:
        writer.close()
    print(f"documents: {len(docs) * REPLICAS} rows")


if __name__ == "__main__":
    main()
