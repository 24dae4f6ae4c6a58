"""Generate the /tmp/sf1 scale-proof replica: a seeded, FK-consistent 10×
blow-up of /root/testdata/sf0.1 (recipe first used for BENCH_sf1.json,
now codified so any session can regenerate it).

  * TPC-H tables: 10 key-shifted copies (replica i shifts every key column
    by i × (max_key + 1) of its table, so all FKs stay consistent within a
    replica and replicas never collide). region/nation are fixed dims —
    copied once.
  * events: key-shifted copies (event_id, user_id), ts untouched — the
    changelog derivation sees 10× keys and 10× events.
  * documents: replica 0 verbatim; replicas 1..9 word-shuffle each text
    with a seed of (doc_id, replica) — same vocabulary/length statistics,
    but NOT near-duplicates of the original, so dedup candidate counts
    scale honestly instead of exploding by construction.
  * embeddings: replica 0 verbatim; replicas 1..9 fresh uniform vectors
    (seeded) — ANN corpus grows 10× without planted structure.

Usage: python tools/make_sf1.py [src_dir] [dst_dir] [replicas]
(defaults below; replicas=100 from sf0.1 yields the /tmp/sf10 100x
replica used for the dedup/similarity-family scale evidence — same
recipe, so the unigram word-set clone groups grow from 10 to 100
members, the stress the set-identity factorization exists for)
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import numpy as np
import pandas as pd

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> columns to shift (every replica i adds i * (max(col0_of_table)+1)
# to each listed column; col0 is the table's own key so span covers FKs)
SHIFTS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "c_custkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "part": {"p_partkey": "p_partkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
}
COPY_ONLY = ("region", "nation")


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    # spans: max+1 per key domain, so shifted replicas are disjoint
    spans: dict[str, int] = {}
    for table, cols in SHIFTS.items():
        for _, domain in cols.items():
            if domain not in spans:
                dt = {
                    "c_custkey": "customer",
                    "o_orderkey": "orders",
                    "p_partkey": "part",
                    "s_suppkey": "supplier",
                    "event_id": "events",
                    "user_id": "events",
                }[domain]
                spans[domain] = (
                    con.execute(
                        f"SELECT max({domain}) + 1 FROM read_parquet('{SRC}/{dt}.parquet')"
                    ).fetchone()[0]
                )

    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, cols in SHIFTS.items():
        names = con.execute(
            f"SELECT * FROM read_parquet('{SRC}/{t}.parquet') LIMIT 0"
        ).df().columns
        proj = ", ".join(
            f"{c} + r.i * {spans[cols[c]]} AS {c}" if c in cols else c for c in names
        )
        con.execute(
            f"COPY (SELECT {proj} FROM read_parquet('{SRC}/{t}.parquet') "
            f"CROSS JOIN range({REPLICAS}) r(i)) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    # documents: replica 0 verbatim, others word-shuffled (seeded)
    docs = pd.read_parquet(f"{SRC}/documents.parquet")
    d_span = int(docs["doc_id"].max()) + 1
    out = []
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
        out.append(rep)
    pd.concat(out, ignore_index=True).to_parquet(f"{DST}/documents.parquet", index=False)
    print(f"documents: {len(docs) * REPLICAS} rows")

    # embeddings: replica 0 verbatim, others fresh uniform (seeded)
    emb = pd.read_parquet(f"{SRC}/embeddings.parquet")
    v_span = int(emb["vec_id"].max()) + 1
    dim = len(emb["embedding"].iloc[0])
    out = [emb]
    for i in range(1, REPLICAS):
        rng = np.random.default_rng(1000 + i)
        rep = emb.copy()
        rep["vec_id"] = rep["vec_id"] + i * v_span
        # match the source distribution: unit-norm gaussian directions
        mat = rng.standard_normal(size=(len(emb), dim))
        mat = (mat / np.linalg.norm(mat, axis=1, keepdims=True)).astype(np.float32)
        rep["embedding"] = list(mat)
        out.append(rep)
    pd.concat(out, ignore_index=True).to_parquet(f"{DST}/embeddings.parquet", index=False)
    print(f"embeddings: {len(emb) * REPLICAS} rows")


if __name__ == "__main__":
    main()
