"""Vectorized numpy XXH64 matching ``functions/xxh64_py.py`` bit-for-bit.

ORACLE/TEST-ONLY — never on the engine hot path. This is the batch form
of the pure-Python reference: the sf1 oracle sweeps spend their wall in
millions of per-call scalar hashes (dedup_minhash_fast: 8 hash families
x ~240k distinct shingles; sample_stratified: one hash per event), and
verification cost is the tax on every round. The kernel processes a
whole Arrow batch at once: rows are grouped by byte length (a handful of
distinct lengths per corpus), each group becomes a (g, L) uint8 matrix,
and the full XXH64 control flow — stripes, 8/4/1-byte tails, avalanche —
runs as elementwise uint64 numpy ops over the group (wrapping multiply/
shift semantics are exactly the C ones). Bit-parity with the scalar
reference (itself JVM-parity-pinned) is pinned in tests over empty/
short/long/unicode inputs and random lengths straddling every control-
flow branch.
"""

from __future__ import annotations

import numpy as np

from .xxh64_py import xxh64 as _xxh64_scalar

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _round(acc, inp):
    acc = acc + inp * _P2
    return _rotl(acc, 31) * _P1


def _merge_round(h, v):
    return (h ^ _round(np.uint64(0), v)) * _P1 + _P4


def _fmix(h):
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    return h ^ (h >> np.uint64(32))


def _lane8(mat: np.ndarray, o: int) -> np.ndarray:
    return np.ascontiguousarray(mat[:, o : o + 8]).view("<u8").ravel()


def _lane4(mat: np.ndarray, o: int) -> np.ndarray:
    return np.ascontiguousarray(mat[:, o : o + 4]).view("<u4").ravel().astype(np.uint64)


def xxh64_fixed_len(mat: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """XXH64 of g equal-length byte rows: ``mat`` is (g, L) uint8,
    ``seeds`` is (g,) uint64 (or scalar). Unsigned (g,) uint64 out.
    Same control flow as the scalar reference — L is shared by the whole
    group, so every branch is taken uniformly and vectorizes."""
    n = mat.shape[1]
    seeds = np.broadcast_to(np.asarray(seeds, dtype=np.uint64), (mat.shape[0],))
    i = 0
    with np.errstate(over="ignore"):
        if n >= 32:
            v1 = seeds + _P1 + _P2
            v2 = seeds + _P2
            v3 = seeds.copy()
            v4 = seeds - _P1
            while i <= n - 32:
                v1 = _round(v1, _lane8(mat, i))
                v2 = _round(v2, _lane8(mat, i + 8))
                v3 = _round(v3, _lane8(mat, i + 16))
                v4 = _round(v4, _lane8(mat, i + 24))
                i += 32
            h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
            h = _merge_round(h, v1)
            h = _merge_round(h, v2)
            h = _merge_round(h, v3)
            h = _merge_round(h, v4)
        else:
            h = seeds + _P5
        h = h + np.uint64(n)
        while i <= n - 8:
            h = h ^ _round(np.uint64(0), _lane8(mat, i))
            h = _rotl(h, 27) * _P1 + _P4
            i += 8
        if i <= n - 4:
            h = h ^ _lane4(mat, i) * _P1
            h = _rotl(h, 23) * _P2 + _P3
            i += 4
        while i < n:
            h = h ^ mat[:, i].astype(np.uint64) * _P5
            h = _rotl(h, 11) * _P1
            i += 1
        return _fmix(h)


def xxh64_batch(rows: list[bytes], seeds: np.ndarray) -> np.ndarray:
    """XXH64 of variable-length byte rows with per-row uint64 seeds.
    Groups rows by length and runs the fixed-length kernel per group;
    scatter back preserves input order. Unsigned uint64 out."""
    out = np.empty(len(rows), dtype=np.uint64)
    by_len: dict[int, list[int]] = {}
    for idx, b in enumerate(rows):
        by_len.setdefault(len(b), []).append(idx)
    seeds = np.asarray(seeds, dtype=np.uint64)
    if seeds.ndim == 0:
        seeds = np.broadcast_to(seeds, (len(rows),))
    for length, idxs in by_len.items():
        ia = np.array(idxs, dtype=np.int64)
        if length == 0:
            # (g, 0) matrices are fine for the kernel, but skip the
            # gather-join for the empty rows
            out[ia] = xxh64_fixed_len(
                np.empty((len(ia), 0), dtype=np.uint8), seeds[ia]
            )
            continue
        blob = b"".join(rows[j] for j in idxs)
        mat = np.frombuffer(blob, dtype=np.uint8).reshape(len(ia), length)
        out[ia] = xxh64_fixed_len(mat, seeds[ia])
    return out


def spark_xxhash64_int_str_batch(ints, strs: list[str]) -> np.ndarray:
    """Batch form of ``xxh64_py.spark_xxhash64_int_str`` — replicates
    ``F.xxhash64(F.lit(i), col)`` per row. SIGNED int64 out (Spark's
    type). ``ints`` is any int sequence; the int-side hash is computed
    once per distinct value (oracle call sites use literal hash-function
    indices, so there are k distinct values per sweep)."""
    ia = np.asarray(ints, dtype=np.int64)
    uniq, inv = np.unique(ia, return_inverse=True)
    seed_per_uniq = np.array(
        [
            _xxh64_scalar((int(u) & 0xFFFFFFFF).to_bytes(4, "little"), 42)
            for u in uniq
        ],
        dtype=np.uint64,
    )
    seeds = seed_per_uniq[inv]
    rows = [s.encode("utf-8") for s in strs]
    return xxh64_batch(rows, seeds).view(np.int64)


def register_xx64_arrow(con) -> bool:
    """Register ``xx64(INTEGER, VARCHAR) -> BIGINT`` on a DuckDB
    connection as an Arrow-vectorized UDF backed by the batch kernel.
    Returns False (caller falls back to the scalar UDF) if this DuckDB
    lacks Arrow UDF support. NULL inputs do not occur at the oracle call
    sites (hash indices are literals, shingles/ids are non-null)."""
    import pyarrow as pa

    def _xx64(i_arr, s_arr):
        ints = i_arr.to_numpy(zero_copy_only=False)
        strs = s_arr.to_pylist()
        return pa.array(
            spark_xxhash64_int_str_batch(ints, strs), type=pa.int64()
        )

    try:
        con.create_function("xx64", _xx64, ["INTEGER", "VARCHAR"], "BIGINT", type="arrow")
        return True
    except Exception:  # noqa: BLE001 — older duckdb / already registered
        return False


def spark_xxhash64_long_int_batch(longs, i: int) -> np.ndarray:
    """Batch form of ``xxh64_py.spark_xxhash64_long_int`` — replicates
    ``F.xxhash64(col, F.lit(i))`` for a LongType column and one int
    literal (the seeded-sample ranking key). SIGNED int64 out."""
    la = np.asarray(longs, dtype=np.int64).view(np.uint64)
    # stage 1: every row is the long's fixed 8-byte LE encoding, seed 42
    mat = la.astype("<u8").view(np.uint8).reshape(-1, 8)
    h = xxh64_fixed_len(mat, np.uint64(42))
    # stage 2: the int literal's 4 bytes, seeded per-row by stage 1
    ib = (i & 0xFFFFFFFF).to_bytes(4, "little")
    mat2 = np.broadcast_to(
        np.frombuffer(ib, dtype=np.uint8), (len(la), 4)
    )
    return xxh64_fixed_len(np.ascontiguousarray(mat2), h).view(np.int64)
