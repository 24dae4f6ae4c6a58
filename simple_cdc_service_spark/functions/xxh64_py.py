"""Pure-Python reference XXH64 matching Spark's ``F.xxhash64``.

ORACLE/TEST-ONLY — never on the engine hot path (the engine uses the
JVM-native expression; this module exists so DuckDB-side oracles can
replicate the xxhash64 hash family and convert rows-only entries into
hash-checked ones, cf. tools/check_oracle.py).

Spark's XxHash64 expression (sql/catalyst XXH64.java — the standard
XXH64 algorithm, public domain) folds its inputs left-to-right: the
running hash starts at the seed (42 for ``F.xxhash64``) and each input
column's hash becomes the seed for the next. IntegerType inputs hash as
their 4-byte little-endian encoding, LongType as 8-byte LE, StringType
as UTF-8 bytes. Parity with the JVM expression is pinned in
tests/test_round6_ops.py (TestXxh64Parity) over multi-stripe/empty/
unicode inputs and several int seeds.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int) -> int:
    """Standard XXH64 of ``data`` with unsigned ``seed`` (unsigned out)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_xxhash64_int_str(i: int, s: str) -> int:
    """Replicates ``F.xxhash64(F.lit(i), col)`` for IntegerType i and
    StringType col: seed 42, int's hash seeds the string's hash. Returns
    the SIGNED 64-bit value Spark emits."""
    h = xxh64((i & 0xFFFFFFFF).to_bytes(4, "little"), 42)
    return _signed(xxh64(s.encode("utf-8"), h))


def spark_xxhash64_long_int(v: int, i: int) -> int:
    """Replicates ``F.xxhash64(col, F.lit(i))`` for LongType col and
    IntegerType i — the seeded-sample ranking key used by
    kmeans_centroids / pq_train_codebooks (operators/similarity.py).
    Long hashes as its 8-byte little-endian encoding with seed 42; that
    hash seeds the int literal's 4-byte hash. SIGNED 64-bit out."""
    h = xxh64((v & _M).to_bytes(8, "little"), 42)
    return _signed(xxh64((i & 0xFFFFFFFF).to_bytes(4, "little"), h))
