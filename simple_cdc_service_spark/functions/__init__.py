"""Reusable Column-level helpers.

Everything here is built from pyspark.sql.functions primitives — JVM-side,
whole-stage-codegen eligible, no Python UDFs in any hot path. Where a
Python (Arrow/pandas) variant exists for throughput comparison it lives in
the owning operator module, clearly marked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Vector math over array<float|double> columns.
# ---------------------------------------------------------------------------


def as_double_array(v: Column) -> Column:
    """Cast array<float> → array<double> BEFORE any arithmetic so both the
    engine and the DuckDB oracle accumulate in float64."""
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic accumulation order —
    comparable across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Dot product unrolled to ``dim`` explicit multiply-adds.

    BIT-IDENTICAL to ``dot``: Python's left-assoc ``+`` builds
    (((0+x₁)+x₂)+…) — the exact fold order of ``F.aggregate``'s
    accumulator (and DuckDB's list_dot_product), so round()-compared
    oracles can't diverge. ~10× faster in the pairwise hot path: the
    higher-order-function form allocates a zipped array and interprets a
    lambda per element per PAIR, while this is straight-line
    whole-stage-codegen arithmetic on array reads. Use when the
    dimension is known (probe one row); fall back to ``dot`` otherwise."""
    acc: Column = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + F.element_at(a, i) * F.element_at(b, i)
    return acc


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---------------------------------------------------------------------------
# Text: tokenization, shingles, hashing.
# ---------------------------------------------------------------------------


def words(text: Column) -> Column:
    """Lowercased space-split tokens (the canonical tokenization shared with
    the oracle SQL: string_split(lower(text), ' '))."""
    return F.split(F.lower(text), " ")


def word_ngrams(ws: Column, n: int) -> Column:
    """Distinct word n-gram shingles, space-joined; empty array when the
    document has fewer than n words (Spark's sequence() would otherwise
    count DOWN and produce invalid indices)."""
    gram = F.transform(
        F.sequence(F.lit(0), F.size(ws) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(ws) >= n, gram).otherwise(F.array().cast("array<string>"))
    )


def word_ngrams_all(ws: Column, n: int) -> Column:
    """ALL word n-gram spans in order, duplicates kept (one per start
    position) — the position-level variant of ``word_ngrams`` used by
    exact-substring-style dedup, where the fraction of duplicated
    positions matters, not just the distinct shingle set."""
    gram = F.transform(
        F.sequence(F.lit(0), F.size(ws) - n),
        lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
    )
    return F.when(F.size(ws) >= n, gram).otherwise(F.array().cast("array<string>"))


def minhash_signature(shingles: Column, k: int) -> Column:
    """k-element MinHash signature, four hash functions per md5 call.

    Hash family: h_{4g+j}(s) = substr(md5(g || '|' || s), 8j+1, 8) — each
    md5 yields four independent-ish 32-bit (8-hex-char) hashes, so k hashes
    cost ceil(k/4) md5 calls per shingle instead of k (md5 is essentially
    the whole signature cost at corpus scale). Minima are taken over the
    hex STRING ordering, which is byte-wise identical in every engine — no
    integer conversion to diverge on.

    Empty shingle sets get NULL mins; downstream banding
    (operators/dedup.py minhash_banded) NULLs the whole band value when
    the minima are NULL so such docs never collide into a band bucket —
    concat_ws alone would skip the NULLs and emit a shared '' bucket.
    """

    # NB: each lambda must take exactly ONE parameter — PySpark treats a
    # second parameter as the array-index column, silently changing the
    # function's meaning. Prefix/offset are bound via closure factories.
    return F.array(
        *[
            _chunk_min(_md5_array(shingles, f"{i // 4}|"), i % 4)
            for i in range(k)
        ]
    )


def _md5_array(shingles: Column, prefix: str) -> Column:
    return F.transform(shingles, lambda s: F.md5(F.concat(F.lit(prefix), s)))


def minhash_signature_xx(shingles: Column, k: int) -> Column:
    """k-element MinHash signature over xxhash64 — the production-bench
    hash family. h_i(s) = xxhash64(i, s): one non-cryptographic 64-bit
    JVM hash per (function, shingle), no hex encoding, no substring
    scans — roughly half the signature cost of the md5 family, which is
    the dominant corpus-scale expense (NOTES). Minima are int64. Kept
    ALONGSIDE the md5 family (not replacing it) because DuckDB has no
    xxhash64, so oracle-parity entries must stay on md5.

    Empty shingle sets → NULL minima → band value NULLed by
    minhash_banded's guard → never collide into a band bucket (same
    property as the md5 family)."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, _xx_hasher(i))
            )
            for i in range(k)
        ]
    )


def _xx_hasher(i: int):
    # closure factory: the lambda must take exactly ONE parameter (see
    # minhash_signature's NB); the hash-function index is bound here.
    return lambda s: F.xxhash64(F.lit(i), s)


def _chunk_min(hashed: Column, j: int) -> Column:
    lo = 8 * j + 1
    return F.array_min(F.transform(hashed, lambda h: F.substring(h, lo, 8)))


def jaccard(a: Column, b: Column) -> Column:
    """Set-Jaccard similarity of two arrays — safe for ARBITRARY inputs:
    duplicate elements are collapsed (array_distinct) before the set
    algebra, so the public contract is plain set Jaccard with no
    precondition (ADVICE r6: the precondition-guarded fast form returned
    silently wrong values on duplicate-element arrays). Two EMPTY sets
    yield NULL (0/0), not an ANSI divide-by-zero: a pair of contentless
    documents has no similarity evidence, and NULL fails every
    >= threshold verify filter, so such pairs drop out.

    Hot paths that already guarantee distinct elements (shingle/word-set
    pipelines) call jaccard_distinct directly and skip the two
    array_distinct passes."""
    return jaccard_distinct(F.array_distinct(a), F.array_distinct(b))


def jaccard_distinct(a: Column, b: Column) -> Column:
    """Jaccard similarity of two DISTINCT-element arrays (the verify-join
    hot path). |A∪B| is derived as |A|+|B|−|A∩B| instead of building the
    union array — the intersect is the only per-pair hash-set pass (the
    verify hot path pays ~150 µs per 200-element array op; halving the
    set builds matters at millions of candidates, NOTES r6). REQUIRES
    distinct-element inputs (in-repo callers shingle/word-set with
    *_distinct); with duplicates use jaccard(), which normalizes first.
    The duplicated intersect subtree is eliminated by codegen
    subexpression elimination. Integer-identical to size(array_union):
    same division, same doubles as the oracle's
    len(list_distinct(list_concat(...))). Empty∩empty yields NULL, as
    jaccard()."""
    inter = F.size(F.array_intersect(a, b))
    return inter / F.nullif(F.size(a) + F.size(b) - inter, F.lit(0))
