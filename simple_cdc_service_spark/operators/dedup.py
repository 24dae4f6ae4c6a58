"""Deduplication operators [EXT]: exact, MinHash-LSH, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (the whole point of these at 100 TB):
  * Exact dedup: hash groupBy on the dedup key — one shuffle, map-side
    partial agg. Never a sort-based distinct.
  * MinHash-LSH: per-doc signature is map-only; candidate generation
    explodes each doc into B band rows and self-joins on (band, band
    value) — the shuffle carries B small rows per doc instead of the
    doc text, and the join key space is the band-bucket space, so skew
    only appears when a bucket is genuinely hot (near-identical corpus
    slices). Verification (true Jaccard) runs only on candidates.
  * Embedding near-dup: blocked (here by label; in production by an
    LSH/IVF bucket) so the pairwise cosine never becomes an all-pairs
    crossJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import (
    as_double_array,
    jaccard_distinct,
    norm,
    word_ngrams,
    words,
)

# minhash_dedup_pairs factorizes by distinct shingle set only when the
# measured distinct-set/doc ratio is BELOW this (clone-heavy corpus);
# above it the grouping/expansion overhead can never win itself back
# (3-gram sets measure ~1.0 distinct at every bench scale, unigram sets
# 0.079 at 10x — see the function docstring and NOTES r6).
FACTORIZE_MAX_RATIO = 0.5

# Session-scoped cache of the adaptive-factorization DECISION (VERDICT
# r6 #1): the decision statistic (distinct-set/doc ratio) is a pure
# function of (corpus content, shingle width, text column), so repeated
# calls over the same unchanged corpus — dedup_minhash and
# dedup_minhash_fast share one corpus and shingle width — need not each
# re-pay the ~0.2 s approx_count_distinct pass. The key is
# (plan semantic hash, sorted input files with mtime_ns + size, n,
# text_col): any in-place rewrite of an input file, a different source
# frame, or different shingle params misses and re-measures. Frames
# whose inputs cannot be fingerprinted (no files / non-local URIs /
# stat failure) are NEVER cached — the decision is simply re-measured,
# so the cache can only ever skip a recomputation of an identical
# statistic, never serve a wrong one. Values are (owning SparkSession,
# bool) and a hit must come from the CURRENT frame's session (same
# identity guard as the shingle cache, VERDICT r7 #5) — a decision
# measured under a stopped/replaced session is re-measured.
_FACTORIZE_DECISION_CACHE: dict = {}
_FACTORIZE_DECISION_CACHE_MAX = 64

# Session-scoped cache of the STAGED (localCheckpointed) shingle frame,
# keyed by the same corpus fingerprint plus id_col: shingle sets are
# independent of the MinHash family/banding, so pipelines over the same
# unchanged corpus (e.g. the md5 and xxhash64 bench entries) reuse one
# materialized frame instead of each re-shingling. Bounded; cleared
# wholesale when full (in-flight queries hold their own references, so
# eviction can never invalidate a running plan).
_SHINGLE_STAGE_CACHE: dict = {}
_SHINGLE_STAGE_CACHE_MAX = 8


def _set_factorize_decision(
    df: DataFrame, staged: DataFrame, set_col: str, n: int, text_col: str
) -> bool:
    """Adaptive set-identity factorization decision: measure the
    distinct-set ratio via a commutative xor-of-xxhash64 set hash over
    ``staged``'s ``set_col`` (ids + 8 bytes only — the agg rides the
    staged frame's materialization) and compare to FACTORIZE_MAX_RATIO.
    Cached per corpus fingerprint (_factorize_cache_key) — callers over
    the same unchanged corpus and shingle width share one measurement
    (minhash n=1, the prefix join, and the factorized clusters all key
    identically because unigram shingle sets ARE word sets)."""
    return _measure_set_stats(df, staged, set_col, n, text_col)[0]


def _measure_set_stats(
    df: DataFrame, staged: DataFrame, set_col: str, n: int, text_col: str
) -> tuple[bool, int, float]:
    """(factorize decision, non-empty-set doc count, mean set size) —
    one cached measurement serves all three (count and mean ride the
    SAME agg that always measured the ratio, so exposing them is free;
    r10 gated the in-bucket verify switch on the doc count, r11 gates
    it on the shingle-cell MASS docs × mean size — the quantity the
    verify-join shuffle actually scales with)."""
    ck = _factorize_cache_key(df, n, text_col)
    hit = _FACTORIZE_DECISION_CACHE.get(ck) if ck is not None else None
    if hit is not None and hit[0] is df.sparkSession:
        # Same session-identity guard as the shingle-stage cache
        # (VERDICT r7 #5): a decision measured under a stopped/replaced
        # session is re-measured, never served — the two caches now key
        # and guard identically.
        return hit[1], hit[2], hit[3]
    dk = F.when(
        F.size(set_col) > 0,
        F.aggregate(
            F.transform(F.col(set_col), lambda s: F.xxhash64(s)),
            F.lit(0).cast("long"),
            lambda acc, x: acc.bitwiseXOR(x),
        ),
    )
    stats = staged.agg(
        F.count(dk).alias("docs"),
        F.approx_count_distinct(dk).alias("sets"),
        F.sum(F.size(set_col)).alias("mass"),
    ).first()
    factorize = (
        stats["docs"] > 0 and stats["sets"] / stats["docs"] < FACTORIZE_MAX_RATIO
    )
    # mean over NON-EMPTY docs (empty sets add 0 mass and aren't counted)
    avg_size = float(stats["mass"] or 0) / stats["docs"] if stats["docs"] else 0.0
    if ck is not None:
        if len(_FACTORIZE_DECISION_CACHE) >= _FACTORIZE_DECISION_CACHE_MAX:
            _FACTORIZE_DECISION_CACHE.clear()
        _FACTORIZE_DECISION_CACHE[ck] = (
            df.sparkSession, factorize, stats["docs"], avg_size
        )
    return factorize, int(stats["docs"]), avg_size


def _factorize_cache_key(df: DataFrame, n: int, text_col: str):
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
        if not files:
            return None
        sem = df.semanticHash()
    except Exception:
        return None
    fps = []
    for f in sorted(files):
        p = f
        if p.startswith("file:"):
            p = unquote(urlparse(p).path)
        elif "://" in p:
            return None  # remote store: no cheap mtime — re-measure
        try:
            st = os.stat(p)
        except OSError:
            return None
        fps.append((p, st.st_mtime_ns, st.st_size))
    return (sem, tuple(fps), n, text_col)


def _exact_set_key(arr):
    """md5 over an INJECTIVE encoding of the exact token set: tokens are
    sorted, then length-prefixed ("len:token") before joining on chr(0).
    A bare chr(0)-join aliases distinct sets whose tokens embed the
    separator ({'a\\x00b'} vs {'a','b'} — ADVICE r7); the length prefix
    pins each token's boundary regardless of its bytes (greedy parse:
    digits → ':' → that many chars → separator/end), so equal keys imply
    equal sets up to md5 collision. Space-split tokens can't embed
    chr(0) in practice — this is the defensive contract for arbitrary
    tokenizers feeding the factorized paths."""
    return F.md5(
        F.concat_ws(
            "\x00",
            F.transform(
                F.array_sort(arr),
                lambda t: F.concat(F.length(t).cast("string"), F.lit(":"), t),
            ),
        )
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: canonical representative (min id) per identical text.
    Deterministic — unlike dropDuplicates, which keeps an arbitrary row."""
    return df.groupBy(text_col).agg(
        F.min(id_col).alias(id_col), F.count("*").alias("n_dups")
    )


def shingle_docs(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    from ..sources.tables import spread

    if id_col.isidentifier() and text_col.isidentifier() and text_col != "__si":
        # Single-expr SQL twin of word_ngrams(words(col), n) — identical
        # analyzed expression, one driver round-trip instead of ~15
        # Column calls per invocation (r11, guide §7.3). The column name
        # is backtick-quoted (isidentifier() ⇒ no backtick inside) so a
        # SQL-keyword column still parses; the lambda variable is the
        # improbable `__si`, excluded from the fast path above, so it can
        # never shadow the text column inside the transform body
        # (ADVICE r11: with lambda var `i` and text_col='i' the shingles
        # silently came from the lambda index).
        ws = f"split(lower(`{text_col}`), ' ')"
        elems = ", ".join(
            f"element_at({ws}, cast(__si + {j} + 1 as int))" for j in range(n)
        )
        sql = (
            f"array_distinct(CASE WHEN size({ws}) >= {n} THEN "
            f"transform(sequence(0, size({ws}) - {n}), __si -> concat_ws(' ', {elems})) "
            f"ELSE cast(array() as array<string>) END)"
        )
        return spread(df).select(F.col(id_col), F.expr(sql).alias("shingles"))
    return spread(df).select(
        F.col(id_col), word_ngrams(words(F.col(text_col)), n).alias("shingles")
    )


def minhash_banded(
    shingled: DataFrame,
    k: int = 8,
    bands: int = 4,
    id_col: str = "doc_id",
    family: str = "md5",
) -> DataFrame:
    """(id, band, band-value) rows of the banded MinHash signature —
    the unit the LSH bucket join runs on, and the thing a production
    pipeline PERSISTS per corpus (bucketed by (band, bv)) so later
    incremental batches can probe it without re-signaturing the corpus.
    rows_per_band = k // bands.

    ``family`` picks the hash family: "md5" (DuckDB-replicable, the
    oracle-parity default) or "xxhash64" (JVM-native 64-bit hashes,
    ~2× cheaper signatures — the production-bench path; no SQL oracle).
    Exact duplicates collide under EITHER family (identical shingle sets
    → identical signatures); near-dup candidate sets differ only through
    ordinary per-family banding randomness.

    Empty shingle sets (docs shorter than the shingle width) have NULL
    signature minima; concat_ws would silently SKIP them and emit bv=''
    — one shared bucket holding every short doc in the corpus, a
    quadratic hot bucket of meaningless pairs. The band value is
    therefore NULLed whenever its first signature element is NULL (all k
    minima are NULL together), and bucket_pairs drops NULL buckets —
    contentless docs never collide, matching the oracle SQL whose
    element-wise sig[i]=sig[i] join is never true on NULL."""
    # Expressions are built as single SQL strings (F.expr) rather than
    # py4j Column chains: identical analyzed expressions, but ONE driver
    # round-trip per projection instead of ~2 ms × dozens of Column calls
    # (measured: the Column-chain build of this function alone cost
    # ~0.5 s of pure driver time per invocation at sf0.1 — r11
    # optimization round, guide §7.3).
    r = k // bands
    if family == "xxhash64":
        # h_i(s) = xxhash64(i, s) — see functions.minhash_signature_xx
        # (kept as the reference Column implementation; equality pinned
        # in tests).
        sig_sql = "array({})".format(
            ",".join(
                f"array_min(transform(shingles, s -> xxhash64({i}, s)))"
                for i in range(k)
            )
        )
        sig = shingled.select(F.col(id_col), F.expr(sig_sql).alias("sig"))
    else:
        # Stage the per-group md5 arrays as real columns so each md5 pass
        # runs ONCE per row; the four 32-bit chunk minima per group are then
        # cheap substring scans. (CollapseProject keeps the staging: the
        # hashed arrays are non-cheap and referenced 4×, so the optimizer
        # does not inline them back into duplicated md5 calls.)
        # Hash family: h_{4g+j}(s) = substr(md5(g || '|' || s), 8j+1, 8) —
        # see functions.minhash_signature (the reference Column form).
        staged = shingled.select(
            F.col(id_col),
            *[
                F.expr(f"transform(shingles, s -> md5(concat('{g}|', s)))").alias(
                    f"__h{g}"
                )
                for g in range((k + 3) // 4)
            ],
        )
        sig_sql = "array({})".format(
            ",".join(
                f"array_min(transform(__h{i // 4}, h -> substring(h, {8 * (i % 4) + 1}, 8)))"
                for i in range(k)
            )
        )
        sig = staged.select(F.col(id_col), F.expr(sig_sql).alias("sig"))
    bands_sql = ",".join(
        "struct({b} as band, if(sig[{first}] is null, cast(null as string), "
        "concat_ws('|', {elems})) as bv)".format(
            b=b,
            first=b * r,
            elems=",".join(f"sig[{b * r + j}]" for j in range(r)),
        )
        for b in range(bands)
    )
    # inline() fuses the historical explode(array<struct>) + field
    # projection into one generator — same rows, same (id, band, bv)
    # schema, one Dataset op less.
    return sig.select(F.col(id_col), F.expr(f"inline(array({bands_sql}))"))


def minhash_candidates(
    shingled: DataFrame,
    k: int = 8,
    bands: int = 4,
    id_col: str = "doc_id",
    family: str = "md5",
    banded: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs: docs sharing at least one band of the MinHash
    signature. Returns (doc_id_a, doc_id_b), a < b, distinct. Pass an
    already-banded frame via ``banded`` to skip signature computation
    (callers that band once and reuse across collapse/probe/persist)."""
    return bucket_pairs(
        banded if banded is not None
        else minhash_banded(shingled, k, bands, id_col, family),
        id_col=id_col,
    )


def bucket_pairs(
    banded: DataFrame,
    id_col: str = "doc_id",
    band_col: str = "band",
    bv_col: str = "bv",
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    chunk: int = 2048,
    dedup: bool = True,
) -> DataFrame:
    """(id, band, bucket-value) rows → distinct candidate id pairs, a < b.

    Bucket-local pair generation instead of a self-join: group each band
    bucket and expand its id pairs. One pass over the upstream hashing
    pipeline (a self-join would recompute it for BOTH sides). Hot
    buckets (near-identical corpus slices) are quadratic in bucket size
    — that pair COUNT is the inherent LSH cost, but the WORK must not
    be confined to the bucket's single groupBy partition, so expansion
    is two-tier on ``chunk``:

    * buckets ≤ chunk: TWO-STAGE explode in place — one row per
      (bucket, left index i), each emitting its (n−1−i) partners. Peak
      per-row memory O(bucket), never O(bucket²) (the single-stage
      flatten OOMed on a ~10k-member template bucket at sf1, NOTES r6).
      The per-row copy of the ids array caps at chunk × chunk × 8 B
      (~34 MB) per bucket — cheap below the threshold, and the pairs
      never leave the bucket's partition before the final distinct.
    * buckets > chunk: CHUNKED TRIANGULAR join — members get a rank (by
      sorted id) and a chunk c = rank÷chunk; the (c1 ≤ c2) chunk-pair
      grid becomes the join key, so each task expands at most chunk²
      pairs and a giant bucket spreads over nc²/2 tasks instead of one.
      Found at 100× scale (SCALE100 r7): a 24.8k-member word-set clone
      group = 307M pairs and ~5 GB of per-row array copies serialized
      through ONE task as a >25 min straggler; chunked, the same group
      is 91 balanced tasks. The b side replicates each member once per
      possible partner chunk (m × nc rows — ids only, no arrays), which
      keeps every join key (band, bv, c1, c2) unique to one chunk pair.

    ``dedup`` keeps the final distinct (the multi-band LSH contract — a
    pair colliding in several bands must emit once). Single-band callers
    whose buckets partition the ids (e.g. the set-identity within-group
    expansion) pass False and skip a full shuffle of the quadratic pair
    stream."""
    # Built with F.expr SQL strings: one driver round-trip per projection
    # instead of ~2 ms × dozens of py4j Column calls (r11, guide §7.3);
    # every expression is the exact SQL form of the historical Column
    # chain (array indexing 0-based via element_at(cast ... int), the
    # same sequence bounds, the same join keys).
    #
    # Interpolated names must be plain identifiers (ADVICE r11: a
    # dotted/space-containing name either fails to parse or silently
    # resolves as a field access); anything else is normalized to the
    # default names first and the outputs renamed back. Identifiers are
    # additionally backtick-quoted in the SQL text (isidentifier() ⇒ no
    # backtick inside) so SQL-keyword column names still parse.
    if not (id_col.isidentifier() and band_col.isidentifier() and bv_col.isidentifier()):
        def _q(name: str):  # literal column ref: backticks, `` escapes `
            return F.col("`" + name.replace("`", "``") + "`")

        safe = banded.select(
            _q(band_col).alias("band"),
            _q(bv_col).alias("bv"),
            _q(id_col).alias("doc_id"),
        )
        res = bucket_pairs(safe, chunk=chunk, dedup=dedup)
        return res.select(F.col("doc_id_a").alias(a_col), F.col("doc_id_b").alias(b_col))
    buckets = (
        banded.groupBy(band_col, bv_col)
        .agg(F.expr(f"array_sort(collect_list(`{id_col}`))").alias("ids"))
        .filter(F.expr(f"size(ids) > 1 AND `{bv_col}` IS NOT NULL"))
    )
    small_pairs = (
        buckets.filter(F.expr(f"size(ids) <= {chunk}"))
        .select("ids", F.expr("explode(sequence(0, size(ids) - 2))").alias("i"))
        .select(
            F.expr(f"element_at(ids, cast(i + 1 as int))").alias(a_col),
            F.expr(
                "explode(transform(sequence(i + 1, size(ids) - 1), "
                "j -> element_at(ids, cast(j + 1 as int))))"
            ).alias(b_col),
        )
    )
    large = buckets.filter(F.expr(f"size(ids) > {chunk}")).select(
        band_col,
        bv_col,
        F.expr(f"cast(ceil(size(ids) / {chunk}) as int)").alias("__nc"),
        "ids",
    )
    mem = large.select(
        band_col, bv_col, "__nc", F.posexplode("ids").alias("__r", "__id")
    ).withColumn("__c", F.expr(f"cast(__r / {chunk} as int)"))
    cp = large.select(
        band_col,
        bv_col,
        "__nc",
        F.expr("explode(sequence(0, __nc - 1))").alias("__c1"),
    ).select(
        band_col,
        bv_col,
        "__c1",
        F.expr("explode(sequence(__c1, __nc - 1))").alias("__c2"),
    )
    a_side = mem.select(
        band_col,
        bv_col,
        F.col("__c").alias("__c1"),
        F.col("__r").alias("__ra"),
        F.col("__id").alias(a_col),
    )
    # each member appears once per possible LEFT chunk ≤ its own, so the
    # join key (band, bv, __c1, __c2) pins exactly one chunk pair
    b_side = mem.select(
        band_col,
        bv_col,
        F.col("__c").alias("__c2"),
        F.col("__r").alias("__rb"),
        F.col("__id").alias(b_col),
        F.expr("explode(sequence(0, __c))").alias("__c1"),
    )
    large_pairs = (
        cp.join(a_side, [band_col, bv_col, "__c1"])
        .join(b_side, [band_col, bv_col, "__c1", "__c2"])
        .filter(F.expr("__c1 < __c2 OR __ra < __rb"))
        .select(a_col, b_col)
    )
    pairs = small_pairs.unionByName(large_pairs)
    return pairs.distinct() if dedup else pairs


# ---------------------------------------------------------------------------
# One-shot SQL builder for the direct (non-factorized, join-verify) MinHash
# pipeline (r11 optimization round, guide §7.3). The Column-chain build of
# sign → band → bucket-pairs → verify is ~15 Dataset ops, and Catalyst
# re-analyzes the WHOLE growing tree eagerly on every op (~20 ms each,
# ~0.45 s of pure driver time per invocation at sf0.1). Emitting the same
# operators as ONE SQL statement over a temp view analyzes the tree once:
# build 0.33 → 0.16 s, identical rows (pinned in tests, incl. a giant
# bucket that exercises the chunked-triangular path), and the physical
# plan is unchanged (same logical operators, plan-invariant sweep green).
# bucket_pairs/minhash_banded stay as the reference Column implementations
# for every composed caller (signature stores, streaming probes, the
# factorized path).
# ---------------------------------------------------------------------------


def _sql_banded_ctes(
    v: str, k: int, bands: int, id_col: str, family: str, sfx: str = ""
) -> str:
    """CTE chain producing `banded{sfx}(id, band, bv)` from shingle view
    ``v`` — the SQL text twin of minhash_banded (same hash families, same
    NULL-band guard). ``sfx`` disambiguates CTE names when two corpora are
    banded in one statement (the incremental probe)."""
    r = k // bands
    if family == "xxhash64":
        sig_expr = ",".join(
            f"array_min(transform(shingles, s -> xxhash64({i}, s)))"
            for i in range(k)
        )
        sig = f"sig{sfx} AS (SELECT `{id_col}`, array({sig_expr}) AS sig FROM {v})"
    else:
        hs = ",".join(
            f"transform(shingles, s -> md5(concat('{g}|', s))) AS __h{g}"
            for g in range((k + 3) // 4)
        )
        sig_expr = ",".join(
            f"array_min(transform(__h{i // 4}, h -> substring(h, {8 * (i % 4) + 1}, 8)))"
            for i in range(k)
        )
        sig = (
            f"staged{sfx} AS (SELECT `{id_col}`, {hs} FROM {v}), "
            f"sig{sfx} AS (SELECT `{id_col}`, array({sig_expr}) AS sig FROM staged{sfx})"
        )
    bands_sql = ",".join(
        "struct({b} as band, if(sig[{first}] is null, cast(null as string), "
        "concat_ws('|', {elems})) as bv)".format(
            b=b,
            first=b * r,
            elems=",".join(f"sig[{b * r + j}]" for j in range(r)),
        )
        for b in range(bands)
    )
    return (
        f"{sig}, banded{sfx} AS "
        f"(SELECT `{id_col}`, inline(array({bands_sql})) FROM sig{sfx})"
    )


def _sql_bucket_pair_ctes(id_col: str, chunk: int) -> str:
    """CTE chain producing `cand(doc_id_a, doc_id_b)` from `banded` — the
    SQL text twin of bucket_pairs (same two-tier small/chunked expansion,
    same distinct)."""
    return f"""
buckets AS (
  SELECT band, bv, array_sort(collect_list(`{id_col}`)) AS ids
  FROM banded GROUP BY band, bv
  HAVING size(ids) > 1 AND bv IS NOT NULL
),
small_pairs AS (
  SELECT element_at(ids, cast(i + 1 as int)) AS doc_id_a,
         explode(transform(sequence(i + 1, size(ids) - 1),
                           j -> element_at(ids, cast(j + 1 as int)))) AS doc_id_b
  FROM (SELECT ids, explode(sequence(0, size(ids) - 2)) AS i
        FROM buckets WHERE size(ids) <= {chunk})
),
large AS (SELECT band, bv, cast(ceil(size(ids) / {chunk}) as int) AS __nc, ids
          FROM buckets WHERE size(ids) > {chunk}),
memc AS (SELECT band, bv, __nc, __r, __id, cast(__r / {chunk} as int) AS __c
         FROM (SELECT band, bv, __nc, posexplode(ids) AS (__r, __id) FROM large)),
cp AS (SELECT band, bv, __c1, explode(sequence(__c1, __nc - 1)) AS __c2
       FROM (SELECT band, bv, __nc, explode(sequence(0, __nc - 1)) AS __c1 FROM large)),
a_side AS (SELECT band, bv, __c AS __c1, __r AS __ra, __id AS doc_id_a FROM memc),
b_side AS (SELECT band, bv, __c AS __c2, __r AS __rb, __id AS doc_id_b,
                  explode(sequence(0, __c)) AS __c1 FROM memc),
large_pairs AS (
  SELECT doc_id_a, doc_id_b
  FROM cp JOIN a_side USING (band, bv, __c1)
          JOIN b_side USING (band, bv, __c1, __c2)
  WHERE __c1 < __c2 OR __ra < __rb
),
cand AS (SELECT DISTINCT doc_id_a, doc_id_b
         FROM (SELECT * FROM small_pairs UNION ALL SELECT * FROM large_pairs))
"""


_SQL_JACCARD = (
    "round(size(array_intersect(__sh_a, __sh_b)) / "
    "nullif(size(__sh_a) + size(__sh_b) - size(array_intersect(__sh_a, __sh_b)), 0), 4)"
)


def _run_pipeline_sql(sh: DataFrame, query_tpl: str, **extra: DataFrame) -> DataFrame:
    """Register ``sh`` (placeholder {v}) plus any ``extra`` frames (their
    kwarg names as placeholders) under unique temp views, analyze
    ``query_tpl`` in ONE pass, drop the views (the returned DataFrame
    keeps the resolved plan)."""
    import uuid

    spark = sh.sparkSession
    frames = {"v": sh, **extra}
    names = {}
    try:
        for ph, df in frames.items():
            names[ph] = f"__mh_{ph}_" + uuid.uuid4().hex[:12]
            df.createOrReplaceTempView(names[ph])
        return spark.sql(query_tpl.format(**names))
    finally:
        for nm in names.values():
            spark.catalog.dropTempView(nm)


def _minhash_pairs_sql(
    sh: DataFrame,
    k: int,
    bands: int,
    threshold: float,
    id_col: str,
    family: str,
    chunk: int = 2048,
) -> DataFrame:
    """One-statement twin of
    _verify(sh, minhash_candidates(sh, k, bands, id_col, family))."""
    body = f"""
WITH {_sql_banded_ctes("{v}", k, bands, id_col, family)},
{_sql_bucket_pair_ctes(id_col, chunk).strip().lstrip(",")},
a AS (SELECT `{id_col}` AS doc_id_a, shingles AS __sh_a FROM {{v}}),
b AS (SELECT `{id_col}` AS doc_id_b, shingles AS __sh_b FROM {{v}})
SELECT doc_id_a, doc_id_b, {_SQL_JACCARD} AS jaccard
FROM a JOIN cand USING (doc_id_a) JOIN b USING (doc_id_b)
"""
    if threshold > 0:
        body = f"SELECT * FROM ({body}) WHERE jaccard >= {threshold}"
    return _run_pipeline_sql(sh, body)


def _incremental_pairs_sql(
    sh_in: DataFrame,
    sh_corp: DataFrame,
    k: int,
    bands: int,
    threshold: float,
    id_col: str,
    family: str = "md5",
) -> DataFrame:
    """One-statement twin of incremental_dedup_pairs' band-probe + verify:
    incoming bands join corpus bands on (band, bv), distinct id pairs,
    exact-Jaccard verify >= threshold."""
    body = f"""
WITH {_sql_banded_ctes("{vin}", k, bands, id_col, family, sfx="_i")},
{_sql_banded_ctes("{vcorp}", k, bands, id_col, family, sfx="_c")},
cand AS (
  SELECT DISTINCT i.`{id_col}` AS doc_id_new, c.`{id_col}` AS dup_of
  FROM banded_i i JOIN banded_c c ON i.band = c.band AND i.bv = c.bv
),
a AS (SELECT `{id_col}` AS doc_id_new, shingles AS __sh_a FROM {{vin}}),
b AS (SELECT `{id_col}` AS dup_of, shingles AS __sh_b FROM {{vcorp}})
SELECT * FROM (
  SELECT doc_id_new AS `{id_col}`, dup_of, {_SQL_JACCARD} AS jaccard
  FROM a JOIN cand USING (doc_id_new) JOIN b USING (dup_of)
) WHERE jaccard >= {threshold}
"""
    return _run_pipeline_sql(sh_in, body.replace("{vin}", "{v}"), vcorp=sh_corp)


def minhash_dedup_pairs(
    df: DataFrame,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    stage_shingles: bool = True,
    family: str = "md5",
    shingled: DataFrame | None = None,
    banded: DataFrame | None = None,
    factorize: bool | None = None,
    verify: str | None = None,
) -> DataFrame:
    """Full MinHash-LSH pipeline: shingle → sign → band-join candidates →
    verify with TRUE Jaccard on the shingle sets → threshold.

    ``factorize``: None (default) decides adaptively from the measured
    distinct-set ratio; True/False force the factorized or direct batch
    pipeline (outputs are identical either way — the flag only exists
    for tests and for callers that already know their clone profile).

    ``family``: MinHash hash family — "md5" (oracle-replicable default)
    or "xxhash64" (~2× cheaper signatures; see minhash_banded).

    ``stage_shingles`` materializes the shingled corpus once
    (localCheckpoint) instead of recomputing it for the signature pass and
    each verify side — three map passes become one (~40% off the sf0.1
    wall time). Trade-off: localCheckpoint storage is executor-local and
    non-replicated, so an executor loss fails the job instead of
    recomputing lineage — acceptable for bounded jobs; long-running
    production pipelines should use a reliable checkpoint dir or pass
    False to trade CPU for fault-tolerance.

    Verify joins against the STAGED shingle frame, never the raw text:
    re-deriving shingles inside the verify join inlines the whole
    ngram pipeline into the join condition, where the expression is too
    large for whole-stage codegen — interpreted evaluation then re-runs
    split() per lambda element, O(words²) per row (measured ~2.4s of a
    4.4s sf0.1 run for only ~750 pairs). With staged arrays the join
    condition is a plain array intersect/union over attribute refs.

    Join shape: BOTH verify joins are deliberately UNHINTED (AQE decides
    from measured runtime sizes). The candidate side is two longs per
    row — AQE broadcasts it whenever it actually fits — but a forced
    broadcast() hint here died at 10× bench scale trying to build an
    8.5 GB hash relation out of a clone-heavy corpus's tens of millions
    of candidate pairs (NOTES r6): a hint asserts a SIZE INVARIANT the
    data doesn't guarantee; AQE checks it at runtime for free. The
    second join's left side carries shingle ARRAYS per candidate row
    (candidate-count × document breadth — exceeded the broadcast budget
    already at sf0.1); same rule, same mechanism.

    ``shingled``: pass an already-shingled (id, shingles) frame to skip
    the shingle pass entirely — callers that shingle once and reuse the
    frame across collapse/probe/verify (streaming admission) avoid the
    per-batch re-shingling this function would otherwise pay.

    SET-IDENTITY FACTORIZATION (batch path, ADAPTIVE, NOTES r6):
    MinHash, banding, and Jaccard are all functions of the DISTINCT
    shingle SET — so documents with identical sets are interchangeable.
    When the corpus is clone-heavy the batch path (1) groups docs by a
    set key (md5 over the sorted shingle array), (2) runs the
    signature/banding/verify pipeline on ONE representative per
    distinct set, and (3) expands rep-level pairs back through group
    membership, adding within-group pairs at jaccard = 1.0. Output is
    provably bit-identical to the direct pipeline (every member shares
    its rep's signature, buckets, and pairwise jaccard; empty-set
    groups are excluded exactly like the NULL-band guard excludes
    them; equivalence pinned in test_round6_ops.py). On a clone-heavy
    corpus this is the difference between verifying 503M candidate
    pairs and verifying ~200k rep pairs (10× bench scale, measured) —
    expansion is pure id joins, no shingle arrays in any wide shuffle.

    The DECISION is data-adaptive, not static: one approx_count_distinct
    over the staged set keys (ids+hashes only, riding the checkpoint
    materialization — no array shuffle) measures the distinct-set
    ratio; below ``FACTORIZE_MAX_RATIO`` the factorized pipeline runs,
    above it the direct one. The decision is CACHED per (source-plan
    semantic hash, input files + mtimes, n, text_col) within the
    session (_FACTORIZE_DECISION_CACHE): callers re-running over the
    same unchanged corpus — e.g. the md5 and xxhash64 bench entries
    share one corpus and shingle width — pay the measurement once; any
    file rewrite or parameter change misses and re-measures.
    Measured on the bench corpora: unigram
    sets are 0.079 distinct at 10× scale (factorize: dead → 21 s) but
    0.79 at 1× and 3-gram sets are ~1.0 distinct at EVERY scale —
    a static factorization would pay ~1 s of pure grouping/expansion
    overhead per 3-gram call forever and never win it back. Streaming
    callers (shingled=/banded=) keep the direct path unconditionally:
    their batches are small and their job-count floor matters more
    than factorization."""

    def _verify(shf: DataFrame, candf: DataFrame) -> DataFrame:
        a = shf.select(
            F.col(id_col).alias("doc_id_a"), F.col("shingles").alias("__sh_a")
        )
        b = shf.select(
            F.col(id_col).alias("doc_id_b"), F.col("shingles").alias("__sh_b")
        )
        out = (
            a.join(candf, "doc_id_a")
            .join(b, "doc_id_b")
            .select(
                "doc_id_a",
                "doc_id_b",
                F.round(jaccard_distinct(F.col("__sh_a"), F.col("__sh_b")), 4).alias("jaccard"),
            )
        )
        # threshold 0 keeps every candidate — skipping the no-op filter
        # keeps the jaccard expression out of the join condition (where
        # Catalyst would inline it and evaluate it once for the
        # predicate and again for the projection).
        return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out

    if shingled is not None or banded is not None:
        sh = shingled if shingled is not None else df
        cand = minhash_candidates(sh, k, bands, id_col, family, banded=banded)
        return _verify(sh, cand)

    from ..sources.tables import spread

    # Shingling + k hash passes are CPU-bound map work: a small parquet
    # file scans as 2-3 partitions and would pin the whole signature
    # computation to as many cores (NOTES r6).
    # The STAGED shingle frame is cached per corpus fingerprint (same
    # key machinery as the decision cache): shingles are independent of
    # the hash family and banding, so the md5 and xxhash64 pipelines
    # over one unchanged corpus share a single localCheckpointed frame
    # instead of each paying the shingle pass. Holding the reference
    # keeps exactly ONE staged frame alive per (corpus, n) — strictly
    # less executor storage than two concurrent uncached calls.
    ck = _factorize_cache_key(df, n, text_col) if stage_shingles else None
    sh = _SHINGLE_STAGE_CACHE.get((ck, id_col)) if ck is not None else None
    if sh is not None and sh.sparkSession is not df.sparkSession:
        sh = None  # frame belongs to a stopped/replaced session — restage
    if sh is None:
        sh = shingle_docs(spread(df), n, text_col, id_col)
        if stage_shingles:
            sh = sh.localCheckpoint(eager=False)
            if ck is not None:
                if len(_SHINGLE_STAGE_CACHE) >= _SHINGLE_STAGE_CACHE_MAX:
                    _SHINGLE_STAGE_CACHE.clear()
                _SHINGLE_STAGE_CACHE[(ck, id_col)] = sh
    # Adaptive decision on a CHEAP commutative set hash (xor of
    # per-shingle xxhash64 — valid because shingles are distinct; a
    # collision only nudges the measured ratio, never correctness).
    # The agg ships ids + 8-byte hashes only — no array shuffle, no
    # array_sort — and doubles as the checkpoint materialization both
    # branches reuse. The direct branch therefore pays NOTHING beyond
    # this one count (the exact md5-of-sorted group key is computed
    # only when factorizing). HLL precision is ample for a 0.5 cutoff.
    n_docs, avg_set = None, None
    if factorize is None:
        factorize, n_docs, avg_set = _measure_set_stats(
            df, sh, "shingles", n, text_col
        )
    if not factorize:
        # DIRECT-PATH VERIFY CHOICE (r10, VERDICT r9 #4): the historical
        # verify JOIN attaches both shingle arrays to every candidate
        # pair — at the 5M-doc decade that intermediate (≈450M random
        # band collisions × ~2.5 KB of arrays, re-exchanged by doc_id_b)
        # is a TB-scale shuffle that filled the disk. Past the gate the
        # verify instead runs IN-BUCKET: arrays ship once per band
        # membership (bands×corpus, linear), small buckets stream
        # through the partition-local kernel, giant buckets (> chunk
        # members) through the distributed chunk-grid cogroup.
        #
        # The gate is the measured SHINGLE-CELL MASS docs × mean set
        # size (r11, VERDICT r10 #6 — both ride the factorize agg for
        # free), not a doc count: the join's array shuffle scales with
        # candidate pairs × ARRAY BYTES, so a corpus of few huge docs
        # crosses as early as many small ones. Calibration and the
        # measured join-is-faster-until-it-spills story live on the
        # _BUCKET_VERIFY_MIN_CELLS constant (VERIFY_GATE_AB_r11.json).
        # ``verify`` forces a mode for the equality tests.
        mode = verify
        if mode is None:
            mode = (
                "bucket"
                if n_docs is not None and n_docs * (avg_set or 0.0) > _BUCKET_VERIFY_MIN_CELLS
                else "join"
            )
        if mode == "bucket":
            return _minhash_verify_in_bucket(
                sh, k, bands, threshold, id_col, family
            )
        if id_col.isidentifier():
            # One-shot SQL build of the same operators (~0.3 s of
            # per-invocation driver analysis saved; see _minhash_pairs_sql).
            return _minhash_pairs_sql(sh, k, bands, threshold, id_col, family)
        return _verify(sh, minhash_candidates(sh, k, bands, id_col, family))
    # Exact set key: NULL for empty shingle sets (they can never pair —
    # the same contract as the NULL-band guard). Injective encoding via
    # _exact_set_key (embedded-separator-proof, ADVICE r7).
    gm = sh.select(
        F.col(id_col),
        F.col("shingles"),
        F.when(
            F.size("shingles") > 0,
            _exact_set_key(F.col("shingles")),
        ).alias("__k"),
    )
    grouped = gm.filter(F.col("__k").isNotNull())
    reps = grouped.groupBy("__k").agg(
        F.min(id_col).alias("__rid"), F.first("shingles").alias("shingles")
    )
    rep_sh = reps.select(F.col("__rid").alias(id_col), "shingles").localCheckpoint(
        eager=False
    )
    rep_pairs = _verify(rep_sh, minhash_candidates(rep_sh, k, bands, id_col, family))
    key_of_rep = reps.select("__rid", "__k")
    rp = rep_pairs.join(
        key_of_rep.select(F.col("__rid").alias("doc_id_a"), F.col("__k").alias("__ka")),
        "doc_id_a",
    ).join(
        key_of_rep.select(F.col("__rid").alias("doc_id_b"), F.col("__k").alias("__kb")),
        "doc_id_b",
    )
    ma = grouped.select(F.col("__k").alias("__ka"), F.col(id_col).alias("__xa"))
    mb = grouped.select(F.col("__k").alias("__kb"), F.col(id_col).alias("__xb"))
    cross = (
        rp.join(ma, "__ka")
        .join(mb, "__kb")
        .select(
            F.least("__xa", "__xb").alias("doc_id_a"),
            F.greatest("__xa", "__xb").alias("doc_id_b"),
            "jaccard",
        )
    )
    within = bucket_pairs(
        grouped.select(F.col(id_col), F.lit(0).alias("band"), F.col("__k").alias("bv")),
        id_col=id_col,  # ADVICE r6: collect_list must read the caller's id column
        # single band + one group per doc → pairs are already unique;
        # dedup would re-shuffle the quadratic within-group pair stream
        # (380M rows at 100× scale) for nothing
        dedup=False,
    ).withColumn("jaccard", F.lit(1.0))
    if threshold > 0:
        within = within.filter(F.col("jaccard") >= threshold)
    return cross.unionByName(within)


def incremental_dedup_pairs(
    corpus: DataFrame,
    incoming: DataFrame,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingled_incoming: DataFrame | None = None,
    shingled_corpus: DataFrame | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup check: which INCOMING docs duplicate something
    already in the CORPUS — the nightly-crawl shape of dedup. Returns
    (doc_id, dup_of, jaccard): incoming doc, the corpus doc it collides
    with, true Jaccard ≥ threshold.

    Scale shape (why this is not just minhash_dedup_pairs on the union):
    the quadratic LSH term and the signature compute are bounded by the
    BATCH, not the corpus. Only the incoming slice is shingled and
    signed fresh; the corpus side is the banded signature table
    (minhash_banded) a production pipeline persists once, bucketed by
    (band, bv) — so the candidate join is new-batch bands probing an
    existing bucketed store (no corpus-side shuffle), and the verify
    join touches corpus shingles only for matched candidates. At 100 TB
    corpus + 1 TB/day crawl, per-day cost is O(batch + collisions),
    never O(corpus). Corpus-internal duplicates are deliberately NOT
    re-derived — they were handled when those docs were themselves the
    incoming batch.

    ``shingled_incoming``/``shingled_corpus`` let a caller whose two
    sides are SLICES OF ONE TABLE shingle that table once and pass the
    sliced (id, shingles) frames — one corpus map pass instead of two
    (r11 optimization round; the registry's dedup_incremental entry does
    exactly this). Raw ``corpus``/``incoming`` frames are shingled and
    staged here as before."""
    sh_in = (
        shingled_incoming
        if shingled_incoming is not None
        else shingle_docs(incoming, n, text_col, id_col).localCheckpoint(eager=False)
    )
    sh_corp_sql = (
        shingled_corpus
        if shingled_corpus is not None
        else shingle_docs(corpus, n, text_col, id_col).localCheckpoint(eager=False)
    )
    if id_col.isidentifier():
        # One-shot SQL build of the same band-probe + verify operators
        # (~0.4 s of per-invocation driver analysis saved; same pattern
        # as _minhash_pairs_sql, twin pinned in tests).
        return _incremental_pairs_sql(
            sh_in, sh_corp_sql, k, bands, threshold, id_col
        )
    sh_corp = sh_corp_sql
    banded_in = minhash_banded(sh_in, k, bands, id_col).select(
        F.col(id_col).alias("doc_id_new"), "band", "bv"
    )
    # Corpus signatures derived here (oracle parity): the shingle frame
    # is STAGED once and reused by both the banding pass and the verify
    # join — one corpus map pass total. In the true incremental
    # deployment signatures come from the persisted (band, bv)-bucketed
    # store instead (persist_signature_store / probe_signature_store) and
    # the verify side is candidate-bounded via a pre-shingle semi-join —
    # see streaming.pipeline.start_corpus_dedup_admission, which wires
    # exactly that: per-batch cost O(batch + collisions), no corpus map.
    banded_corp = minhash_banded(sh_corp, k, bands, id_col).select(
        F.col(id_col).alias("dup_of"), "band", "bv"
    )
    cand = (
        banded_in.join(banded_corp, ["band", "bv"])
        .select("doc_id_new", "dup_of")
        .distinct()
    )
    return jaccard_verify_pairs(sh_in, sh_corp, cand, threshold, id_col=id_col)


def jaccard_verify_pairs(
    sh_new: DataFrame,
    sh_corpus: DataFrame,
    cand: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Exact-Jaccard verify join over asymmetric candidates: ``cand`` is
    (doc_id_new, dup_of) id pairs, the shingle frames are (id, shingles).
    Returns (id_col, dup_of, jaccard) rows ≥ threshold. Joins are
    unhinted — AQE sizes them from actual candidate volume. ``carry``
    names extra ``cand`` columns to pass through unchanged (e.g. the
    batch/store source tag of the fused admission probe)."""
    a = sh_new.select(
        F.col(id_col).alias("doc_id_new"), F.col("shingles").alias("__sh_a")
    )
    b = sh_corpus.select(
        F.col(id_col).alias("dup_of"), F.col("shingles").alias("__sh_b")
    )
    return (
        a.join(cand, "doc_id_new")
        .join(b, "dup_of")
        .select(
            F.col("doc_id_new").alias(id_col),
            "dup_of",
            F.round(jaccard_distinct(F.col("__sh_a"), F.col("__sh_b")), 4).alias("jaccard"),
            *[F.col(c) for c in carry],
        )
        .filter(F.col("jaccard") >= threshold)
    )


def persist_signature_store(
    corpus: DataFrame,
    table: str,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    n_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the corpus's banded MinHash signatures as a table
    BUCKETED BY (band, bv) — the pre-paid exchange that makes every later
    incremental probe shuffle only the incoming batch. Rewritten only
    when the corpus itself is re-deduplicated; nightly batches append
    their own signatures after admission."""
    from ..sources.sinks import write_bucketed

    banded = minhash_banded(shingle_docs(corpus, n, text_col, id_col), k, bands, id_col)
    write_bucketed(banded, table, ["band", "bv"], n_buckets=n_buckets)


def probe_signature_store(
    spark,
    table: str,
    incoming: DataFrame,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate (incoming, corpus) id pairs from the persisted store:
    the incoming batch is shingled + signed fresh (O(batch) map work) and
    joined to the bucketed store on its bucket columns — the store side
    reads co-located, only the batch side shuffles (pinned by
    test_sinks.py). Feed the result to the exact-Jaccard verify join."""
    banded_in = minhash_banded(
        shingle_docs(incoming, n, text_col, id_col), k, bands, id_col
    ).withColumnRenamed(id_col, "doc_id_new")
    store = spark.table(table).withColumnRenamed(id_col, "dup_of")
    return (
        banded_in.join(store, ["band", "bv"])
        .select("doc_id_new", "dup_of")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    factorize: bool | None = None,
) -> DataFrame:
    """Blocked exact n-gram (here unigram-set) Jaccard dedup: compare only
    pairs within the same block, keep pairs ≥ threshold.

    ``block_col=None`` is the PRODUCTION path: blocks are MinHash-LSH band
    buckets over the unigram sets (minhash_dedup_pairs with n=1) — no
    dependence on a metadata column, and the quadratic term is bounded by
    the largest LSH bucket (similar docs only) instead of the largest
    metadata block (which for a skewed corpus — one dominant source — is
    the whole corpus). A metadata ``block_col`` remains useful when the
    domain GUARANTEES duplicates never cross blocks and blocks are
    uniformly small; it is the oracle-replicable mode.

    Banding is k=32 / 4 bands of r=8 — THRESHOLD-APPROPRIATE for 0.95:
    P(candidate | j) = 1-(1-j^8)^4 ≈ 0.99 at j=0.95 but 0.015 at j=0.5.
    The earlier r=2 banding (P=0.83 at j=0.5!) made band values collide
    corpus-wide over a vocabulary-limited corpus: the max bucket held
    ~6.6% of docs at EVERY scale (330 → 3,185 → 31,850 docs at
    sf0.01/0.1/1), i.e. candidates grew QUADRATICALLY with the corpus
    (215k → 21M → 2.1B pairs) — measured, NOTES r6. r=8 buckets only
    genuinely-similar docs, so the quadratic term tracks true duplicate
    families. The r=2 setting remains correct for dedup_minhash's 0.6
    threshold over 3-gram shingles (a far bigger shingle space).

    SCALE (the metadata-blocked mode): a corpus with few distinct blocks
    hashes each whole block onto ONE reducer — at 10× bench scale (20
    sources × 2.5k docs) that is ~62M O(|words|) jaccards on a handful
    of straggler tasks (measured multi-hour hang, NOTES r6). Two
    semantics-free fixes: (1) LENGTH-RATIO PRUNE — j(A,B) ≥ t implies
    |A∩B| ≤ min(|A|,|B|) and |A∪B| ≥ max(|A|,|B|), hence min/max ≥ t,
    so an O(1) size check in the join residual skips the O(|words|)
    intersect for every length-dissimilar pair; (2) SALTED self-join —
    the left side gets a deterministic xxhash64(id) % SALT key, the
    right side is replicated SALT times, and the join key becomes
    (block, salt): each block's quadratic pair enumeration spreads over
    SALT tasks instead of one, for an O(SALT × corpus) replication cost
    that stays linear in data. Every (a, b) pair still meets on exactly
    one salt value, so the output is provably unchanged.

    For HIGH thresholds (≥ 0.8) even the pruned enumeration verifies too
    much — the length prune keeps ~18% of a uniform-length corpus and
    each survivor pays an O(|words|) JVM set intersection (~150 µs
    measured; 11.5M survivors at 10× bench scale ≈ a multi-minute tail).
    There the EXACT prefix-filter path (``prefix_jaccard_pairs``, the
    Bayardo/Chaudhuri all-pairs technique) replaces enumeration — it is
    lossless for jaccard ≥ t, so the brute-force blocked oracle is
    unchanged."""
    if block_col is None:
        return minhash_dedup_pairs(
            df, n=1, k=32, bands=4, threshold=threshold, text_col=text_col, id_col=id_col
        )
    if threshold >= 0.8:
        return prefix_jaccard_pairs(
            df,
            threshold=threshold,
            block_col=block_col,
            text_col=text_col,
            id_col=id_col,
            factorize=factorize,
        )
    from ..sources.tables import spread

    SALT = 32
    w = spread(df).select(
        F.col(id_col),
        F.col(block_col).alias("blk"),
        F.array_distinct(words(F.col(text_col))).alias("ws"),
    ).withColumn("nw", F.size("ws"))
    a = w.select(
        F.col(id_col).alias("doc_id_a"),
        F.col("blk"),
        F.col("ws").alias("ws_a"),
        F.col("nw").alias("nw_a"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(SALT)).alias("salt_a"),
    )
    b = w.select(
        F.col(id_col).alias("doc_id_b"),
        F.col("blk").alias("blk_b"),
        F.col("ws").alias("ws_b"),
        F.col("nw").alias("nw_b"),
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(SALT - 1).cast("long"))).alias(
            "salt_b"
        ),
    )
    return (
        a.join(
            b,
            (F.col("blk") == F.col("blk_b"))
            & (F.col("salt_a") == F.col("salt_b"))
            & (F.col("doc_id_a") < F.col("doc_id_b"))
            # length-ratio prune: implied by jaccard >= threshold, O(1)
            # in the join residual, evaluated before the intersect
            & (F.col("nw_a") >= F.col("nw_b") * threshold)
            & (F.col("nw_b") >= F.col("nw_a") * threshold),
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(jaccard_distinct(F.col("ws_a"), F.col("ws_b")), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _prefix_filter_verify(
    w: DataFrame, threshold: float, id_col: str
) -> DataFrame:
    """The prefix-filter join core over a staged (id, blk, ws, nw) frame:
    inverted prefix index → blocked candidates with length prune →
    exact-Jaccard verify. See prefix_jaccard_pairs for the proof and the
    cost shape."""
    from pyspark.sql.window import Window

    tok = w.select(id_col, "blk", "nw", F.explode("ws").alias("w"))
    dfreq = tok.groupBy("w").agg(F.count("*").alias("df_"))
    prefix_len = F.col("nw") - F.ceil(F.col("nw") * threshold - 1e-9) + 1
    prefix = (
        tok.join(dfreq, "w")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("df_", "w")
            ),
        )
        .filter(F.col("rn") <= prefix_len)
    )
    pa = prefix.select(
        F.col(id_col).alias("doc_id_a"),
        "blk",
        "w",
        F.col("nw").alias("nw_a"),
    )
    pb = prefix.select(
        F.col(id_col).alias("doc_id_b"),
        F.col("blk").alias("blk_b"),
        F.col("w").alias("w_b"),
        F.col("nw").alias("nw_b"),
    )
    cand = (
        pa.join(
            pb,
            (F.col("blk") == F.col("blk_b"))
            & (F.col("w") == F.col("w_b"))
            & (F.col("doc_id_a") < F.col("doc_id_b"))
            # length-ratio prune: j >= t forces min/max set size >= t
            & (F.col("nw_a") >= F.col("nw_b") * threshold)
            & (F.col("nw_b") >= F.col("nw_a") * threshold),
        )
        .select("doc_id_a", "doc_id_b")
        .distinct()
    )
    sa = w.select(F.col(id_col).alias("doc_id_a"), F.col("ws").alias("ws_a"))
    sb = w.select(F.col(id_col).alias("doc_id_b"), F.col("ws").alias("ws_b"))
    return (
        cand.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(jaccard_distinct(F.col("ws_a"), F.col("ws_b")), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    block_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    factorize: bool | None = None,
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (the all-pairs
    technique of Bayardo et al., WWW'07 / PPJoin) — same result set as
    the brute-force blocked jaccard join, near-linear cost at high
    thresholds.

    SET-IDENTITY FACTORIZATION (``factorize``, adaptive by default —
    second disease found by the 100× run, SCALE100 r7): a clone-heavy
    corpus makes even the lossless prefix filter quadratic, because every
    member of an identical-word-set group is a true ≥ t match of every
    other — at sf10 the engine verified ~380M within-group candidates
    with full O(|words|) intersects (>1 h, 14 parallel tasks). When the
    measured distinct-set ratio (same statistic, same session cache as
    minhash_dedup_pairs — unigram shingle sets ARE word sets) is below
    FACTORIZE_MAX_RATIO, the prefix join runs over one REPRESENTATIVE
    per (block, word-set) group (~4k rows at sf10, not 500k), within-
    group pairs expand directly with jaccard 1.0 through the chunked
    bucket_pairs machinery, and cross-group rep pairs expand through the
    group membership — the verify count collapses from O(Σ group²) to
    O(distinct-set pairs).

    Order the vocabulary by ascending document frequency (ties by token
    string). A doc's PREFIX is its first ``p = |X| - ceil(t·|X|) + 1``
    tokens in that order. Lossless-candidate proof: if j(A,B) ≥ t then
    o = |A∩B| ≥ ceil(t·max(|A|,|B|)); let x be the SMALLEST shared token
    — every token of A ordered before x lies in A\\B, and
    |A\\B| ≤ |A| - o ≤ |A| - ceil(t·|A|) = p_A - 1, so x sits within A's
    prefix, and symmetrically within B's. Hence every qualifying pair
    shares an indexed token, and indexing only prefixes is exact.

    Cost shape: the inverted index holds ~(1-t)·|X|+1 tokens per doc
    (11 of ~200 at t=0.95) and those are each doc's RAREST tokens, so
    posting lists are short; candidate pairs ≈ true-duplicate families
    + a thin fringe, and the O(|words|) jaccard verify runs only on
    those — measured 62M → ~100k verifications at 10× bench scale.
    Every stage is a hash shuffle on a high-cardinality key (token,
    doc id) — no few-key reducer, no broadcast requirement (the
    doc-frequency join is a plain equi-join Spark may broadcast when
    small; at corpus scale it degrades gracefully to shuffle).

    The ceil uses a 1e-9 guard: t·|X| computed in doubles can land one
    ulp ABOVE an exact integer (0.95×180 → 171.000…002), which would
    shorten the prefix and break the losslessness proof; subtracting the
    guard only ever LENGTHENS the prefix (safe direction)."""
    from ..sources.tables import spread

    w = spread(df).select(
        F.col(id_col),
        F.col(block_col).alias("blk"),
        F.array_distinct(words(F.col(text_col))).alias("ws"),
    ).withColumn("nw", F.size("ws")).localCheckpoint(eager=False)
    if factorize is None:
        # Same decision statistic, same cache as minhash_dedup_pairs —
        # unigram shingle sets ARE the word sets, so a corpus measured
        # for dedup_ngram_lsh never re-pays the pass here (and vice
        # versa).
        factorize = _set_factorize_decision(df, w, "ws", 1, text_col)
    if not factorize:
        return _prefix_filter_verify(w, threshold, id_col)
    # Group key = (block, exact word set); empty sets stay out (their
    # pairwise jaccard is NULL — the brute-force join drops them too),
    # and NULL blocks stay out (ADVICE r7: the direct path's blk == blk_b
    # equi-join and the oracle's a.source = b.source are never true on
    # NULL, but concat_ws SKIPS nulls — grouping NULL-block docs together
    # would emit within-group pairs the direct path never emits). The
    # md5 is the injective _exact_set_key; blk||chr(0)||md5 is itself
    # injective because the md5 tail has fixed length 32.
    grouped = w.filter(F.col("blk").isNotNull() & (F.size("ws") > 0)).withColumn(
        "__g",
        F.concat_ws("\x00", F.col("blk"), _exact_set_key(F.col("ws"))),
    )
    reps = grouped.groupBy("__g").agg(
        F.min(id_col).alias("__rid"),
        F.first("blk").alias("blk"),
        F.first("ws").alias("ws"),
        F.first("nw").alias("nw"),
    )
    rep_w = reps.select(
        F.col("__rid").alias(id_col), "blk", "ws", "nw"
    ).localCheckpoint(eager=False)
    rep_pairs = _prefix_filter_verify(rep_w, threshold, id_col)
    key_of = reps.select("__rid", "__g")
    rp = rep_pairs.join(
        key_of.select(F.col("__rid").alias("doc_id_a"), F.col("__g").alias("__ga")),
        "doc_id_a",
    ).join(
        key_of.select(F.col("__rid").alias("doc_id_b"), F.col("__g").alias("__gb")),
        "doc_id_b",
    )
    ma = grouped.select(F.col("__g").alias("__ga"), F.col(id_col).alias("__xa"))
    mb = grouped.select(F.col("__g").alias("__gb"), F.col(id_col).alias("__xb"))
    cross = (
        rp.join(ma, "__ga")
        .join(mb, "__gb")
        .select(
            F.least("__xa", "__xb").alias("doc_id_a"),
            F.greatest("__xa", "__xb").alias("doc_id_b"),
            "jaccard",
        )
    )
    within = bucket_pairs(
        grouped.select(F.col(id_col), F.lit(0).alias("band"), F.col("__g").alias("bv")),
        id_col=id_col,
        dedup=False,  # one group per doc: pairs already unique
    ).withColumn("jaccard", F.lit(1.0))
    return cross.unionByName(within)


def adaptive_lsh_params(
    n_rows: int,
    threshold: float,
    base_bands: int = 8,
    base_rbits: int = 8,
    target_per_bucket: int = 1024,
    hi_rbits: int = 16,
) -> tuple[int, int]:
    """Scale-adaptive hyperplane-LSH shape (mirrored in
    functions/ref_oracle.py::_adaptive_lsh_params — the oracle recomputes
    the identical (bands, rbits) from its own COUNT(*)).

    FIXED rbits is a fixed-parameter quadratic, the same family as the
    fixed cluster count adaptive_n_centroids killed (NOTES r8
    carry-forward): random pairs collide in a table at ~2^-rbits
    regardless of corpus size, so candidate mass grows as
    bands·N²·2^-rbits — ~3.1% of ALL pairs at (8, 8), which is what made
    the r7 verify join fill the disk at sf10. Growing rbits with N keeps
    the expected random bucket at ~target_per_bucket rows, so in-kernel
    verify work per decade grows ~linearly; bands is then re-solved so
    the true-pair recall at ``threshold`` never drops below the
    historical (base_bands, base_rbits) design point:

        rbits = max(base, ceil(log2(N / target)))   (capped at hi_rbits)
        recall(b, r) = 1 - (1 - p^r)^b,  p = 1 - acos(threshold)/pi
        bands = smallest b with recall(b, rbits) >= recall(base_b, base_r)

    The base clamp keeps every corpus with N <= target·2^base_rbits
    (262,144 at the defaults — all committed sf <= 10 evidence) on
    exactly the historical (8, 8); the hi clamp bounds key width.
    Integer-exact (bit_length, no float log2), deterministic."""
    import math

    if n_rows <= target_per_bucket:
        return base_bands, base_rbits
    rbits = max(
        base_rbits,
        min(hi_rbits, (-(-n_rows // target_per_bucket) - 1).bit_length()),
    )
    if rbits == base_rbits:
        return base_bands, base_rbits
    p = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    p = min(max(p, 1e-9), 1.0 - 1e-9)
    # ln(1 - recall_floor) = base_bands * ln(1 - p^base_rbits): solve
    # recall(bands, rbits) >= recall_floor in closed form (the -1e-9
    # absorbs float noise so the equality case stays exact).
    num = 1.0 - p**base_rbits
    den = 1.0 - p**rbits
    if num >= 1.0 or den >= 1.0:
        # p**rbits underflowed to 0 (threshold near -1, e.g. the
        # candidate-inspection pattern threshold=-1.0): log(1.0) == 0
        # would divide by zero, and no finite band count holds the
        # recall floor anyway — every pair "qualifies" at such a
        # threshold. Keep the historical shape rather than exploding.
        return base_bands, base_rbits
    bands = math.ceil(base_bands * math.log(num) / math.log(den) - 1e-9)
    # Low thresholds make the closed form ask for enormous band counts
    # (28 at t=0.5, ~87k at t=-0.99): cap the hyperplane allocation at
    # 8x the base — past that, banded LSH is the wrong tool and the
    # caller should use the blocked/brute paths.
    capped = min(max(base_bands, bands), 8 * base_bands)
    if capped < bands:
        # The documented recall floor no longer holds once the cap
        # truncates the solve (thresholds below ~0.3 at large N) — say
        # so instead of silently returning weaker recall (ADVICE r9 #3;
        # same explicit-signal pattern as the fuzzy density guard).
        import warnings

        warnings.warn(
            f"adaptive_lsh_params: recall-floor solve wants {bands} bands "
            f"for threshold={threshold} at N={n_rows}, capped to {capped} "
            f"(8x base) — the documented recall floor does NOT hold at "
            f"this threshold; use the blocked (embedding_dup_pairs) or "
            f"brute-force paths for low-threshold pair mining",
            stacklevel=2,
        )
    return capped, rbits


def embedding_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    bands: int | None = None,
    rbits: int | None = None,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup with RANDOM-HYPERPLANE LSH blocking — the
    production path with no metadata-column dependence.

    Each vector gets ``bands`` sign-bucket keys (one per hash table); a
    table's key is the sign pattern of ``rbits`` seeded random
    projections. Candidates share a bucket in ANY table (OR-
    amplification): P(candidate) = 1-(1-p^rbits)^bands with p = 1-θ/π.
    At (8 tables × 8 bits): cos≥0.9 pairs (θ≤26°, p≈0.86) survive with
    ~0.94 probability and cos≥0.98 with ~0.999, while random pairs
    (p≈0.5) collide in a table with only 2⁻⁸ probability. Verification
    (exact cosine) runs only on candidates. The hyperplanes are a
    driver-side (bands·rbits)×dim seeded matrix shipped as expression
    literals — tiny, deterministic, no fitting step.

    Scale: one map pass to bucket, one shuffle on bucket keys, pair count
    quadratic only in real near-dup clusters. Compare embedding_dup_pairs
    (metadata blocking, oracle-replicable).

    ``bands``/``rbits`` default to the scale-adaptive shape (one count()
    of the non-null-vector corpus feeds adaptive_lsh_params; the DuckDB
    oracle recomputes the identical shape from its COUNT(*)). Explicit
    values pin the historical fixed shape. The sizing count() re-runs
    the input's lineage once — callers with expensive upstream lineage
    should pass a precomputed ``n_rows`` (non-null-vector count), cache
    the input, or pin ``bands``/``rbits`` explicitly."""
    import numpy as np

    if bands is None or rbits is None:
        n_vecs = (
            n_rows
            if n_rows is not None
            else df.filter(F.col(vec_col).isNotNull()).count()
        )
        a_bands, a_rbits = adaptive_lsh_params(n_vecs, threshold)
        bands = a_bands if bands is None else bands
        rbits = a_rbits if rbits is None else rbits

    if dim is None:
        # Probe one row only when the caller didn't supply the dimension.
        # An empty corpus has no row to probe — and no pairs to emit.
        probe = df.select(vec_col).first()
        if probe is None:
            return df.sparkSession.createDataFrame(
                [],
                "vec_id_a long, vec_id_b long, cos_sim double",
            )
        dim = len(probe[0])
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((bands * rbits, dim))
    # SCALE 100× (SCALE100 r7, fifth disease): the former candidate-join
    # verify (bucket_pairs → a.join(cand).join(b) with cosine in the
    # residual) ships TWO full vectors per candidate row, and random-pair
    # collisions at fixed rbits are QUADRATIC in the corpus —
    # P(collide) = 1-(1-2^-rbits)^bands ≈ 3.1% of all pairs regardless of
    # scale, ~6×10⁸ candidates × ~1 KB of arrays at sf10: a disk-filling
    # SMJ spill. Verification now runs INSIDE the buckets via the same
    # chunk-tiled cogrouped kernel as embedding_dup_pairs: vectors ship
    # once per (band, bucket) membership, candidates never shuffle — only
    # threshold SURVIVORS leave the kernel, and the multi-table distinct
    # dedups that small survivor stream. The cosine value is bit-identical
    # to the join form (same per-dimension left-fold as F.aggregate /
    # list_dot_product), so a pair colliding in several tables emits
    # identical rows and distinct-after-round is exact.
    #
    # BANDING KERNEL (r8): the former expression form built bands·rbits
    # interpreted `dot(v, plane)` folds PER ROW (64 folds × dim lambda
    # steps — the fixed per-row cost that dominated the 115s sf10 wall)
    # and then joined the vectors back onto the banded rows. One Arrow
    # batch kernel now computes all projections per batch via
    # per-dimension left folds — ``acc[:, j] += X[:, d] * P[j, d]`` in
    # index order, bit-identical to the F.aggregate fold and to the
    # oracle's list_dot_product — and emits (id, band, bv, v, nrm)
    # directly, so the vector join disappears too. nrm uses the same
    # per-dimension fold as norm() (sqrt of the self-dot fold).
    import pandas as pd

    from ..sources.tables import spread

    id_field = df.schema[id_col].dataType.simpleString()
    eb_schema = (
        f"{id_col} {id_field}, band int, bv string, v array<double>, nrm double"
    )

    def band_rows(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            n = len(X)
            proj = np.zeros((n, bands * rbits))
            dv = np.zeros(n)
            for d in range(dim):
                xd = X[:, d]
                dv += xd * xd
                proj += xd[:, None] * planes[None, :, d]
            nrm = np.sqrt(dv)
            bits = np.where(proj >= 0, "1", "0")
            out = []
            for t in range(bands):
                bv = [
                    "".join(row) for row in bits[:, t * rbits : (t + 1) * rbits]
                ]
                out.append(
                    pd.DataFrame(
                        {
                            id_col: pdf[id_col],
                            "band": t,
                            "bv": bv,
                            "v": pdf["v"],
                            "nrm": nrm,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    eb = spread(
        df.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("v")).filter(
            F.col("v").isNotNull()
        )
    ).mapInPandas(band_rows, eb_schema)
    # VECTOR-DECADE FIX (r10, VERDICT r9 #1): the shared cogroup-tiled
    # kernel (_tiled_cosine_pairs) ranks rows with a window, joins two
    # chunk-grid legs, and cogroups — the banded vector rows (bands
    # full copies of every corpus vector, ~11 GB at 2M vectors) crossed
    # a shuffle THREE MORE times after the banding exchange, which is
    # what blew the 2M-vector cell to 11.1x on a 3.33x step (SCALE100VEC
    # r9) against the Θ(bands·N·target) model's ~4x. LSH buckets are
    # many and small (expected ~target_per_bucket rows — the adaptive
    # rbits exists to keep them so), so the verify now runs PARTITION-
    # LOCAL: ONE hash repartition on (band, bv), a partition-local sort,
    # and a streaming mapInPandas kernel that triangles each contiguous
    # bucket with the same per-dimension fold (tile-chunked inside the
    # task, so a giant bucket costs bounded memory, not bounded wall).
    # Vectors cross exactly one post-banding exchange; only threshold
    # survivors leave. The cogroup-tiled kernel remains the right shape
    # for FEW-GIANT-block inputs (embedding_dup_pairs, dedup_semantic),
    # where cross-task tile distribution is the point.
    return (
        _partition_local_cosine_pairs(
            eb,
            key_cols=["band", "bv"],
            id_col=id_col,
            id_type=df.schema[id_col].dataType,
            loose=threshold - 1e-6,
            tile=2048,
        )
        .select(
            "vec_id_a",
            "vec_id_b",
            F.round(F.col("cos_raw"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    block_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tile: int = 2048,
) -> DataFrame:
    """Embedding-cosine near-dup within metadata blocks — the oracle-
    replicable mode (DuckDB can reproduce the blocking exactly). The
    production path with no metadata dependence is
    embedding_dup_pairs_lsh (random-hyperplane buckets).

    SCALE (NOTES r6): few distinct blocks → few join keys → one reducer
    per block computing O(block²) per-pair cosine EXPRESSIONS (20M pairs
    × a ~µs-scale fold each at 10× bench scale; an unrolled-expression
    attempt blew the codegen method budget and ran interpreted). The
    enumerate-join is replaced by a pandas kernel with PER-DIMENSION
    vectorized accumulation:

        acc = zeros((na, nb)); for i in dims: acc += outer(A[:,i], B[:,i])

    Each acc element is built by the SAME left-fold addition order as
    F.aggregate's accumulator and DuckDB's list_dot_product —
    ((0+x₁y₁)+x₂y₂)+… — so cos = acc/(nₐ·n_b) is bit-identical to the
    per-pair expression and round(...,6) can never diverge from the
    oracle (norms are likewise hoisted per row, not recomputed per
    pair; a numpy matmul/BLAS path would reorder the sum and flip
    boundary values). Python-side filtering uses a LOOSE margin
    (t − 1e-6); the EXACT half-up round + threshold happens in Spark
    after return.

    SCALE 100× (SCALE100 r7): a per-BLOCK kernel allocates O(block²)
    doubles in one python worker — at 100× bench scale (10 labels ×
    ~20k vectors) that is ~3×3.2 GB of accumulator/temporary per task
    across 7+ concurrent workers: memory-bound thrash on ONE task per
    block. The same chunked-triangle cure as ``bucket_pairs``: rows
    rank within their block by id, chunk c = rank÷tile, and the
    (c1 ≤ c2) chunk-pair grid keys a COGROUPED kernel — each task
    computes one tile of the block's cosine matrix (≤ tile² doubles),
    so a giant block spreads over nc²/2 balanced tasks. Blocks smaller
    than ``tile`` degenerate to one (0,0) tile running the identical
    kernel. The tile split never changes a cosine: each pair's value is
    computed once, in one tile, by the same per-dimension fold."""
    from ..sources.tables import spread

    e = (
        spread(df)
        .select(
            F.col(id_col),
            F.col(block_col).alias("blk"),
            as_double_array(F.col(vec_col)).alias("v"),
        )
        # Join null-propagation parity (ADVICE r6): the equi-join this
        # replaces (a.blk = b.blk, and the oracle's a.label = b.label)
        # never matches NULL blocks, but groupBy would put all NULL-blk
        # rows into ONE processed group and pair them with each other.
        # NULL vectors likewise never pair — dropping them BEFORE the
        # rank keeps chunks dense.
        .filter(F.col("blk").isNotNull() & F.col("v").isNotNull())
        .withColumn("nrm", norm(F.col("v")))
    )
    return (
        _tiled_cosine_pairs(
            e,
            key_cols=["blk"],
            id_col=id_col,
            id_type=df.schema[id_col].dataType,
            loose=threshold - 1e-6,
            tile=tile,
        )
        .select(
            "vec_id_a",
            "vec_id_b",
            F.round(F.col("cos_raw"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _partition_local_cosine_pairs(
    e: DataFrame,
    key_cols: list,
    id_col: str,
    id_type,
    loose: float,
    tile: int,
) -> DataFrame:
    """All-pairs cosine within key groups, computed PARTITION-LOCALLY —
    the many-small-groups twin of _tiled_cosine_pairs (r10, VERDICT r9
    #1). Same contract: ``e`` carries key_cols + id_col + v (double
    array, non-null) + nrm; output (vec_id_a, vec_id_b, cos_raw) with
    a < b by id, each within-group pair computed exactly once, values
    bit-identical to the cogroup form (the per-dimension left-fold
    order is what fixes every IEEE-754 sum; the tile split never
    changes a value because each acc element accumulates its dims in
    the same sequence regardless of which tile computes it).

    Plan shape: ONE hash exchange on key_cols, a partition-local sort
    on (key_cols, id), then a streaming Arrow kernel over each
    partition that buffers one contiguous group at a time (groups can
    span Arrow batch boundaries — the buffer carries across) and emits
    only pairs with cos >= ``loose``. Giant groups are tile-chunked
    INSIDE the task — bounded accumulator memory (<= tile² doubles),
    but single-task wall — so this path is for workloads whose groups
    are bounded by construction (adaptive-rbits LSH buckets at
    ~target_per_bucket rows). Few-giant-group inputs (metadata blocks,
    kmeans cells) should keep _tiled_cosine_pairs, which spreads one
    group's tile grid across tasks."""
    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [
            StructField("vec_id_a", id_type, True),
            StructField("vec_id_b", id_type, True),
            StructField("cos_raw", DoubleType(), True),
        ]
    )

    def group_pairs(g: "pd.DataFrame"):
        import numpy as np

        if len(g) < 2:
            return None
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        # None elements inside a vector become NaN → NaN cosine → fails
        # the keep filter, matching the join/cogroup forms.
        V = np.stack(g["v"].to_numpy()).astype(np.float64)
        nr = g["nrm"].to_numpy()
        n, dim = V.shape
        frames = []
        for c1 in range(0, n, tile):
            A = V[c1 : c1 + tile]
            ids_a = ids[c1 : c1 + tile]
            nr_a = nr[c1 : c1 + tile]
            for c2 in range(c1, n, tile):
                diagonal = c1 == c2
                if diagonal:
                    B, ids_b, nr_b = A, ids_a, nr_a
                else:
                    B = V[c2 : c2 + tile]
                    ids_b = ids[c2 : c2 + tile]
                    nr_b = nr[c2 : c2 + tile]
                acc = np.zeros((len(ids_a), len(ids_b)))
                for d in range(dim):
                    acc += np.multiply.outer(
                        np.ascontiguousarray(A[:, d]),
                        np.ascontiguousarray(B[:, d]),
                    )
                cos = acc / np.multiply.outer(nr_a, nr_b)
                if diagonal:
                    ia, ib = np.triu_indices(len(ids_a), 1)
                else:
                    ia, ib = np.indices(cos.shape).reshape(2, -1)
                keep = cos[ia, ib] >= loose
                if keep.any():
                    frames.append(
                        pd.DataFrame(
                            {
                                "vec_id_a": ids_a[ia[keep]],
                                "vec_id_b": ids_b[ib[keep]],
                                "cos_raw": cos[ia[keep], ib[keep]],
                            }
                        )
                    )
        if not frames:
            return None
        return pd.concat(frames, ignore_index=True)

    def stream_groups(batches):
        cur_key = None
        buf: list = []
        for pdf in batches:
            if pdf.empty:
                continue
            keys = pdf[key_cols]
            bounds = (keys != keys.shift()).any(axis=1).cumsum()
            for _, g in pdf.groupby(bounds, sort=False):
                k = tuple(g[key_cols].iloc[0])
                if k == cur_key:
                    buf.append(g)
                    continue
                if cur_key is not None:
                    out = group_pairs(
                        buf[0] if len(buf) == 1 else pd.concat(buf)
                    )
                    if out is not None:
                        yield out
                cur_key, buf = k, [g]
        if cur_key is not None:
            out = group_pairs(buf[0] if len(buf) == 1 else pd.concat(buf))
            if out is not None:
                yield out

    return (
        e.repartition(*key_cols)
        .sortWithinPartitions(*key_cols, id_col)
        .mapInPandas(stream_groups, out_schema)
    )


# Direct-path minhash verify switches from the candidate JOIN to the
# in-bucket kernels past this corpus size (measured: the join's
# array-per-candidate intermediate filled the disk at 5M docs, while
# every committed oracle scale is orders of magnitude below the gate).
# Shingle-cell-mass gate for the in-bucket verify switch (r11, VERDICT
# r10 #6: the r10 constant was 1M DOCS, picked at the death site; the
# decision really scales with docs × set size — see the gate comment in
# minhash_dedup_pairs). Calibrated by the committed A/B
# (VERIFY_GATE_AB_r11.json, word-shuffled bench-shaped docs, ~52
# 3-gram shingles each): the JOIN verify is 5-7x FASTER than the
# in-bucket kernel everywhere its pair-array shuffle fits — 6.7 vs
# 41.7 s at 15.6M cells, 16.2 vs 117.1 s at 52M, 34.8 vs 171.2 s at
# 78M, identical rows at every point — so the r10 1M-doc (52M-cell)
# switch point was premature by a measured 5x. The gate is a
# SPILL-SAFETY bound, not a wall optimum: join's intermediate is
# candidate-pairs × both arrays (~2.5 KB/pair), measured dead at 260M
# cells (459.5M pairs ≈ TB-scale, r10's disk-full) and modeled at
# hundreds of GB already at 156M cells (165.3M pairs), where bucket's
# linear kernel reads 432.7 s safely. 100M splits the measured-safe
# (<=78M) and modeled-unsafe (>=156M) regions; callers with real
# shuffle capacity can force verify="join" past it.
_BUCKET_VERIFY_MIN_CELLS = 100_000_000


def _minhash_verify_in_bucket(
    sh: DataFrame,
    k: int,
    bands: int,
    threshold: float,
    id_col: str,
    family: str,
    chunk: int = 2048,
) -> DataFrame:
    """Direct-path MinHash verify with arrays shipped per BAND
    MEMBERSHIP instead of per candidate (r10, VERDICT r9 #4).

    The banded (id, band, bv) frame is checkpointed (ids + band values
    only, ~50 B/row) so bucket sizes cost one cheap aggregate instead
    of a second signature pass; single-member buckets — the vast
    majority — are dropped BEFORE the shingle arrays are attached, so
    arrays shuffle once into the multi-member rows and once into the
    kernels' bucket partitioning. Buckets ≤ ``chunk`` stream through
    the partition-local kernel; giants spread their pair tiles across
    tasks via the cogrouped grid. Output is identical to the verify
    join: same integers, same division, engine round(..., 4) applied
    after the kernel (loose = threshold − 1e-4 keeps every raw value
    that could round up across the boundary), multi-band collisions
    deduped by the same distinct."""
    nb = (
        minhash_banded(sh, k, bands, id_col, family)
        .filter(F.col("bv").isNotNull())
        .localCheckpoint(eager=False)
    )
    sizes = nb.groupBy("band", "bv").agg(F.count("*").alias("__bn"))
    multi = nb.join(sizes.filter(F.col("__bn") >= 2), ["band", "bv"])
    eb = multi.join(sh, id_col)
    id_type = sh.schema[id_col].dataType
    loose = (threshold - 1e-4) if threshold > 0 else -1.0
    small = _partition_local_jaccard_pairs(
        eb.filter(F.col("__bn") <= chunk).select(id_col, "band", "bv", "shingles"),
        key_cols=["band", "bv"],
        id_col=id_col,
        id_type=id_type,
        loose=loose,
    )
    giant = _tiled_jaccard_pairs(
        eb.filter(F.col("__bn") > chunk).select(id_col, "band", "bv", "shingles"),
        key_cols=["band", "bv"],
        id_col=id_col,
        id_type=id_type,
        loose=loose,
    )
    out = (
        small.unionByName(giant)
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(F.col("jac_raw"), 4).alias("jaccard"),
        )
        .distinct()
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def _jaccard_group_pairs_fn(id_col: str, loose: float, tile: int):
    """Shared bucket kernel for the jaccard verify twins: sort the
    group by id, convert each member's DISTINCT shingle array to a
    frozenset ONCE, then chunk-triangle the pair grid computing
    inter / (|A| + |B| - inter) — the same integers and the same
    float64 division as jaccard_distinct's JVM expression (sizes and
    intersections of identical sets), so the raw double is bit-equal
    and the engine-side round(..., 4) can never diverge from the
    join-verify form. Pairs below ``loose`` never leave the kernel."""
    import numpy as np
    import pandas as pd

    def group_pairs(g: "pd.DataFrame"):
        if len(g) < 2:
            return None
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sets = [frozenset(s) for s in g["shingles"]]
        sizes = [len(s) for s in sets]
        n = len(ids)
        rows_a, rows_b, vals = [], [], []
        # plain triangle: unlike the cosine kernel there is no per-tile
        # accumulator matrix to bound, so chunking buys nothing here —
        # per-pair state is two set handles (``tile`` is accepted for
        # signature symmetry; giant groups belong to the tiled twin)
        for i in range(n - 1):
            si, zi = sets[i], sizes[i]
            for j in range(i + 1, n):
                inter = len(si & sets[j])
                den = zi + sizes[j] - inter
                if den == 0:
                    continue  # empty∩empty: NULL in the join form,
                    # which the >= threshold filter drops anyway
                jac = inter / den
                if jac >= loose:
                    rows_a.append(ids[i])
                    rows_b.append(ids[j])
                    vals.append(jac)
        if not rows_a:
            return None
        return pd.DataFrame(
            {
                "doc_id_a": np.asarray(rows_a),
                "doc_id_b": np.asarray(rows_b),
                "jac_raw": vals,
            }
        )

    return group_pairs


def _partition_local_jaccard_pairs(
    e: DataFrame,
    key_cols: list,
    id_col: str,
    id_type,
    loose: float,
    tile: int = 2048,
) -> DataFrame:
    """Jaccard twin of _partition_local_cosine_pairs (r10, VERDICT r9
    #4): ``e`` carries key_cols + id + ``shingles`` (distinct-element
    arrays); output (doc_id_a, doc_id_b, jac_raw) with a < b, each
    within-group pair exactly once per group. ONE hash exchange on
    key_cols, partition-local sort, streaming per-bucket kernel — the
    arrays cross exactly one shuffle, instead of once per CANDIDATE in
    the verify-join form (which is what filled the disk at the 5M-doc
    decade: ~450M candidates × ~2.5 KB of arrays ≈ a TB-scale exchange).
    For bounded-size buckets only; giant buckets go through
    _tiled_jaccard_pairs."""
    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [
            StructField("doc_id_a", id_type, True),
            StructField("doc_id_b", id_type, True),
            StructField("jac_raw", DoubleType(), True),
        ]
    )
    group_pairs = _jaccard_group_pairs_fn(id_col, loose, tile)

    def stream_groups(batches):
        cur_key = None
        buf: list = []
        for pdf in batches:
            if pdf.empty:
                continue
            keys = pdf[key_cols]
            bounds = (keys != keys.shift()).any(axis=1).cumsum()
            for _, g in pdf.groupby(bounds, sort=False):
                k = tuple(g[key_cols].iloc[0])
                if k == cur_key:
                    buf.append(g)
                    continue
                if cur_key is not None:
                    out = group_pairs(
                        buf[0] if len(buf) == 1 else pd.concat(buf)
                    )
                    if out is not None:
                        yield out
                cur_key, buf = k, [g]
        if cur_key is not None:
            out = group_pairs(buf[0] if len(buf) == 1 else pd.concat(buf))
            if out is not None:
                yield out

    return (
        e.repartition(*key_cols)
        .sortWithinPartitions(*key_cols, id_col)
        .mapInPandas(stream_groups, out_schema)
    )


def _tiled_jaccard_pairs(
    e: DataFrame,
    key_cols: list,
    id_col: str,
    id_type,
    loose: float,
    tile: int = 2048,
) -> DataFrame:
    """Jaccard twin of _tiled_cosine_pairs for GIANT buckets: rows rank
    within their key group by id, chunk c = rank÷tile, and the
    (c1 ≤ c2) chunk-pair grid keys a cogrouped kernel — one task per
    ≤ tile² pair tile, so a 100k-member band bucket spreads over
    thousands of balanced tasks instead of one. Same pair values as
    the partition-local twin (shared kernel arithmetic)."""
    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType
    from pyspark.sql.window import Window

    e = e.withColumn(
        "__r",
        F.row_number().over(Window.partitionBy(*key_cols).orderBy(id_col)) - 1,
    ).withColumn("__c", (F.col("__r") / F.lit(tile)).cast("int"))
    grid = (
        e.groupBy(*key_cols)
        .agg(F.max("__c").alias("__mx"))
        .select(
            *key_cols,
            F.explode(F.sequence(F.lit(0), F.col("__mx"))).alias("__c1"),
            "__mx",
        )
        .select(
            *key_cols,
            "__c1",
            F.explode(F.sequence(F.col("__c1"), F.col("__mx"))).alias("__c2"),
        )
    )
    leg_a = e.withColumnRenamed("__c", "__c1").join(grid, [*key_cols, "__c1"])
    kb = [f"__kb{i}" for i in range(len(key_cols))]
    e_b = e.select(
        *[F.col(k).alias(n) for k, n in zip(key_cols, kb)],
        F.col(id_col).alias("__idb"),
        F.col("shingles").alias("__shb"),
        F.col("__r").alias("__rb"),
        F.col("__c").alias("__c2b"),
    )
    grid_b = grid.select(
        *[F.col(k).alias(n) for k, n in zip(key_cols, kb)],
        F.col("__c1").alias("__c1b"),
        F.col("__c2").alias("__c2b"),
    )
    leg_b = e_b.join(grid_b, [*kb, "__c2b"])
    out_schema = StructType(
        [
            StructField("doc_id_a", id_type, True),
            StructField("doc_id_b", id_type, True),
            StructField("jac_raw", DoubleType(), True),
        ]
    )

    def tile_pairs(la: "pd.DataFrame", lb: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        empty = pd.DataFrame({"doc_id_a": [], "doc_id_b": [], "jac_raw": []})
        if la.empty or lb.empty:
            return empty
        diagonal = la["__c1"].iat[0] == la["__c2"].iat[0]
        la = la.sort_values("__r")
        ids_a = la[id_col].to_numpy()
        sets_a = [frozenset(s) for s in la["shingles"]]
        if diagonal:
            ids_b, sets_b = ids_a, sets_a
        else:
            lb = lb.sort_values("__rb")
            ids_b = lb["__idb"].to_numpy()
            sets_b = [frozenset(s) for s in lb["__shb"]]
        rows_a, rows_b, vals = [], [], []
        for i, (si, ai) in enumerate(zip(sets_a, ids_a)):
            zi = len(si)
            j0 = i + 1 if diagonal else 0
            for j in range(j0, len(sets_b)):
                sj = sets_b[j]
                inter = len(si & sj)
                den = zi + len(sj) - inter
                if den == 0:
                    continue
                jac = inter / den
                if jac >= loose:
                    rows_a.append(ai)
                    rows_b.append(ids_b[j])
                    vals.append(jac)
        if not rows_a:
            return empty
        return pd.DataFrame(
            {
                "doc_id_a": np.asarray(rows_a),
                "doc_id_b": np.asarray(rows_b),
                "jac_raw": vals,
            }
        )

    return (
        leg_a.groupBy(*key_cols, "__c1", "__c2")
        .cogroup(leg_b.groupBy(*kb, "__c1b", "__c2b"))
        .applyInPandas(lambda la, lb: tile_pairs(la, lb), out_schema)
    )


def _tiled_cosine_pairs(
    e: DataFrame,
    key_cols: list,
    id_col: str,
    id_type,
    loose: float,
    tile: int,
) -> DataFrame:
    """Chunk-tiled all-pairs cosine within key groups.

    ``e`` carries ``key_cols`` + ``id_col`` + ``v`` (double array, non-
    null) + ``nrm``. Rows rank within their key group by id, chunk
    c = rank÷tile, and the (c1 ≤ c2) chunk-pair grid keys a COGROUPED
    pandas kernel: each task computes one ≤ tile² tile of the group's
    cosine matrix via PER-DIMENSION left-fold accumulation (the order
    F.aggregate and DuckDB's list_dot_product use — bit-identical to the
    per-pair expression, NOTES r6/r7) and emits only pairs with
    cos ≥ ``loose``. Output: (vec_id_a, vec_id_b, cos_raw), a < b by id
    order, each within-group pair computed exactly once in one tile.

    Filtering INSIDE the kernel is the scale point: survivors shuffle,
    candidates don't — a verify JOIN ships every candidate row with two
    full vectors (measured at 100×: ~6×10⁸ random LSH collisions × ~1 KB
    of arrays = a disk-filling spill), while the tile kernel ships each
    vector once per group membership."""
    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType
    from pyspark.sql.window import Window

    e = e.withColumn(
        "__r",
        F.row_number().over(Window.partitionBy(*key_cols).orderBy(id_col)) - 1,
    ).withColumn("__c", (F.col("__r") / F.lit(tile)).cast("int"))
    grid = (
        e.groupBy(*key_cols)
        .agg(F.max("__c").alias("__mx"))
        .select(
            *key_cols,
            F.explode(F.sequence(F.lit(0), F.col("__mx"))).alias("__c1"),
            "__mx",
        )
        .select(
            *key_cols,
            "__c1",
            F.explode(F.sequence(F.col("__c1"), F.col("__mx"))).alias("__c2"),
        )
    )
    leg_a = e.withColumnRenamed("__c", "__c1").join(grid, [*key_cols, "__c1"])
    # The b leg re-reads the SAME e lineage — alias every column to fresh
    # attributes (incl. the grid copy) so the cogroup isn't an ambiguous
    # self-reference.
    kb = [f"__kb{i}" for i in range(len(key_cols))]
    e_b = e.select(
        *[F.col(k).alias(n) for k, n in zip(key_cols, kb)],
        F.col(id_col).alias("__idb"),
        F.col("v").alias("__vb"),
        F.col("nrm").alias("__nrmb"),
        F.col("__r").alias("__rb"),
        F.col("__c").alias("__c2b"),
    )
    grid_b = grid.select(
        *[F.col(k).alias(n) for k, n in zip(key_cols, kb)],
        F.col("__c1").alias("__c1b"),
        F.col("__c2").alias("__c2b"),
    )
    leg_b = e_b.join(grid_b, [*kb, "__c2b"])
    out_schema = StructType(
        [
            StructField("vec_id_a", id_type, True),
            StructField("vec_id_b", id_type, True),
            StructField("cos_raw", DoubleType(), True),
        ]
    )

    def tile_pairs(la: "pd.DataFrame", lb: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        empty = pd.DataFrame({"vec_id_a": [], "vec_id_b": [], "cos_raw": []})
        if la.empty or lb.empty:
            return empty
        diagonal = la["__c1"].iat[0] == la["__c2"].iat[0]
        la = la.sort_values("__r")
        ids_a = la[id_col].to_numpy()
        # None elements inside a vector become NaN → NaN cosine → fails
        # the keep filter, matching the join form's null-propagation.
        A = np.stack(la["v"].to_numpy()).astype(np.float64)
        nr_a = la["nrm"].to_numpy()
        if diagonal:
            ids_b, B, nr_b = ids_a, A, nr_a
        else:
            lb = lb.sort_values("__rb")
            ids_b = lb["__idb"].to_numpy()
            B = np.stack(lb["__vb"].to_numpy()).astype(np.float64)
            nr_b = lb["__nrmb"].to_numpy()
        acc = np.zeros((len(ids_a), len(ids_b)))
        for i in range(A.shape[1]):
            acc += np.multiply.outer(
                np.ascontiguousarray(A[:, i]), np.ascontiguousarray(B[:, i])
            )
        cos = acc / np.multiply.outer(nr_a, nr_b)
        if diagonal:
            ia, ib = np.triu_indices(len(ids_a), 1)
        else:
            ia, ib = np.indices(cos.shape).reshape(2, -1)
        keep = cos[ia, ib] >= loose
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "vec_id_a": ids_a[ia[keep]],
                "vec_id_b": ids_b[ib[keep]],
                "cos_raw": cos[ia[keep], ib[keep]],
            }
        )

    return (
        leg_a.groupBy(*key_cols, "__c1", "__c2")
        .cogroup(leg_b.groupBy(*kb, "__c1b", "__c2b"))
        .applyInPandas(lambda la, lb: tile_pairs(la, lb), out_schema)
    )


def semantic_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_clusters: int | None = None,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic near-dup: cluster the embedding space with
    seeded k-means, then compare pairs only WITHIN each cluster (the
    published semantic-dedup recipe: Abbas et al. 2023, "SemDeDup: Data-
    efficient learning at web-scale through semantic deduplication" —
    public arXiv method, re-expressed as DataFrame ops).

    Scale shape: centroid training is O(cap) (bounded seeded sample,
    kmeans_centroids); assignment is one broadcast-centroids map pass
    (ivf_assign, nprobe=1); the quadratic term is bounded by the largest
    CLUSTER, not the corpus — identical cost structure to the
    LSH-bucketed variant but with semantically meaningful blocks, which
    is what lets a high cosine threshold inside a block stand in for
    all-pairs cosine over the corpus. Near-dup pairs that straddle a
    cluster boundary are missed — the standard SemDeDup trade-off;
    raise n_clusters for tighter blocks (cost) or lower it for recall.
    ``n_clusters`` defaults to the scale-adaptive count
    (similarity.adaptive_n_centroids, VERDICT r7 #2): a FIXED cluster
    count makes per-cluster pair mass grow quadratically with the
    corpus — 200k/16 ≈ 12.5k-vector clusters cost ~78M in-kernel
    cosines EACH at 100× bench scale; with k ∝ N the per-cluster mass
    stays ~constant. Small corpora (< 16·1024 rows) land on the
    historical k=16 exactly.
    SCALE 100× (SCALE100 r7): the former within-cluster pair join
    confined each cluster's quadratic enumeration — full vectors on both
    sides — to n_clusters join keys (~1.25B array-carrying rows over 16
    reducers at sf10). Pairing now runs through the chunk-tiled cogrouped
    cosine kernel keyed by centroid_id (shared _tiled_cosine_pairs):
    balanced ≤ tile² tasks, vectors ship once per cluster membership,
    only threshold survivors shuffle, identical cosines (same
    per-dimension left-fold as the expression form).

    Returns (vec_id_a, vec_id_b, cos_sim) with a < b."""
    from .similarity import (
        adaptive_coarse_shape,
        imi_assign,
        imi_codebooks,
        ivf_assign,
        kmeans_centroids,
    )

    if n_clusters is None:
        # flat k-means blocks to the flat cap (byte-identical to r8 at
        # every committed scale), IMI cells past it (r9, VERDICT r8 #3 —
        # same within-block pairing either way)
        kind, val = adaptive_coarse_shape(df.count())
    else:
        kind, val = ("flat", n_clusters)
    if kind == "imi":
        cb = imi_codebooks(df, val, seed, vec_col, id_col) or (None, None)
        assigned = imi_assign(df, *cb, vec_col=vec_col, id_col=id_col)
    else:
        cents = kmeans_centroids(df, val, seed, vec_col, id_col)
        assigned = ivf_assign(df, cents, vec_col, id_col)  # (id, centroid_id, v)
    e = assigned.select(F.col(id_col), "centroid_id", "v").filter(
        F.col("v").isNotNull()
    ).withColumn("nrm", norm(F.col("v")))
    return (
        _tiled_cosine_pairs(
            e,
            key_cols=["centroid_id"],
            id_col=id_col,
            id_type=df.schema[id_col].dataType,
            loose=threshold - 1e-6,
            tile=2048,
        )
        .select(
            "vec_id_a",
            "vec_id_b",
            F.round(F.col("cos_raw"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def dup_clusters(pairs: DataFrame, a_col: str = "doc_id_a", b_col: str = "doc_id_b") -> DataFrame:
    """Near-dup pairs → connected components → (doc_id, cluster_id) with
    cluster_id = min doc id in the component (the canonical survivor).

    Iterative min-label propagation over the edge list: each round every
    node adopts the smallest label among itself and its neighbors;
    converges in O(component diameter) rounds. Each round is two
    hash joins + an aggregate on the EDGE list — no driver-side graph.
    Dedup components are overwhelmingly tiny (pairs of near-identical
    docs), so rounds ≈ 2-3; the loop stops as soon as a round changes
    nothing. (GraphFrames would do the same thing; this stays in pure
    DataFrame ops.)
    """
    edges = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .unionAll(pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b")))
        .distinct()
        # Iterative algorithm: truncate the lineage so each round reads the
        # materialized edge list instead of re-running the (expensive)
        # pair-generation upstream. localCheckpoint stores on executors —
        # production would use a reliable checkpoint dir.
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(20):  # diameter bound; real exit is the no-change check
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)  # per-round lineage stays O(1)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def dup_cluster_losers_capped(
    pairs: DataFrame,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    max_pairs: int = 200_000,
) -> DataFrame:
    """Non-representative members of each duplicate cluster (everything
    except the component's min id) via DRIVER-SIDE union-find over the
    collected pair list — the micro-batch companion to ``dup_clusters``.

    Same semantics (min-root-wins union keeps every root the component
    minimum, so losers ≡ dup_clusters' doc_id != cluster_id set —
    equivalence pinned in tests), but ONE Spark action instead of the
    label-propagation loop's ≥6 per call (edges+labels checkpoints, then
    a checkpoint+count per round) — that fixed job count was the
    measured per-batch floor of streaming admission (NOTES r4/r5), where
    within-batch verified pairs are candidate-bounded and tiny. The
    collect is CAPPED: past ``max_pairs`` the function falls back to the
    distributed loop instead of growing the driver (same bounded-sample
    discipline as kmeans_centroids)."""
    from pyspark.sql.types import StructField, StructType

    # Output schema is derived from the input id column so non-long doc
    # ids (string hashes, decimals) round-trip identically through the
    # capped path and the dup_clusters fallback.
    out_schema = StructType(
        [StructField("doc_id", pairs.schema[a_col].dataType, True)]
    )
    rows = pairs.select(a_col, b_col).limit(max_pairs + 1).collect()
    if len(rows) > max_pairs:
        lab = dup_clusters(pairs, a_col, b_col)
        return lab.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    spark = pairs.sparkSession
    if not rows:
        return spark.createDataFrame([], out_schema)
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    nodes = set()
    for r in rows:
        a, b = r[0], r[1]
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:  # min root wins -> root is always the component min
                parent[rb] = ra
            else:
                parent[ra] = rb
    losers = sorted(x for x in nodes if find(x) != x)
    return spark.createDataFrame([(x,) for x in losers], out_schema)


def ngram_jaccard_clusters(
    df: DataFrame,
    threshold: float = 0.95,
    block_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    factorize: bool | None = None,
) -> DataFrame:
    """Dedup completion in one operator: blocked exact word-set Jaccard
    pairs → connected components → (doc_id, cluster_id = component min).

    The point of fusing pairs+clusters (vs dup_clusters over
    ngram_jaccard_pairs) is the factorized path: label propagation over
    clone-clique edges is quadratic per clique (sf10: ~760M directed
    edges from 380M within-group pairs), but jaccard is a function of
    the word SET and blocking is per block column, so docs sharing
    (block, set) are interchangeable — the components of the full graph
    are exactly the components of the REPRESENTATIVE graph (one rep per
    group, ~4k nodes at sf10) expanded through group membership, and
    each rep is its group's min id so component-min labels agree. Same
    algebra as the DuckDB oracle's recursive-CTE closure (registry
    dedup_clusters) and the same adaptive decision + session cache as
    the pair operators. Membership rule: a doc belongs to the output iff
    its rep has a cross edge (component label = rep component's label)
    or its group has ≥ 2 members (within-group jaccard is exactly 1.0;
    label = rep id).

    Direct path (distinct-set corpora): dup_clusters over
    ngram_jaccard_pairs, unchanged semantics."""
    from ..sources.tables import spread

    w = (
        spread(df)
        .select(
            F.col(id_col),
            F.col(block_col).alias("blk"),
            F.array_distinct(words(F.col(text_col))).alias("ws"),
        )
        .withColumn("nw", F.size("ws"))
        .localCheckpoint(eager=False)
    )
    if factorize is None:
        factorize = _set_factorize_decision(df, w, "ws", 1, text_col)
    if not factorize:
        return dup_clusters(
            ngram_jaccard_pairs(
                df, threshold, block_col, text_col, id_col, factorize=False
            )
        )
    # NULL blocks excluded + injective set key — same null-parity and
    # embedded-separator contracts as prefix_jaccard_pairs (ADVICE r7).
    grouped = w.filter(F.col("blk").isNotNull() & (F.size("ws") > 0)).withColumn(
        "__g",
        F.concat_ws("\x00", F.col("blk"), _exact_set_key(F.col("ws"))),
    )
    reps = grouped.groupBy("__g").agg(
        F.min(id_col).alias("__rid"),
        F.count("*").alias("__n"),
        F.first("blk").alias("blk"),
        F.first("ws").alias("ws"),
        F.first("nw").alias("nw"),
    ).localCheckpoint(eager=False)
    rep_w = reps.select(F.col("__rid").alias(id_col), "blk", "ws", "nw")
    rep_pairs = _prefix_filter_verify(rep_w, threshold, id_col)
    rep_label = dup_clusters(rep_pairs)  # (doc_id=rep id, cluster_id), cross-edged reps only
    return (
        grouped.select("__g", F.col(id_col).alias("doc_id"))
        .join(reps.select("__g", "__rid", "__n"), "__g")
        .join(
            rep_label.select(F.col("doc_id").alias("__rid"), "cluster_id"),
            "__rid",
            "left",
        )
        .filter(F.col("cluster_id").isNotNull() | (F.col("__n") >= 2))
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("__rid")).alias("cluster_id"),
        )
    )


def estimate_length_band_pairs(
    df: DataFrame,
    block_col: str = "source",
    len_col: str = "n_chars",
    band: int = 40,
) -> int:
    """O(corpus) estimate of the candidate mass a (block, length-band)
    pair join enumerates — the fuzzy family's twin of
    temporal.estimate_interval_join_pairs: one hash groupBy over
    (block, floor(len/band)) bucket counts plus a tiny self-join on
    neighboring buckets, NEVER O(pairs).

    Counts unordered banded pairs (the post-id<-filter stream the
    length-band join scores): within-bucket C(n,2) + adjacent-bucket
    n_b*n_{b+1}. Slightly over the post-residual mass (adjacent-bucket
    pairs farther than ``band`` chars apart are filtered later) — the
    right direction for a guard."""
    sizes = df.groupBy(
        F.col(block_col).alias("__blk"),
        F.floor(F.col(len_col) / band).alias("__bkt"),
    ).agg(F.count("*").alias("__n"))
    nxt = sizes.select(
        "__blk", (F.col("__bkt") + 1).alias("__bkt"), F.col("__n").alias("__nb")
    )
    row = (
        sizes.join(nxt, ["__blk", "__bkt"], "left")
        .agg(
            F.sum(
                F.col("__n") * (F.col("__n") - 1) / 2
                + F.coalesce(F.col("__nb"), F.lit(0)) * F.col("__n")
            ).alias("pairs")
        )
        .collect()[0]
    )
    return int(row["pairs"] or 0)


def fuzzy_pair_edit_topk(
    df: DataFrame,
    k: int = 20,
    band: int = 40,
    prefix: int = 80,
    block_col: str = "source",
    len_col: str = "n_chars",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_candidate_pairs: "int | None" = 100_000_000,
    force: bool = False,
) -> DataFrame:
    """The k closest document pairs by Levenshtein distance over the
    normalized ``prefix``-char text prefix, within (block, length-band)
    blocks — argmin edit distance MUST score every banded pair, so the
    work is quadratic in block density BY CONTRACT (reference semantics:
    fuzzy matching; cf. VERDICT r8 weak grade).

    BAND JOIN SHAPE (r8): length buckets join as part of the equi-key
    (probe side explodes to its three neighboring buckets) so per-key
    candidate mass drops quadratically vs the former block-only key;
    every pair within ``band`` chars lands in exactly one (block,
    bucket) key and the exact band is re-checked in the residual.

    DENSITY GUARD (r9, interval_join_bucketed's protocol): the banded
    pair mass is measured FIRST with estimate_length_band_pairs (an
    O(corpus) bucket-count pass) and a ValueError names the measured
    mass and the production path when it exceeds ``max_candidate_pairs``
    — at 100 TB the scale-safe shape is LSH candidate generation
    (dedup_ngram_lsh / minhash_dedup_pairs) with edit distance scored
    only on surviving candidates. ``force=True`` (or cap None) is the
    explicit escape for a consciously-paid quadratic run. Measured: the
    sf10 replica banded mass is ~1.45e9 (3675 s wall when run unguarded,
    SCALE100_FULL_r08) vs sf1's 1.44e7 — the default cap admits every
    committed bench scale <= sf1 and refuses the decade that burns
    hours."""
    from ..sources.tables import spread

    d = spread(df).select(
        F.col(id_col),
        F.col(block_col).alias("__blk"),
        F.col(len_col).alias("__len"),
        F.substring(F.lower(F.col(text_col)), 1, prefix).alias("__pfx"),
    )
    if not force and max_candidate_pairs is not None:
        est = estimate_length_band_pairs(d, "__blk", "__len", band)
        if est > max_candidate_pairs:
            raise ValueError(
                f"fuzzy_pair_edit would score ~{est:,} banded candidate "
                f"pairs (cap {max_candidate_pairs:,}). Argmin edit "
                "distance is quadratic in block density by contract; at "
                "this scale generate candidates with LSH first "
                "(dedup_ngram_lsh / minhash_dedup_pairs) and score edit "
                "distance only on those, or pass force=True / a higher "
                "cap to consciously pay the quadratic run."
            )
    a = d.withColumn("__bkt", F.floor(F.col("__len") / band))
    b = d.select(
        F.col(id_col).alias("__id_b"),
        F.col("__blk").alias("__blk_b"),
        F.col("__len").alias("__len_b"),
        F.col("__pfx").alias("__pfx_b"),
        F.explode(
            F.array(
                F.floor(F.col("__len") / band) - 1,
                F.floor(F.col("__len") / band),
                F.floor(F.col("__len") / band) + 1,
            )
        ).alias("__bkt_b"),
    )
    pairs = a.join(
        b,
        (F.col("__blk") == F.col("__blk_b"))
        & (F.col("__bkt") == F.col("__bkt_b"))
        & (F.col(id_col) < F.col("__id_b"))
        & (F.abs(F.col("__len") - F.col("__len_b")) <= band),
    ).select(
        F.col(id_col).alias("doc_id_a"),
        F.col("__id_b").alias("doc_id_b"),
        F.levenshtein(F.col("__pfx"), F.col("__pfx_b")).cast("long").alias("edit_dist"),
    )
    return pairs.orderBy("edit_dist", "doc_id_a", "doc_id_b").limit(k)
