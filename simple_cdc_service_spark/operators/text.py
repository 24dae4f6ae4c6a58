"""Text analysis operators [EXT]: token counting, quality scoring,
language ID, document fingerprinting.

All pure Column expressions (JVM-side, codegen'd, no shuffle — these are
map-only over the documents scan, which is exactly what you want when the
input is 100 TB of text: the cost is the scan, the expressions are free).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import words

# Tiny embedded stopword/marker lists — shared verbatim with the oracle SQL
# in registry.py (keep in lockstep).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "es": ("el", "la", "los", "de", "que", "y"),
    "fr": ("le", "la", "les", "et", "est", "des"),
    "zh": ("de", "le", "shi", "bu", "wo", "ni"),
}
# Deterministic precedence for argmax ties (checked in order).
LANG_ORDER = ("en", "de", "es", "fr", "zh")

PUNCT_CLASS = "[.!?,;:]"


def token_count(text: Column) -> Column:
    """Whitespace token count (trim first so leading/trailing blanks don't
    create phantom tokens)."""
    return F.size(F.split(F.trim(text), r"\s+"))


def _count_in(ws: Column, vocab: tuple[str, ...]) -> Column:
    vocab_arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(ws, lambda w: F.array_contains(vocab_arr, w)))


def quality_columns(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword quality signals (the standard cheap
    pre-filters of an LLM data pipeline)."""
    ws = words(text)
    n_chars = F.length(text)
    punct = n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    # nullif denominators: an EMPTY document has no defined ratios (NULL),
    # rather than an ANSI divide-by-zero failure of the whole pass
    nz_chars = F.nullif(n_chars, F.lit(0))
    nz_words = F.nullif(F.size(ws), F.lit(0))
    return {
        "n_chars": n_chars,
        "n_tokens": token_count(text),
        "punct_ratio": F.round(punct / nz_chars, 4),
        "stopword_ratio": F.round(_count_in(ws, STOPWORDS) / nz_words, 4),
        "mean_word_len": F.round(
            (n_chars - F.size(ws) + 1) / nz_words, 4
        ),  # chars minus separators over words
    }


def lang_scores(text: Column) -> dict[str, Column]:
    ws = words(text)
    return {lang: _count_in(ws, LANG_MARKERS[lang]) for lang in LANG_ORDER}


def predict_lang(text: Column) -> Column:
    """Marker-word language ID with fixed-precedence argmax — deterministic
    and expressible identically in SQL (chained CASE)."""
    s = lang_scores(text)
    expr = None
    checked: list[str] = []
    for lang in LANG_ORDER[:-1]:
        rest = [o for o in LANG_ORDER if o != lang]
        cond = None
        for o in rest:
            c = s[lang] >= s[o]
            cond = c if cond is None else (cond & c)
        expr = (
            F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
        )
        checked.append(lang)
    return expr.otherwise(F.lit(LANG_ORDER[-1]))


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the lowercased text. Identical hex output
    in every engine; the basis for exact near-canonical dedup."""
    return F.md5(F.lower(text))


def simhash_bits(ws: Column, n_bits: int = 64) -> Column:
    """SimHash over the word multiset: per-document locality-sensitive
    fingerprint where near-identical texts differ in few bits.

    Hash family (one md5 per word serves up to 64 bits): bit_i for
    i < 32 is the TOP bit of md5 hex digit i+1 (value ≥ 8); bit_i for
    i ≥ 32 is the SECOND bit of hex digit i-31 (value & 4, i.e. digit in
    {4,5,6,7,c,d,e,f}). The document bit is the sign of the +1/−1 vote
    sum over its words. Emitted as a '0'/'1' string (byte-identical
    across engines; no 64-bit signed/unsigned divergence to worry
    about).

    WIDTH MATTERS AT SCALE (NOTES r6): same-distribution documents have
    strongly biased simhash bits, so the mean pairwise distance sits at
    only ~27% of the width — at 32 bits a hamming ≤ 6 dedup threshold
    captured 29% of ALL doc pairs (measured; ~360M "near-dup" pairs at
    10× bench scale), while at 64 bits the same threshold is a ~1e-4
    left-tail. 64 is the default; 32 remains available for
    compatibility experiments.

    Plan shape: ONE md5 per word (staged), then n_bits cheap aggregate()
    folds over the hashed array — map-only, no shuffle.
    """
    hashed = F.transform(ws, lambda w: F.md5(w))

    def vote(i: int) -> Column:
        if i < 32:
            pos, digits = i + 1, "89abcdef"
        else:
            pos, digits = i - 31, "4567cdef"
        return F.aggregate(
            hashed,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.substring(h, pos, 1).isin(*digits), F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )

    return F.concat(
        *[F.when(vote(i) >= 0, F.lit("1")).otherwise(F.lit("0")) for i in range(n_bits)]
    )


def simhash_docs(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 64,
    factorize: bool | None = None,
):
    """(id, simhash) over space-split lowercased words, with the bits
    computed once per distinct word MULTISET when the corpus is
    clone-heavy (adaptive — same measured distinct-set decision and
    session cache as the minhash family).

    The simhash is a pure function of the word multiset: the per-bit
    vote is a commutative ±1 sum over words, so word-shuffled clones
    share the fingerprint bit-for-bit. At 100× bench scale 500k docs
    hold only ~5k distinct multisets, and the 64 vote folds — measured
    ~80s of dedup_simhash's sf10 wall (r8 profile; a bare count() hid
    it behind column pruning) — run ~100× fewer times; docs join their
    group's fingerprint back by the multiset key. Distinct corpora keep
    the map-only direct path (no shuffle — the factorized path pays a
    groupBy+join of the word arrays, which only the fold savings can
    justify). Output is identical either way; the dedup_simhash oracle
    (registry) factorizes with the same algebra.

    The multiset key reuses the injective sorted length-prefixed
    encoding of the factorized dedup paths (_exact_set_key — it never
    deduplicates, so on a sorted-with-duplicates array it keys the
    multiset exactly)."""
    from ..sources.tables import spread
    from .dedup import _exact_set_key, _set_factorize_decision

    w = spread(df).select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("ws")
    )
    if factorize is None:
        # decision statistic on word SETS — byte-compatible with the
        # minhash n=1 cache entry (unigram shingle sets ARE word sets),
        # so a corpus measured by either family never re-pays the pass.
        # Set ratio lower-bounds multiset ratio: at the 0.5 cutoff a
        # factorize=True call is at worst break-even, never wrong.
        staged = w.select(F.col(id_col), F.array_distinct("ws").alias("wset"))
        factorize = _set_factorize_decision(df, staged, "wset", 1, text_col)
    if not factorize:
        return w.select(
            F.col(id_col), simhash_bits(F.col("ws"), n_bits).alias("simhash")
        )
    keyed = w.withColumn("__k", _exact_set_key(F.col("ws")))
    groups = keyed.groupBy("__k").agg(F.first("ws").alias("ws"))
    bits = groups.select(
        "__k", simhash_bits(F.col("ws"), n_bits).alias("simhash")
    )
    return keyed.join(bits, "__k").select(F.col(id_col), "simhash")


def hamming_bits(a: Column, b: Column, n_bits: int = 32) -> Column:
    """Hamming distance between two equal-length '0'/'1' strings."""
    return F.size(
        F.filter(
            F.zip_with(F.split(a, ""), F.split(b, ""), lambda x, y: x != y),
            lambda d: d,
        )
    )


# ---------------------------------------------------------------------------
# Gopher/C4-style rule filter (shared by the quality_rules registry entry
# and the streaming admission quality gate).
# ---------------------------------------------------------------------------

# (lo, hi) word-count band, mean-word-length band, stopword floor, top-word cap
RULE_WORD_COUNT = (20, 1000)
RULE_MEAN_WORD_LEN = (3, 6)
RULE_MIN_STOPWORDS = 2
RULE_TOP_WORD_CAP = 0.15


def quality_rule_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document rule inputs from ONE token-level pipeline (explode →
    (doc, token) counts → per-doc aggregate): two hash shuffles total, no
    matter how many rules consume the metrics. Metrics are rounded so the
    derived booleans are bit-identical across engines."""
    toks = docs.select(id_col, F.explode(words(F.col(text_col))).alias("tok"))
    c = toks.groupBy(id_col, "tok").agg(F.count("*").alias("n"))
    return c.groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_words"),
        F.round(F.sum(F.length("tok") * F.col("n")) / F.sum("n"), 4).alias(
            "mean_word_len"
        ),
        F.coalesce(F.sum(F.when(F.col("tok").isin(*STOPWORDS), F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_stopwords"),
        F.round(F.max("n") / F.sum("n"), 4).alias("top_word_fraction"),
    )


def quality_rule_flags(metrics: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Named per-rule booleans + the conjunctive ``passes`` verdict."""
    ok_wc = F.col("n_words").between(*RULE_WORD_COUNT)
    ok_mwl = F.col("mean_word_len").between(*RULE_MEAN_WORD_LEN)
    ok_stop = F.col("n_stopwords") >= RULE_MIN_STOPWORDS
    ok_top = F.col("top_word_fraction") <= RULE_TOP_WORD_CAP
    return metrics.select(
        id_col,
        "n_words",
        "mean_word_len",
        "n_stopwords",
        "top_word_fraction",
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_stop.alias("ok_stopwords"),
        ok_top.alias("ok_top_word"),
        (ok_wc & ok_mwl & ok_stop & ok_top).alias("passes"),
    )


def filter_quality(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep only documents passing every rule — the admission-gate form
    (semi join against the passing ids; per micro-batch the metrics frame
    is batch-sized, so the join is broadcast-cheap)."""
    passing = (
        quality_rule_flags(quality_rule_metrics(docs, id_col, text_col), id_col)
        .filter("passes")
        .select(id_col)
    )
    return docs.join(passing, id_col, "left_semi")


# ---------------------------------------------------------------------------
# WordPiece-style subword tokenization (greedy longest-match over a
# corpus-derived vocab) — the "real tokenizer" token-counting pass.
# ---------------------------------------------------------------------------


def wordpiece_vocab(
    docs: DataFrame, top_k: int = 20, text_col: str = "text"
) -> "set[str]":
    """Deterministic subword vocab from the corpus itself: the top_k most
    frequent whole words (count desc, word asc tie-break) + every single
    character observed, in both word-initial and '##'-continuation form —
    the minimal WordPiece-shaped vocab that can encode any in-alphabet
    word. Two small aggregates; the collected vocab is O(top_k + alphabet)
    and ships in the encode closure."""
    ws = words(F.col(text_col))
    top = (
        docs.select(F.explode(ws).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"), "w")
        .limit(top_k)
        .collect()
    )
    chars = (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), "")).alias("c"))
        # split('', -1) keeps a trailing '' element; without the filter the
        # returned vocab carries latent '' / '##' noise entries
        .filter((F.col("c") != " ") & (F.col("c") != ""))
        .distinct()
        .collect()
    )
    cs = {r.c for r in chars}
    return {r.w for r in top} | cs | {"##" + c for c in cs}


def wordpiece_encode_word(w: str, vocab: "set[str]") -> "list[str]":
    """Greedy longest-match WordPiece encode of ONE word: the longest
    vocab prefix, then longest '##'-continuations; a position with no
    match (character outside the vocab alphabet) collapses the whole word
    to ['[UNK]'] — standard WordPiece semantics."""
    out: list[str] = []
    i, first = 0, True
    while i < len(w):
        j = len(w)
        while j > i:
            piece = w[i:j] if first else "##" + w[i:j]
            if piece in vocab:
                out.append(piece)
                break
            j -= 1
        else:
            return ["[UNK]"]
        i, first = j, False
    return out


def wordpiece_stats(
    docs: DataFrame,
    vocab: "set[str]",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document subword statistics under greedy WordPiece: word count,
    subword count, [UNK] words, and the fertility ratio
    (subwords per word — THE quantity a training-data pipeline budgets
    by, since sequence length is subwords, not words).

    Arrow-batched mapInPandas: the vocab set rides the closure (a few KB
    broadcast with the task), encoding is pure per-row Python over the
    batch — embarrassingly parallel, no shuffle; the fertility math is
    exact, not estimated. Null text → zero counts with NULL ratio (the
    dirty-input contract)."""
    from collections.abc import Iterator

    import pandas as pd

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    rows.append(
                        {"doc_id": int(did), "n_words": 0, "n_subwords": 0,
                         "n_unk_words": 0, "fertility": None}
                    )
                    continue
                toks = [w for w in text.lower().split(" ") if w]
                n_sub = n_unk = 0
                for w in toks:
                    enc = wordpiece_encode_word(w, vocab)
                    n_sub += len(enc)
                    n_unk += enc == ["[UNK]"]
                rows.append(
                    {
                        "doc_id": int(did),
                        "n_words": len(toks),
                        "n_subwords": n_sub,
                        "n_unk_words": n_unk,
                        "fertility": round(n_sub / len(toks), 4) if toks else None,
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select(id_col, text_col).mapInPandas(
        gen,
        "doc_id long, n_words long, n_subwords long, n_unk_words long, fertility double",
    )
