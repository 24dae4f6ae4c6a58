"""Semantic invariants for the round-4 operators — beyond the oracle parity
that test_registry_oracle.py already enforces for every registered entry.

  * cdc_scd2: interval chaining, single current version per key, agreement
    with cdc_snapshot, correct close-on-delete; also exercised over the
    seeded Debezium envelope workload (the reference's actual input shape).
  * dedup_spans: planted exact duplicates score dup_fraction 1.0, a
    vocabulary-disjoint document scores 0.0.
  * unigram_logprob: rare-token documents must score strictly higher than
    common-token documents (the filter's reason to exist).
  * quality_rules: booleans are exactly the thresholds applied to the
    reported (rounded) metrics, and the smoke corpus has both outcomes.
  * embedding_dim_stats: one row per dimension, n = corpus size.
"""

import pandas as pd
import pytest

from simple_cdc_service_spark.registry import REGISTRY

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# cdc_scd2
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def scd2_df(spark):
    return REGISTRY["cdc_scd2"].fn(spark, SF).toPandas()


def test_scd2_intervals_chain_per_key(scd2_df):
    """Within a key, versions ordered by valid_from must tile: each
    version's valid_to equals the next version's valid_from UNLESS the
    version was closed by a delete (then the next version opens later)."""
    for _, g in scd2_df.groupby("user_id"):
        g = g.sort_values("valid_from")
        froms = g["valid_from"].tolist()
        tos = g["valid_to"].tolist()
        for i in range(len(g) - 1):
            assert tos[i] is not None and not pd.isna(tos[i])
            # closed no later than the next version opens (equality when the
            # closer was the next version itself; earlier when a delete
            # intervened)
            assert tos[i] <= froms[i + 1]
        # intervals never overlap
        for i in range(len(g) - 1):
            assert froms[i + 1] >= tos[i]


def test_scd2_one_current_per_key(scd2_df):
    cur = scd2_df[scd2_df["is_current"]]
    assert cur["user_id"].is_unique


def test_scd2_current_matches_snapshot(spark, scd2_df):
    """The open versions ARE the replica: same keys, same values as
    cdc_snapshot (whose oracle parity is already proven)."""
    snap = REGISTRY["cdc_snapshot"].fn(spark, SF).toPandas()
    cur = scd2_df[scd2_df["is_current"]][["user_id", "last_value"]]
    a = cur.sort_values(["user_id"]).reset_index(drop=True)
    b = snap[["user_id", "last_value"]].sort_values(["user_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_scd2_from_envelopes_matches_expected_state(spark):
    """SCD2 over the seeded Debezium workload: the current versions must
    equal the python-side expected replica state, and every closed version
    must have been superseded or deleted."""
    from simple_cdc_service_spark.config import USER_VALUE as _  # noqa: F401
    from simple_cdc_service_spark.config import ChangeTableConfig
    from simple_cdc_service_spark.operators.cdc import scd2_history
    from simple_cdc_service_spark.sources.changelog import (
        envelopes_df,
        generate_envelopes,
        parse_envelopes,
    )
    from simple_cdc_service_spark.operators.cdc import envelope_changelog

    msgs, expected = generate_envelopes(n=400, seed=7, truncate_every=150)
    cfg = ChangeTableConfig(
        name="invoice",
        key_columns=("order_id",),
        value_columns=("invoice_number",),
    )
    ch = envelope_changelog(parse_envelopes(envelopes_df(spark, msgs)), cfg)
    hist = scd2_history(
        ch, key_cols=("order_id",), value_cols=("invoice_number",), order_col="offset"
    ).toPandas()
    cur = hist[hist["is_current"]]
    got = dict(zip(cur["order_id"], cur["invoice_number"]))
    assert got == expected
    # closed versions all predate their key's current version (if any)
    closed = hist[~hist["is_current"]]
    cur_from = dict(zip(cur["order_id"], cur["valid_from"]))
    for _, r in closed.iterrows():
        if r["order_id"] in cur_from:
            assert r["valid_from"] < cur_from[r["order_id"]]


# ---------------------------------------------------------------------------
# dedup_spans
# ---------------------------------------------------------------------------


def test_dedup_spans_planted_duplicates(spark, tmp_path):
    """Two identical 12-word docs → every span duplicated (fraction 1.0);
    a vocabulary-disjoint doc → fraction 0.0; a doc sharing only its first
    8-word span with the twins → exactly one duplicated position."""
    twelve = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    partial = "alpha beta gamma delta epsilon zeta eta theta onlyhere unique tokens"
    other = "one two three four five six seven eight nine ten eleven twelve"
    rows = [(1, twelve), (2, twelve), (3, partial), (4, other)]
    df = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'src0' AS source", "length(text) AS n_chars"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = REGISTRY["dedup_spans"].fn(spark, str(tmp_path)).toPandas()
    by_id = out.set_index("doc_id")
    assert by_id.loc[1, "dup_fraction"] == 1.0
    assert by_id.loc[2, "dup_fraction"] == 1.0
    assert by_id.loc[3, "n_dup_spans"] == 1  # only the shared leading span
    assert by_id.loc[4, "dup_fraction"] == 0.0


def test_dedup_spans_positions_not_distinct(spark, tmp_path):
    """A doc that repeats the same 8-gram at two positions counts BOTH
    positions (the position-level semantics that separates this from the
    distinct-shingle MinHash family). Repetition is internal only, so
    nothing is cross-document duplicated."""
    rep = "a b c d e f g h a b c d e f g h"  # 16 words, span 'a..h' at pos 0 and 8
    df = spark.createDataFrame([(1, rep)], "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'src0' AS source", "length(text) AS n_chars"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = REGISTRY["dedup_spans"].fn(spark, str(tmp_path)).toPandas()
    assert out.loc[0, "n_spans"] == 9  # 16 - 8 + 1 positions
    assert out.loc[0, "n_dup_spans"] == 0  # within-doc repetition ≠ cross-doc dup


def test_scd2_asof_equals_prefix_collapse(spark):
    """The SCD2-interval formulation of time travel must give the exact
    state the changelog prefix-collapse gives at the same cutoff — the
    history table is a lossless index of the changelog."""
    from pyspark.sql import functions as F

    from simple_cdc_service_spark.config import USER_VALUE
    from simple_cdc_service_spark.operators import cdc
    from simple_cdc_service_spark.registry import _changelog

    got = REGISTRY["cdc_scd2_asof"].fn(spark, SF).toPandas()

    ch = _changelog(spark, SF)
    row = (
        ch.agg(
            F.coalesce(
                F.max(F.when(F.col("op") == "t", F.col("ev_offset"))), F.lit(-1)
            ).alias("t_off"),
            F.max("ev_offset").alias("m"),
        ).collect()[0]
    )
    cutoff = (row.t_off + row.m) // 2
    prefix = ch.filter(F.col("ev_offset") <= cutoff)
    want = cdc.collapse_changelog(prefix, USER_VALUE).toPandas()
    a = got.sort_values(["user_id"]).reset_index(drop=True)
    b = want[["user_id", "last_value"]].sort_values(["user_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_dedup_spans_cut_planted(spark, tmp_path):
    """Identical twin docs are cut to nothing; a unique doc survives
    verbatim (lowercased); a doc sharing only its leading 8-word span
    loses exactly those 8 tokens and keeps the rest."""
    twelve = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    partial = "alpha beta gamma delta epsilon zeta eta theta onlyhere unique tokens"
    other = "One Two three four five six seven eight nine ten eleven twelve"
    rows = [(1, twelve), (2, twelve), (3, partial), (4, other)]
    df = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'src0' AS source", "length(text) AS n_chars"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = REGISTRY["dedup_spans_cut"].fn(spark, str(tmp_path)).toPandas()
    by_id = out.set_index("doc_id")
    assert by_id.loc[1, "cleaned_text"] == "" and by_id.loc[1, "n_removed"] == 12
    assert by_id.loc[2, "cleaned_text"] == ""
    # twins cover positions 0..11 of the shared prefix in doc 3? no — doc 3
    # shares only the span starting at position 0 (8 tokens); the spans at
    # positions 1..3 differ (they include 'onlyhere'), so exactly 8 cut
    assert by_id.loc[3, "n_removed"] == 8
    assert by_id.loc[3, "cleaned_text"] == "onlyhere unique tokens"
    assert by_id.loc[4, "n_removed"] == 0
    assert by_id.loc[4, "cleaned_text"] == other.lower()


def test_dedup_spans_cut_internal_consistency(spark):
    """On the real corpus: n_removed + tokens(cleaned_text) == n_tokens
    for every doc, and the cut agrees with dedup_spans' verdict on who is
    touched (n_removed > 0 ⇔ n_dup_spans > 0)."""
    cut = REGISTRY["dedup_spans_cut"].fn(spark, SF).toPandas()
    kept_toks = cut["cleaned_text"].map(lambda t: len(t.split()) if t else 0)
    assert ((cut["n_removed"] + kept_toks) == cut["n_tokens"]).all()
    spans = REGISTRY["dedup_spans"].fn(spark, SF).toPandas()
    touched_cut = set(cut[cut["n_removed"] > 0]["doc_id"])
    touched_spans = set(spans[spans["n_dup_spans"] > 0]["doc_id"])
    assert touched_cut == touched_spans


# ---------------------------------------------------------------------------
# unigram_logprob
# ---------------------------------------------------------------------------


def test_unigram_rare_tokens_score_higher(spark, tmp_path):
    """Corpus: 'common' appears 40×, each rare token once. The all-rare doc
    must carry a strictly higher mean negative log-prob than the all-common
    doc — i.e. the filter orders documents the way a perplexity filter
    would."""
    rows = [(i, "common common common common") for i in range(10)]
    rows.append((100, "rareone raretwo rarethree rarefour"))
    df = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'src0' AS source", "length(text) AS n_chars"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = REGISTRY["unigram_logprob"].fn(spark, str(tmp_path)).toPandas()
    by_id = out.set_index("doc_id")
    assert by_id.loc[100, "avg_neg_logp"] > by_id.loc[0, "avg_neg_logp"]
    assert (out["n_tokens"] == 4).all()


def test_bigram_is_order_sensitive_where_unigram_is_not(spark, tmp_path):
    """Two documents with IDENTICAL token histograms: one a repetitive
    (predictable) sequence, one scrambled. The unigram scorer must tie
    them exactly; the bigram scorer must score the repetitive one lower —
    the order sensitivity that makes a transition model worth its extra
    join."""
    rep = "red blue red blue red blue red blue red blue"
    scr = "red red blue blue red blue blue red red blue"
    rows = [(1, rep), (2, scr)]
    # pad the corpus so the model isn't trained only on the two probes
    rows += [(10 + i, "green yellow green yellow green") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'src0' AS source", "length(text) AS n_chars"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    uni = REGISTRY["unigram_logprob"].fn(spark, str(tmp_path)).toPandas().set_index("doc_id")
    bi = REGISTRY["bigram_logprob"].fn(spark, str(tmp_path)).toPandas().set_index("doc_id")
    assert uni.loc[1, "avg_neg_logp"] == uni.loc[2, "avg_neg_logp"]
    assert bi.loc[1, "avg_neg_logp"] < bi.loc[2, "avg_neg_logp"]


# ---------------------------------------------------------------------------
# quality_rules
# ---------------------------------------------------------------------------


def test_quality_rules_flags_consistent_and_mixed(spark):
    out = REGISTRY["quality_rules"].fn(spark, SF).toPandas()
    assert out["ok_word_count"].equals(out["n_words"].between(20, 1000))
    assert out["ok_mean_word_len"].equals(out["mean_word_len"].between(3, 6))
    assert out["ok_stopwords"].equals(out["n_stopwords"] >= 2)
    assert out["ok_top_word"].equals(out["top_word_fraction"] <= 0.15)
    assert out["passes"].equals(
        out["ok_word_count"]
        & out["ok_mean_word_len"]
        & out["ok_stopwords"]
        & out["ok_top_word"]
    )
    # the rule set discriminates on the real corpus: both outcomes present
    assert out["passes"].any() and (~out["passes"]).any()


# ---------------------------------------------------------------------------
# knn_filtered
# ---------------------------------------------------------------------------


def test_knn_filtered_prefilter_beats_postfilter(spark):
    """Every neighbor shares its query's label, every query gets a FULL k
    (pre-filter semantics), and post-filtering the unfiltered top-k would
    under-fill — the defect the operator exists to avoid."""
    got = REGISTRY["knn_filtered"].fn(spark, SF).toPandas()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    labels = dict(zip(emb["vec_id"], emb["label"]))
    # label agreement
    assert all(labels[q] == l for q, l in zip(got["query_id"], got["label"]))
    # full k per query (corpus has >= k matching vectors per label here)
    per_q = got.groupby("query_id").size()
    assert (per_q == 10).all()
    # post-filter comparison: unfiltered global top-10 restricted to the
    # query's label keeps FEWER than 10 for at least one query
    unf = REGISTRY["knn_bruteforce"].fn(spark, SF).toPandas()
    post = unf[[labels[q] == labels[n] for q, n in zip(unf["query_id"], unf["neighbor_id"])]]
    assert (post.groupby("query_id").size() < 10).any()


# ---------------------------------------------------------------------------
# embedding_dim_stats
# ---------------------------------------------------------------------------


def test_embedding_dim_stats_shape(spark):
    out = REGISTRY["embedding_dim_stats"].fn(spark, SF).toPandas()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sorted(out["dim"]) == list(range(1, len(out) + 1))
    assert (out["n"] == n_vecs).all()
    assert (out["min_x"] <= out["mean_x"]).all() and (out["mean_x"] <= out["max_x"]).all()


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def test_chunk_documents_overlap_and_reconstruction(spark):
    """Chunking invariants: (1) consecutive chunks overlap by exactly
    window - stride tokens; (2) concatenating each chunk's first `stride`
    tokens (all of the last chunk) rebuilds the full tokenized document;
    (3) every chunk has exactly min(window, n - start) tokens — with
    window > stride the final SEVERAL chunks may run short, not just the
    last one."""
    W, S = 40, 30
    got = REGISTRY["chunk_documents"].fn(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    full = {r.doc_id: r.text.lower().split(" ") for r in docs.itertuples()}
    for doc_id, g in got.groupby("doc_id"):
        g = g.sort_values("chunk_id")
        toks = [c.split(" ") if c else [""] for c in g["chunk_text"]]
        n = len(full[doc_id])
        # chunk ids are dense from 0, covering every stride start
        assert g["chunk_id"].tolist() == list(range((n - 1) // S + 1))
        # token counts: exactly min(window, remaining-from-start)
        assert g["n_chunk_tokens"].tolist() == [
            min(W, n - i * S) for i in g["chunk_id"]
        ]
        assert [len(t) for t in toks] == g["n_chunk_tokens"].tolist()
        # overlap: chunk i's last W-S tokens == chunk i+1's first W-S tokens
        for a, b in zip(toks, toks[1:]):
            assert a[S:] == b[: len(a) - S]
        # reconstruction from stride-prefixes + full tail
        rebuilt = [t for c in toks[:-1] for t in c[:S]] + toks[-1]
        assert rebuilt == full[doc_id]


# ---------------------------------------------------------------------------
# interval_join_bucketed
# ---------------------------------------------------------------------------


def test_interval_join_bucketed_matches_naive_theta_join(spark):
    """The bucketed equi-join must produce each qualifying (point,
    interval) pair EXACTLY once — cross-checked against the naive
    pandas theta join, including windows that straddle a bucket
    boundary (bucket width == window width guarantees most do)."""
    got = REGISTRY["interval_join_bucketed"].fn(spark, SF).toPandas()
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    import pandas as pd

    ts_ms = (ev["ts"].astype("int64") // 10**6).astype("int64")
    e = pd.DataFrame(
        {"ts_ms": ts_ms, "user_id": ev["user_id"],
         "cents": (ev["value"] * 100).round().astype("int64"),
         "event_type": ev["event_type"], "event_id": ev["event_id"]}
    )
    inc = e[e["event_type"] == "error"]
    rows = []
    for r in inc.itertuples():
        m = e[(e["ts_ms"] >= r.ts_ms) & (e["ts_ms"] < r.ts_ms + 600_000)]
        rows.append((r.event_id, r.ts_ms, len(m), m["user_id"].nunique(),
                     int(m["cents"].sum())))
    want = pd.DataFrame(rows, columns=[
        "incident_id", "incident_start_ms", "n_events", "n_users", "sum_cents"])
    key = ["incident_id"]
    a = got.sort_values(key).reset_index(drop=True)
    b = want.sort_values(key).reset_index(drop=True)
    assert a.astype(str).equals(b[a.columns].astype(str))


# ---------------------------------------------------------------------------
# user_event_sequences
# ---------------------------------------------------------------------------


def test_user_event_sequences_length_and_order(spark):
    """seq has exactly n_events tokens, and per user the sequence follows
    event-time order (spot-checked against a pandas sort)."""
    got = REGISTRY["user_event_sequences"].fn(spark, SF).toPandas()
    assert (got["seq"].str.split(" ").str.len() == got["n_events"]).all()
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    u = got.iloc[0]["user_id"]
    mine = ev[ev["user_id"] == u].sort_values(["ts", "event_id"])
    assert " ".join(mine["event_type"]) == got.set_index("user_id").loc[u, "seq"]




# ---------------------------------------------------------------------------
# ewma_decay
# ---------------------------------------------------------------------------


def test_ewma_decay_matches_direct_computation(spark):
    """The log-domain windowed-sum formulation must equal the textbook
    O(n^2) direct sum Σ v_i·exp(-(t-t_i)/tau) for every event of a
    sampled user, and decay must actually decay: an event's weight in a
    much-later EWMA is negligible."""
    import numpy as np

    got = REGISTRY["ewma_decay"].fn(spark, SF).toPandas()
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["ts_ms"] = ev["ts"].astype("int64") // 10**6
    tau = 86_400_000.0
    u = got["user_id"].iloc[0]
    mine = ev[ev["user_id"] == u].sort_values(["ts_ms", "event_id"])
    ref = []
    for i in range(len(mine)):
        t = mine["ts_ms"].iloc[i]
        ref.append(
            sum(
                v * np.exp(-(t - ti) / tau)
                for ti, v in zip(mine["ts_ms"].iloc[: i + 1], mine["value"].iloc[: i + 1])
            )
        )
    g = got[got["user_id"] == u].sort_values(["ts_ms", "event_id"])
    assert np.allclose(g["ewma_value"].values, ref, atol=2e-4)
    # decay: value from >20 tau ago contributes < 1e-8 of its magnitude
    assert np.exp(-20) < 1e-8
