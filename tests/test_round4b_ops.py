"""Semantic invariants for the block-6 analytics/curation operators —
beyond the oracle parity test_registry_oracle.py enforces for every entry.

  * funnel_conversion: the fold-based funnel must equal a driver-side
    sequential replay on a hand-built event set (ordering semantics), and
    stage counts must be monotonically non-increasing.
  * per_source_cap: cap respected per source; selection is a pure function
    of doc_id (stable under corpus growth for surviving docs).
  * keyword_search: planted conjunctive hit found; a doc missing one term
    is excluded.
  * text_normalize: idempotent, and never longer than the input.
  * histogram_tokens: bucket counts sum to the corpus size.
  * ngram_top: counts are descending with deterministic gram tiebreak.
"""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from simple_cdc_service_spark.registry import REGISTRY

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# funnel_conversion
# ---------------------------------------------------------------------------


def _funnel_replay(events):
    """Driver-side sequential oracle: events = [(user, ts_ms, type)]."""
    stages = ("signup", "view", "click", "purchase")
    per_user = {}
    for u, ts, ty in sorted(events):
        slots = per_user.setdefault(u, [None, None, None, None])
        for k, st in enumerate(stages):
            if ty != st or slots[k] is not None:
                continue
            if k == 0 or (slots[k - 1] is not None and ts > slots[k - 1]):
                slots[k] = ts
            break
    counts = [0, 0, 0, 0]
    for slots in per_user.values():
        for k in range(4):
            counts[k] += slots[k] is not None
    return counts


def test_funnel_matches_sequential_replay(spark, tmp_path):
    # user 1: full ordered funnel; user 2: purchase BEFORE click (stops at
    # click); user 3: view only (no signup -> counts nowhere); user 4:
    # signup+view at the SAME ms (strictly-after -> view not counted).
    rows = [
        (1, 10, "signup"), (1, 20, "view"), (1, 30, "click"), (1, 40, "purchase"),
        (2, 10, "signup"), (2, 20, "view"), (2, 25, "purchase"), (2, 30, "click"),
        (3, 10, "view"), (3, 20, "click"),
        (4, 10, "signup"), (4, 10, "view"),
    ]
    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [pd.Timestamp(ts, unit="ms") for _, ts, _ in rows],
            "user_id": [u for u, _, _ in rows],
            "event_type": [ty for _, _, ty in rows],
            "value": 1.0,
            "props": "{}",
        }
    )
    # single parquet FILE (load_events sniffs the footer with pyarrow)
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    out = (
        REGISTRY["funnel_conversion"]
        .fn(spark, str(tmp_path))
        .collect()[0]
        .asDict()
    )
    exp = _funnel_replay([(u, ts, ty) for u, ts, ty in rows])
    got = [out["n_signup"], out["n_view"], out["n_click"], out["n_purchase"]]
    assert got == exp == [3, 2, 2, 1]


def test_funnel_stage_counts_monotone(spark):
    out = REGISTRY["funnel_conversion"].fn(spark, SF).collect()[0]
    assert out.n_signup >= out.n_view >= out.n_click >= out.n_purchase >= 0


# ---------------------------------------------------------------------------
# per_source_cap
# ---------------------------------------------------------------------------


def test_per_source_cap_respects_cap(spark):
    pdf = REGISTRY["per_source_cap"].fn(spark, SF).toPandas()
    assert (pdf.groupby("source").size() <= 10).all()
    assert (pdf["sample_rank"] >= 1).all() and (pdf["sample_rank"] <= 10).all()


def test_per_source_cap_stable_under_growth(spark, tmp_path):
    """A surviving doc's selection must not depend on later-added docs with
    LARGER hash order — the quota property that makes re-runs append-only.
    (Docs hashing below existing survivors can displace them; that is the
    contract, same as train_val_split's.)"""
    docs = REGISTRY["per_source_cap"].fn(spark, SF).toPandas()
    # re-run over a corpus with half the docs removed: survivors from the
    # kept half must keep their relative order
    full = docs.sort_values(["source", "sample_rank"])
    kept_ids = set(
        pd.read_parquet(f"{SF}/documents.parquet")
        .query("doc_id % 2 == 0")["doc_id"]
    )
    sub = full[full["doc_id"].isin(kept_ids)]
    for _, g in sub.groupby("source"):
        assert g["sample_rank"].is_monotonic_increasing


# ---------------------------------------------------------------------------
# keyword_search
# ---------------------------------------------------------------------------


def test_keyword_search_conjunctive(spark, tmp_path):
    docs = [
        (0, "spark does merge with a window frame", "s", "x", 1),
        (1, "spark merge only", "s", "x", 1),  # missing 'window'
        (2, "window spark", "s", "x", 1),  # missing 'merge'
        (3, "merge window spark merge spark", "s", "x", 1),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = sorted(
        r.doc_id
        for r in REGISTRY["keyword_search"].fn(spark, str(tmp_path)).collect()
    )
    assert got == [0, 3]


# ---------------------------------------------------------------------------
# text_normalize
# ---------------------------------------------------------------------------


def test_text_normalize_idempotent_and_shrinking(spark):
    df = REGISTRY["text_normalize"].fn(spark, SF)
    renorm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("norm_text")), "[\\x00-\\x1f]", " "),
            "\\s+",
            " ",
        )
    )
    bad = df.filter(
        (renorm != F.col("norm_text")) | (F.col("n_chars_norm") > F.col("n_chars_raw"))
    )
    assert bad.limit(1).count() == 0


# ---------------------------------------------------------------------------
# histogram_tokens / ngram_top / corpus_stats
# ---------------------------------------------------------------------------


def test_histogram_counts_sum_to_corpus(spark):
    pdf = REGISTRY["histogram_tokens"].fn(spark, SF).toPandas()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert int(pdf["n_docs"].sum()) == n_docs
    assert set(pdf["token_bucket_lo"]) <= {i * 10 for i in range(20)}


def test_ngram_top_ordering(spark):
    rows = REGISTRY["ngram_top"].fn(spark, SF).collect()
    assert len(rows) == 50
    for a, b in zip(rows, rows[1:]):
        assert (a.n_occurrences, b.gram) >= (b.n_occurrences, a.gram) or (
            a.n_occurrences > b.n_occurrences
        )
        # primary key: count descending; secondary: gram ascending on ties
        assert a.n_occurrences >= b.n_occurrences
        if a.n_occurrences == b.n_occurrences:
            assert a.gram < b.gram


def test_corpus_stats_consistent(spark):
    pdf = REGISTRY["corpus_stats"].fn(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert int(pdf["n_docs"].sum()) == len(docs)
    assert (pdf["n_unique_texts"] <= pdf["n_docs"]).all()
    assert (pdf["n_sources"] >= 1).all()


# ---------------------------------------------------------------------------
# block 7: domain_reweight / shard_plan / retrieval_mrr / props_profile
# ---------------------------------------------------------------------------


def test_shard_plan_matches_naive_global_cumsum(spark):
    """The hierarchical (segment-offset + within-segment) prefix sum must
    equal the single-partition global cumsum it replaces."""
    pdf = (
        REGISTRY["shard_plan"].fn(spark, SF).toPandas().sort_values("shard_id")
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet").sort_values("doc_id")
    n_tok = docs["text"].str.lower().str.split(" ").str.len()
    before = n_tok.cumsum().shift(fill_value=0)
    naive = (
        pd.DataFrame(
            {"doc_id": docs["doc_id"].values, "n": n_tok.values,
             "shard_id": (before // 5000).values}
        )
        .groupby("shard_id")
        .agg(n_docs=("n", "size"), n_tokens=("n", "sum"),
             first_doc_id=("doc_id", "min"), last_doc_id=("doc_id", "max"))
        .reset_index()
    )
    got = pdf.reset_index(drop=True).astype("int64")
    exp = naive.astype("int64")
    pd.testing.assert_frame_equal(
        got[["shard_id", "n_docs", "n_tokens", "first_doc_id", "last_doc_id"]], exp
    )


def test_shard_plan_shards_contiguous(spark):
    pdf = REGISTRY["shard_plan"].fn(spark, SF).toPandas().sort_values("shard_id")
    # doc-id ranges of consecutive shards must not overlap
    assert (pdf["last_doc_id"].shift(1).dropna().values
            < pdf["first_doc_id"].iloc[1:].values).all()


def test_retrieval_mrr_bounds(spark):
    r = REGISTRY["retrieval_mrr"].fn(spark, SF).collect()[0]
    assert r.n_queries == 5
    assert 0.0 <= r.mrr <= 1.0
    assert 0.0 <= r.mean_precision_at_10 <= 1.0


def test_domain_reweight_shares(spark):
    pdf = REGISTRY["domain_reweight"].fn(spark, SF).toPandas()
    assert abs(pdf["corpus_share"].sum() - 1.0) < 1e-4
    assert (pdf["weight"] > 0).all()
    # expected counts under the weights preserve total mass ~ target shares
    assert abs(pdf["target_share"].sum() - 1.0) < 1e-9


def test_props_profile_covers_all_events(spark):
    pdf = REGISTRY["props_profile"].fn(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert int(pdf["n_events"].sum()) == ev["props"].notna().sum()


# ---------------------------------------------------------------------------
# block 8: retention_cohorts / event_transitions / dau_rolling
# ---------------------------------------------------------------------------


def test_retention_week0_is_cohort_size(spark):
    pdf = REGISTRY["retention_cohorts"].fn(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    # parquet ts is datetime64[us] -> int64 gives micros; ms = //1000
    ev["ts_ms"] = ev["ts"].astype("int64") // 1000
    W = 604_800_000
    first = ev.groupby("user_id")["ts_ms"].min() // W
    cohort_sizes = (first * W).value_counts()
    week0 = pdf[pdf["week_offset"] == 0].set_index("cohort_week_ms")["n_users"]
    for cohort, size in cohort_sizes.items():
        assert week0[cohort] == size
    # retention can never exceed the cohort size
    m = pdf.merge(week0.rename("c0"), left_on="cohort_week_ms", right_index=True)
    assert (m["n_users"] <= m["c0"]).all()


def test_event_transitions_probabilities_normalize(spark):
    pdf = REGISTRY["event_transitions"].fn(spark, SF).toPandas()
    sums = pdf.groupby("src")["p_transition"].sum()
    assert ((sums - 1.0).abs() < 1e-3).all()
    assert (pdf["n_transitions"] > 0).all()


def test_dau_rolling_wau_bounds(spark):
    pdf = REGISTRY["dau_rolling"].fn(spark, SF).toPandas()
    # WAU covers the day itself -> never below DAU; and never above the sum
    # of the trailing 7 DAUs
    pdf = pdf.sort_values("day_ms").reset_index(drop=True)
    assert (pdf["wau"] >= pdf["dau"]).all()
    D = 86_400_000
    dau_by_day = pdf.set_index(pdf["day_ms"] // D)["dau"]
    for _, r in pdf.iterrows():
        d = r["day_ms"] // D
        cap = sum(dau_by_day.get(d - i, 0) for i in range(7))
        assert r["wau"] <= cap


def test_dau_rolling_hll_agrees_with_exact(spark):
    """The sketch entry's exact column must equal dau_rolling's wau (same
    contribute-forward semantics), and the in-bound boolean must hold on
    every row (the oracle hash-match enforces it too; this keeps the
    property visible if the oracle is ever loosened)."""
    a = REGISTRY["dau_rolling"].fn(spark, SF).toPandas().set_index("day_ms")
    b = REGISTRY["dau_rolling_hll"].fn(spark, SF).toPandas().set_index("day_ms")
    assert (a["wau"].sort_index() == b["wau_exact"].sort_index()).all()
    assert b["hll_in_bound"].all()


# ---------------------------------------------------------------------------
# funnel property test: random event streams vs sequential replay
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_ev = st.tuples(
    st.integers(min_value=1, max_value=5),  # user
    st.integers(min_value=0, max_value=50),  # ts ms
    st.sampled_from(["signup", "view", "click", "purchase", "error"]),
)


@given(st.lists(_ev, max_size=40))
@settings(max_examples=10, deadline=None)
def test_funnel_property_vs_replay(spark, tmp_path_factory, events):
    """Random event streams (duplicate timestamps, shuffled stages, noise
    types): the one-shuffle fold must equal the sequential replay."""
    import uuid

    d = tmp_path_factory.mktemp("funnel") / uuid.uuid4().hex
    d.mkdir()
    pdf = pd.DataFrame(
        {
            "event_id": pd.array(range(len(events)), dtype="int64"),
            # explicit datetime64 dtype: an EMPTY object column would land in
            # parquet as unannotated int64, which load_events refuses
            "ts": pd.to_datetime([pd.Timestamp(ts, unit="ms") for _, ts, _ in events]),
            "user_id": pd.array([u for u, _, _ in events], dtype="int64"),
            "event_type": pd.array([ty for _, _, ty in events], dtype=object),
            "value": 1.0,
            "props": "{}",
        }
    )
    pdf.to_parquet(str(d / "events.parquet"))
    out = REGISTRY["funnel_conversion"].fn(spark, str(d)).collect()[0].asDict()
    # replay must see events in (ts, event_id) order — the engine's tiebreak
    ordered = sorted(zip(events, range(len(events))), key=lambda p: (p[0][1], p[1]))
    exp = _funnel_replay_ordered([(u, ts, ty) for (u, ts, ty), _ in ordered])
    got = [out["n_signup"], out["n_view"], out["n_click"], out["n_purchase"]]
    assert got == exp, (events, got, exp)


def _funnel_replay_ordered(events_in_order):
    """Sequential replay over an ALREADY-ORDERED event list."""
    stages = ("signup", "view", "click", "purchase")
    per_user = {}
    for u, ts, ty in events_in_order:
        slots = per_user.setdefault(u, [None, None, None, None])
        for k, s in enumerate(stages):
            if ty != s or slots[k] is not None:
                continue
            if k == 0 or (slots[k - 1] is not None and ts > slots[k - 1]):
                slots[k] = ts
            break
    counts = [0, 0, 0, 0]
    for slots in per_user.values():
        for k in range(4):
            counts[k] += slots[k] is not None
    return counts


# ---------------------------------------------------------------------------
# block 10: cdc_before_image / quality_deciles
# ---------------------------------------------------------------------------


def test_before_image_unique_and_causal(spark):
    pdf = REGISTRY["cdc_before_image"].fn(spark, SF).toPandas()
    assert len(pdf) > 0
    assert pdf["event_offset"].is_unique  # ≤1 pre-image per event
    assert (pdf["before_since_offset"] < pdf["event_offset"]).all()  # causality


def test_before_image_delete_preimage_matches_history(spark):
    """A delete's before image must be the version the delete closed:
    re-derive from the SCD2 history (valid_to == delete offset)."""
    hist = REGISTRY["cdc_scd2"].fn(spark, SF).toPandas()
    img = REGISTRY["cdc_before_image"].fn(spark, SF).toPandas()
    dels = img[img["op"] == "d"]
    closed = hist.dropna(subset=["valid_to"]).set_index(
        ["user_id", "valid_to"]
    )["last_value"]
    for _, r in dels.iterrows():
        assert closed.loc[(r["user_id"], r["event_offset"])] == r["before_value"]


def test_quality_deciles_partition_corpus(spark):
    pdf = (
        REGISTRY["quality_deciles"].fn(spark, SF).toPandas().sort_values("decile")
    )
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert int(pdf["n_docs"].sum()) == n_docs
    assert set(pdf["decile"]) <= set(range(1, 11))
    # value ranges are ordered: bucket assignment is monotone in the score
    assert (
        pdf["max_tokens"].shift(1).dropna().values
        <= pdf["min_tokens"].iloc[1:].values
    ).all()


# ---------------------------------------------------------------------------
# property tests: transitions + retention vs pandas replays
# ---------------------------------------------------------------------------

_rev = st.tuples(
    st.integers(min_value=1, max_value=4),  # user
    st.integers(min_value=0, max_value=20_000_000_000),  # ts ms (~231 days)
    st.sampled_from(["view", "click", "purchase"]),
)


def _write_events(d, events):
    pdf = pd.DataFrame(
        {
            "event_id": pd.array(range(len(events)), dtype="int64"),
            "ts": pd.to_datetime(
                [pd.Timestamp(ts, unit="ms") for _, ts, _ in events]
            ),
            "user_id": pd.array([u for u, _, _ in events], dtype="int64"),
            "event_type": pd.array([ty for _, _, ty in events], dtype=object),
            "value": 1.0,
            "props": "{}",
        }
    )
    pdf.to_parquet(str(d / "events.parquet"))


@given(st.lists(_rev, min_size=1, max_size=30))
@settings(max_examples=8, deadline=None)
def test_event_transitions_property_vs_replay(spark, tmp_path_factory, events):
    import uuid
    from collections import Counter

    d = tmp_path_factory.mktemp("tr") / uuid.uuid4().hex
    d.mkdir()
    _write_events(d, events)
    got = {
        (r.src, r.dst): (r.n_transitions, r.p_transition)
        for r in REGISTRY["event_transitions"].fn(spark, str(d)).collect()
    }
    per_user = {}
    for i, (u, ts, ty) in enumerate(events):
        per_user.setdefault(u, []).append((ts, i, ty))
    pairs = Counter()
    for seq in per_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    src_tot = Counter()
    for (a, _), n in pairs.items():
        src_tot[a] += n
    want = {
        (a, b): (n, round(n / src_tot[a], 6)) for (a, b), n in pairs.items()
    }
    assert got == want, (events, got, want)


@given(st.lists(_rev, min_size=1, max_size=30))
@settings(max_examples=8, deadline=None)
def test_retention_property_vs_replay(spark, tmp_path_factory, events):
    import uuid

    W = 604_800_000
    d = tmp_path_factory.mktemp("ret") / uuid.uuid4().hex
    d.mkdir()
    _write_events(d, events)
    got = {
        (r.cohort_week_ms, r.week_offset): r.n_users
        for r in REGISTRY["retention_cohorts"].fn(spark, str(d)).collect()
    }
    first = {}
    for u, ts, _ in events:
        first[u] = min(first.get(u, ts), ts)
    cells = {}
    seen = set()
    for u, ts, _ in events:
        cohort = (first[u] // W) * W
        off = ts // W - first[u] // W
        if (u, cohort, off) not in seen:
            seen.add((u, cohort, off))
            cells[(cohort, off)] = cells.get((cohort, off), 0) + 1
    assert got == cells, (events, got, cells)


# ---------------------------------------------------------------------------
# tokenize_wordpiece
# ---------------------------------------------------------------------------


def test_wordpiece_golden_encodings():
    from simple_cdc_service_spark.operators.text import wordpiece_encode_word

    vocab = {"the", "scan", "t", "h", "e", "s", "c", "a", "n", "i", "g",
             "##t", "##h", "##e", "##s", "##c", "##a", "##n", "##i", "##g"}
    assert wordpiece_encode_word("the", vocab) == ["the"]
    assert wordpiece_encode_word("scan", vocab) == ["scan"]
    # greedy longest prefix first, then ## continuations
    assert wordpiece_encode_word("scanning", vocab) == [
        "scan", "##n", "##i", "##n", "##g"
    ]
    # out-of-alphabet char collapses the word
    assert wordpiece_encode_word("axe", vocab) == ["[UNK]"]
    assert wordpiece_encode_word("", vocab) == []


def test_wordpiece_roundtrip_and_fertility(spark):
    """Every non-UNK word must reconstruct by stripping '##'; fertility is
    bounded below by 1 and the registry stats must agree with a driver
    recount on a sample."""
    from simple_cdc_service_spark.operators.text import (
        wordpiece_encode_word,
        wordpiece_vocab,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    vocab = wordpiece_vocab(d, top_k=20)
    sample = d.limit(20).collect()
    for r in sample:
        for w in [w for w in r.text.lower().split(" ") if w]:
            enc = wordpiece_encode_word(w, vocab)
            if enc != ["[UNK]"]:
                assert "".join(p.removeprefix("##") for p in enc) == w

    stats = REGISTRY["tokenize_wordpiece"].fn(spark, SF).toPandas()
    ok = stats[stats["n_words"] > 0]
    assert (ok["fertility"] >= 1.0).all()
    assert (ok["n_subwords"] >= ok["n_words"] - ok["n_unk_words"]).all()
    # vocab is small (top-20) so SOME word somewhere must actually split
    assert (ok["fertility"] > 1.0).any()


def test_wordpiece_deterministic(spark):
    a = (
        REGISTRY["tokenize_wordpiece"].fn(spark, SF)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        REGISTRY["tokenize_wordpiece"].fn(spark, SF)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_dedup_cluster_stats_partitions_corpus(spark):
    pdf = REGISTRY["dedup_cluster_stats"].fn(spark, SF).toPandas()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    # every document is in exactly one cluster (incl. singletons)
    assert int((pdf["cluster_size"] * pdf["n_clusters"]).sum()) == n_docs
    # pair-derived clusters have size >= 2; exactly one size-1 row at most
    assert (pdf[pdf["cluster_size"] == 1].shape[0]) <= 1


@given(st.lists(_rev, min_size=1, max_size=30))
@settings(max_examples=8, deadline=None)
def test_dau_rolling_property_vs_replay(spark, tmp_path_factory, events):
    import uuid

    D = 86_400_000
    d = tmp_path_factory.mktemp("dau") / uuid.uuid4().hex
    d.mkdir()
    _write_events(d, events)
    got = {
        r.day_ms: (r.dau, r.wau)
        for r in REGISTRY["dau_rolling"].fn(spark, str(d)).collect()
    }
    ud = {(u, ts // D) for u, ts, _ in events}
    days = {day for _, day in ud}
    want = {}
    for day in days:
        dau = len({u for u, dd in ud if dd == day})
        wau = len({u for u, dd in ud if day - 6 <= dd <= day})
        want[day * D] = (dau, wau)
    assert got == want, (events, got, want)


def test_gini_bounds_and_replay(spark):
    r = REGISTRY["user_activity_gini"].fn(spark, SF).collect()[0]
    assert 0.0 <= r.gini < 1.0
    assert 0.0 <= r.top10pct_share <= 1.0
    # replay in pandas
    ev = pd.read_parquet(f"{SF}/events.parquet")
    counts = ev.groupby("user_id").size().sort_values(kind="mergesort")
    n, total = len(counts), counts.sum()
    x = counts.to_numpy()
    import numpy as np

    gini = (2.0 * ((np.arange(1, n + 1)) * x).sum()) / (n * total) - (n + 1.0) / n
    assert abs(r.gini - round(gini, 6)) <= 1e-6
    assert r.n_users == n and r.n_events == total


def test_seasonality_covers_all_events(spark):
    pdf = REGISTRY["seasonality_matrix"].fn(spark, SF).toPandas()
    ev_n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert int(pdf["n_events"].sum()) == ev_n
    assert pdf["dow"].between(1, 7).all() and pdf["hour"].between(0, 23).all()
    assert len(pdf) <= 168


def test_curation_impact_monotone_and_consistent(spark):
    pdf = (
        REGISTRY["curation_impact"].fn(spark, SF).toPandas().sort_values("stage")
    )
    n = pdf["n_docs"].tolist()
    assert len(n) == 5
    # survival is monotone non-increasing through the stack
    assert all(a >= b for a, b in zip(n, n[1:]))
    assert n[0] == spark.read.parquet(f"{SF}/documents.parquet").count()
    # stage-1 count equals the standalone quality_rules pass count
    q = REGISTRY["quality_rules"].fn(spark, SF).toPandas()
    assert n[1] == int(q["passes"].sum())
