"""Property-based check (hypothesis): for ANY changelog, the engine's
collapse must equal a sequential dict replay — the generalization of the
reference's oracle-equality tests beyond the seeded generator."""

from hypothesis import given, settings, strategies as st

from simple_cdc_service_spark.config import ChangeTableConfig
from simple_cdc_service_spark.operators import cdc

CFG = ChangeTableConfig(
    name="t", key_columns=("k",), value_columns=("v",), order_columns=("offset",)
)

event = st.tuples(
    st.sampled_from(["c", "u", "d", "t"]),
    st.integers(min_value=0, max_value=9),   # key
    st.integers(min_value=0, max_value=99),  # value
)


def replay(events):
    state = {}
    for op, k, v in events:
        if op == "t":
            state.clear()
        elif op == "d":
            state.pop(k, None)
        else:
            state[k] = v
    return state


@given(st.lists(event, max_size=60))
@settings(max_examples=12, deadline=None)
def test_collapse_equals_sequential_replay(spark, events):
    rows = [
        (i, op, None if op == "t" else k, None if op in ("t", "d") else v)
        for i, (op, k, v) in enumerate(events)
    ]
    ch = spark.createDataFrame(rows, "offset long, op string, k long, v long")
    # deletes in the flat changelog carry the key (before-image), value null
    got = {r.k: r.v for r in cdc.collapse_changelog(ch, CFG).collect()}
    # sequential truth: deletes remove the key, truncates clear everything
    expected = replay(events)
    # collapse drops keys whose final event is delete; replay's delete list
    # differs subtly: a delete of key k ONLY erases if no later upsert —
    # both semantics agree because collapse keeps the LATEST event per key.
    assert got == expected


def replay_history(events):
    """Sequential truth for SCD2: every version a key held in the live
    epoch with its [open, close) offsets; truncate wipes all history."""
    open_ver: dict[int, list] = {}
    closed: list[list] = []
    for i, (op, k, v) in enumerate(events):
        if op == "t":
            closed.clear()
            open_ver.clear()
        elif op == "d":
            if k in open_ver:
                ver = open_ver.pop(k)
                ver[3] = i
                closed.append(ver)
        else:  # c/u: close any open version, open a new one
            if k in open_ver:
                ver = open_ver.pop(k)
                ver[3] = i
                closed.append(ver)
            open_ver[k] = [k, v, i, None]
    return sorted(
        (k, v, vf, vt, vt is None) for k, v, vf, vt in closed + list(open_ver.values())
    )


@given(st.lists(event, max_size=60))
@settings(max_examples=12, deadline=None)
def test_scd2_equals_sequential_replay(spark, events):
    """For ANY changelog, scd2_history must produce exactly the versions a
    sequential replay records — intervals, open flags, truncate wipes,
    delete closes, re-insert-after-delete reopenings, all of it."""
    rows = [
        (i, op, None if op == "t" else k, None if op in ("t", "d") else v)
        for i, (op, k, v) in enumerate(events)
    ]
    ch = spark.createDataFrame(rows, "offset long, op string, k long, v long")
    hist = cdc.scd2_history(ch, key_cols=("k",), value_cols=("v",), order_col="offset")
    got = sorted(
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in hist.collect()
    )
    assert got == replay_history(events)


# ---------------------------------------------------------------------------
# As-of join property: for ANY (left, right) event sets, the union+window
# composition must equal the brute-force python definition — "the right row
# with the greatest ts strictly below the left ts, per key" — including
# ties, duplicate right timestamps (latest-wins pre-dedup), and keys with
# no right rows at all.
# ---------------------------------------------------------------------------

asof_left = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),    # key
        st.integers(min_value=0, max_value=50),   # ts
    ),
    max_size=30,
)
asof_right = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),    # key
        st.integers(min_value=0, max_value=50),   # ts
        st.integers(min_value=0, max_value=999),  # payload
    ),
    max_size=30,
)


def asof_reference(left, right):
    # pre-dedup: one right row per (key, ts), max payload wins — matching
    # the operator's max_by(ts) contract requires latest-by-ts; for equal
    # (key, ts) max_by ties are broken arbitrarily in Spark, so make the
    # payload unique per (key, ts) in the strategy instead (see caller).
    out = []
    for i, (k, ts) in enumerate(left):
        cands = [(rts, p) for (rk, rts, p) in right if rk == k and rts < ts]
        best = max(cands) if cands else None
        out.append((i, k, ts, best[1] if best else None))
    return out


@given(asof_left, asof_right)
@settings(max_examples=10, deadline=None)
def test_asof_join_equals_bruteforce(spark, left, right):
    from simple_cdc_service_spark.operators.temporal import asof_join

    # make right payloads unique per (key, ts): keep only the max payload
    dedup = {}
    for k, ts, p in right:
        dedup[(k, ts)] = max(p, dedup.get((k, ts), -1))
    right = [(k, ts, p) for (k, ts), p in dedup.items()]

    l_rows = [(i, k, ts) for i, (k, ts) in enumerate(left)]
    ldf = spark.createDataFrame(l_rows or [(0, 0, 0)], "lid long, k long, ts long")
    if not l_rows:
        ldf = ldf.limit(0)
    rdf = spark.createDataFrame(
        right or [(0, 0, 0)], "k long, ts long, payload long"
    )
    if not right:
        rdf = rdf.limit(0)
    got = {
        (r.lid, r.k, r.ts, r.asof_payload)
        for r in asof_join(
            ldf, rdf, key="k", ts="ts", right_cols=["payload"], strict=True
        ).collect()
    }
    want = {
        (i, k, ts, p) for (i, k, ts, p) in asof_reference(left, right)
    }
    assert got == want


# ---------------------------------------------------------------------------
# interval_join_bucketed: for ANY point set and ANY interval set — including
# intervals spanning many buckets (fan-out >> 2), sub-bucket intervals,
# empty intervals (lo == hi), negative timestamps, and bucket-boundary
# points — the bucketed equi-join must produce each qualifying
# (point, interval) pair EXACTLY once (exactly-once is the part a wrong
# bucket fan-out silently breaks: a missed bucket drops pairs, a dedup-less
# double-cover duplicates them).
# ---------------------------------------------------------------------------

iv_points = st.lists(st.integers(min_value=-50, max_value=150), max_size=25)
iv_intervals = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=150),
        st.integers(min_value=0, max_value=90),
    ),
    max_size=12,
)


@given(iv_points, iv_intervals, st.sampled_from([1, 3, 7, 16, 64]))
@settings(max_examples=12, deadline=None)
def test_interval_join_bucketed_equals_bruteforce(spark, pts, ivs, bucket):
    from simple_cdc_service_spark.operators.temporal import interval_join_bucketed

    pdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pts)] or [(0, 0)], "pid long, ts long"
    )
    if not pts:
        pdf = pdf.limit(0)
    idf = spark.createDataFrame(
        [(j, lo, lo + ln) for j, (lo, ln) in enumerate(ivs)] or [(0, 0, 0)],
        "iid long, lo long, hi long",
    )
    if not ivs:
        idf = idf.limit(0)
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join_bucketed(pdf, idf, "ts", "lo", "hi", bucket).collect()
    )
    want = sorted(
        (i, j)
        for i, t in enumerate(pts)
        for j, (lo, ln) in enumerate(ivs)
        if lo <= t < lo + ln
    )
    assert got == want


@given(iv_points, iv_intervals, st.sampled_from([1, 3, 7, 16, 64]))
@settings(max_examples=12, deadline=None)
def test_interval_join_preagg_equals_bruteforce(spark, pts, ivs, bucket):
    """Pre-aggregated interior + exact edges must equal the brute-force
    containment aggregate for every bucket width — including sub-bucket
    intervals, bucket-aligned bounds, negative timestamps, and empty
    inputs (value = the point's ts, so sums catch misassignment)."""
    from simple_cdc_service_spark.operators.temporal import interval_join_preagg

    pdf = spark.createDataFrame(
        [(t, t) for t in pts] or [(0, 0)], "ts long, v long"
    )
    if not pts:
        pdf = pdf.limit(0)
    idf = spark.createDataFrame(
        [(j, lo, lo + ln) for j, (lo, ln) in enumerate(ivs)] or [(0, 0, 0)],
        "iid long, lo long, hi long",
    )
    if not ivs:
        idf = idf.limit(0)
    got = {
        r.iid: (r.n_events, r.sum_value)
        for r in interval_join_preagg(
            pdf, idf, "ts", "lo", "hi", bucket, "v"
        ).collect()
    }
    want = {}
    for j, (lo, ln) in enumerate(ivs):
        hits = [t for t in pts if lo <= t < lo + ln]
        if hits:
            want[j] = (len(hits), sum(hits))
    assert got == want


@given(iv_points, iv_intervals, st.sampled_from([1, 3, 7, 16, 64]))
@settings(max_examples=10, deadline=None)
def test_interval_distinct_hll_within_bound(spark, pts, ivs, bucket):
    """Sketch-union distinct vs brute force: at these cardinalities HLL
    runs in sparse mode, so the estimate should be within max(1, 5%) of
    exact for every interval — and intervals with no points must not
    appear at all."""
    from simple_cdc_service_spark.operators.temporal import (
        interval_join_distinct_hll,
    )

    pdf = spark.createDataFrame(
        [(t, t % 7) for t in pts] or [(0, 0)], "ts long, uid long"
    )
    if not pts:
        pdf = pdf.limit(0)
    idf = spark.createDataFrame(
        [(j, lo, lo + ln) for j, (lo, ln) in enumerate(ivs)] or [(0, 0, 0)],
        "iid long, lo long, hi long",
    )
    if not ivs:
        idf = idf.limit(0)
    got = {
        r.iid: r.n_distinct_est
        for r in interval_join_distinct_hll(
            pdf, idf, "ts", "lo", "hi", bucket, "uid"
        ).collect()
    }
    for j, (lo, ln) in enumerate(ivs):
        exact = len({t % 7 for t in pts if lo <= t < lo + ln})
        if exact == 0:
            assert j not in got
        else:
            assert abs(got[j] - exact) <= max(1.0, 0.05 * exact), (j, got[j], exact)
