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
