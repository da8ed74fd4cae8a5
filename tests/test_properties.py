"""Property-based tests (SURVEY §5): the change-detection invariant
under randomized source/state pairs.

Invariants:
  1. changed = src ∖ state on the composite (key, ts) — exactly the
     keys whose watermark pair is absent from state;
  2. idempotence — after committing state ← update_state(state, changed),
     a second detection over the same source yields ∅;
  3. J1 ⊆ changed — every brand-new key is reported.

Examples are kept small (each one runs Spark jobs); the generator still
exercises the interesting boundaries: empty state, empty source,
duplicate keys with conflicting timestamps, reverted values.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from webscrap_datapipeline_spark.operators.change_detection import (
    detect_changes,
    missing_keys,
    update_state,
)

KEYS = st.sampled_from(["A", "B", "C", "D", "E"])
TS = st.sampled_from(["t1", "t2", "t3"])

# source rows may repeat a key with different ts (the reference dedups
# with drop_duplicates, src/utils.py:190); state has one row per key.
SRC = st.lists(st.tuples(KEYS, TS), max_size=12)
STATE = st.dictionaries(KEYS, TS, max_size=5)


def _mk(spark, rows):
    schema = "hotel_cd string, lst_optimization string"
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)


@given(src=SRC, state=STATE)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_change_detection_invariants(spark, src, state):
    src_df = _mk(spark, src)
    state_df = _mk(spark, list(state.items()))

    changed = detect_changes(src_df, state_df, "hotel_cd", "lst_optimization").collect()
    changed_keys = {r["hotel_cd"] for r in changed}

    # 1. membership: a key is reported iff SOME of its source pairs is
    #    absent from state (dedup keeps one representative per key)
    state_pairs = set(state.items())
    expect_keys = {k for (k, t) in src if (k, t) not in state_pairs}
    assert changed_keys == expect_keys
    # dedup: one row per key, and each reported pair is a real source pair
    assert len(changed) == len(changed_keys)
    for r in changed:
        pair = (r["hotel_cd"], r["lst_optimization"])
        assert pair in set(src) and pair not in state_pairs

    # 2. J1 ⊆ changed: brand-new keys always surface
    new_keys = {r["hotel_cd"] for r in missing_keys(src_df, state_df, "hotel_cd").collect()}
    assert new_keys <= changed_keys

    # 3. idempotence: commit the detected watermarks, re-detect → only
    #    keys with >1 distinct source ts can still differ (the committed
    #    representative fixed one of them); keys with a single source ts
    #    must be quiescent
    committed = update_state(state_df, _mk(spark, [tuple(r) for r in changed]),
                             "hotel_cd", "lst_optimization")
    second = detect_changes(src_df, committed, "hotel_cd", "lst_optimization").collect()
    multi_ts = {k for (k, t) in src if len({t2 for (k2, t2) in src if k2 == k}) > 1}
    assert {r["hotel_cd"] for r in second} <= multi_ts


# ---------------------------------------------------------------------------
# CDC round-trip: apply(old, diff(old, new)) == new, for arbitrary
# snapshots including NULL values and disjoint/overlapping key sets.

_SNAP = st.dictionaries(
    st.integers(min_value=0, max_value=12),
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-3, max_value=3)),
        st.sampled_from(["a", "b", "c"]),
    ),
    max_size=10,
)


def _snap_df(spark, snap):
    schema = "k int, v int, tag string"
    rows = [(k, v, t) for k, (v, t) in snap.items()]
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)


@given(old=_SNAP, new=_SNAP)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_cdc_diff_apply_roundtrip(spark, old, new):
    from webscrap_datapipeline_spark.operators.cdc import (
        apply_change_feed,
        snapshot_diff,
    )

    old_df, new_df = _snap_df(spark, old), _snap_df(spark, new)
    feed = snapshot_diff(old_df, new_df, keys=["k"])
    rebuilt = apply_change_feed(old_df, feed, keys=["k"])
    got = sorted((tuple(r) for r in rebuilt.collect()), key=repr)
    want = sorted(((k, v, t) for k, (v, t) in new.items()), key=repr)
    assert got == want
    # the feed's class counts are exactly the set-theoretic ones
    classes = {r["k"]: r["_change_type"] for r in feed.collect()}
    assert {k for k, c in classes.items() if c == "insert"} == set(new) - set(old)
    assert {k for k, c in classes.items() if c == "delete"} == set(old) - set(new)
