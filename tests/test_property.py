"""Property-based tests (hypothesis) for the cross-engine determinism
layer — the contract every oracle comparison rests on.

No SparkSession here: these pin the *specification* shared by the
Spark-side builders (norms._scaled_units) and the DuckDB-side SQL
builders (norms._o_units), plus the comparison harness's canonical
form. Spark-vs-DuckDB agreement on real plans is covered per-key in
test_parity.py; these catch spec drift on inputs the fixtures never
produce (negative halves, tie values, permuted frames).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from data_webhooks_spark.norms import _o_units
from data_webhooks_spark.oracle import canon, compare_frames, frame_multiset


def _py_scaled_units(x: float, scale: int) -> int:
    """Reference implementation of the sign-branched FLOOR quantization
    both engines must follow (norms.py docstring)."""
    m = float(10**scale)
    if x >= 0:
        return int(math.floor(x * m + 0.5))
    return -int(math.floor(-x * m + 0.5))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=40,
    ),
    st.sampled_from([2, 4, 6]),
)
def test_o_units_matches_python_spec(vals, scale):
    """DuckDB evaluating the generated _o_units SQL must agree with the
    Python reference on every value — including negatives and exact
    .5-boundary ties (round-half-away-from-zero)."""
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t (x DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
        got = [
            r[0]
            for r in con.execute(
                f"SELECT {_o_units('x', scale)} FROM t"
            ).fetchall()
        ]
    finally:
        con.close()
    assert got == [_py_scaled_units(v, scale) for v in vals]


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=30,
    ),
    st.sampled_from([2, 4]),
)
def test_unit_sum_is_order_independent(vals, scale):
    """The whole point of the unit-sum discipline: the exact total is
    identical under any aggregation order (integer adds associate),
    where a naive float sum would drift."""
    units = [_py_scaled_units(v, scale) for v in vals]
    assert sum(units) == sum(reversed(units)) == sum(sorted(units))


_cell = st.one_of(
    st.none(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=True, allow_infinity=False, width=64),
    st.text(max_size=12),
    st.booleans(),
    st.lists(st.integers(-100, 100), max_size=4),
)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(_cell, _cell), min_size=1, max_size=12),
    st.randoms(use_true_random=False),
)
def test_frame_multiset_invariant_under_permutation(rows, rng):
    """The driver's order-insensitive comparison: permuting rows AND
    reordering columns must not change the canonical multiset, so two
    engines returning the same rows in any order always match."""
    a = pd.DataFrame(rows, columns=["x", "y"])
    shuffled = list(rows)
    rng.shuffle(shuffled)
    b = pd.DataFrame(shuffled, columns=["x", "y"])[["y", "x"]][["x", "y"]]
    assert frame_multiset(a) == frame_multiset(b)
    # _cell can generate list cells; multiset invariance is what's
    # under test here, not the driver-sortable output lint
    assert not compare_frames(
        a, b.sample(frac=1, random_state=7), require_driver_sortable=False
    )


def test_compare_frames_rejects_driver_unsortable_columns():
    """The r5 regression class, pinned: a result whose cells are
    ndarray/list/bytes/dict must be REJECTED by the default
    (driver-strict) compare even when both sides are identical —
    the external driver's pandas sort canon would crash on it.
    Scalar frames still pass; the opt-out flag restores the old
    element-wise behavior for ad-hoc array checks."""
    import numpy as np

    for cell in ([1, 2], np.array([1.0, 2.0]), b"\x00\x01", {"k": 1}):
        pdf = pd.DataFrame({"id": [1, 2], "v": [cell, cell]})
        probs = compare_frames(pdf, pdf.copy())
        assert probs and "driver-unsortable" in probs[0], (cell, probs)
        assert not compare_frames(
            pdf, pdf.copy(), require_driver_sortable=False
        )
    ok = pd.DataFrame({"id": [1, 2], "v": ["a,b", "c,d"]})
    assert not compare_frames(ok, ok.copy())


@settings(max_examples=200, deadline=None)
@given(_cell, _cell)
def test_canon_equality_is_value_equality(u, v):
    """canon() must be injective enough for the hash check: equal
    canonical forms for equal values, distinct for distinct values
    (modulo float NaN, which canonicalizes to one token by design)."""
    cu, cv = canon(u), canon(v)
    if type(u) is type(v):
        is_nan = (
            isinstance(u, float)
            and isinstance(v, float)
            and math.isnan(u)
            and math.isnan(v)
        )
        if u == v or is_nan:
            assert cu == cv
        elif not is_nan:
            assert cu != cv or u == v


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters=[" "]
            ),
            min_size=0,
            max_size=12,
        ),
        min_size=0,
        max_size=30,
    )
)
def test_simhash_vectorized_equals_reference_on_random_words(words):
    """The r4 numpy SimHash kernel must be bit-exact vs the original
    interpreted loop on arbitrary vocabularies (unicode, empty words,
    duplicates) — not just the fixed cases in test_quality.py."""
    from data_webhooks_spark.operators.simhash_impl import (
        simhash64_batch,
        simhash64_reference,
    )

    texts = [" ".join(words), " ".join(reversed(words))]
    got = simhash64_batch(texts)
    for txt, g in zip(texts, got):
        assert int(g) == simhash64_reference(txt)


# ---------- CDC apply-log state specification ----------
#
# cdc_apply_log (batch) and stream_cdc_apply (streaming) both compute
# the same per-user state: (n_ops, n_deletes, max delete key, max
# upsert key + its value, last ts). These properties pin that the
# STATE formulation equals an actual sequential replay, and that the
# state merge is associative under ANY chunking — on logs the fixture
# never produces (same-timestamp ties, all-tombstone users,
# delete-then-upsert tails).

_CDC_EMPTY = (0, 0, None, None, None)  # n_ops, n_dels, del_key, upd, last


def _cdc_partial(ops):
    """State of one log slice; ops = [(ts, eid, is_del, value)]."""
    n_del = sum(1 for o in ops if o[2])
    del_key = max(((o[0], o[1]) for o in ops if o[2]), default=None)
    upds = [o for o in ops if not o[2]]
    upd = max(((o[0], o[1], o[3]) for o in upds), default=None)
    last = max((o[0], o[1]) for o in ops) if ops else None
    return (len(ops), n_del, del_key, upd, last)


def _cdc_merge(a, b):
    def mx(x, y):
        if x is None:
            return y
        if y is None:
            return x
        return max(x, y)

    return (a[0] + b[0], a[1] + b[1], mx(a[2], b[2]), mx(a[3], b[3]),
            mx(a[4], b[4]))


def _cdc_read(state):
    """(alive, final_value) derived from the state."""
    _, _, del_key, upd, _ = state
    if upd is None:
        return (False, None)
    if del_key is None or (upd[0], upd[1]) > del_key:
        return (True, upd[2])
    return (False, None)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # ts (dense -> ties)
            st.booleans(),  # tombstone?
            st.floats(min_value=-10, max_value=10, allow_nan=False),
        ),
        min_size=0,
        max_size=12,
    ),
    st.randoms(use_true_random=False),
)
def test_cdc_state_equals_sequential_replay_and_merge_associative(
    raw, rng
):
    ops = [(ts, eid, d, v) for eid, (ts, d, v) in enumerate(raw)]
    # sequential replay in (ts, eid) order: the ground-truth semantics
    state_val, n_del = None, 0
    for ts, eid, is_del, v in sorted(ops):
        if is_del:
            state_val, n_del = None, n_del + 1
        else:
            state_val = v
    alive, val = _cdc_read(_cdc_partial(ops))
    assert alive == (state_val is not None)
    assert val == state_val
    # associativity: any chunking of the log folds to the same state
    chunks, cur = [], []
    for o in ops:
        cur.append(o)
        if rng.random() < 0.4:
            chunks.append(cur)
            cur = []
    chunks.append(cur)
    folded = _CDC_EMPTY
    for c in chunks:
        folded = _cdc_merge(folded, _cdc_partial(c))
    assert folded == _cdc_partial(ops)


def _ref_max_argmax(rows):
    """Brute-force SQL-semantics reference for stream_custom_state's
    per-user state: rows are (event_id, value, isnull). MAX skips
    NULLs with NaN greatest (both engines); argmax = MIN(event_id)
    among rows whose value EQUALS the max under SQL `=` (NaN never
    equals, so a NaN max has NULL argmax)."""
    n = len(rows)
    vals = [(e, v) for e, v, isnull in rows if not isnull]
    if not vals:
        return n, None, None
    has_nan = any(v != v for _, v in vals)
    if has_nan:
        return n, float("nan"), None
    mx = max(v for _, v in vals)
    arg = min(e for e, v in vals if v == mx)
    return n, mx, arg


_fold_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # event_id
        st.one_of(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
            st.just(float("nan")),
        ),
        st.booleans(),  # isnull flag (Spark-side NULL marker)
    ),
    min_size=0,
    max_size=60,
    unique_by=lambda r: r[0],  # event_ids are unique by schema
)


@settings(max_examples=300, deadline=None)
@given(_fold_rows, st.data())
def test_fold_max_matches_reference_under_any_chunking(rows, data):
    """r9: stream_custom_state's _fold_max must (a) equal the
    brute-force SQL-semantics reference and (b) be chunking-
    independent — the same rows split across any micro-batch
    boundaries fold to the same state (the exactly-once replay
    contract depends on it)."""
    from data_webhooks_spark.streaming.queries import _fold_max

    def as_pdf(chunk):
        return pd.DataFrame(
            {
                "event_id": [r[0] for r in chunk],
                "value": [r[1] for r in chunk],
                "vnull": [r[2] for r in chunk],
            }
        )

    # one chunk
    n1, mx1, a1 = _fold_max(as_pdf(rows), 0, None, None)
    # arbitrary chunking
    n2, mx2, a2 = 0, None, None
    i = 0
    while i < len(rows):
        j = data.draw(st.integers(min_value=i + 1, max_value=len(rows)))
        n2, mx2, a2 = _fold_max(as_pdf(rows[i:j]), n2, mx2, a2)
        i = j
    ref_n, ref_mx, ref_arg = _ref_max_argmax(rows)

    def same(x, y):
        if x is None or y is None:
            return x is None and y is None
        return (x != x and y != y) or x == y

    assert n1 == n2 == ref_n
    assert same(mx1, ref_mx) and same(mx2, ref_mx)
    assert a1 == a2 == ref_arg


@settings(max_examples=60, deadline=None)
@given(st.lists(_fold_rows, min_size=1, max_size=4))
def test_stream_custom_state_paths_share_one_transition(batches):
    """r10 (r9 verdict item 4): stream_custom_state's two execution
    paths — applyInPandasWithState (_cs_track, GroupState property
    surface) and transformWithStateInPandas (_cs_handle_tws,
    ValueState method surface) — must be pure adapters over one
    shared transition. Drive BOTH over identical micro-batch
    sequences with fake state objects and require identical emitted
    updates and identical stored state after every batch."""
    from data_webhooks_spark.streaming.queries import (
        _cs_handle_tws,
        _cs_track,
    )

    def as_pdf(chunk):
        return pd.DataFrame(
            {
                "event_id": [r[0] for r in chunk],
                "value": [r[1] for r in chunk],
                "vnull": [r[2] for r in chunk],
            }
        )

    class FakeGroupState:  # property surface (applyInPandasWithState)
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeValueState:  # method surface (transformWithStateInPandas)
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    gs, vs = FakeGroupState(), FakeValueState()
    key = (7,)
    for chunk in batches:
        pdf = as_pdf(chunk)
        (out_a,) = list(_cs_track(key, iter([pdf]), gs))
        (out_b,) = list(_cs_handle_tws(vs, key, iter([pdf])))
        pd.testing.assert_frame_equal(out_a, out_b)
        assert gs._v == vs._v or (
            # NaN max compares unequal to itself; compare fields
            gs._v[0] == vs._v[0]
            and gs._v[1] != gs._v[1]
            and vs._v[1] != vs._v[1]
            and gs._v[2] == vs._v[2]
        )
