"""Unit-level evidence for the transformWithStateInPandas sessionizer
(``make_session_processor``): drive handleInputRows / handleExpiredTimer
directly with a FAKE handle — no Spark streaming runner, no protobuf —
and assert equality with the shared ``_session_fold`` state machine on
the same multi-batch corpora the property tests use.  This closes the
evidence gap the env-gated tws-vs-classic parity test leaves in
sandboxes without protobuf: only the Spark WIRING remains untested
there, not the processor logic."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from logfowd2_spark.streaming.stream import (
    _fmt_session_ts,
    _session_fold,
    make_session_processor,
)

GAP_S = 1  # 1s gap → µs stamps up to 50s give multi-session corpora
GAP_US = GAP_S * 1_000_000


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeHandle:
    """The slice of StatefulProcessorHandle the sessionizer uses."""

    def __init__(self):
        self.states = {}
        self.timers = []

    def getValueState(self, name, schema):
        return self.states.setdefault(name, FakeValueState())

    def registerTimer(self, ts_ms):
        self.timers.append(ts_ms)

    def deleteTimer(self, ts_ms):
        self.timers.remove(ts_ms)

    def listTimers(self):
        return list(self.timers)


def drive(batches, fire_final_timer=True):
    """Feed µs-stamp batches through the processor; return the emitted
    (key, start, end, n) rows and the handle (for timer assertions)."""
    proc = make_session_processor(key="k", ts="ts", gap_s=GAP_S)
    handle = FakeHandle()
    proc.init(handle)
    out = []
    for stamps in batches:
        pdf = pd.DataFrame(
            {"k": 7, "ts": pd.to_datetime([s * 1000 for s in stamps])}
        )
        for emitted in proc.handleInputRows((7,), iter([pdf]), None):
            out.extend(map(tuple, emitted.itertuples(index=False)))
    if fire_final_timer:
        for emitted in proc.handleExpiredTimer((7,), None, None):
            out.extend(map(tuple, emitted.itertuples(index=False)))
    return out, handle, proc


def fold_reference(batches):
    """The same corpus through the shared fold + final flush."""
    closed = []
    s0, last, n = None, None, 0
    for stamps in batches:
        s0, last, n = _session_fold(sorted(stamps), s0, last, n, GAP_US,
                                    7, closed)
    if last is not None:
        closed.append((7, _fmt_session_ts(s0), _fmt_session_ts(last), n))
    return [tuple(c) for c in closed]


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.lists(st.integers(min_value=0, max_value=50_000_000),
             min_size=1, max_size=30),
    min_size=1, max_size=5,
))
def test_processor_equals_session_fold(batches):
    """Across arbitrary multi-batch corpora (including out-of-order
    late events in later batches) the processor's emissions — closed
    sessions during input plus the timer-expiry flush — equal the
    shared fold's."""
    got, _handle, _proc = drive(batches)
    assert got == fold_reference(batches)


def test_timer_rearm_keeps_exactly_one_deadline():
    """Every input batch supersedes the previous gap deadline: exactly
    one registered timer remains, at (last + gap) in epoch ms."""
    batches = [[1_000_000, 2_500_000], [9_000_000], [9_100_000]]
    _out, handle, proc = drive(batches, fire_final_timer=False)
    assert handle.timers == [(9_100_000 + GAP_US) // 1000]


def test_expiry_flushes_open_session_and_clears_state():
    out, handle, proc = drive([[5_000_000]], fire_final_timer=False)
    assert out == []  # nothing closed yet
    flushed = []
    for emitted in proc.handleExpiredTimer((7,), None, None):
        flushed.extend(map(tuple, emitted.itertuples(index=False)))
    assert flushed == [(7, _fmt_session_ts(5_000_000),
                        _fmt_session_ts(5_000_000), 1)]
    assert not handle.states["session"].exists()
    # a second expiry (spurious timer) emits nothing
    assert list(proc.handleExpiredTimer((7,), None, None)) == []
