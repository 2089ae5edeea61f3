"""Property tests for the shared sessionizer state machine
(``stream._session_fold``) — pure Python, no Spark session needed, so
hypothesis can hammer it.  This is the drift guard that matters in
environments where the tws-vs-classic parity test skips (no protobuf):
both streaming backends call exactly this fold."""

from hypothesis import given, settings
from hypothesis import strategies as st

from logfowd2_spark.streaming.stream import _fmt_session_ts, _session_fold

GAP = 1_000_000  # 1s in µs


def reference_sessions(all_stamps: list[int], gap: int):
    """Independent batch reference: sort everything, split on gap."""
    out = []
    cur = []
    for t in sorted(all_stamps):
        if cur and t - cur[-1] > gap:
            out.append(cur)
            cur = []
        cur.append(t)
    if cur:
        out.append(cur)
    return [(min(s), max(s), len(s)) for s in out]


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50_000_000),
                min_size=1, max_size=60))
def test_single_batch_fold_matches_batch_reference(stamps):
    """One micro-batch (sorted input, like the operators feed it): the
    fold's closed sessions + open tail equal the batch split."""
    closed = []
    s0, last, n = _session_fold(sorted(stamps), None, None, 0, GAP,
                                "k", closed)
    got = [
        (c[1], c[2], c[3]) for c in closed
    ] + [(_fmt_session_ts(s0), _fmt_session_ts(last), n)]
    want = [(_fmt_session_ts(a), _fmt_session_ts(b), m)
            for a, b, m in reference_sessions(stamps, GAP)]
    assert got == want


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50_000_000),
             min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=50_000_000),
             min_size=0, max_size=40),
)
def test_fold_invariants_across_batches(batch1, batch2):
    """Across micro-batches (batch2 may contain out-of-order events
    relative to batch1's open session): the open session's bounds only
    WIDEN, ``last`` never moves backward, counts are conserved, and
    every closed session respects the gap internally."""
    closed = []
    s0, last, n = _session_fold(sorted(batch1), None, None, 0, GAP,
                                "k", closed)
    last_before = last
    s0, last, n = _session_fold(sorted(batch2), s0, last, n, GAP,
                                "k", closed)
    # last never moves backward across batches
    assert last >= last_before
    assert s0 <= last
    # counts conserved: every event is in exactly one session
    assert sum(c[3] for c in closed) + n == len(batch1) + len(batch2)
    # closed sessions are internally gap-consistent and well-formed
    for c in closed:
        assert c[1] <= c[2]  # start <= end (formatted strings, same width)
        assert c[3] >= 1


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50_000_000),
                min_size=1, max_size=60))
def test_fold_is_split_invariant_for_ordered_batches(stamps):
    """Feeding the same time-ordered events as one batch or split at an
    arbitrary point yields identical sessions — the property the
    streaming gates rely on (tercile splits don't change the answer)."""
    ordered = sorted(stamps)
    for cut in {0, len(ordered) // 3, len(ordered) // 2, len(ordered)}:
        closed_a = []
        s0, last, n = _session_fold(ordered, None, None, 0, GAP,
                                    "k", closed_a)
        open_a = (s0, last, n)
        closed_b = []
        s0, last, n = _session_fold(ordered[:cut], None, None, 0, GAP,
                                    "k", closed_b)
        s0, last, n = _session_fold(ordered[cut:], s0, last, n, GAP,
                                    "k", closed_b)
        assert closed_b == closed_a
        assert (s0, last, n) == open_a
