"""Property tests for the round-6 MinHash signature fold kernel
(``trainingdata._make_sig_fold``): the numpy ``minimum.reduceat`` fold
must equal a pure-Python reference fold of min((h1 + i*h2) mod P) per
doc — including documents SPLIT across Arrow batch boundaries (the
carry path), single-row docs, and empty batches.  The kernel is a plain
generator over pandas frames, so the property is pinned without a
SparkSession; Spark-side equality with the SQL fold was additionally
asserted over the full sf0.1 corpus when the kernel landed (bit-
identical md5 signature fingerprints for every doc)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from logfowd2_spark.plans.trainingdata import (
    MINHASH_K,
    MINHASH_PRIME,
    _make_sig_fold,
)

H = st.integers(min_value=0, max_value=2**28 - 1)


def py_signature(rows):
    """Reference fold: per-component minimum over the doc's hash rows."""
    sig = [min((h1 + i * h2) % MINHASH_PRIME for h1, h2 in rows)
           for i in range(MINHASH_K)]
    return sig


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 50),
                  st.lists(st.tuples(H, H), min_size=1, max_size=6)),
        min_size=1, max_size=8, unique_by=lambda d: d[0],
    ),
    split_at=st.lists(st.integers(1, 40), max_size=3),
)
def test_kernel_equals_python_fold_across_batch_splits(docs, split_at):
    docs = sorted(docs)  # the kernel requires doc-sorted input
    flat = [(doc_id, h1, h2) for doc_id, rows in docs
            for h1, h2 in rows]
    # cut the row stream into batches at arbitrary positions — docs
    # spanning a cut exercise the carry/merge path
    cuts = sorted({c for c in split_at if c < len(flat)})
    frames, prev = [], 0
    for c in [*cuts, len(flat)]:
        chunk = flat[prev:c]
        frames.append(pd.DataFrame(chunk, columns=["doc_id", "h1", "h2"]))
        prev = c
    frames.insert(0, pd.DataFrame(columns=["doc_id", "h1", "h2"]))

    fold = _make_sig_fold(MINHASH_K, MINHASH_PRIME)
    got = {}
    for out in fold(iter(frames)):
        for _, row in out.iterrows():
            assert row["doc_id"] not in got, "doc emitted twice"
            got[row["doc_id"]] = list(row["sg"])

    want = {doc_id: py_signature(rows) for doc_id, rows in docs}
    assert got == want
