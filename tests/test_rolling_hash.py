"""Property test for the Rabin-Karp rolling-hash SQL: the DuckDB
list_reduce expression (the oracle side of ``doc_fingerprint``) equals
a pure-Python polynomial fold for arbitrary text — so the SQL really
encodes (acc*31 + codepoint) mod 1e9+7, not something that merely
agrees on the fixture corpus.  (Spark-vs-DuckDB equality of the same
expression is the driver's oracle gate; this pins the MATH.)"""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from logfowd2_spark.plans.trainingdata import _ROLL_DUCK

P = 1_000_000_007


def py_rolling(text: str) -> int:
    acc = 0
    for ch in text:
        acc = (acc * 31 + ord(ch)) % P
    return acc


@settings(max_examples=200, deadline=None)
@given(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
    min_size=0, max_size=80,
))
def test_duckdb_rolling_hash_matches_python(text):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT ? AS text", [text])
    got = con.sql(f"SELECT {_ROLL_DUCK} AS h FROM documents").fetchone()[0]
    con.close()
    want = py_rolling(text)
    # empty text: the fold's seed (0) on both sides
    assert got == want, (text, got, want)
