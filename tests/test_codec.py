"""Token codec unit tests (the data-format contract of input_hint)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from logfowd2_spark.codec import (
    TOKEN_OFFSET,
    decode_tokens_arrow,
    encode_lines_arrow,
)


def roundtrip(strings):
    s = pd.Series(strings)
    return list(decode_tokens_arrow(encode_lines_arrow(s)))


def test_roundtrip_basic():
    data = ["hello world", "", "tab\tsep", "ünïcödé ✓", "a\x00nul"]
    assert roundtrip(data) == data


def test_token_values_are_bytes_plus_offset():
    enc = encode_lines_arrow(pd.Series(["AB"]))
    assert list(enc.iloc[0]) == [65 + TOKEN_OFFSET, 66 + TOKEN_OFFSET]


def test_empty_series():
    assert roundtrip([]) == []


def test_multibyte_utf8_roundtrip():
    data = ["日本語ログ", "emoji 🚀 line", "mixed ascii + ß"]
    assert roundtrip(data) == data


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=200), max_size=50))
def test_roundtrip_property(strings):
    assert roundtrip(strings) == strings


def test_decode_handles_ndarray_rows():
    # Spark hands pandas UDFs numpy arrays per row, not lists
    arrs = pd.Series([np.array([104, 105], dtype=np.int32) + TOKEN_OFFSET])
    assert list(decode_tokens_arrow(arrs)) == ["hi"]


def test_spark_udf_roundtrip(spark):
    from pyspark.sql import functions as F

    from logfowd2_spark.codec import decode_tokens, encode_line

    df = spark.createDataFrame(
        [("a", "hello spark"), ("b", "second ✓ line")], ["id", "text"]
    )
    out = (
        df.withColumn("tokens", encode_line(F.col("text")))
        .withColumn("back", decode_tokens(F.col("tokens")))
        .select("text", "back")
        .collect()
    )
    for r in out:
        assert r["text"] == r["back"]


def test_sql_codec_ascii_roundtrip(spark):
    from pyspark.sql import functions as F

    from logfowd2_spark.codec import decode_tokens_sql, encode_line_sql

    df = spark.createDataFrame([("x", "ascii only line 123")], ["id", "text"])
    out = (
        df.withColumn("tokens", encode_line_sql(F.col("text")))
        .withColumn("back", decode_tokens_sql(F.col("tokens")))
        .collect()[0]
    )
    assert out["back"] == out["text"]
