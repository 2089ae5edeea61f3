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


# --- byte-level sanitize (reference file.rs:660-721 semantics) ------------

def _sanitize_rows(rows: list[bytes]) -> list[str]:
    import pyarrow as pa

    from logfowd2_spark.codec import sanitize_decode_bytes

    byts = np.frombuffer(b"".join(rows), dtype=np.uint8)
    offs = np.concatenate(([0], np.cumsum([len(r) for r in rows]))).astype(np.int32)
    return sanitize_decode_bytes(byts.copy(), offs).to_pylist()


def test_sanitize_corrupted_control_chars():
    # mirrors test_corrupted_file_handling (file.rs:1719-1760)
    rows = [b"normal line", bytes([0x00, 0x01, 0x02, 0x03, 0x04, 0x05]),
            b"another normal line", bytes([0xFF, 0xFE, 0xFD])]
    out = _sanitize_rows(rows)
    assert out[0] == "normal line"
    assert out[1] == "??????"            # NUL branch: printable replacement
    assert out[2] == "another normal line"
    assert out[3] == "���"  # high-binary branch: lossy

def test_sanitize_lossy_partial_utf8():
    # mirrors test_partial_utf8_sequences (file.rs:1797-1827)
    rows = [b"Valid text", b"\xc3", "Валидный текст".encode("utf-8")]
    out = _sanitize_rows(rows)
    assert out == ["Valid text", "�", "Валидный текст"]


def test_sanitize_binary_range_lossy():
    # mirrors test_binary_data_handling (file.rs:1762-1795): bytes
    # 128..255 — no NULs, no control chars ⇒ lossy conversion
    mid = bytes(range(128, 255))
    out = _sanitize_rows([b"Text before binary", mid, b"Text after binary"])
    assert out[0] == "Text before binary"
    assert len(out[1]) > 0 and "�" in out[1]
    assert out[2] == "Text after binary"


def test_sanitize_valid_multibyte_untouched():
    rows = ["caffé ümlaut 日本".encode("utf-8"), b"plain"]
    assert _sanitize_rows(rows) == ["caffé ümlaut 日本", "plain"]


def test_sanitize_mixed_invalid_inline():
    out = _sanitize_rows([b"abc\xffdef", b"ok"])
    assert out == ["abc�def", "ok"]


def test_sanitize_ctl_ratio_boundary():
    # 1 ctl in 10 bytes: 10*1 !> 10 ⇒ NOT corrupted ⇒ ctl survives lossy
    ten = b"\x01" + b"x" * 9
    # 2 ctl in 10 bytes: 20 > 10 ⇒ corrupted ⇒ '?' replacement
    two = b"\x01\x01" + b"x" * 8
    out = _sanitize_rows([ten, two])
    assert out[0] == "\x01" + "x" * 9
    assert out[1] == "??" + "x" * 8


def test_sanitize_empty_and_zero_len_rows():
    out = _sanitize_rows([b"", b"a", b""])
    assert out == ["", "a", ""]


def test_sanitize_matches_py_reference():
    from logfowd2_spark.codec import sanitize_decode_py

    rows = [b"normal", b"\x00mix\x01ed", b"\xc3\xa9ok", b"\xed\xa0\x80",
            bytes(range(0, 64)), b"", b"\xf0\x9f\x92"]
    assert _sanitize_rows(rows) == [sanitize_decode_py(r) for r in rows]


def test_with_decoded_line_sanitize_spark(spark):
    """End-to-end through mapInArrow: corrupted + invalid + clean rows."""
    import pyarrow as pa

    from logfowd2_spark.codec import TOKEN_OFFSET, with_decoded_line

    payloads = [b"clean line", b"\x00\x01bad", b"caf\xc3\xa9", b"oops\xff!"]
    rows = [
        (f"d{i}", [b + TOKEN_OFFSET for b in p]) for i, p in enumerate(payloads)
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {
        r["doc_id"]: r["line"]
        for r in with_decoded_line(df, sanitize=True).collect()
    }
    assert got == {
        "d0": "clean line",
        "d1": "??bad",
        "d2": "café",
        "d3": "oops�!",
    }


def test_sanitize_trailing_empty_rows_tail_byte():
    """Regression: a batch ending in empty row(s) must not drop the last
    non-empty row's final byte from the corruption counts (the reduceat
    start-clipping bug silently passed invalid UTF-8 through)."""
    from logfowd2_spark.codec import sanitize_decode_py

    cases = [
        [b"abc\x00", b""],
        [b"ab\xff", b""],
        [b"x", b"", b""],
        [b"", b"ab\x01\x01", b""],
        [b"ok", b"\x00", b""],
    ]
    for rows in cases:
        assert _sanitize_rows(rows) == [sanitize_decode_py(r) for r in rows], rows


def test_sql_decode_out_of_range_tokens_degrade(spark):
    """Malformed token values must decode to NUL chars (-> corrupt ->
    DLQ), never abort the batch (ANSI element_at would throw)."""
    from logfowd2_spark.codec import decode_tokens_sql

    df = spark.createDataFrame(
        [([999, 1065, 5000, -3],)], "tokens array<int>"
    )
    from pyspark.sql import functions as F

    out = df.select(decode_tokens_sql(F.col("tokens")).alias("line")).collect()
    assert out[0]["line"] == "\x00A\x00\x00"
