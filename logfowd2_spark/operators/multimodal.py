"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode/feature-extract kernels are STUBS (no image/audio libs in
this container): ``decode_image`` raises NotImplementedError unless the
deterministic fake is enabled.  Everything Spark-side is real and
tested: schema, batch iteration, partition-size control, and the UDF
signature a real decoder would drop into.

Payload layout (synthetic, deterministic): a fake container format
``b"IMG0" + width(4B LE) + height(4B LE) + seed byte * (w*h)`` so the
"decode" can be verified without any codec library.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

MAGIC = b"IMG0"

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, width int, height int"
)
FEATURE_SCHEMA = (
    "media_id string, kind string, width int, height int, "
    "n_bytes int, mean_px double, ok boolean"
)


def make_fake_payload(media_id: int, width: int, height: int) -> bytes:
    """Deterministic fake container: header + constant pixel plane."""
    seed = (media_id * 31 + width + height) % 256
    return MAGIC + struct.pack("<II", width, height) + bytes([seed]) * (width * height)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    rows = []
    for i in range(n):
        w, h = 4 + (i % 13), 4 + (i % 7)
        rows.append(
            (f"m-{i:06d}", ["image", "audio", "video"][i % 3],
             bytearray(make_fake_payload(i, w, h)), w, h)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode one payload to a pixel array.

    Real implementation would call PIL/libjpeg — not available here, so
    it is stubbed behind NotImplementedError; ``fake=True`` parses the
    deterministic fake container instead (used by tests to exercise the
    full Spark plumbing).
    """
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "use fake=True for the deterministic test container"
        )
    if payload[:4] != MAGIC:
        raise ValueError("bad magic")
    w, h = struct.unpack("<II", payload[4:12])
    return np.frombuffer(payload[12 : 12 + w * h], dtype=np.uint8).reshape(h, w)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batches arrive as pandas DataFrames (Arrow transfer of the binary
    column is zero-copy into bytes objects); each batch is processed
    vectorized-per-batch.  At 100 TB the binary column dominates scan
    bytes, so the projection pushes only the needed columns and the
    partition size knob is bytes-based (maxPartitionBytes), not rows.
    """
    cols = ["media_id", "kind", "payload", "width", "height"]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np  # noqa: PLC0415 - executor side
        import struct as _struct  # noqa: PLC0415

        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": pdf["width"],
                "height": pdf["height"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
            }
            means, oks = [], []
            for p in pdf["payload"]:
                try:
                    if not fake:
                        raise NotImplementedError
                    b = bytes(p)
                    w, h = _struct.unpack("<II", b[4:12])
                    px = _np.frombuffer(b[12 : 12 + w * h], dtype=_np.uint8)
                    means.append(float(px.mean()))
                    oks.append(True)
                except Exception:  # noqa: BLE001 - quarantine semantics
                    means.append(float("nan"))
                    oks.append(False)
            out["mean_px"] = means
            out["ok"] = oks
            yield pd.DataFrame(out)[
                ["media_id", "kind", "width", "height", "n_bytes", "mean_px", "ok"]
            ]

    return df.select(*cols).mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video payloads: deterministic row-level
    sampling by id hash (the real version would sample frames inside the
    payload; the *selection* logic — pure JVM, no Python — is the part
    that matters at scale)."""
    from pyspark.sql import functions as F

    return df.filter(
        F.pmod(F.abs(F.xxhash64("media_id")), F.lit(every_n)) == 0
    )
