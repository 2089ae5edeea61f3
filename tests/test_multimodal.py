"""Multimodal plumbing tests: binary columns through mapInPandas with the
deterministic fake container (the decode itself is stubbed — the Spark
schema/batching/quarantine behavior is what's under test)."""

import numpy as np
import pytest

from logfowd2_spark.operators import multimodal as mm


def test_fake_container_roundtrip():
    p = mm.make_fake_payload(7, 5, 3)
    px = mm.decode_image(p, fake=True)
    assert px.shape == (3, 5)
    assert (px == (7 * 31 + 5 + 3) % 256).all()


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"whatever")


def test_extract_features_spark(spark):
    df = mm.synth_media(spark, 64)
    feats = mm.extract_features(df, fake=True).toPandas()
    assert len(feats) == 64
    assert feats["ok"].all()
    # mean of a constant plane == the seed byte
    row = feats[feats["media_id"] == "m-000007"].iloc[0]
    w, h = 4 + 7 % 13, 4 + 7 % 7
    assert row["mean_px"] == (7 * 31 + w + h) % 256
    assert row["n_bytes"] == 12 + w * h


def test_corrupt_payload_quarantined(spark):
    good = mm.synth_media(spark, 8)
    bad = spark.createDataFrame(
        [("m-bad", "image", bytearray(b"NOPE"), 2, 2)], mm.MEDIA_SCHEMA
    )
    feats = mm.extract_features(good.union(bad), fake=True).toPandas()
    assert len(feats) == 9
    badrow = feats[feats["media_id"] == "m-bad"].iloc[0]
    assert not badrow["ok"] and np.isnan(badrow["mean_px"])
    assert feats[feats["media_id"] != "m-bad"]["ok"].all()


def test_frame_sample_deterministic(spark):
    df = mm.synth_media(spark, 64)
    a = sorted(r["media_id"] for r in mm.frame_sample(df, 4).collect())
    b = sorted(r["media_id"] for r in mm.frame_sample(df, 4).collect())
    assert a == b
    assert 0 < len(a) < 64
