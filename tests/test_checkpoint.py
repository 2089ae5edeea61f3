"""Checkpoint manifest round-trip + corruption fallback
(≈ reference state.rs tests: save/load, checksum mismatch, backup)."""

import json
import os

from logfowd2_spark.streaming.checkpoint import (
    BatchRecord,
    Manifest,
    load_manifest,
    save_manifest,
)


def rec(bid):
    return BatchRecord(bid, [f"{bid}.parquet"], 10, 9, 1, {"s": 9}, [])


def test_roundtrip(tmp_path):
    p = str(tmp_path / "m.json")
    man = Manifest()
    man.batches["b0"] = rec("b0")
    save_manifest(man, p)
    got = load_manifest(p)
    assert got.committed("b0")
    assert got.batches["b0"].sink_counts == {"s": 9}


def test_corruption_falls_back_to_backup(tmp_path):
    p = str(tmp_path / "m.json")
    man = Manifest()
    man.batches["b0"] = rec("b0")
    save_manifest(man, p)
    man.batches["b1"] = rec("b1")
    save_manifest(man, p)  # creates .backup with only b0
    with open(p, "w") as fh:
        fh.write("{corrupt")
    got = load_manifest(p)
    assert got.committed("b0") and not got.committed("b1")


def test_checksum_mismatch_detected(tmp_path):
    p = str(tmp_path / "m.json")
    man = Manifest()
    man.batches["b0"] = rec("b0")
    save_manifest(man, p)
    doc = json.load(open(p))
    doc["data"]["batches"]["b0"]["rows_in"] = 999  # tamper
    json.dump(doc, open(p, "w"))
    got = load_manifest(p)  # no backup exists → empty manifest
    assert got.batches == {}


def test_missing_file_empty_manifest(tmp_path):
    got = load_manifest(str(tmp_path / "nope.json"))
    assert got.batches == {}


def test_manifest_backcompat_checksum(tmp_path):
    """A manifest written before optional fields existed (no
    failure_counts key) must still checksum-verify — otherwise an
    upgrade silently discards all committed history and re-runs every
    batch."""
    import json

    from logfowd2_spark.streaming.checkpoint import (
        BatchRecord, Manifest, load_manifest, save_manifest,
    )

    p = str(tmp_path / "manifest.json")
    man = Manifest()
    man.batches["b0"] = BatchRecord("b0", ["f"], 9, 9, 0, {"s": 9}, [])
    save_manifest(man, p)
    raw = json.load(open(p))
    # empty optional fields are omitted from the canonical/payload form
    assert "failure_counts" not in raw["data"]["batches"]["b0"]
    got = load_manifest(p)
    assert got.batches["b0"].sink_counts == {"s": 9}
    assert got.batches["b0"].failure_counts == {}

    # and non-empty failure_counts round-trips
    man.batches["b1"] = BatchRecord("b1", ["g"], 5, 4, 1, {"s": 4}, [],
                                    {"bad_level": 1})
    save_manifest(man, p)
    got = load_manifest(p)
    assert got.batches["b1"].failure_counts == {"bad_level": 1}
