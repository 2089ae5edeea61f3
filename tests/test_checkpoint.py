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
