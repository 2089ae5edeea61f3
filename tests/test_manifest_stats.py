"""Manifest-carried file statistics: every metadata consumer (partition
lineage, DLQ cap, metrics gauge, compaction verify) must resolve row
counts from the commit-time ``_FILES.json`` stats, opening parquet
footers ONLY on manifest-less legacy dirs.  ``ioutil.FOOTER_OPENS``
counts the fallback opens, so the zero-footer claim is asserted, not
assumed."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from logfowd2_spark import ioutil, synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.commit import (
    FILE_MANIFEST,
    manifest_rows,
    read_file_manifest,
)
from logfowd2_spark.streaming.pipeline import run_pipeline


@pytest.fixture(scope="module")
def piped(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("mstats")
    paths = synth.write_dataset(str(d / "in"), n_rows=1500, seed=7, n_files=3)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        max_line_size=256,  # force some truncation/corruption → DLQ rows
    )
    metrics = run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                           files_per_batch=2)
    return cfg, metrics


def _footer_rows_raw(path):
    """Independent footer count, bypassing the counted helper."""
    n = 0
    for r, _d, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet") and not fn.startswith((".", "_")):
                n += pq.ParquetFile(os.path.join(r, fn)).metadata.num_rows
    return n


def test_manifests_carry_stats(piped):
    """Every committed batch dir (routed AND quarantine) has a manifest
    whose per-file stats agree with the actual footers."""
    cfg, _ = piped
    roots = [os.path.join(cfg.output_path, "routed"),
             os.path.join(cfg.output_path, "parse_failures")]
    seen = 0
    for root in roots:
        for name in sorted(os.listdir(root)):
            if not name.startswith("batch_id="):
                continue
            d = os.path.join(root, name)
            man = read_file_manifest(d)
            assert man is not None, f"missing manifest under {d}"
            assert "stats" in man
            for rel in man["files"]:
                full = os.path.join(d, rel)
                assert (man["stats"][rel]["rows"]
                        == pq.ParquetFile(full).metadata.num_rows)
                assert man["stats"][rel]["bytes"] == os.path.getsize(full)
            seen += 1
    assert seen >= 3  # 2 routed batches + at least 1 quarantine generation


def test_tree_num_rows_zero_footer_opens(piped):
    """On the manifest-bearing layout the row counts are correct AND
    take zero footer opens; the counter proves the claim."""
    cfg, _ = piped
    for sub in ("routed", "parse_failures"):
        root = os.path.join(cfg.output_path, sub)
        truth = _footer_rows_raw(root)
        ioutil.reset_footer_opens()
        assert ioutil.tree_num_rows(root) == truth
        assert ioutil.FOOTER_OPENS == 0, f"footer opens leaked under {sub}"


def test_lineage_matches_footers(piped):
    """The manifest-derived partition lineage equals an independent
    footer walk of the routed output."""
    cfg, metrics = piped
    lineage_total = sum(p["rows_routed"] for m in metrics
                        for p in m.partition_metrics)
    assert lineage_total == _footer_rows_raw(
        os.path.join(cfg.output_path, "routed"))
    for m in metrics:
        for p in m.partition_metrics:
            assert p["sink_id"] and p["sink_id"] != "__dlq__"
            assert p["rows_routed"] > 0 and p["file_bytes"] > 0


def test_legacy_dir_falls_back_to_footers(piped, tmp_path):
    """A manifest-less (legacy) dir still counts correctly — via footer
    opens, which the counter records."""
    cfg, _ = piped
    root = os.path.join(cfg.output_path, "routed")
    legacy = str(tmp_path / "legacy")
    shutil.copytree(root, legacy)
    truth = _footer_rows_raw(legacy)
    for r, _d, files in os.walk(legacy):
        for fn in files:
            if fn == FILE_MANIFEST:
                os.remove(os.path.join(r, fn))
    ioutil.reset_footer_opens()
    assert ioutil.tree_num_rows(legacy) == truth
    assert ioutil.FOOTER_OPENS > 0


def test_stats_less_manifest_counts_referenced_files_only(piped, tmp_path):
    """A v1 (stats-less) manifest is resolved by footer-reading exactly
    the files it references — an unreferenced leftover (deferred vacuum)
    is not counted, unlike a raw directory walk."""
    cfg, _ = piped
    root = os.path.join(cfg.output_path, "routed")
    name = next(n for n in sorted(os.listdir(root))
                if n.startswith("batch_id="))
    legacy = str(tmp_path / "gen")
    shutil.copytree(os.path.join(root, name), legacy)
    man = read_file_manifest(legacy)
    truth = sum(pq.ParquetFile(os.path.join(legacy, f)).metadata.num_rows
                for f in man["files"])
    # strip stats (v1 manifest) and plant an unreferenced file
    with open(os.path.join(legacy, FILE_MANIFEST), "w") as fh:
        json.dump({"generation": 0, "files": man["files"]}, fh)
    shutil.copy(os.path.join(legacy, man["files"][0]),
                os.path.join(legacy, "zz-unreferenced.parquet"))
    assert manifest_rows(legacy) == truth
    ioutil.reset_footer_opens()
    assert ioutil.tree_num_rows(legacy) == truth
    assert ioutil.FOOTER_OPENS == len(man["files"])
