"""Commit-protocol tests (streaming/commit.py): the rename (POSIX/HDFS)
and put (object-store-safe, rename-free) protocols must both survive
crash windows without losing rows, and the pipeline/compaction/DLQ paths
must work identically under either."""

import json
import os

import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.commit import (
    OLD_PREFIX,
    PutCommitter,
    RenameCommitter,
    get_committer,
    stage_path,
)


def _mk_files(d, names):
    os.makedirs(d, exist_ok=True)
    for n, content in names.items():
        with open(os.path.join(d, n), "w") as fh:
            fh.write(content)


def _read_all(d):
    return {
        n: open(os.path.join(d, n)).read()
        for n in os.listdir(d)
        if os.path.isfile(os.path.join(d, n))
    }


@pytest.mark.parametrize("proto", ["rename", "put"])
def test_swap_replaces_contents(tmp_path, proto):
    # callers stage at stage_path(live) — the canonical Spark-invisible
    # name; PutCommitter REFUSES foreign stage dirs (adopting one would
    # open a window where the only copy sits in an unmarked stage that
    # recover() discards)
    live = str(tmp_path / "t")
    staged = stage_path(live)
    _mk_files(live, {"a.parquet": "old"})
    _mk_files(staged, {"b.parquet": "new"})
    get_committer(proto).swap(live, staged)
    assert _read_all(live) == {"b.parquet": "new"}
    assert not os.path.exists(staged)
    # no transient dirs left behind
    assert sorted(os.listdir(tmp_path)) == ["t"]


def test_put_swap_refuses_foreign_stage(tmp_path):
    live, staged = str(tmp_path / "t"), str(tmp_path / "elsewhere")
    _mk_files(live, {"a.parquet": "old"})
    _mk_files(staged, {"b.parquet": "new"})
    with pytest.raises(ValueError, match="stage_path"):
        get_committer("put").swap(live, staged)
    # nothing was touched
    assert _read_all(live) == {"a.parquet": "old"}
    assert _read_all(staged) == {"b.parquet": "new"}


def test_rename_recover_restores_original(tmp_path):
    root = str(tmp_path)
    _mk_files(os.path.join(root, OLD_PREFIX + "g1"), {"a.parquet": "orig"})
    healed = RenameCommitter().recover(root)
    assert healed == [os.path.join(root, "g1")]
    assert _read_all(os.path.join(root, "g1")) == {"a.parquet": "orig"}


def test_put_recover_replays_marked_stage(tmp_path):
    """A commit-ready stage is authoritative: recover() must finish the
    interrupted swap (even if the live dir was half-deleted)."""
    root = str(tmp_path)
    live = os.path.join(root, "g1")
    staged = stage_path(live)
    _mk_files(live, {"a.parquet": "old", "b.parquet": "old2"})
    _mk_files(staged, {"c.parquet": "new"})
    with open(os.path.join(staged, PutCommitter.MARKER), "w") as fh:
        json.dump({"files": ["c.parquet"]}, fh)
    # crash mid-step-2: part of live already deleted
    os.remove(os.path.join(live, "a.parquet"))
    healed = PutCommitter().recover(root)
    assert healed == [live]
    assert _read_all(live) == {"c.parquet": "new"}
    assert not os.path.exists(staged)


def test_put_recover_discards_unmarked_stage(tmp_path):
    """No marker ⇒ the swap never reached commit-ready ⇒ live untouched
    and the stage is garbage."""
    root = str(tmp_path)
    live = os.path.join(root, "g1")
    staged = stage_path(live)
    _mk_files(live, {"a.parquet": "old"})
    _mk_files(staged, {"c.parquet": "half-written"})
    assert PutCommitter().recover(root) == []
    assert _read_all(live) == {"a.parquet": "old"}
    assert not os.path.exists(staged)


@pytest.fixture(scope="module")
def put_run(spark, tmp_path_factory):
    """A full pipeline run under the object-store-safe protocol."""
    d = tmp_path_factory.mktemp("putproto")
    paths = synth.write_dataset(str(d / "in"), n_rows=600, seed=9, n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        max_line_size=256,
        bulk_size=50,
        commit_protocol="put",
    )
    from logfowd2_spark.streaming.pipeline import run_pipeline

    metrics = run_pipeline(spark, cfg, paths["pods"], paths["routes"])
    return cfg, metrics


def test_pipeline_under_put_protocol(spark, put_run):
    """Quarantine relocation (the per-batch commit point) works without
    a single rename: conservation holds and the DLQ table is complete."""
    cfg, metrics = put_run
    m = metrics[0]
    assert m.conservation_ok()
    assert m.parse_failures > 0
    dlq = spark.read.parquet(os.path.join(cfg.output_path, "parse_failures"))
    assert dlq.count() == m.parse_failures


def test_compaction_under_put_protocol(spark, put_run):
    from logfowd2_spark.streaming.maintenance import (
        committed_batch_ids,
        compact_batch,
    )
    from logfowd2_spark.streaming.pipeline import read_routed

    cfg, metrics = put_run
    ids = committed_batch_ids(cfg)
    stats = compact_batch(spark, cfg, ids[0], target_records_per_file=100_000)
    assert stats["rows"] == metrics[0].rows_routed
    assert stats["files_after"] < stats["files_before"]
    assert read_routed(spark, cfg).count() == metrics[0].rows_routed
