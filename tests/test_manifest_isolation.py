"""Reader isolation across in-place rewrites (the manifest-pointer
commit, streaming/commit.py): a reader racing a compaction's
generation swap sees exactly the old or exactly the new generation —
never a partial mix, never doubled rows — under BOTH commit protocols.
Also pins the protocol-switch recovery rules (a commit-ready stage is
never discardable debris, whichever protocol wrote it)."""

import json
import os

import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.commit import (
    FILE_MANIFEST,
    PUBLISH_MARKER,
    PutCommitter,
    RenameCommitter,
    data_files,
    get_committer,
    read_file_manifest,
    stage_path,
    vacuum_unreferenced,
    write_file_manifest,
)
from logfowd2_spark.streaming.maintenance import (
    committed_batch_ids,
    resolve_batch_paths,
)
from logfowd2_spark.streaming.pipeline import read_routed, run_pipeline


@pytest.fixture(scope="module", params=["rename", "put"])
def ran(request, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"iso-{request.param}")
    paths = synth.write_dataset(str(d / "in"), n_rows=600, seed=9, n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        max_line_size=256,
        bulk_size=40,  # many small files → compaction has work
        commit_protocol=request.param,
    )
    metrics = run_pipeline(spark, cfg, paths["pods"], paths["routes"])
    return cfg, metrics


def test_manifest_lists_exactly_the_batch_files(spark, ran):
    """Every committed batch dir carries a generation-0 manifest naming
    exactly its data files (the writer publishes it at batch commit).
    Runs FIRST in this module: the swap tests below advance the
    generations of the shared run's batch dirs."""
    cfg, _ = ran
    root = os.path.join(cfg.output_path, "routed")
    for b in committed_batch_ids(cfg):
        live = os.path.join(root, f"batch_id={b}")
        man = read_file_manifest(live)
        assert man is not None and man["generation"] == 0
        assert sorted(man["files"]) == data_files(live)
        assert FILE_MANIFEST not in man["files"]


def test_reader_isolated_across_generation_swap(spark, ran):
    """Walk the manifest_swap steps by hand with a reader at every
    window: the resolved file set flips atomically with the manifest,
    rows never mix or double, and a reader HOLDING the pre-flip
    resolution keeps a complete old generation until vacuum."""
    cfg, metrics = ran
    committer = get_committer(cfg.commit_protocol)
    b = committed_batch_ids(cfg)[0]
    root = os.path.join(cfg.output_path, "routed")
    live = os.path.join(root, f"batch_id={b}")

    baseline = metrics[0].rows_routed
    old_files = read_file_manifest(live)["files"]
    assert sorted(old_files) == data_files(live)
    assert read_routed(spark, cfg).count() == baseline

    # stage the compacted rewrite (what compact_batch does)
    staged = stage_path(live)
    df = spark.read.option("basePath", live).parquet(live)
    (
        df.coalesce(1).write.mode("overwrite")
        .partitionBy("sink_id", "log_date").parquet(staged)
    )
    new_files = data_files(staged)
    assert new_files and not set(new_files) & set(old_files)

    # window 1: marker written, nothing published — reader sees old gen
    committer.put_file(
        os.path.join(staged, PUBLISH_MARKER),
        json.dumps({"generation": 1, "files": new_files}).encode(),
    )
    assert sorted(os.path.basename(p) for p in resolve_batch_paths(root, b)) \
        == sorted(os.path.basename(f) for f in old_files)

    # window 2: new generation's files fully published, manifest NOT yet
    # flipped — the dir holds BOTH generations, but the reader resolves
    # exactly the old one (no doubling, no mix)
    for rel in new_files:
        dst = os.path.join(live, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        committer.put_file(dst, src_path=os.path.join(staged, rel))
    held_old = resolve_batch_paths(root, b)  # a reader opened mid-swap
    assert sorted(os.path.relpath(p, live) for p in held_old) \
        == sorted(old_files)
    assert read_routed(spark, cfg).count() == baseline

    # window 3: manifest flip — THE commit point; new resolution is
    # exactly the new generation, while the held old resolution still
    # reads a complete old generation (files undisturbed until vacuum)
    write_file_manifest(committer, live, new_files, generation=1)
    assert sorted(os.path.relpath(p, live)
                  for p in resolve_batch_paths(root, b)) == sorted(new_files)
    assert read_routed(spark, cfg).count() == baseline
    assert spark.read.option("basePath", root).parquet(*held_old).count() \
        == baseline

    # vacuum: the superseded generation goes away, nothing else
    removed = vacuum_unreferenced(live)
    assert sorted(removed) == sorted(old_files)
    assert data_files(live) == sorted(new_files)
    assert read_routed(spark, cfg).count() == baseline
    import shutil

    shutil.rmtree(staged, ignore_errors=True)


def test_publish_ready_stage_replayed_after_crash(spark, ran):
    """Crash after the marker put, before any publish: recover() (either
    protocol) completes the swap from the stage — manifest flipped,
    rows intact, stage gone."""
    cfg, metrics = ran
    committer = get_committer(cfg.commit_protocol)
    ids = committed_batch_ids(cfg)
    b = ids[-1]
    root = os.path.join(cfg.output_path, "routed")
    live = os.path.join(root, f"batch_id={b}")
    total = sum(m.rows_routed for m in metrics)

    staged = stage_path(live)
    df = spark.read.option("basePath", live).parquet(live)
    (
        df.coalesce(1).write.mode("overwrite")
        .partitionBy("sink_id", "log_date").parquet(staged)
    )
    new_files = data_files(staged)
    committer.put_file(
        os.path.join(staged, PUBLISH_MARKER),
        json.dumps({"generation": 1, "files": new_files}).encode(),
    )
    healed = committer.recover(root)
    assert healed == [live]
    assert not os.path.isdir(staged)
    man = read_file_manifest(live)
    assert man["generation"] == 1 and sorted(man["files"]) == sorted(new_files)
    assert data_files(live) == sorted(new_files)
    assert read_routed(spark, cfg).count() == total


def test_rename_recover_replays_foreign_committed_stage(tmp_path):
    """Protocol-switch hazard (round-3 advice): a commit-ready
    put-protocol stage may be the ONLY copy of the data after the live
    dir was deleted — RenameCommitter.recover must replay it, not
    rmtree it."""
    root = tmp_path / "routed"
    live = root / "batch_id=b1"
    staged = root / "_stage_batch_id%3Db1"
    staged.mkdir(parents=True)
    (staged / "part-0.parquet").write_bytes(b"DATA")
    (staged / PutCommitter.MARKER).write_text(
        json.dumps({"files": ["part-0.parquet"]})
    )
    healed = RenameCommitter().recover(str(root))
    assert healed == [str(live)]
    assert (live / "part-0.parquet").read_bytes() == b"DATA"
    assert not staged.exists()


def test_put_recover_restores_foreign_old_dir(tmp_path):
    """The symmetric switch: a rename-protocol ``_old_`` with no live
    dir (crash between the two renames, then restart under 'put') is
    the only copy — PutCommitter.recover restores it rename-free."""
    root = tmp_path / "routed"
    old = root / "_old_batch_id%3Db1"
    old.mkdir(parents=True)
    (old / "part-0.parquet").write_bytes(b"DATA")
    healed = PutCommitter().recover(str(root))
    live = root / "batch_id=b1"
    assert healed == [str(live)]
    assert (live / "part-0.parquet").read_bytes() == b"DATA"
    assert not old.exists()
