"""Snapshot expiry (the deferred half of the retention model): with
``vacuum_retention_s > 0`` a compaction's manifest flip RETAINS the
superseded generation as a ``retired`` manifest entry, a reader that
resolved the pre-swap manifest keeps its complete old generation across
AND past the flip, and only the ``vacuum_expired`` maintenance pass —
once the window has passed — reaps it and rewrites the manifest."""

import os

import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.commit import (
    data_files,
    get_committer,
    read_file_manifest,
    vacuum_expired,
)
from logfowd2_spark.streaming.maintenance import (
    committed_batch_ids,
    compact_batch,
    resolve_batch_paths,
    vacuum_expired_table,
)
from logfowd2_spark.streaming.pipeline import read_routed, run_pipeline


@pytest.fixture(scope="module", params=["rename", "put"])
def ran(request, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"ret-{request.param}")
    paths = synth.write_dataset(str(d / "in"), n_rows=500, seed=11, n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        max_line_size=256,
        bulk_size=40,  # many small files so compaction has work
        commit_protocol=request.param,
        vacuum_retention_s=3600.0,
    )
    metrics = run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                           files_per_batch=1)
    return cfg, metrics


def test_retained_swap_then_expiry(spark, ran):
    cfg, metrics = ran
    b = committed_batch_ids(cfg)[0]
    root = os.path.join(cfg.output_path, "routed")
    live = os.path.join(root, f"batch_id={b}")
    baseline = metrics[0].rows_routed

    # a reader resolves the PRE-swap manifest and holds its paths
    held_old = resolve_batch_paths(root, b)
    old_files = sorted(os.path.relpath(p, live) for p in held_old)

    res = compact_batch(spark, cfg, b, target_records_per_file=10_000)
    assert res["rows"] == baseline and res["files_after"] < res["files_before"]

    man = read_file_manifest(live)
    assert man["generation"] == 1
    assert len(man["retired"]) == 1
    ent = man["retired"][0]
    assert ent["generation"] == 0 and sorted(ent["files"]) == old_files
    superseded_at = ent["superseded_at"]

    # the old generation survived the flip: the held reader still reads
    # a complete old generation, and new resolutions see the new one
    assert spark.read.option("basePath", root).parquet(*held_old).count() \
        == baseline
    assert read_routed(spark, cfg).count() == sum(
        m.rows_routed for m in metrics)
    # both generations physically on disk
    assert set(old_files) <= set(data_files(live))

    committer = get_committer(cfg.commit_protocol)
    # before the window passes: expiry is a no-op
    assert vacuum_expired(committer, live, cfg.vacuum_retention_s,
                          now=superseded_at + 10) == []
    assert spark.read.option("basePath", root).parquet(*held_old).count() \
        == baseline

    # after the window: the retired generation is reaped, the manifest
    # drops the entry, and the current generation is untouched
    removed = vacuum_expired(committer, live, cfg.vacuum_retention_s,
                             now=superseded_at + 3601)
    assert sorted(removed) == old_files
    man2 = read_file_manifest(live)
    assert not man2.get("retired")
    assert sorted(man2["files"]) == sorted(man["files"])
    assert data_files(live) == sorted(man["files"])
    assert read_routed(spark, cfg).count() == sum(
        m.rows_routed for m in metrics)


def test_retired_entries_accumulate_and_expire_independently(spark, ran):
    """Two retained compactions stack two retired generations; expiry
    honors each entry's own supersession time."""
    cfg, metrics = ran
    b = committed_batch_ids(cfg)[1]
    root = os.path.join(cfg.output_path, "routed")
    live = os.path.join(root, f"batch_id={b}")
    rows = metrics[1].rows_routed

    compact_batch(spark, cfg, b, target_records_per_file=10_000)
    compact_batch(spark, cfg, b, target_records_per_file=20_000)
    man = read_file_manifest(live)
    assert man["generation"] == 2 and len(man["retired"]) == 2
    t0 = man["retired"][0]["superseded_at"]
    gen0 = sorted(man["retired"][0]["files"])

    committer = get_committer(cfg.commit_protocol)
    # age only the first entry past the window (the second is younger
    # but with equal timestamps resolution, force it younger)
    man["retired"][1]["superseded_at"] = t0 + 100
    from logfowd2_spark.streaming.commit import write_file_manifest

    write_file_manifest(committer, live, man["files"], man["generation"],
                        stats=man.get("stats"), retired=man["retired"])
    removed = vacuum_expired(committer, live, cfg.vacuum_retention_s,
                             now=t0 + 3601)
    assert sorted(removed) == gen0
    man2 = read_file_manifest(live)
    assert len(man2["retired"]) == 1
    assert man2["retired"][0]["superseded_at"] == t0 + 100
    assert spark.read.option("basePath", root).parquet(
        *resolve_batch_paths(root, b)).count() == rows


def test_vacuum_expired_table_sweeps_all_dirs(spark, ran):
    """The table-level maintenance pass reaps every expired retired
    generation under the routed root in one metadata-only sweep."""
    cfg, metrics = ran
    root = os.path.join(cfg.output_path, "routed")
    # all batch dirs from the previous tests may still hold retired
    # entries; sweep far in the future and verify nothing retired stays
    out = vacuum_expired_table(cfg, now=4e18)
    for name in sorted(os.listdir(root)):
        if not name.startswith("batch_id="):
            continue
        man = read_file_manifest(os.path.join(root, name))
        if man is not None:
            assert not man.get("retired")
    assert read_routed(spark, cfg).count() == sum(
        m.rowsrouted if hasattr(m, "rowsrouted") else m.rows_routed
        for m in metrics)
    assert isinstance(out, dict)
