"""Cross-batch table compaction (``compact_table``): many small batch
dirs bin-packed into the ``_consolidated`` generation under one manifest
flip + an atomic ``_TABLE.json`` pointer, with batch_id preserved as a
data column so as-of reads on pre-consolidation batch ids stay exact.
Covers: row equality, as-of correctness, incremental (second) runs,
reader isolation across the flip, crash replay of the staged swap, and
retention-deferred removal of the superseded batch dirs."""

import json
import os

import pandas as pd

import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.commit import (
    CONSOLIDATED_DIR,
    PUBLISH_MARKER,
    get_committer,
    read_file_manifest,
    read_table_manifest,
    stage_path,
)
from logfowd2_spark.streaming.maintenance import (
    committed_batch_ids,
    compact_table,
    read_routed_as_of,
    vacuum_expired_table,
)
from logfowd2_spark.streaming.pipeline import read_routed, run_pipeline


def _norm(pdf):
    pdf = pdf.copy()
    pdf["ts"] = pdf["ts"].astype(str)
    pdf["log_date"] = pdf["log_date"].astype(str)
    return (pdf.sort_values(["doc_id"])
            .reindex(sorted(pdf.columns), axis=1)
            .reset_index(drop=True))


@pytest.fixture(scope="module", params=["rename", "put"])
def ran(request, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"ctab-{request.param}")
    paths = synth.write_dataset(str(d / "in"), n_rows=900, seed=21, n_files=3)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        max_line_size=256,
        bulk_size=30,  # many small files per batch
        commit_protocol=request.param,
    )
    # two batches now; the third committed later for the incremental run
    metrics = run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                           files_per_batch=1, max_batches=2)
    return d, paths, cfg, metrics


def test_compact_table_roundtrip_and_as_of(spark, ran):
    d, paths, cfg, metrics = ran
    ids = committed_batch_ids(cfg)[:2]
    before_all = _norm(read_routed(spark, cfg).toPandas())
    before_b0 = _norm(read_routed_as_of(spark, cfg, ids[0]).toPandas())

    res = compact_table(spark, cfg, target_records_per_file=100_000)
    assert res["consolidated_ids"] == ids
    assert res["rows"] == len(before_all)
    assert res["files_after"] < res["files_before"]

    root = os.path.join(cfg.output_path, "routed")
    tman = read_table_manifest(root)
    assert tman["consolidated_ids"] == ids
    # retention 0 → superseded per-batch dirs reaped immediately
    assert tman["pending"] == []
    for b in ids:
        assert not os.path.isdir(os.path.join(root, f"batch_id={b}"))

    # full read and as-of on a PRE-consolidation batch id are unchanged
    after_all = _norm(read_routed(spark, cfg).toPandas())
    assert after_all.equals(before_all)
    after_b0 = _norm(read_routed_as_of(spark, cfg, ids[0]).toPandas())
    assert after_b0.equals(before_b0)


def test_incremental_consolidation_appends(spark, ran):
    """A batch committed after a consolidation is folded in by the next
    compact_table run; earlier consolidated files are re-listed, not
    rewritten."""
    d, paths, cfg, _ = ran
    root = os.path.join(cfg.output_path, "routed")
    live = os.path.join(root, CONSOLIDATED_DIR)
    gen1_files = set(read_file_manifest(live)["files"])

    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)  # commits the remaining batch
    ids = committed_batch_ids(cfg)
    assert len(ids) == 3
    before = _norm(read_routed(spark, cfg).toPandas())

    res = compact_table(spark, cfg, target_records_per_file=100_000)
    assert res["consolidated_ids"] == [ids[2]]
    man = read_file_manifest(live)
    # previous generation's files re-listed untouched, new ones appended
    assert gen1_files <= set(man["files"])
    assert len(man["files"]) > len(gen1_files)
    assert read_table_manifest(root)["consolidated_ids"] == ids

    after = _norm(read_routed(spark, cfg).toPandas())
    assert after.equals(before)
    # as-of a mid-table id: exactly batches 0-1
    mid = _norm(read_routed_as_of(spark, cfg, ids[1]).toPandas())
    assert set(mid["batch_id"].unique()) == set(ids[:2])
    assert len(mid) + (after["batch_id"] == ids[2]).sum() == len(after)

    # noop when everything is consolidated
    assert compact_table(spark, cfg)["consolidated_ids"] == []


def test_crash_before_table_pointer_is_replayable(spark, ran):
    """Crash after the consolidation stage reached commit-ready but
    before the _TABLE.json pointer: readers still see the per-batch
    view; recover() completes the file swap; re-running compact_table
    converges."""
    d, paths, cfg, _ = ran
    root = os.path.join(cfg.output_path, "routed")
    live = os.path.join(root, CONSOLIDATED_DIR)
    committer = get_committer(cfg.commit_protocol)
    before = _norm(read_routed(spark, cfg).toPandas())

    # simulate: stage a fake extra generation with a publish marker but
    # no flipped pointer (as if compact_table died between swap stages)
    staged = stage_path(live)
    os.makedirs(staged, exist_ok=True)
    man = read_file_manifest(live)
    committer.put_file(
        os.path.join(staged, PUBLISH_MARKER),
        json.dumps({"generation": man["generation"] + 1,
                    "files": man["files"], "publish": [],
                    "stats": man.get("stats", {})}).encode(),
    )
    healed = committer.recover(root)
    assert healed == [live]
    assert not os.path.isdir(staged)
    assert read_file_manifest(live)["generation"] == man["generation"] + 1
    after = _norm(read_routed(spark, cfg).toPandas())
    assert after.equals(before)


def test_retention_defers_batch_dir_removal(spark, tmp_path_factory):
    """With vacuum_retention_s > 0 the superseded per-batch dirs stay on
    disk (retention copies readers exclude) until the expiry sweep."""
    d = tmp_path_factory.mktemp("ctab-ret")
    paths = synth.write_dataset(str(d / "in"), n_rows=400, seed=23, n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        max_line_size=256,
        bulk_size=30,
        vacuum_retention_s=3600.0,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    ids = committed_batch_ids(cfg)
    before = _norm(read_routed(spark, cfg).toPandas())

    compact_table(spark, cfg)
    root = os.path.join(cfg.output_path, "routed")
    tman = read_table_manifest(root)
    assert [e["batch_id"] for e in tman["pending"]] == ids
    for b in ids:  # retention copies still on disk...
        assert os.path.isdir(os.path.join(root, f"batch_id={b}"))
    # ...but excluded from reads (no double counting)
    assert _norm(read_routed(spark, cfg).toPandas()).equals(before)

    t0 = tman["pending"][0]["superseded_at"]
    # before the window: nothing reaped
    assert vacuum_expired_table(cfg, now=t0 + 10) == {}
    # past the window: dirs reaped, pending cleared, reads unchanged
    out = vacuum_expired_table(cfg, now=t0 + 3601)
    assert out.get("pending_batch_dirs") == ids
    assert read_table_manifest(root)["pending"] == []
    for b in ids:
        assert not os.path.isdir(os.path.join(root, f"batch_id={b}"))
    assert _norm(read_routed(spark, cfg).toPandas()).equals(before)


def test_as_of_filter_pushes_to_consolidated_scan(spark, ran):
    """The as-of batch_id predicate must reach the consolidated parquet
    scan as a pushed filter (row-group stats pruning) — the property
    that keeps time travel cheap after cross-batch consolidation."""
    d, paths, cfg, _ = ran
    from logfowd2_spark.streaming.maintenance import (
        committed_batch_ids,
        read_routed_as_of,
    )

    compact_table(spark, cfg)  # no-op if earlier tests already ran it
    ids = committed_batch_ids(cfg)
    df = read_routed_as_of(spark, cfg, ids[0])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(batch_id,batch-00000)" in plan or "In(batch_id" in plan, \
        "batch_id predicate not pushed to the consolidated scan"


def test_crash_between_flip_and_pointer_no_duplication(spark,
                                                       tmp_path_factory):
    """THE consolidation crash window (round-5 review finding): the
    consolidated manifest flip committed (covering batch B) but the
    process died before the _TABLE.json update.  Readers must not
    double-count B (its per-batch dir is still live by the pointer),
    and the rerun must FINISH phase 2 for B instead of re-staging it —
    re-staging would list B's rows twice via keep_prev_files."""
    d = tmp_path_factory.mktemp("ctab-crash")
    paths = synth.write_dataset(str(d / "in"), n_rows=500, seed=29,
                                n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        bulk_size=40,
        vacuum_retention_s=3600.0,  # keep dirs so the window is live
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    ids = committed_batch_ids(cfg)
    root = os.path.join(cfg.output_path, "routed")
    baseline = _norm(read_routed(spark, cfg).toPandas())

    # consolidate batch 0 only, then commit the real state and simulate
    # the crash while consolidating batch 1: run it fully, then restore
    # the PRE-RUN _TABLE.json (the pointer write "never happened")
    compact_table(spark, cfg, upto_batch_id=ids[0])
    tman_before = read_table_manifest(root)
    compact_table(spark, cfg)  # consolidates batch 1 into the same gen
    from logfowd2_spark.streaming.commit import write_table_manifest

    write_table_manifest(get_committer(cfg.commit_protocol), root,
                         tman_before)

    # crash window: consolidated gen covers both ids, pointer only id 0,
    # id 1's per-batch dir still present → reads must stay exact
    man_c = read_file_manifest(os.path.join(root, CONSOLIDATED_DIR))
    assert set(man_c["consolidates"]) == set(ids)
    assert read_table_manifest(root)["consolidated_ids"] == [ids[0]]
    mid = _norm(read_routed(spark, cfg).toPandas())
    assert mid.equals(baseline), "crash window double-counts rows"

    # rerun: phase-2 recovery records id 1 WITHOUT re-staging
    gen_before = man_c["generation"]
    res = compact_table(spark, cfg)
    assert res["consolidated_ids"] == []  # nothing re-staged
    man_c2 = read_file_manifest(os.path.join(root, CONSOLIDATED_DIR))
    assert man_c2["generation"] == gen_before  # no new generation
    assert read_table_manifest(root)["consolidated_ids"] == ids
    after = _norm(read_routed(spark, cfg).toPandas())
    assert after.equals(baseline), "rerun duplicated the batch's rows"


def test_auto_compact_policy(spark, tmp_path):
    """auto_compact_min_batches: the driver consolidates automatically
    once enough batch dirs accumulate; below threshold it leaves the
    table alone; the compacted read stays exact."""
    from logfowd2_spark import synth
    from logfowd2_spark.streaming.commit import read_table_manifest

    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=300,
                                seed=61, n_files=4)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_line_size=256,
        auto_compact_min_batches=3,
    )
    # two batches: below threshold, nothing consolidated
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1, max_batches=2)
    root = os.path.join(cfg.output_path, "routed")
    assert read_table_manifest(root) is None
    before = read_routed(spark, cfg).toPandas()

    # the remaining two arrive: 4 >= 3 -> auto-consolidated
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    tman = read_table_manifest(root)
    assert tman is not None and len(tman["consolidated_ids"]) == 4
    after = read_routed(spark, cfg).toPandas()
    assert len(after) > len(before)
    # and the consolidated read is exact vs a policy-free control run
    ctl = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out2"),
        checkpoint_path=str(tmp_path / "ckpt2"),
        max_line_size=256,
    )
    run_pipeline(spark, ctl, paths["pods"], paths["routes"],
                 files_per_batch=1)
    want = read_routed(spark, ctl).toPandas()
    key = sorted(after.columns)
    pd.testing.assert_frame_equal(
        after[key].astype(str).sort_values(key).reset_index(drop=True),
        want[key].astype(str).sort_values(key).reset_index(drop=True))
