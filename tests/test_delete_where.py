"""Copy-on-write row-level delete (``maintenance.delete_where``) —
Iceberg's DELETE FROM ... WHERE in COW mode on the plain layout: only
files provably holding matches are rewritten under the source's atomic
manifest flip; unaffected files stay listed untouched; superseded
originals retire under the retention window (in-flight readers keep a
complete generation) and are physically reaped past it.

Covers: exact row removal + untouched-file preservation, no-match
no-ops, whole-batch deletes by batch_id, deletes against the
consolidated generation (metadata keys preserved, as-of still exact),
retention-deferred removal + expiry, and adoption of manifest-less
legacy dirs into the manifest layer."""

import os

import pytest
from pyspark.sql import functions as F

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.commit import (
    CONSOLIDATED_DIR,
    FILE_MANIFEST,
    read_file_manifest,
)
from logfowd2_spark.streaming.maintenance import (
    committed_batch_ids,
    compact_table,
    delete_where,
    materialize_deletes,
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
    d = tmp_path_factory.mktemp(f"delw-{request.param}")
    paths = synth.write_dataset(str(d / "in"), n_rows=900, seed=31, n_files=3)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        max_line_size=256,
        bulk_size=40,  # several files per batch
        commit_protocol=request.param,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    return d, paths, cfg


def _batch_dirs(cfg):
    root = os.path.join(cfg.output_path, "routed")
    return sorted(
        os.path.join(root, n) for n in os.listdir(root)
        if n.startswith("batch_id=")
    )


def test_no_match_is_a_noop(spark, ran):
    d, paths, cfg = ran
    gens = {p: read_file_manifest(p)["generation"] for p in _batch_dirs(cfg)}
    res = delete_where(spark, cfg, [("pod_name", "==", "no-such-pod")])
    assert res == {"deleted_rows": 0, "files_rewritten": 0, "dirs": {}}
    # no manifest flipped anywhere
    for p, g in gens.items():
        assert read_file_manifest(p)["generation"] == g


def test_delete_rows_rewrites_only_hit_files(spark, ran):
    d, paths, cfg = ran
    before = _norm(read_routed(spark, cfg).toPandas())
    pod = before["pod_name"].value_counts().index[2]
    n_pod = int((before["pod_name"] == pod).sum())
    assert n_pod > 0
    old_files = {p: set(read_file_manifest(p)["files"])
                 for p in _batch_dirs(cfg)}
    # ground truth of which files actually hold the pod's rows
    hits = (
        read_routed(spark, cfg).filter(F.col("pod_name") == pod)
        .select(F.input_file_name().alias("f")).distinct().collect()
    )
    hit_abs = {r["f"].replace("file://", "").replace("file:", "")
               for r in hits}

    res = delete_where(spark, cfg, [("pod_name", "==", pod)])
    assert res["deleted_rows"] == n_pod
    after = _norm(read_routed(spark, cfg).toPandas())
    assert (after["pod_name"] == pod).sum() == 0
    expect = _norm(before[before["pod_name"] != pod])
    assert after.equals(expect), "surviving rows changed under the delete"

    # every file that held no matching row is carried UNTOUCHED (same
    # relative path, no rewrite); every hit file is gone from the list
    for p in _batch_dirs(cfg):
        man = read_file_manifest(p)
        new_files = set(man["files"])
        hit_rels = {
            os.path.relpath(a, os.path.abspath(p))
            for a in hit_abs if a.startswith(os.path.abspath(p) + os.sep)
        }
        assert (old_files[p] - hit_rels) <= new_files
        assert not (hit_rels & new_files)
        assert man["deleted_rows"] > 0 or not hit_rels


def test_delete_whole_batch_by_id(spark, ran):
    d, paths, cfg = ran
    ids = committed_batch_ids(cfg)
    before = _norm(read_routed(spark, cfg).toPandas())
    n0 = int((before["batch_id"] == ids[0]).sum())
    other_gens = {
        p: read_file_manifest(p)["generation"]
        for p in _batch_dirs(cfg)
        if not p.endswith(f"batch_id={ids[0]}")
    }
    res = delete_where(spark, cfg, [("batch_id", "==", ids[0])])
    assert res["deleted_rows"] == n0
    after = _norm(read_routed(spark, cfg).toPandas())
    assert (after["batch_id"] == ids[0]).sum() == 0
    assert len(after) == len(before) - n0
    # untargeted batch dirs were never flipped (batch_id predicates are
    # resolved against dir names driver-side, zero Spark jobs for them)
    for p, g in other_gens.items():
        assert read_file_manifest(p)["generation"] == g


def test_delete_on_consolidated_generation(spark, ran):
    d, paths, cfg = ran
    compact_table(spark, cfg, target_records_per_file=100_000)
    root = os.path.join(cfg.output_path, "routed")
    live = os.path.join(root, CONSOLIDATED_DIR)
    man0 = read_file_manifest(live)
    before = _norm(read_routed(spark, cfg).toPandas())
    pod = before["pod_name"].value_counts().index[0]
    n_pod = int((before["pod_name"] == pod).sum())

    res = delete_where(spark, cfg, [("pod_name", "==", pod)])
    assert res["deleted_rows"] == n_pod
    after = _norm(read_routed(spark, cfg).toPandas())
    assert after.equals(_norm(before[before["pod_name"] != pod]))

    man1 = read_file_manifest(live)
    assert man1["generation"] == man0["generation"] + 1
    # consolidation metadata (phase-2 recovery record, schema) must
    # survive the delete's flip
    assert man1["consolidates"] == man0["consolidates"]
    assert man1.get("schema") == man0.get("schema")
    assert man1["deleted_rows"] >= n_pod

    # as-of a consolidated id reflects the delete (current manifests)
    ids = committed_batch_ids(cfg)
    asof = _norm(read_routed_as_of(spark, cfg, ids[-1]).toPandas())
    assert (asof["pod_name"] == pod).sum() == 0


def test_retention_defers_then_expiry_reaps(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("delw-ret")
    paths = synth.write_dataset(str(d / "in"), n_rows=300, seed=37, n_files=1)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        bulk_size=40,
        vacuum_retention_s=3600.0,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"])
    before = _norm(read_routed(spark, cfg).toPandas())
    pod = before["pod_name"].value_counts().index[0]

    # a reader plan resolved BEFORE the delete: retention keeps its
    # complete generation readable across the flip
    pre_reader = read_routed(spark, cfg)
    res = delete_where(spark, cfg, [("pod_name", "==", pod)])
    assert res["deleted_rows"] > 0

    (live,) = _batch_dirs(cfg)
    man = read_file_manifest(live)
    retired = [f for e in man.get("retired", []) for f in e["files"]]
    assert retired, "hit files must retire under the retention window"
    for rel in retired:
        assert os.path.exists(os.path.join(live, rel))
    assert _norm(pre_reader.toPandas()).equals(before)

    t0 = man["retired"][0]["superseded_at"]
    assert vacuum_expired_table(cfg, now=t0 + 10) == {}  # window not passed
    out = vacuum_expired_table(cfg, now=t0 + 3601)
    assert set(out[os.path.basename(live)]) == set(retired)
    for rel in retired:  # right-to-be-forgotten: physically gone
        assert not os.path.exists(os.path.join(live, rel))
    after = _norm(read_routed(spark, cfg).toPandas())
    assert after.equals(_norm(before[before["pod_name"] != pod]))


def test_legacy_dir_is_adopted_then_deleted(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("delw-legacy")
    paths = synth.write_dataset(str(d / "in"), n_rows=300, seed=41, n_files=1)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        bulk_size=40,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"])
    (live,) = _batch_dirs(cfg)
    os.remove(os.path.join(live, FILE_MANIFEST))  # simulate a legacy dir
    before = _norm(read_routed(spark, cfg).toPandas())
    pod = before["pod_name"].value_counts().index[0]

    res = delete_where(spark, cfg, [("pod_name", "==", pod)])
    assert res["deleted_rows"] == int((before["pod_name"] == pod).sum())
    man = read_file_manifest(live)
    assert man is not None, "delete must adopt the dir into the layer"
    assert man["deleted_rows"] == res["deleted_rows"]
    after = _norm(read_routed(spark, cfg).toPandas())
    assert after.equals(_norm(before[before["pod_name"] != pod]))


# ---------------------------------------------------------------------------
# Deferred (merge-on-read) deletes: delete_where(mode="defer")
# ---------------------------------------------------------------------------

def _mk_table(spark, tmp_path_factory, name, n_rows=600, n_files=2, **kw):
    d = tmp_path_factory.mktemp(name)
    paths = synth.write_dataset(str(d / "in"), n_rows=n_rows, seed=47,
                                n_files=n_files)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        bulk_size=60,
        **kw,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    return cfg


def test_defer_is_metadata_only_and_applied_at_scan(spark,
                                                    tmp_path_factory):
    from logfowd2_spark.streaming.maintenance import export_ndjson_bulk
    from logfowd2_spark.streaming.pipeline import scan_routed

    cfg = _mk_table(spark, tmp_path_factory, "delw-mor")
    before = _norm(read_routed(spark, cfg).toPandas())
    pod = before["pod_name"].value_counts().index[1]
    n_pod = int((before["pod_name"] == pod).sum())
    snap = {p: (read_file_manifest(p)["generation"],
                tuple(read_file_manifest(p)["files"]))
            for p in _batch_dirs(cfg)}

    res = delete_where(spark, cfg, [("pod_name", "==", pod)],
                       mode="defer")
    assert res["deferred"] and res["dirs"]
    # METADATA-ONLY in cost (no file rewritten, no Spark job) but a
    # real SNAPSHOT: generation+1, operation recorded, files unchanged
    for p, (g, files) in snap.items():
        man = read_file_manifest(p)
        assert (man["generation"], tuple(man["files"])) == (g + 1, files)
        assert man["delete_filters"] == [[["pod_name", "==", pod]]]
        assert man["operation"] == "overwrite"
        assert man["tombstones_added"] == [[["pod_name", "==", pod]]]
    # ...but every read path applies the tombstone
    after = _norm(read_routed(spark, cfg).toPandas())
    assert after.equals(_norm(before[before["pod_name"] != pod]))
    assert scan_routed(spark, cfg,
                       [("pod_name", "==", pod)]).count() == 0
    ids = committed_batch_ids(cfg)
    asof = read_routed_as_of(spark, cfg, ids[0]).toPandas()
    assert (asof["pod_name"] == pod).sum() == 0
    # the NDJSON export recounts instead of trusting stale stats
    out = os.path.join(cfg.output_path, "export")
    n = export_ndjson_bulk(spark, cfg, ids[0], out)
    assert n == int((asof["batch_id"] == ids[0]).sum()
                    if "batch_id" in asof else len(asof))

    # idempotent re-issue: still exactly one tombstone entry
    delete_where(spark, cfg, [("pod_name", "==", pod)], mode="defer")
    for p in _batch_dirs(cfg):
        assert len(read_file_manifest(p)["delete_filters"]) == 1

    # a predicate the membership metadata refutes writes NO tombstone
    res2 = delete_where(spark, cfg, [("pod_name", "==", "no-such-pod")],
                        mode="defer")
    assert res2 == {"deferred": True, "dirs": {}}
    assert res["deleted_rows"] if "deleted_rows" in res else True

    # materialization: rows physically gone, tombstones cleared, counts
    # stamped — under one flip per dir
    out2 = materialize_deletes(spark, cfg)
    assert sum(r["matched"] for r in out2.values()) == n_pod
    for p in _batch_dirs(cfg):
        man = read_file_manifest(p)
        assert "delete_filters" not in man
        assert man["deleted_rows"] > 0 or \
            os.path.basename(p) not in out2
    final = _norm(read_routed(spark, cfg).toPandas())
    assert final.equals(after)
    # a second materialization is a no-op
    assert materialize_deletes(spark, cfg) == {}


def test_defer_then_compact_table_materializes_first(spark,
                                                     tmp_path_factory):
    """A consolidation over tombstoned sources must not fold logically
    deleted rows into the consolidated generation (whose manifest drops
    the per-source tombstones)."""
    cfg = _mk_table(spark, tmp_path_factory, "delw-mor-ct")
    before = _norm(read_routed(spark, cfg).toPandas())
    pod = before["pod_name"].value_counts().index[0]
    delete_where(spark, cfg, [("pod_name", "==", pod)], mode="defer")

    res = compact_table(spark, cfg, target_records_per_file=100_000)
    expect = _norm(before[before["pod_name"] != pod])
    assert res["rows"] == len(expect)
    after = _norm(read_routed(spark, cfg).toPandas())
    assert after.equals(expect)
    root = os.path.join(cfg.output_path, "routed")
    man = read_file_manifest(os.path.join(root, CONSOLIDATED_DIR))
    assert "delete_filters" not in man
    # the materialized counts rolled into the consolidated marker
    assert man["deleted_rows"] == len(before) - len(expect)
