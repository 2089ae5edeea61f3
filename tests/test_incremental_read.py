"""Incremental (CDC-style) reads — Iceberg's incremental append scan
on the plain layout.  Batch axis: `read_routed_between` returns exactly
the batches committed after a watermark (always sound — table-level
commits are append-only).  Generation axis: every manifest flip records
its `operation` kind and `added` files; `read_appended_between` returns
exactly the rows appended over a generation range, SKIPS `replace`
snapshots (compactions — content-preserving by the row-count verify),
and REFUSES `overwrite`/`rollback`/legacy snapshots, because appends
scanned across a delete would resurrect retracted rows downstream."""

import os

import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.commit import (
    CONSOLIDATED_DIR,
    PutCommitter,
    archive_manifest,
    incremental_files,
    read_file_manifest,
    write_file_manifest,
)
from logfowd2_spark.streaming.maintenance import (
    committed_batch_ids,
    compact_batch,
    compact_table,
    delete_where,
    read_appended_between,
    read_routed_between,
    rollback_batch,
    table_scan,
)
from logfowd2_spark.streaming.pipeline import read_routed, run_pipeline


@pytest.fixture(scope="module")
def ran(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("increm")
    paths = synth.write_dataset(str(d / "in"), n_rows=600, seed=31, n_files=3)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        max_line_size=256,
        bulk_size=40,
        commit_protocol="rename",
        vacuum_retention_s=3600.0,
    )
    metrics = run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                           files_per_batch=1)
    return cfg, metrics


def _checksum(df):
    from pyspark.sql import functions as F

    return df.select(
        F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)"))
        .alias("h"),
        F.count("*").alias("n"),
    ).first()


def test_batch_axis_between(spark, ran):
    cfg, metrics = ran
    ids = committed_batch_ids(cfg)
    inc = read_routed_between(spark, cfg, ids[0])
    assert _checksum(inc) == _checksum(table_scan(spark, cfg, ids[1:]))
    assert inc.count() == sum(m.rows_routed for m in metrics[1:])
    # bounded upper end + empty range
    assert read_routed_between(spark, cfg, ids[0], ids[1]).count() \
        == metrics[1].rows_routed
    assert read_routed_between(spark, cfg, ids[0], ids[0]).count() == 0
    with pytest.raises(ValueError):
        read_routed_between(spark, cfg, "nope")
    with pytest.raises(ValueError):
        read_routed_between(spark, cfg, ids[1], ids[0])


def test_replace_skipped_overwrite_and_rollback_refused(spark, ran):
    cfg, metrics = ran
    b = committed_batch_ids(cfg)[1]
    live = os.path.join(cfg.output_path, "routed", f"batch_id={b}")

    # generation 1: compaction = replace -> skipped, nothing appended
    compact_batch(spark, cfg, b, target_records_per_file=10_000)
    assert read_file_manifest(live)["operation"] == "replace"
    inc = read_appended_between(spark, cfg, b, 0)
    assert inc.count() == 0
    assert "pod_name" in inc.columns  # empty WITH the table schema

    # generation 2: COW delete = overwrite -> the range is refused
    pod = read_batch_snapshot_pod(spark, cfg, b)
    out = delete_where(spark, cfg, [("batch_id", "==", b),
                                    ("pod_name", "==", pod)])
    assert out["deleted_rows"] > 0
    assert read_file_manifest(live)["operation"] == "overwrite"
    with pytest.raises(ValueError, match="overwrite"):
        read_appended_between(spark, cfg, b, 0)
    with pytest.raises(ValueError, match="overwrite"):
        read_appended_between(spark, cfg, b, 1, 2)

    # generation 3: rollback -> refused too
    rollback_batch(cfg, b, 1)
    assert read_file_manifest(live)["operation"] == "rollback"
    with pytest.raises(ValueError, match="rollback"):
        read_appended_between(spark, cfg, b, 2)
    # ranges entirely before the mutations still answer (and are empty)
    assert read_appended_between(spark, cfg, b, 0, 1).count() == 0
    assert read_routed(spark, cfg).count() == sum(
        m.rows_routed for m in metrics)


def read_batch_snapshot_pod(spark, cfg, b) -> str:
    from logfowd2_spark.streaming.maintenance import read_batch_snapshot

    return read_batch_snapshot(spark, cfg, b).select("pod_name").first()[0]


def test_consolidated_appends_are_incremental(spark, ran):
    cfg, metrics = ran
    ids = committed_batch_ids(cfg)
    cons = os.path.join(cfg.output_path, "routed", CONSOLIDATED_DIR)

    # generation 1 consolidates batch 0 only
    compact_table(spark, cfg, target_records_per_file=10_000,
                  upto_batch_id=ids[0])
    man1 = read_file_manifest(cons)
    assert man1["operation"] == "append" and man1["generation"] == 1
    # what batches 1..2 hold RIGHT NOW (batch 1 was deleted-from above)
    expected = _checksum(table_scan(spark, cfg, ids[1:]))

    # generation 2 consolidates the rest — an append of exactly them
    compact_table(spark, cfg, target_records_per_file=10_000)
    man2 = read_file_manifest(cons)
    assert man2["operation"] == "append" and man2["generation"] == 2
    assert sorted(man2["added"]) == sorted(
        set(man2["files"]) - set(man1["files"]))

    inc = read_appended_between(spark, cfg, CONSOLIDATED_DIR, 1)
    assert _checksum(inc) == expected
    # explicit upper bound and provably-empty range
    assert _checksum(read_appended_between(
        spark, cfg, CONSOLIDATED_DIR, 1, 2)) == expected
    assert read_appended_between(
        spark, cfg, CONSOLIDATED_DIR, 2, 2).count() == 0
    # the full-table read is untouched by any of this (the rollback in
    # the previous test restored batch 1's pre-delete content)
    assert read_routed(spark, cfg).count() == sum(
        m.rows_routed for m in metrics)


# ---- pure-metadata unit layer (no Spark) ----------------------------------


def _put(live, name):
    path = os.path.join(live, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(b"x")


def test_incremental_files_lineage(tmp_path):
    live = str(tmp_path)
    committer = PutCommitter()
    _put(live, "a.parquet")
    write_file_manifest(committer, live, ["a.parquet"], 1,
                        committed_at=100.0,
                        extra={"operation": "append",
                               "added": ["a.parquet"]})
    archive_manifest(committer, live, read_file_manifest(live),
                     superseded_at=150.0)
    _put(live, "b.parquet")
    write_file_manifest(committer, live, ["a.parquet", "b.parquet"], 2,
                        committed_at=200.0,
                        extra={"operation": "append",
                               "added": ["b.parquet"]})

    ents = incremental_files(live, 1)
    assert [(e["generation"], e["files"]) for e in ents] \
        == [(2, ["b.parquet"])]
    assert incremental_files(live, 1, 1) == []
    # the anchor itself must still resolve
    with pytest.raises(LookupError):
        incremental_files(live, 0)
    # an appended file vacuumed away fails loudly, never a partial read
    os.remove(os.path.join(live, "b.parquet"))
    with pytest.raises(FileNotFoundError):
        incremental_files(live, 1)


def test_incremental_files_refuses_legacy(tmp_path):
    """A pre-lineage flip (no `operation` recorded) cannot be proven
    append-only — the incremental read refuses instead of guessing."""
    live = str(tmp_path)
    committer = PutCommitter()
    _put(live, "a.parquet")
    write_file_manifest(committer, live, ["a.parquet"], 1,
                        committed_at=100.0,
                        extra={"operation": "append",
                               "added": ["a.parquet"]})
    archive_manifest(committer, live, read_file_manifest(live),
                     superseded_at=150.0)
    _put(live, "b.parquet")
    write_file_manifest(committer, live, ["b.parquet"], 2,
                        committed_at=200.0)  # legacy: no operation
    with pytest.raises(ValueError, match="unknown kind"):
        incremental_files(live, 1)
