"""Snapshot log, time travel, rollback (commit.py's `_history/` layer
— Iceberg's snapshot list / `rollback_to_snapshot` on the plain
layout): every manifest flip archives the superseded manifest before
the flip, `read_file_manifest_at` resolves a snapshot by generation or
timestamp, `snapshot_files` proves it is still readable (loud failure
past retention expiry, never a partial read), and rollback publishes an
old file list as a NEW forward-moving generation."""

import json
import os

import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.commit import (
    FILE_MANIFEST,
    PutCommitter,
    archive_manifest,
    data_files,
    get_committer,
    read_file_manifest,
    read_file_manifest_at,
    rollback_to_generation,
    snapshot_files,
    snapshot_log,
    vacuum_expired,
    write_file_manifest,
)
from logfowd2_spark.streaming.maintenance import (
    committed_batch_ids,
    compact_batch,
    read_batch_snapshot,
    rollback_batch,
    snapshot_log_table,
)
from logfowd2_spark.streaming.pipeline import read_routed, run_pipeline


@pytest.fixture(scope="module")
def ran(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("snaplog")
    paths = synth.write_dataset(str(d / "in"), n_rows=600, seed=23, n_files=4)
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
    """Order-insensitive row fingerprint for exact-content equality."""
    from pyspark.sql import functions as F

    return df.select(
        # decimal accumulator: a bigint sum of 64-bit hashes overflows
        F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)"))
        .alias("h"),
        F.count("*").alias("n"),
    ).first()


def test_initial_commit_is_a_snapshot(ran):
    cfg, metrics = ran
    b = committed_batch_ids(cfg)[0]
    live = os.path.join(cfg.output_path, "routed", f"batch_id={b}")
    man = read_file_manifest(live)
    assert isinstance(man.get("committed_at"), float)
    log = snapshot_log(live)
    assert len(log) == 1
    (row,) = log
    assert row["is_current"] and row["generation"] == man["generation"]
    assert row["superseded_at"] is None
    assert row["rows"] == metrics[0].rows_routed  # manifest stats carried


def test_flip_archives_and_time_travel_resolves(spark, ran):
    cfg, metrics = ran
    b = committed_batch_ids(cfg)[0]
    live = os.path.join(cfg.output_path, "routed", f"batch_id={b}")
    before = _checksum(read_batch_snapshot(spark, cfg, b))
    gen0 = read_file_manifest(live)

    compact_batch(spark, cfg, b, target_records_per_file=10_000)

    log = snapshot_log(live)
    assert [r["generation"] for r in log] == [gen0["generation"],
                                              gen0["generation"] + 1]
    old, cur = log
    assert not old["is_current"] and cur["is_current"]
    assert old["superseded_at"] is not None
    assert old["rows"] == cur["rows"] == metrics[0].rows_routed

    # by generation: the archived manifest, file list intact
    man0 = read_file_manifest_at(live, generation=gen0["generation"])
    assert sorted(man0["files"]) == sorted(gen0["files"])
    assert sorted(snapshot_files(live, generation=gen0["generation"])) \
        == sorted(gen0["files"])

    # by timestamp: before the flip -> old generation, after -> current
    assert read_file_manifest_at(
        live, as_of=cur["committed_at"] - 1e-3,
    )["generation"] == gen0["generation"]
    assert read_file_manifest_at(
        live, as_of=cur["committed_at"] + 1e-3,
    )["generation"] == cur["generation"]

    # the snapshot READ is bit-identical to the pre-compaction content,
    # planned over exactly the old generation's files
    snap = read_batch_snapshot(spark, cfg, b, generation=gen0["generation"])
    assert _checksum(snap) == before
    assert _checksum(read_batch_snapshot(
        spark, cfg, b, as_of=cur["committed_at"] - 1e-3)) == before

    with pytest.raises(LookupError):
        read_file_manifest_at(live, generation=99)
    with pytest.raises(ValueError):
        read_file_manifest_at(live, generation=0, as_of=1.0)
    with pytest.raises(ValueError):
        read_file_manifest_at(live)


def test_rollback_publishes_forward(spark, ran):
    cfg, metrics = ran
    b = committed_batch_ids(cfg)[1]
    live = os.path.join(cfg.output_path, "routed", f"batch_id={b}")
    before = _checksum(read_batch_snapshot(spark, cfg, b))
    gen0 = read_file_manifest(live)

    compact_batch(spark, cfg, b, target_records_per_file=10_000)
    gen1 = read_file_manifest(live)
    assert gen1["generation"] == gen0["generation"] + 1

    out = rollback_batch(cfg, b, gen0["generation"])
    assert out == {"dir": f"batch_id={b}",
                   "rolled_back_to": gen0["generation"],
                   "generation_now": gen0["generation"] + 2,
                   "n_files": len(gen0["files"])}
    man = read_file_manifest(live)
    # history moved FORWARD: the rollback is itself a snapshot...
    assert man["generation"] == gen0["generation"] + 2
    assert man["rollback_of"] == gen0["generation"]
    assert sorted(man["files"]) == sorted(gen0["files"])
    # ...and the undone generation retired under the retention window,
    # still time-travel-readable
    assert any(ent["generation"] == gen1["generation"]
               and sorted(ent["files"]) == sorted(gen1["files"])
               for ent in man["retired"])
    assert _checksum(read_batch_snapshot(
        spark, cfg, b, generation=gen1["generation"])) == before

    # the table read resolves the rolled-back content and stays exact
    assert _checksum(read_batch_snapshot(spark, cfg, b)) == before
    assert read_routed(spark, cfg).count() == sum(
        m.rows_routed for m in metrics)

    # rolling back to the current generation is a no-op
    again = rollback_batch(cfg, b, man["generation"])
    assert again["generation_now"] == man["generation"]

    # the rollback itself is reversible: forward to gen1's list again
    fwd = rollback_batch(cfg, b, gen1["generation"])
    assert fwd["generation_now"] == man["generation"] + 1
    assert sorted(read_file_manifest(live)["files"]) \
        == sorted(gen1["files"])
    assert _checksum(read_batch_snapshot(spark, cfg, b)) == before


def test_expiry_breaks_time_travel_loudly(spark, ran):
    cfg, metrics = ran
    b = committed_batch_ids(cfg)[2]
    live = os.path.join(cfg.output_path, "routed", f"batch_id={b}")
    gen0 = read_file_manifest(live)
    compact_batch(spark, cfg, b, target_records_per_file=10_000)
    ent = read_file_manifest(live)["retired"][0]

    committer = get_committer(cfg.commit_protocol)
    # inside the window: snapshot still readable
    assert vacuum_expired(committer, live, cfg.vacuum_retention_s,
                          now=ent["superseded_at"] + 1) == []
    snapshot_files(live, generation=gen0["generation"])

    removed = vacuum_expired(committer, live, cfg.vacuum_retention_s,
                             now=ent["superseded_at"] + 3601)
    assert sorted(removed) == sorted(gen0["files"])
    # the data is gone -> loud FileNotFoundError...
    # ...and the log entry expired WITH it -> the snapshot no longer
    # resolves at all (Iceberg expire_snapshots removes the metadata)
    with pytest.raises(LookupError):
        read_file_manifest_at(live, generation=gen0["generation"])
    # rollback past retention is refused, current data unharmed
    with pytest.raises((LookupError, FileNotFoundError)):
        rollback_to_generation(committer, live, gen0["generation"])
    assert read_batch_snapshot(spark, cfg, b).count() \
        == metrics[2].rows_routed


def test_rollback_requires_readable_snapshot(spark, ran, tmp_path):
    """A snapshot whose files were lost (not just expired) is refused
    with a FileNotFoundError naming the gap — never a partial rollback."""
    cfg, _ = ran
    b = committed_batch_ids(cfg)[3]
    live = os.path.join(cfg.output_path, "routed", f"batch_id={b}")
    gen0 = read_file_manifest(live)
    compact_batch(spark, cfg, b, target_records_per_file=10_000)
    victim = os.path.join(live, gen0["files"][0])
    os.remove(victim)
    committer = get_committer(cfg.commit_protocol)
    with pytest.raises(FileNotFoundError):
        snapshot_files(live, generation=gen0["generation"])
    with pytest.raises(FileNotFoundError):
        rollback_to_generation(committer, live, gen0["generation"])


def test_snapshot_log_table_lists_every_dir(ran):
    cfg, _ = ran
    logs = snapshot_log_table(cfg)
    ids = committed_batch_ids(cfg)
    assert set(logs) >= {f"batch_id={b}" for b in ids}
    for log in logs.values():
        gens = [r["generation"] for r in log]
        assert gens == sorted(gens)
        assert sum(r["is_current"] for r in log) == 1
        assert json.dumps(log)  # CLI-printable


# ---- pure-metadata unit layer (no Spark) ----------------------------------


def _mkman(tmp, files, gen, committed_at):
    committer = PutCommitter()
    for f in files:
        path = os.path.join(tmp, f)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as fh:
            fh.write(b"x")
    write_file_manifest(committer, tmp, files, gen,
                        committed_at=committed_at)
    return committer


def test_as_of_prefers_stamped_entries(tmp_path):
    """A legacy UN-stamped history entry never shadows a stamped
    qualifying one; it is chosen only when nothing stamped qualifies."""
    live = str(tmp_path)
    committer = _mkman(live, ["a.parquet"], 1, committed_at=100.0)
    archive_manifest(committer, live, read_file_manifest(live),
                     superseded_at=110.0)
    # legacy flip with no committed_at stamp
    write_file_manifest(committer, live, ["b.parquet"], 2)
    archive_manifest(committer, live, read_file_manifest(live),
                     superseded_at=210.0)
    write_file_manifest(committer, live, ["c.parquet"], 3,
                        committed_at=200.0)

    # stamped gen-1 qualifies at 150 even though unstamped gen-2 is newer
    assert read_file_manifest_at(live, as_of=150.0)["generation"] == 1
    assert read_file_manifest_at(live, as_of=250.0)["generation"] == 3
    # nothing stamped qualifies at 50: the unstamped legacy is the
    # documented fallback
    assert read_file_manifest_at(live, as_of=50.0)["generation"] == 2


def test_archive_is_idempotent(tmp_path):
    """A crash-replayed flip neither restamps superseded_at nor re-puts
    the archive — the original supersession time survives the replay."""
    live = str(tmp_path)
    committer = _mkman(live, ["a.parquet"], 1, committed_at=100.0)
    man = read_file_manifest(live)
    archive_manifest(committer, live, man, superseded_at=110.0)
    archive_manifest(committer, live, man, superseded_at=999.0)  # replay
    assert read_file_manifest_at(live, generation=1)["superseded_at"] \
        == 110.0


def test_history_is_invisible_to_data_listings(tmp_path):
    """`_history/` is underscore-prefixed: data listings, manifests and
    vacuums never see it (Spark partition discovery skips it too)."""
    live = str(tmp_path)
    committer = _mkman(live, ["a.parquet"], 1, committed_at=100.0)
    archive_manifest(committer, live, read_file_manifest(live))
    write_file_manifest(committer, live, ["b.parquet"], 2,
                        committed_at=200.0)
    with open(os.path.join(live, "b.parquet"), "wb") as fh:
        fh.write(b"x")
    assert data_files(live) == ["a.parquet", "b.parquet"]
    assert os.path.exists(os.path.join(live, "_history", "1.json"))
    assert os.path.exists(os.path.join(live, FILE_MANIFEST))
