"""Round-6 correctness fixes from the round-5 ADVICE findings:

- ``manifest_lock`` serializes the checkpoint batch-log's
  read-modify-write cycles (merge_into registration vs the streaming
  trigger's) so concurrent writers can no longer erase each other's
  just-committed BatchRecord;
- ``_history_entries`` skips crash-left dot-prefixed temp files, so
  debris cannot resurrect a vacuum-pruned generation;
- snapshot-log expiry never prunes the current generation's
  predecessor archive (the OCC claim) — even at ``retention_s == 0`` —
  and treats a missing ``superseded_at`` as not-expired;
- ``poll_changes`` applies the table-surface drop/rename projection to
  the changelog parts, so a CDC group's deletes keep cancelling its
  inserts on evolved tables.
"""

import json
import os
import threading

from logfowd2_spark.streaming.checkpoint import (
    BatchRecord,
    Manifest,
    load_manifest,
    manifest_lock,
    save_manifest,
)
from logfowd2_spark.streaming.commit import (
    PutCommitter,
    archive_manifest,
    claim_generation,
    read_file_manifest,
    snapshot_log,
    vacuum_expired,
    write_file_manifest,
)


def _rec(bid: str) -> BatchRecord:
    return BatchRecord(batch_id=bid, input_files=[], rows_in=1,
                       rows_parsed=1, parse_failures=0, sink_counts={},
                       partition_metrics=[])


def test_manifest_lock_serializes_concurrent_writers(tmp_path):
    """8 writers × 12 locked load→record→save cycles: every record
    survives (the unserialized cycle loses updates whenever two writers
    interleave — the merge_into vs streaming-trigger race)."""
    path = str(tmp_path / "ckpt" / "manifest.json")
    save_manifest(Manifest(), path)

    def writer(w: int) -> None:
        for i in range(12):
            with manifest_lock(path):
                man = load_manifest(path)
                man.record(_rec(f"w{w}-{i:02d}"))
                save_manifest(man, path)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    man = load_manifest(path)
    assert len(man.batches) == 8 * 12
    assert len(man.order) == 8 * 12  # commit order intact, no dupes


def _mk_gen(live, files, gen, committed_at):
    committer = PutCommitter()
    for f in files:
        p = os.path.join(live, f)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as fh:
            fh.write(b"x")
    write_file_manifest(committer, live, files, gen,
                        committed_at=committed_at)
    return committer


def test_history_entries_skip_dot_debris(tmp_path):
    """Crash-left '.put-*'/'.claim-*' temps in _history/ are ignored:
    a vacuum-pruned generation cannot resurrect through debris."""
    live = str(tmp_path)
    committer = _mk_gen(live, ["a.parquet"], 1, committed_at=100.0)
    archive_manifest(committer, live, read_file_manifest(live),
                     superseded_at=110.0)
    write_file_manifest(committer, live, ["b.parquet"], 2,
                        committed_at=200.0)
    # debris: a fully-parseable manifest under a dot-temp name
    junk = {"generation": 0, "files": ["ghost.parquet"],
            "committed_at": 1.0, "superseded_at": 2.0}
    with open(os.path.join(live, "_history", ".put-123.json"), "w") as fh:
        json.dump(junk, fh)
    gens = [row["generation"] for row in snapshot_log(live)]
    assert 0 not in gens
    assert gens == [1, 2]


def test_vacuum_zero_retention_preserves_occ_claim(tmp_path):
    """With retention_s == 0 (the config default) the history prune is
    a no-op: the age test would be trivially true for every entry,
    including the current generation's predecessor archive — the OCC
    claim (claim_generation) — whose removal would let a stale writer
    re-claim an already-committed generation.  Unstamped entries are
    never provably expired and survive positive-window prunes too."""
    live = str(tmp_path)
    committer = _mk_gen(live, ["a.parquet"], 1, committed_at=100.0)
    archive_manifest(committer, live, read_file_manifest(live),
                     superseded_at=110.0)
    write_file_manifest(committer, live, ["b.parquet"], 2,
                        committed_at=200.0)
    archive_manifest(committer, live, read_file_manifest(live),
                     superseded_at=210.0)
    write_file_manifest(committer, live, ["c.parquet"], 3,
                        committed_at=300.0)
    gen2_man = json.load(open(os.path.join(live, "_history", "2.json")))

    removed = vacuum_expired(committer, live, retention_s=0.0, now=1e9)
    assert removed == []  # nothing retired; history prune is a no-op
    hist = sorted(os.listdir(os.path.join(live, "_history")))
    assert hist == ["1.json", "2.json"]

    # the surviving claim still wins the OCC race: a stale writer
    # re-claiming generation 3 (prev_man = gen 2) must CONFLICT
    stale = claim_generation(live, gen2_man, token="stale-writer")
    assert stale is not None  # claim refused — existing doc returned

    # an UNSTAMPED legacy entry is kept even by a positive-window prune
    legacy = dict(read_file_manifest(live))
    legacy["generation"] = 0
    legacy.pop("superseded_at", None)
    with open(os.path.join(live, "_history", "0.json"), "w") as fh:
        json.dump(legacy, fh)
    vacuum_expired(committer, live, retention_s=3600.0, now=1e9)
    hist = sorted(os.listdir(os.path.join(live, "_history")))
    # stamped-and-expired 1/2 pruned under the positive window; the
    # unstamped legacy survives
    assert hist == ["0.json"]


def test_cdc_schema_uniform_after_rename(spark, tmp_path):
    """After --rename-column, poll_changes delivers inserts AND
    retractions under the SAME (surfaced) column set, with the renamed
    column populated on delete rows — no null-padded union."""
    from pyspark.sql import functions as F

    from logfowd2_spark import synth
    from logfowd2_spark.config import PipelineConfig
    from logfowd2_spark.streaming.follower import commit_cursor, poll_changes
    from logfowd2_spark.streaming.maintenance import (
        delete_where,
        rename_column,
    )
    from logfowd2_spark.streaming.pipeline import run_pipeline

    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=300,
                                seed=7, n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_line_size=256,
        vacuum_retention_s=3600.0,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)

    got = poll_changes(spark, cfg, "g-evo")
    assert got.df is not None
    victim = got.df.filter(F.col("_change_type") == "insert") \
        .select("doc_id").first()["doc_id"]
    commit_cursor(cfg, "g-evo", got.cursor)

    rename_column(cfg, "level", "severity")
    delete_where(spark, cfg, [("doc_id", "==", victim)], mode="cow")

    got2 = poll_changes(spark, cfg, "g-evo", cursor=got.cursor)
    assert got2.df is not None
    cols = set(got2.df.columns)
    assert "severity" in cols and "level" not in cols
    deletes = got2.df.filter(F.col("_change_type") == "delete")
    n_del = deletes.count()
    assert n_del > 0
    # retraction rows carry the surfaced column POPULATED — the exact
    # rows the insert delivered, so a multiset consumer cancels them
    assert deletes.filter(F.col("severity").isNull()).count() == 0
