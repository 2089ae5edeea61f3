"""CDC changelog reads — Iceberg's ``create_changelog_view`` on the
plain layout.  `read_changes_between` returns the exact row-level
changes over a generation range (`_change_type` insert/delete,
`_change_generation`): appends contribute inserts, rewrites diff
dropped-vs-added files multiset-exactly, tombstone snapshots contribute
the newly hidden kept-file rows, and compactions / materializations
contribute nothing.  Deferred-delete tombstones are now SNAPSHOTS
(generation+1), so time travel to the prior generation shows the rows
— the delete no longer leaks backward in time."""

import os

import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.commit import (
    PutCommitter,
    archive_manifest,
    changelog_entries,
    read_file_manifest,
    write_file_manifest,
)
from logfowd2_spark.streaming.maintenance import (
    committed_batch_ids,
    compact_batch,
    delete_where,
    materialize_deletes,
    read_batch_snapshot,
    read_changes_between,
    rollback_batch,
)
from logfowd2_spark.streaming.pipeline import run_pipeline


@pytest.fixture(scope="module")
def ran(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("chlog")
    paths = synth.write_dataset(str(d / "in"), n_rows=600, seed=53, n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        bulk_size=40,
        commit_protocol="rename",
        vacuum_retention_s=3600.0,  # dropped files survive as retention
    )  # copies — the changelog diff reads them
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    return cfg


def _ms(df):
    """Multiset checksum over sorted columns (order-independent)."""
    from pyspark.sql import functions as F

    cols = sorted(c for c in df.columns
                  if not c.startswith("_change_"))
    return df.select(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        F.count("*").alias("n"),
    ).first()


def test_changelog_full_story(spark, ran):
    cfg = ran
    b = committed_batch_ids(cfg)[0]
    live = os.path.join(cfg.output_path, "routed", f"batch_id={b}")
    s0 = read_batch_snapshot(spark, cfg, b)  # generation 0
    pods = [r[0] for r in
            s0.select("pod_name").distinct().orderBy("pod_name").collect()]
    pod_a, pod_b = pods[0], pods[1]
    rows_a = s0.filter(s0.pod_name == pod_a)
    rows_b = s0.filter(s0.pod_name == pod_b)
    n_a, n_b = rows_a.count(), rows_b.count()
    assert n_a > 0 and n_b > 0

    # -- generation 1: deferred tombstone on pod A -----------------------
    delete_where(spark, cfg, [("batch_id", "==", b),
                              ("pod_name", "==", pod_a)], mode="defer")
    man = read_file_manifest(live)
    assert (man["generation"], man["operation"]) == (1, "overwrite")
    ch = read_changes_between(spark, cfg, b, 0)
    assert ch.select("_change_type").distinct().collect() == [("delete",)]
    assert ch.select("_change_generation").distinct().collect() == [(1,)]
    assert _ms(ch) == _ms(rows_a)
    # time travel: the delete does NOT leak backward — generation 0
    # still holds pod A, generation 1 hides it
    g0 = read_batch_snapshot(spark, cfg, b, generation=0)
    assert g0.filter(g0.pod_name == pod_a).count() == n_a
    g1 = read_batch_snapshot(spark, cfg, b, generation=1)
    assert g1.filter(g1.pod_name == pod_a).count() == 0

    # -- generation 2: materialization — physically removes rows that
    # were already logically invisible, so the changelog is EMPTY
    materialize_deletes(spark, cfg, dirs=[live])
    man = read_file_manifest(live)
    assert (man["generation"], man["operation"]) == (2, "overwrite")
    assert "delete_filters" not in man
    assert read_changes_between(spark, cfg, b, 1, 2).count() == 0
    assert _ms(read_changes_between(spark, cfg, b, 0, 2)) == _ms(rows_a)

    # -- generation 3: compaction — replace, elided entirely -------------
    compact_batch(spark, cfg, b, target_records_per_file=10_000)
    man = read_file_manifest(live)
    assert (man["generation"], man["operation"]) == (3, "replace")
    empty = read_changes_between(spark, cfg, b, 2, 3)
    assert empty.count() == 0
    assert "_change_type" in empty.columns

    # -- generation 4: COW delete of pod B --------------------------------
    delete_where(spark, cfg, [("batch_id", "==", b),
                              ("pod_name", "==", pod_b)])
    man = read_file_manifest(live)
    assert (man["generation"], man["operation"]) == (4, "overwrite")
    ch = read_changes_between(spark, cfg, b, 3)
    assert ch.select("_change_type").distinct().collect() == [("delete",)]
    assert _ms(ch) == _ms(rows_b)
    # a range CROSSING the replace diffs straight across it, exactly
    assert _ms(read_changes_between(spark, cfg, b, 2, 4)) == _ms(rows_b)

    # -- generation 5: rollback to pre-delete — B's rows come back as
    # inserts (history moves forward; the rollback is itself a change)
    rollback_batch(cfg, b, 3)
    ch = read_changes_between(spark, cfg, b, 4)
    assert ch.select("_change_type").distinct().collect() == [("insert",)]
    assert _ms(ch) == _ms(rows_b)

    # -- replay invariant over the whole range: s0 ⊎ inserts ∖ deletes
    # is exactly the current snapshot, as multisets
    chg = read_changes_between(spark, cfg, b, 0)
    cols = sorted(s0.columns)
    ins = chg.filter(chg._change_type == "insert").select(cols)
    dels = chg.filter(chg._change_type == "delete").select(cols)
    final = read_batch_snapshot(spark, cfg, b).select(cols)
    lhs = s0.select(cols).unionByName(ins)
    rhs = final.unionByName(dels)
    assert lhs.exceptAll(rhs).count() == 0
    assert rhs.exceptAll(lhs).count() == 0


# ---- pure-metadata unit layer (no Spark) ----------------------------------


def _put(live, name):
    path = os.path.join(live, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(b"x")


def _commit(committer, live, gen, files, op, added=None, filters=None,
            at=None):
    prev = read_file_manifest(live)
    if prev is not None:
        archive_manifest(committer, live, prev, superseded_at=at)
    extra = {"operation": op, "added": added or []}
    if filters is not None:
        extra["delete_filters"] = filters
    for f in files:
        if not os.path.exists(os.path.join(live, f)):
            _put(live, f)
    write_file_manifest(committer, live, files, gen, committed_at=at,
                        extra=extra)


def test_changelog_entries_lineage(tmp_path):
    live = str(tmp_path)
    c = PutCommitter()
    _commit(c, live, 1, ["a"], "append", added=["a"], at=100.0)
    _commit(c, live, 2, ["a", "b"], "append", added=["b"], at=200.0)
    # compaction rewrites a+b into c — elided AND diffed across
    _commit(c, live, 3, ["c"], "replace", at=300.0)
    # overwrite drops c, adds d
    _commit(c, live, 4, ["d"], "overwrite", added=["d"], at=400.0)

    steps = changelog_entries(live, 1)
    assert [(s["generation"], s["operation"]) for s in steps] \
        == [(2, "append"), (4, "overwrite")]
    # the overwrite diffs against the REPLACE result, not generation 2
    assert steps[1]["dropped"] == ["c"] and steps[1]["added"] == ["d"]
    assert changelog_entries(live, 4) == []

    # tombstone diffs are carried per side
    _commit(c, live, 5, ["d"], "overwrite",
            filters=[[["x", "==", 1]]], at=500.0)
    st = changelog_entries(live, 4)[0]
    assert st["filters_added"] == [[["x", "==", 1]]]
    assert st["filters_removed"] == [] and st["kept"] == ["d"]

    # expired changed file: loud, never partial
    os.remove(os.path.join(live, "c"))
    with pytest.raises(FileNotFoundError):
        changelog_entries(live, 3)


def test_changelog_entries_refuses_legacy(tmp_path):
    live = str(tmp_path)
    c = PutCommitter()
    _commit(c, live, 1, ["a"], "append", added=["a"], at=100.0)
    prev = read_file_manifest(live)
    archive_manifest(c, live, prev, superseded_at=150.0)
    _put(live, "b")
    write_file_manifest(c, live, ["b"], 2, committed_at=200.0)  # no op
    with pytest.raises(ValueError, match="unknown kind"):
        changelog_entries(live, 1)
