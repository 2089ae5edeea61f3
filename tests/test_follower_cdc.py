"""CDC-mode consumer groups (follower.poll_changes): the replay
invariant `inserts ∖ deletes == visible content of consumed batches`
held across the full table lifecycle — inserts, COW deletes, deferred
tombstones, table consolidation (elided, content-preserving), deletes
on consolidated data (provenance-filtered), late batches — plus the
expiry contract: a lagging group whose absorbed dir was reaped with
unconsumed changes gets CursorDiverged, a caught-up one sails through.
"""

import collections
import os

import pytest
from pyspark.sql import functions as F

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.follower import (
    CursorDiverged,
    commit_cursor,
    poll,
    poll_changes,
)
from logfowd2_spark.streaming.maintenance import (
    committed_batch_ids,
    compact_table,
    delete_where,
)
from logfowd2_spark.streaming.pipeline import read_routed, run_pipeline


def _mk(spark, tmp_path, retention: float):
    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=400,
                                seed=99, n_files=4)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_line_size=256,
        commit_protocol="rename",
        vacuum_retention_s=retention,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1, max_batches=2)
    return cfg, paths


class Replayer:
    """Applies deliveries the way the contract says a consumer should;
    tracks per-doc_id multiset counts."""

    def __init__(self):
        self.counts = collections.Counter()

    def apply(self, got):
        if got.df is None:
            return
        rows = (got.df
                .select("doc_id", "_change_type", "_change_generation",
                        "_change_source")
                .collect())
        # inserts first, then changes in per-source generation order
        rows.sort(key=lambda r: (r["_change_type"] != "insert"
                                 or r["_change_generation"] > 0,
                                 r["_change_source"],
                                 r["_change_generation"]))
        for r in rows:
            if r["_change_type"] == "insert":
                self.counts[r["doc_id"]] += 1
            else:
                assert r["_change_type"] == "delete"
                self.counts[r["doc_id"]] -= 1

    def live_ids(self):
        bad = {k: v for k, v in self.counts.items() if v not in (0, 1)}
        assert not bad, f"replay multiset corrupt: {bad}"
        return {k for k, v in self.counts.items() if v == 1}


def _visible_ids(spark, cfg):
    return {r["doc_id"]
            for r in read_routed(spark, cfg).select("doc_id").collect()}


def test_cdc_full_lifecycle(spark, tmp_path):
    cfg, paths = _mk(spark, tmp_path, retention=3600.0)
    g, rep = "cdc", Replayer()

    def roll():
        got = poll_changes(spark, cfg, g)
        rep.apply(got)
        commit_cursor(cfg, g, got.cursor)
        assert rep.live_ids() == _visible_ids(spark, cfg)
        return got

    # 1. initial inserts
    got = poll_changes(spark, cfg, g)
    assert got.df.filter(F.col("_change_type") != "insert").count() == 0
    rep.apply(got)
    commit_cursor(cfg, g, got.cursor)
    assert rep.live_ids() == _visible_ids(spark, cfg)

    # caught up: nothing
    got = poll_changes(spark, cfg, g)
    assert got.df is None and got.batch_ids == []
    commit_cursor(cfg, g, got.cursor)

    # 2. COW delete → exact retractions delivered
    pdf = read_routed(spark, cfg).toPandas()
    pod = pdf["pod_name"].value_counts().index[0]
    n = int((pdf["pod_name"] == pod).sum())
    assert delete_where(spark, cfg,
                        [("pod_name", "==", pod)])["deleted_rows"] == n
    got = roll()
    assert got.df.filter(F.col("_change_type") == "delete").count() == n

    # 3. deferred tombstone → retractions delivered metadata-first
    pdf = read_routed(spark, cfg).toPandas()
    pod2 = pdf["pod_name"].value_counts().index[0]
    n2 = int((pdf["pod_name"] == pod2).sum())
    delete_where(spark, cfg, [("pod_name", "==", pod2)], mode="defer")
    got = roll()
    assert got.df.filter(F.col("_change_type") == "delete").count() == n2

    # 4. consolidation: content-preserving → delivers NOTHING
    res = compact_table(spark, cfg)
    assert res["rows"] > 0
    got = poll_changes(spark, cfg, g)
    assert (got.df is None
            or got.df.count() == 0), "consolidation must be elided"
    rep.apply(got)
    commit_cursor(cfg, g, got.cursor)
    assert rep.live_ids() == _visible_ids(spark, cfg)

    # 5. late batches → inserts only for the new ids
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    got = roll()
    assert len(got.batch_ids) == 2
    assert got.df.filter(F.col("_change_type") != "insert").count() == 0

    # 6. delete hitting CONSOLIDATED (already-consumed) data
    pdf = read_routed(spark, cfg).toPandas()
    ids = committed_batch_ids(cfg)
    old = pdf[pdf["batch_id"] == ids[0]]
    pod3 = old["pod_name"].value_counts().index[0]
    delete_where(spark, cfg, [("pod_name", "==", pod3),
                              ("batch_id", "==", ids[0])])
    got = roll()
    dels = got.df.filter(F.col("_change_type") == "delete")
    assert dels.count() > 0
    assert {r["_change_source"] for r in
            dels.select("_change_source").distinct().collect()} \
        == {"_consolidated"}


def test_cdc_retraction_of_unconsumed_batch_never_delivered(spark, tmp_path):
    """A delete on a batch the group has NOT consumed yet must not
    surface as a retraction — the batch's eventual insert already
    excludes those rows."""
    cfg, paths = _mk(spark, tmp_path, retention=3600.0)
    g, rep = "late", Replayer()
    got = poll_changes(spark, cfg, g)  # consume wave 1
    rep.apply(got)
    commit_cursor(cfg, g, got.cursor)

    # wave 2 lands, is consolidated, and then partially deleted —
    # all BEFORE the group sees it
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    compact_table(spark, cfg)
    ids = committed_batch_ids(cfg)
    pdf = read_routed(spark, cfg).toPandas()
    new = pdf[pdf["batch_id"] == ids[2]]
    pod = new["pod_name"].value_counts().index[0]
    delete_where(spark, cfg, [("pod_name", "==", pod),
                              ("batch_id", "==", ids[2])])

    got = poll_changes(spark, cfg, g)
    # only inserts, and none of them the deleted rows
    assert got.df.filter(F.col("_change_type") == "delete").count() == 0
    rep.apply(got)
    commit_cursor(cfg, g, got.cursor)
    assert rep.live_ids() == _visible_ids(spark, cfg)


def test_cdc_expiry_contract(spark, tmp_path):
    """Reaped source dirs: proven-harmless for a caught-up group,
    CursorDiverged for a lagging one.  Retention stays on while the
    retraction is consumable (the changelog needs the dropped files,
    Iceberg's contract) and drops to zero only for the consolidation
    reap itself."""
    cfg, paths = _mk(spark, tmp_path, retention=3600.0)

    lag = poll_changes(spark, cfg, "lag")
    commit_cursor(cfg, "lag", lag.cursor)
    ok = poll_changes(spark, cfg, "ok")
    commit_cursor(cfg, "ok", ok.cursor)

    # a COW delete flips one dir's generation past both cursors
    pdf = read_routed(spark, cfg).toPandas()
    pod = pdf["pod_name"].value_counts().index[0]
    delete_where(spark, cfg, [("pod_name", "==", pod)])
    # 'ok' consumes the retraction; 'lag' does not
    got = poll_changes(spark, cfg, "ok")
    commit_cursor(cfg, "ok", got.cursor)

    # consolidation with zero retention reaps the source dirs
    cfg.vacuum_retention_s = 0.0
    compact_table(spark, cfg)
    assert not [n for n in
                os.listdir(os.path.join(cfg.output_path, "routed"))
                if n.startswith("batch_id=")]

    nxt = poll_changes(spark, cfg, "ok")  # caught up: clean elision
    assert nxt.df is None or \
        nxt.df.filter(F.col("_change_type") == "delete").count() == 0
    commit_cursor(cfg, "ok", nxt.cursor)

    with pytest.raises(CursorDiverged, match="expired"):
        poll_changes(spark, cfg, "lag")


def test_mode_guards(spark, tmp_path):
    cfg, _ = _mk(spark, tmp_path, retention=3600.0)
    a = poll(spark, cfg, "apnd")
    commit_cursor(cfg, "apnd", a.cursor)
    c = poll_changes(spark, cfg, "cdc")
    commit_cursor(cfg, "cdc", c.cursor)
    with pytest.raises(ValueError, match="CDC group"):
        poll(spark, cfg, "cdc")
    with pytest.raises(ValueError, match="appends-mode group"):
        poll_changes(spark, cfg, "apnd")
