"""Hardening regressions from the round-5 review of the follower
stack: durable commit-order for mixed-mode batch logs, merge inserts
visible to every follower mode, fresh-destination delivery never
inheriting a poll cursor, the lag gauge tracking delivery groups,
CDC sub-state regression refusal, and group-name path-escape guards.
"""

import os

import pytest
from pyspark.sql import functions as F

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.checkpoint import (
    BatchRecord,
    Manifest,
    load_manifest,
    save_manifest,
)
from logfowd2_spark.streaming.commit import CommitConflict
from logfowd2_spark.streaming.follower import (
    commit_cursor,
    deliver_exactly_once,
    group_lag,
    poll,
    poll_changes,
)
from logfowd2_spark.streaming.maintenance import (
    committed_batch_ids,
    merge_into,
)
from logfowd2_spark.streaming.pipeline import read_routed, run_pipeline


def _rec(bid):
    return BatchRecord(bid, [], 1, 1, 0, {}, [])


def test_batch_log_preserves_commit_order_across_id_families(tmp_path):
    """stream-* then batch-* then merge-* ids: committed order, not
    lexicographic order, survives the save/load round-trip."""
    path = str(tmp_path / "manifest.json")
    man = Manifest()
    for bid in ["stream-00000", "stream-00001", "batch-00000",
                "merge-00000", "stream-00002"]:
        man.record(_rec(bid))
    save_manifest(man, path)
    got = load_manifest(path)
    assert got.committed_ids() == ["stream-00000", "stream-00001",
                                   "batch-00000", "merge-00000",
                                   "stream-00002"]


def test_batch_log_counter_rollover_order(tmp_path):
    path = str(tmp_path / "manifest.json")
    man = Manifest()
    man.record(_rec("stream-99999"))
    man.record(_rec("stream-100000"))  # sorts BEFORE 99999 textually
    save_manifest(man, path)
    assert load_manifest(path).committed_ids() == [
        "stream-99999", "stream-100000"]


def test_legacy_manifest_checksum_still_verifies(tmp_path):
    """Manifests whose order matches sorted keys keep the pre-`order`
    canonical form (old files load; new files stay byte-compatible)."""
    import json

    path = str(tmp_path / "manifest.json")
    man = Manifest()
    man.record(_rec("batch-00000"))
    man.record(_rec("batch-00001"))
    save_manifest(man, path)
    doc = json.load(open(path))
    assert "order" not in doc["data"]  # canonical form unchanged
    got = load_manifest(path)  # checksum verifies, order backfilled
    assert got.committed_ids() == ["batch-00000", "batch-00001"]


@pytest.fixture()
def table(spark, tmp_path):
    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=300,
                                seed=13, n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_line_size=256,
        commit_protocol="rename",
        vacuum_retention_s=3600.0,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    return cfg


def _merge_updates(spark, cfg, n_new=2):
    pdf = read_routed(spark, cfg).toPandas().head(1)
    ld = pdf["log_date"].iloc[0]
    return spark.createDataFrame(
        [(f"merged-{i}", "logs-app", ld, 7) for i in range(n_new)],
        "doc_id string, sink_id string, log_date date, n_tok int",
    )


def test_merge_inserts_reach_followers(spark, table):
    cfg = table
    # appends-mode group consumes everything, then a merge inserts rows
    got = poll(spark, cfg, "a")
    commit_cursor(cfg, "a", got.cursor)
    cdc = poll_changes(spark, cfg, "c")
    commit_cursor(cfg, "c", cdc.cursor)

    res = merge_into(spark, cfg, _merge_updates(spark, cfg))
    assert res["inserted_rows"] == 2
    mid = res["insert_batch_id"]
    assert committed_batch_ids(cfg)[-1] == mid

    nxt = poll(spark, cfg, "a")
    assert nxt.batch_ids == [mid]
    rows = nxt.df.select("doc_id").collect()
    assert {r["doc_id"] for r in rows} == {"merged-0", "merged-1"}
    commit_cursor(cfg, "a", nxt.cursor)

    cnx = poll_changes(spark, cfg, "c")
    assert cnx.batch_ids == [mid]
    ins = cnx.df.filter(F.col("_change_type") == "insert") \
        .select("doc_id").collect()
    assert {r["doc_id"] for r in ins} == {"merged-0", "merged-1"}
    assert cnx.df.filter(F.col("_change_type") == "delete").count() == 0
    commit_cursor(cfg, "c", cnx.cursor)
    # exactly once: nothing re-delivered
    assert poll(spark, cfg, "a").df is None
    again = poll_changes(spark, cfg, "c")
    assert again.df is None or again.df.count() == 0


def test_fresh_dest_never_inherits_poll_cursor(spark, table):
    cfg = table
    got = poll(spark, cfg, "shared")
    commit_cursor(cfg, "shared", got.cursor)  # group used for polling
    with pytest.raises(ValueError, match="durable poll/commit cursor"):
        deliver_exactly_once(spark, cfg, "shared",
                             os.path.join(cfg.output_path, "m1"))
    # a fresh group delivers the WHOLE log into a fresh dest
    dest = os.path.join(cfg.output_path, "m2")
    r = deliver_exactly_once(spark, cfg, "fresh", dest)
    assert r["rows"] == read_routed(spark, cfg).count()


def test_lag_gauge_tracks_delivery_groups(spark, table):
    cfg = table
    dest = os.path.join(cfg.output_path, "mirror")
    deliver_exactly_once(spark, cfg, "dg", dest)
    lag = group_lag(cfg, "dg")
    assert lag["batches_behind"] == 0 and lag["rows_behind"] == 0


def test_cdc_equal_position_substate_regression_refused(spark, table):
    cfg = table
    from logfowd2_spark.streaming.maintenance import delete_where

    got = poll_changes(spark, cfg, "g")
    commit_cursor(cfg, "g", got.cursor)
    stale = poll_changes(spark, cfg, "g")  # worker A (pre-delete)
    pdf = read_routed(spark, cfg).toPandas()
    pod = pdf["pod_name"].value_counts().index[0]
    delete_where(spark, cfg, [("pod_name", "==", pod)])
    fresh = poll_changes(spark, cfg, "g")  # worker B (post-delete)
    commit_cursor(cfg, "g", fresh.cursor)
    with pytest.raises(CommitConflict, match="regress"):
        commit_cursor(cfg, "g", stale.cursor)
    # cross-mode commits refused outright
    ap = poll(spark, cfg, "apx")
    commit_cursor(cfg, "apx", ap.cursor)
    bad = dict(fresh.cursor, group="apx")
    with pytest.raises(CommitConflict, match="appends-mode"):
        commit_cursor(cfg, "apx", bad)


def test_deliver_exactly_once_changes_mode(spark, table):
    """An exactly-once CHANGELOG sink: inserts land, a later delete
    arrives as retraction rows in a new generation, replaying the sink
    reconstructs the table, and mode mixing on one dest is refused."""
    from logfowd2_spark.streaming.maintenance import delete_where

    cfg = table
    dest = os.path.join(cfg.output_path, "cdc-feed")
    r1 = deliver_exactly_once(spark, cfg, "feed", dest, mode="changes")
    total0 = read_routed(spark, cfg).count()
    assert r1["rows"] == total0  # initial inserts

    pdf = read_routed(spark, cfg).toPandas()
    pod = pdf["pod_name"].value_counts().index[0]
    n = int((pdf["pod_name"] == pod).sum())
    delete_where(spark, cfg, [("pod_name", "==", pod)])

    r2 = deliver_exactly_once(spark, cfg, "feed", dest, mode="changes")
    assert r2["batch_ids"] == [] and r2["rows"] == n  # retractions only
    feed = spark.read.parquet(dest)
    assert feed.filter(F.col("_change_type") == "delete").count() == n
    # replay the changelog: inserts minus deletes == current table
    ins = {r["doc_id"] for r in feed.filter(
        F.col("_change_type") == "insert").select("doc_id").collect()}
    dels = {r["doc_id"] for r in feed.filter(
        F.col("_change_type") == "delete").select("doc_id").collect()}
    now = {r["doc_id"] for r in
           read_routed(spark, cfg).select("doc_id").collect()}
    assert ins - dels == now
    # caught up: no flip
    r3 = deliver_exactly_once(spark, cfg, "feed", dest, mode="changes")
    assert r3["rows"] == 0 and r3["generation"] == r2["generation"]
    # the sink is permanently changes-mode
    with pytest.raises(ValueError, match="-mode sink"):
        deliver_exactly_once(spark, cfg, "feed", dest)


def test_crashed_merge_registration_backfilled(spark, table):
    """merge_into crash window: table flipped, batch-log registration
    lost.  recover_compactions (run by every log consumer) backfills
    the merge id at the log's end, so merged rows become consumable
    exactly once instead of being invisible forever."""
    import json

    from logfowd2_spark.streaming.maintenance import recover_compactions

    cfg = table
    res = merge_into(spark, cfg, _merge_updates(spark, cfg))
    mid = res["insert_batch_id"]
    # simulate the crash: strip the registration from the batch log
    path = os.path.join(cfg.checkpoint_path, "manifest.json")
    man = load_manifest(path)
    del man.batches[mid]
    man.order.remove(mid)
    save_manifest(man, path)
    assert mid not in committed_batch_ids(cfg)

    healed = recover_compactions(cfg)
    assert f"batch_log:{mid}" in healed
    assert committed_batch_ids(cfg)[-1] == mid
    # a follower now receives the merged rows (via the poll's own
    # recover_compactions — exactly once)
    got = poll(spark, cfg, "postcrash")
    assert mid in got.batch_ids
    ids = {r["doc_id"] for r in got.df.select("doc_id").collect()}
    assert {"merged-0", "merged-1"} <= ids


def test_changes_sink_skips_elided_maintenance(spark, table):
    """A consolidation (content-preserving) must not flip an empty
    generation into a changes-mode sink."""
    from logfowd2_spark.streaming.commit import read_file_manifest
    from logfowd2_spark.streaming.maintenance import compact_table

    cfg = table
    dest = os.path.join(cfg.output_path, "feed2")
    deliver_exactly_once(spark, cfg, "f2", dest, mode="changes")
    gen0 = read_file_manifest(dest)["generation"]
    compact_table(spark, cfg)
    r = deliver_exactly_once(spark, cfg, "f2", dest, mode="changes")
    assert r["rows"] == 0
    assert read_file_manifest(dest)["generation"] == gen0


def test_zero_position_group_can_switch_modes(spark, table):
    """A group that consumed nothing may be taken over by either mode
    (poll-side and commit-side guards agree)."""
    import json

    cfg = table
    # fabricate an empty-log appends cursor at position 0
    commit_cursor(cfg, "zp", {"version": 1, "position": 0,
                              "last_batch": None})
    got = poll_changes(spark, cfg, "zp")  # allowed: nothing consumed
    commit_cursor(cfg, "zp", got.cursor)  # and committable
    assert (poll_changes(spark, cfg, "zp").df is None)


def test_dirless_watermark_batches_do_not_wedge(spark, tmp_path):
    """read_existing_on_startup=False commits watermark records with NO
    routed dirs — a legal batch-log state every follower mode, tag
    creation, and the auto-compact policy must treat as zero rows, not
    as divergence, un-pinnable dirs, or a zero-path compaction."""
    from logfowd2_spark.streaming.maintenance import (
        compact_table,
        create_tag,
    )

    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=200,
                                seed=71, n_files=3)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_line_size=256,
        vacuum_retention_s=3600.0,
        auto_compact_min_batches=2,  # would fire on 3 ids if they count
    )
    cfg.read_existing_on_startup = False
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    ids = committed_batch_ids(cfg)
    assert len(ids) == 3

    # auto-compact must not have staged a zero-path rewrite
    assert compact_table(spark, cfg)["consolidated_ids"] == []
    # tags skip the dir-less ids instead of refusing
    assert create_tag(cfg, "wm")["dirs"] == {}
    # CDC polls: zero-row inserts now, and the NEXT poll must not
    # CursorDiverge on the tracked-but-dir-less ids
    got = poll_changes(spark, cfg, "wm-cdc")
    assert got.batch_ids == ids
    commit_cursor(cfg, "wm-cdc", got.cursor)
    again = poll_changes(spark, cfg, "wm-cdc")
    assert again.df is None and again.batch_ids == []


def test_group_name_path_escape_rejected(spark, table):
    cfg = table
    for bad in ("..", ".", "a/b", "a\\b" * 40, "_CURSOR", ".hidden", ""):
        with pytest.raises(ValueError, match="invalid consumer group"):
            group_lag(cfg, bad)
