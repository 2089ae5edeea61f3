"""Consumer-group followers (streaming/follower.py): durable offsets
over the committed batch log, at-least-once poll/commit, cursor
divergence detection, regression OCC, and exactly-once table-to-table
delivery whose cursor rides the destination manifest flip (crash
before/after the commit point injected and proven loss-and-dup-free).
"""

import json
import os

import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming import follower
from logfowd2_spark.streaming.commit import CommitConflict, read_file_manifest
from logfowd2_spark.streaming.follower import (
    CursorDiverged,
    commit_cursor,
    deliver_exactly_once,
    load_cursor,
    poll,
    reset_cursor,
)
from logfowd2_spark.streaming.maintenance import committed_batch_ids
from logfowd2_spark.streaming.pipeline import read_routed, run_pipeline


@pytest.fixture()
def env(spark, tmp_path):
    """4 input files → first wave = 2 committed batches (1 file each),
    second wave (the resume) = 2 more: the tailing timeline."""
    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=400,
                                seed=77, n_files=4)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_line_size=256,
        commit_protocol="rename",
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1, max_batches=2)
    return cfg, paths


def _more_data(spark, cfg, paths):
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)


def _count(df):
    return 0 if df is None else df.count()


def test_poll_commit_tail(spark, env):
    cfg, paths = env
    ids = committed_batch_ids(cfg)
    assert len(ids) == 2

    got = poll(spark, cfg, "indexer")
    assert got.batch_ids == ids
    first_rows = _count(got.df)
    assert first_rows == read_routed(spark, cfg).count()
    # nothing durable yet: a re-poll before commit re-delivers
    assert poll(spark, cfg, "indexer").batch_ids == ids
    commit_cursor(cfg, "indexer", got.cursor)
    assert load_cursor(cfg, "indexer")["position"] == 2

    # caught up: empty poll plans no job at all
    empty = poll(spark, cfg, "indexer")
    assert empty.df is None and empty.batch_ids == []
    # committing a caught-up cursor is an idempotent no-op
    commit_cursor(cfg, "indexer", empty.cursor)

    # second wave arrives → only the new batches are delivered
    _more_data(spark, cfg, paths)
    ids2 = committed_batch_ids(cfg)
    assert len(ids2) == 4 and ids2[:2] == ids
    got2 = poll(spark, cfg, "indexer")
    assert got2.batch_ids == ids2[2:]
    assert _count(got2.df) == read_routed(spark, cfg).count() - first_rows
    commit_cursor(cfg, "indexer", got2.cursor)
    assert poll(spark, cfg, "indexer").df is None

    # groups are independent: a new group starts from the beginning
    fresh = poll(spark, cfg, "packer")
    assert fresh.batch_ids == ids2


def test_poll_pagination(spark, env):
    cfg, _ = env
    ids = committed_batch_ids(cfg)
    seen = []
    while True:
        got = poll(spark, cfg, "paged", max_batches=1)
        if not got.batch_ids:
            break
        assert len(got.batch_ids) == 1
        seen += got.batch_ids
        commit_cursor(cfg, "paged", got.cursor)
    assert seen == ids


def test_commit_regression_refused(spark, env):
    cfg, _ = env
    stale = poll(spark, cfg, "g", max_batches=1)
    ahead = poll(spark, cfg, "g")  # a second worker reads everything
    commit_cursor(cfg, "g", ahead.cursor)
    with pytest.raises(CommitConflict, match="refusing to regress"):
        commit_cursor(cfg, "g", stale.cursor)
    # wrong-group commits refused before any IO
    with pytest.raises(ValueError, match="belongs to group"):
        commit_cursor(cfg, "other", ahead.cursor)


def test_cursor_divergence_detected(spark, env):
    cfg, _ = env
    got = poll(spark, cfg, "d")
    commit_cursor(cfg, "d", got.cursor)
    # table recreated / checkpoint rewritten: same position, other ids
    path = os.path.join(cfg.output_path, follower.CONSUMERS_DIR, "d",
                        follower.CURSOR_FILE)
    cur = json.load(open(path))
    cur["last_batch"] = "not-a-real-batch"
    with open(path, "w") as fh:
        json.dump(cur, fh)
    with pytest.raises(CursorDiverged, match="diverged"):
        poll(spark, cfg, "d")
    reset_cursor(cfg, "d")
    assert poll(spark, cfg, "d").batch_ids == committed_batch_ids(cfg)


def test_deliver_exactly_once(spark, env):
    cfg, paths = env
    dest = os.path.join(cfg.output_path, "mirror")

    r1 = deliver_exactly_once(spark, cfg, "mirror", dest)
    assert r1["batch_ids"] == committed_batch_ids(cfg)
    total = read_routed(spark, cfg).count()
    assert r1["rows"] == total
    man = read_file_manifest(dest)
    assert man[follower.MANIFEST_CURSOR_KEY]["position"] == 2
    assert spark.read.parquet(dest).count() == total

    # caught up: no generation flip, no rows
    r2 = deliver_exactly_once(spark, cfg, "mirror", dest)
    assert r2["rows"] == 0 and r2["generation"] == man["generation"]

    # second wave appends in a new generation; transform rides along
    _more_data(spark, cfg, paths)
    r3 = deliver_exactly_once(
        spark, cfg, "mirror", dest,
        transform=lambda df: df.select("doc_id", "sink_id", "n_tok"))
    assert len(r3["batch_ids"]) == 2
    got = spark.read.parquet(dest)
    # earlier generations keep the full schema; new files are projected
    assert got.count() == read_routed(spark, cfg).count()
    # the sink refuses another group's cursorless takeover
    with pytest.raises(ValueError, match="sink of group"):
        deliver_exactly_once(spark, cfg, "hijack", dest)


def test_follower_tails_streaming_output(spark, tmp_path):
    """Structured-streaming ingest commits into the SAME batch log the
    batch driver writes, so a consumer group tails streaming output
    with no special casing — the batch-axis contract is mode-blind."""
    from logfowd2_spark.streaming.pipeline import load_routes
    from logfowd2_spark.streaming.stream import streaming_pipeline

    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=400,
                                seed=55, n_files=4)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_line_size=256,
    )
    cfg.routes = load_routes(spark, paths["routes"])
    pods = spark.read.parquet(paths["pods"])
    q = streaming_pipeline(spark, cfg, pods, max_files_per_trigger=2)
    q.awaitTermination(120)

    ids = committed_batch_ids(cfg)
    assert ids and all(b.startswith("stream-") for b in ids)
    got = poll(spark, cfg, "tailer")
    assert got.batch_ids == ids
    assert _count(got.df) == read_routed(spark, cfg).count()
    commit_cursor(cfg, "tailer", got.cursor)
    assert poll(spark, cfg, "tailer").df is None


def test_deliver_crash_before_commit_point(spark, env, monkeypatch):
    """Crash AFTER staging but BEFORE the manifest flip: nothing is
    visible, and the retry delivers the identical range once."""
    cfg, _ = env
    dest = os.path.join(cfg.output_path, "crash-pre")

    from logfowd2_spark.streaming import commit as commit_mod

    calls = {"n": 0}
    orig = commit_mod.manifest_swap

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("injected crash before commit point")

    monkeypatch.setattr(commit_mod, "manifest_swap", boom)
    with pytest.raises(RuntimeError, match="injected"):
        deliver_exactly_once(spark, cfg, "cp", dest)
    assert calls["n"] == 1
    monkeypatch.setattr(commit_mod, "manifest_swap", orig)
    assert read_file_manifest(dest) is None  # nothing visible

    r = deliver_exactly_once(spark, cfg, "cp", dest)
    assert r["rows"] == read_routed(spark, cfg).count()
    assert spark.read.parquet(dest).count() == r["rows"]


def test_deliver_crash_after_commit_point(spark, env, monkeypatch):
    """Crash AFTER the marker is committed-to but before publication:
    the next delivery's recover() replays the flip (cursor advances
    with it) and the retry re-delivers NOTHING — exactly-once."""
    cfg, _ = env
    dest = os.path.join(cfg.output_path, "crash-post")

    from logfowd2_spark.streaming import commit as commit_mod

    orig = commit_mod._publish_from_marker

    def crash_after_marker(*a, **k):
        raise RuntimeError("injected crash after commit point")

    monkeypatch.setattr(commit_mod, "_publish_from_marker",
                        crash_after_marker)
    with pytest.raises(RuntimeError, match="injected"):
        deliver_exactly_once(spark, cfg, "cq", dest)
    monkeypatch.setattr(commit_mod, "_publish_from_marker", orig)
    # the flip never landed yet — the marker is staged, not published
    assert read_file_manifest(dest) is None

    r = deliver_exactly_once(spark, cfg, "cq", dest)
    total = read_routed(spark, cfg).count()
    # recover() replayed the crashed flip; this call then found the
    # cursor already advanced and delivered nothing new
    assert read_file_manifest(dest)[follower.MANIFEST_CURSOR_KEY][
        "position"] == 2
    assert r["rows"] == 0 and r["batch_ids"] == []
    assert spark.read.parquet(dest).count() == total
