"""Optimistic concurrency on generation flips — Iceberg's commit model
on the plain layout.  Every flip from generation g must archive g into
the snapshot log first, and `claim_generation` makes that archive an
exclusive create (temp + hard link — complete content, no clobber): one
winner per generation no matter how many writers staged against it.  A
crash REPLAY of the same commit (same token) passes; a racer raises
`CommitConflict` with the table left exactly as the winner published it
and ZERO debris (validation happens before any staged file lands).
Marker-less metadata commits carry their full next manifest as a
roll-forwardable intent, so a crashed claimer can never wedge the
table.  No Spark needed — this layer is pure metadata."""

import json
import os
import threading

import pytest

from logfowd2_spark.streaming.commit import (
    FILE_MANIFEST,
    PUBLISH_MARKER,
    CommitConflict,
    PutCommitter,
    _publish_from_marker,
    claim_generation,
    commit_metadata_snapshot,
    manifest_swap,
    read_file_manifest,
    stage_path,
    write_file_manifest,
)


def _put(root, name, data=b"x"):
    path = os.path.join(root, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(data)


def _mk_live(tmp_path, name="batch_id=t"):
    root = str(tmp_path)
    live = os.path.join(root, name)
    _put(live, "a.parquet")
    write_file_manifest(PutCommitter(), live, ["a.parquet"], 1,
                        committed_at=100.0,
                        extra={"operation": "append",
                               "added": ["a.parquet"]})
    return root, live


def _mk_stage(live, files, gen, token, stage=None):
    staged = stage or stage_path(live)
    for f in files:
        _put(staged, f)
    with open(os.path.join(staged, "_tmp_marker"), "w") as fh:
        json.dump({"generation": gen, "files": files, "publish": files,
                   "committed_at": 200.0, "operation": "append",
                   "stats": {}, "retired": [], "extra": {},
                   "commit_token": token}, fh)
    os.replace(os.path.join(staged, "_tmp_marker"),
               os.path.join(staged, PUBLISH_MARKER))
    return staged


def test_expected_generation_early_abort(tmp_path):
    _, live = _mk_live(tmp_path)
    staged = os.path.join(str(tmp_path), "_stage_x")
    _put(staged, "b.parquet")
    with pytest.raises(CommitConflict, match="generation"):
        manifest_swap(PutCommitter(), live, staged, stats={},
                      expected_generation=0)
    # aborted BEFORE commit-ready: no marker, live untouched
    assert not os.path.exists(os.path.join(staged, PUBLISH_MARKER))
    assert read_file_manifest(live)["generation"] == 1


def test_loser_leaves_no_debris_and_recover_discards(tmp_path):
    root, live = _mk_live(tmp_path)
    c = PutCommitter()
    # writer A wins generation 2 through the normal swap
    sa = os.path.join(root, "_stage_a")
    _put(sa, "fa.parquet")
    manifest_swap(c, live, sa, stats={}, keep_prev_files=True)
    man = read_file_manifest(live)
    assert man["generation"] == 2 and man["commit_token"]
    tok_a = man["commit_token"]

    # writer B staged against generation 1 — its marker replays stale
    sb = _mk_stage(live, ["fb.parquet"], 2, "tok-b")
    with pytest.raises(CommitConflict):
        _publish_from_marker(c, sb, live)
    # the loser left ZERO debris: its file never landed in live
    assert not os.path.exists(os.path.join(live, "fb.parquet"))
    man = read_file_manifest(live)
    assert (man["generation"], man["commit_token"]) == (2, tok_a)
    # recovery discards the lost stage instead of replaying it
    assert c.recover(root) == []
    assert not os.path.isdir(sb)
    man = read_file_manifest(live)
    assert (man["generation"], man["commit_token"]) == (2, tok_a)


def test_claimed_generation_conflicts_then_recover_completes(tmp_path):
    """A writer that claimed its generation and crashed before the flip
    holds the claim; a racer conflicts (never clobbers), and the
    committer's recover finishes the crashed commit from its marker."""
    root, live = _mk_live(tmp_path)
    c = PutCommitter()
    man1 = read_file_manifest(live)

    # writer A: stage + claim landed, then crash before the flip
    sa = _mk_stage(live, ["fa.parquet"], 2, "tok-a")
    assert claim_generation(live, man1, "tok-a",
                            superseded_at=200.0) is None
    assert read_file_manifest(live)["generation"] == 1  # not flipped

    # writer B (staged elsewhere against the same base) must lose
    sb = _mk_stage(live, ["fb.parquet"], 2, "tok-b",
                   stage=os.path.join(root, "_stage_other"))
    with pytest.raises(CommitConflict, match="claimed"):
        _publish_from_marker(c, sb, live)
    assert not os.path.exists(os.path.join(live, "fb.parquet"))

    # recover replays A's marker: same token passes the claim
    healed = c.recover(root)
    assert live in healed
    man = read_file_manifest(live)
    assert (man["generation"], man["commit_token"]) == (2, "tok-a")
    assert os.path.exists(os.path.join(live, "fa.parquet"))


def test_replay_same_token_is_idempotent(tmp_path):
    _, live = _mk_live(tmp_path)
    c = PutCommitter()
    sa = _mk_stage(live, ["fa.parquet"], 2, "tok-a")
    _publish_from_marker(c, sa, live)
    assert read_file_manifest(live)["generation"] == 2
    # crash after flip but before stage cleanup: the replay re-runs
    # the whole publish with the same token and changes nothing
    sa = _mk_stage(live, ["fa.parquet"], 2, "tok-a")
    _publish_from_marker(c, sa, live)
    man = read_file_manifest(live)
    assert (man["generation"], man["commit_token"]) == (2, "tok-a")


def test_metadata_snapshot_conflict_and_retry(tmp_path):
    _, live = _mk_live(tmp_path)
    c = PutCommitter()
    man1 = read_file_manifest(live)
    commit_metadata_snapshot(c, live, man1, {"k": "x"}, "overwrite")
    assert read_file_manifest(live)["k"] == "x"
    # a second writer holding the STALE manifest loses
    with pytest.raises(CommitConflict):
        commit_metadata_snapshot(c, live, man1, {"k": "y"}, "overwrite")
    assert read_file_manifest(live)["k"] == "x"
    # retrying against the re-read manifest wins generation 3
    man2 = read_file_manifest(live)
    out = commit_metadata_snapshot(c, live, man2, {"k": "y"}, "overwrite")
    assert (out["generation"], out["k"]) == (3, "y")


def test_roll_forward_completes_crashed_intent(tmp_path):
    _, live = _mk_live(tmp_path)
    c = PutCommitter()
    man1 = read_file_manifest(live)
    # a writer claimed generation 2 with a full intent, then crashed
    intent = {"generation": 2, "files": list(man1["files"]),
              "committed_at": 300.0, "operation": "overwrite",
              "added": [], "commit_token": "crashed", "k": "theirs"}
    assert claim_generation(live, man1, "crashed",
                            superseded_at=300.0, intent=intent) is None
    assert read_file_manifest(live)["generation"] == 1
    # the next writer completes the crashed flip, THEN concedes
    with pytest.raises(CommitConflict):
        commit_metadata_snapshot(c, live, man1, {"k": "mine"}, "overwrite")
    man = read_file_manifest(live)
    assert (man["generation"], man["commit_token"], man["k"]) \
        == (2, "crashed", "theirs")
    # and its retry against the rolled-forward state succeeds
    out = commit_metadata_snapshot(c, live, man, {"k": "mine"},
                                   "overwrite")
    assert (out["generation"], out["k"]) == (3, "mine")


def test_concurrent_writers_linearize(tmp_path):
    """N threads hammer metadata commits from the same base; with the
    read-retry loop every update lands exactly once, in SOME serial
    order — generations 2..N+1, all keys present in the final state."""
    _, live = _mk_live(tmp_path)
    c = PutCommitter()
    n, errs = 8, []

    def work(i):
        try:
            for _ in range(50):
                man = read_file_manifest(live)
                try:
                    commit_metadata_snapshot(
                        c, live, man, {f"k{i}": i}, "overwrite")
                    return
                except CommitConflict:
                    continue
            errs.append(f"writer {i} starved")
        except Exception as e:  # noqa: BLE001
            errs.append(f"writer {i}: {e!r}")

    threads = [threading.Thread(target=work, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    man = read_file_manifest(live)
    assert man["generation"] == 1 + n
    assert all(man.get(f"k{i}") == i for i in range(n))
    # the snapshot log holds every superseded generation exactly once
    hist = os.path.join(live, "_history")
    gens = sorted(int(f.split(".")[0]) for f in os.listdir(hist)
                  if f.endswith(".json"))
    assert gens == list(range(1, n + 1))


def test_manifest_put_is_exclusive_per_generation(tmp_path):
    _, live = _mk_live(tmp_path)
    man1 = read_file_manifest(live)
    assert claim_generation(live, man1, "t1") is None
    existing = claim_generation(live, man1, "t2")
    assert existing["superseded_by"] == "t1"
    # same token re-claims fine (crash replay)
    existing = claim_generation(live, man1, "t1")
    assert existing["superseded_by"] == "t1"
    assert os.path.exists(os.path.join(live, FILE_MANIFEST))
