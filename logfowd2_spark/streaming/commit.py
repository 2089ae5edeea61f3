"""Directory commit protocols — the one seam every destructive table
operation goes through.

Three places mutate committed data in place: the quarantine relocation
(`pipeline._move_dlq_partition`), the compaction swap
(`maintenance.compact_batch`), and the DLQ boundary trim
(`dlq.enforce_dlq_cap`).  Each is a commit point, and the durability
story differs by filesystem:

- ``RenameCommitter`` (default): POSIX/HDFS metadata renames.  A swap is
  two renames with an ``_old_`` safety copy in between — never lossy, and
  ``recover()`` heals a crash between them.  Correct wherever rename is
  atomic (local disk, HDFS).
- ``PutCommitter``: object-store-safe — uses ONLY put (full-object
  write/copy), delete, and list; no rename anywhere (on S3-style stores
  rename is a non-atomic copy+delete, so any rename-based protocol has a
  lost-data window).  Crash safety comes from *replayable staging*, not
  atomicity: the staged directory (with a ``_COMMIT_READY`` marker
  naming every file) is the source of truth until the live directory is
  fully populated and the stage deleted; ``recover()`` replays any stage
  whose marker still exists.

Reader ISOLATION across in-place rewrites comes from the third layer,
``manifest_swap`` + ``_FILES.json`` (below): batch dirs carry a file
manifest that readers resolve instead of listing the directory, and a
compaction commits by atomically flipping that pointer — the
Iceberg-style metadata-pointer commit SURVEY.md §7 named as plan-A
(risk d), completed here on the plain parquet layout.  The committers
remain the per-file/per-directory durability primitives underneath it
(``RenameCommitter.swap`` stays for recovering pre-manifest layouts).

Both protocols name their transient directories with a leading
underscore (``_old_<name>``, ``_stage_<name>``) so Spark's partition
discovery and file listings NEVER see in-flight state — a crash can
leave debris, but that debris is invisible to every reader until
``recover()`` resolves it.

The reference has no analogue — its sink is an ES cluster whose bulk API
owns atomicity (pool.rs submits and retries); these protocols are what
replaces that guarantee on a file-table sink.
"""

from __future__ import annotations

import json
import os
import re
import shutil

OLD_PREFIX = "_old_"
STAGE_PREFIX = "_stage_"


def _mangle(name: str) -> str:
    """Escape ``=`` out of a dir name: Spark skips underscore-prefixed
    directories from partition discovery ONLY when the name contains no
    ``=`` (measured on 4.1: ``_x=1`` still participates in partition
    inference and turns transient debris into a schema conflict)."""
    return name.replace("%", "%25").replace("=", "%3D")


def _demangle(name: str) -> str:
    return name.replace("%3D", "=").replace("%25", "%")


def stage_path(live: str) -> str:
    """The canonical (Spark-invisible) staging dir for a live dir."""
    d, name = os.path.split(live.rstrip("/"))
    return os.path.join(d, STAGE_PREFIX + _mangle(name))


def _old_path(live: str) -> str:
    d, name = os.path.split(live.rstrip("/"))
    return os.path.join(d, OLD_PREFIX + _mangle(name))


def _atomic_put_file(dst: str, data: bytes | None = None,
                     preserve_mtime_of: str | None = None,
                     src_path: str | None = None) -> None:
    """Publish a single file atomically under BOTH protocols: on a
    filesystem, write a dot-hidden temp in the destination dir
    (invisible to Spark and the footer walks) and rename it into place —
    a half-written object never exists under ``dst``; on an object store
    this is a single-object PUT, atomic by contract.  Pass ``src_path``
    to STREAM an existing file (no full in-memory materialization — the
    DLQ trim publishes parquet files this way), or ``data`` for small
    in-memory payloads (markers).  ``preserve_mtime_of`` copies that
    file's mtime onto the published file (the DLQ's drop-oldest order
    derives generation age from file mtimes).

    Power-loss durability: the temp file is fsynced before the rename
    and the destination directory entry after it — without these a
    journaling fs can persist a LATER delete (e.g. the DLQ trim's
    removal of the replaced original) while this put is still only in
    the page cache, which is exactly the lost-data window the commit
    seam exists to close."""
    import uuid as _uuid  # noqa: PLC0415

    # unique temp per call: concurrent put_file(dst) calls (e.g. a
    # roll-forward racing the crashed winner's own identical manifest
    # put) must never replace each other's temp out from underneath
    tmp = os.path.join(
        os.path.dirname(dst),
        f".put-{_uuid.uuid4().hex[:12]}-" + os.path.basename(dst))
    if src_path is not None:
        with open(src_path, "rb") as fi, open(tmp, "wb") as fo:
            shutil.copyfileobj(fi, fo)
            fo.flush()
            os.fsync(fo.fileno())
    else:
        with open(tmp, "wb") as fo:
            fo.write(data or b"")
            fo.flush()
            os.fsync(fo.fileno())
    if preserve_mtime_of is not None:
        m = os.path.getmtime(preserve_mtime_of)
        os.utime(tmp, (m, m))
    os.replace(tmp, dst)
    _fsync_dir(os.path.dirname(dst))


class CommitConflict(RuntimeError):
    """Another writer committed the generation this commit was based on
    — optimistic concurrency, Iceberg's commit model: writers never
    lock, they validate at the commit point and the LOSER recomputes
    from the now-current snapshot.  The table is left exactly as the
    winner published it; the loser's staged work is discarded or
    rebased by its caller."""


def _put_file_exclusive(path: str, data: bytes) -> bool:
    """Atomically create ``path`` with ``data`` IFF absent — the
    compare-and-swap primitive under optimistic concurrency.  The
    content is written complete and fsynced to a unique temp first,
    then hard-linked into place: ``link`` fails with EEXIST when a
    racer won, and a reader can never observe a partial file under
    ``path``.  Returns False when the path already exists.  (On object
    stores the equivalent is a conditional PUT / If-None-Match, which
    S3, GCS and ABFS all provide.)"""
    import uuid  # noqa: PLC0415

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = os.path.join(
        os.path.dirname(path),
        f".claim-{uuid.uuid4().hex[:12]}-{os.path.basename(path)}")
    with open(tmp, "wb") as fo:
        fo.write(data)
        fo.flush()
        os.fsync(fo.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError:
        return False
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass
    _fsync_dir(os.path.dirname(path))
    return True


def _fsync_dir(path: str) -> None:
    """Durably persist a directory's entries (rename/create/delete)."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        return  # platform without directory fds — best effort
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def validate_ref_name(name: str, kind: str) -> str:
    """Shared charset/length rule for user-supplied ref names (consumer
    groups, table tags): conservative charset, no leading dot or
    underscore — rules out path escapes ('..'), separator smuggling,
    and collisions with the layout's underscore-prefixed metadata."""
    import re  # noqa: PLC0415

    if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]{0,63}", name or ""):
        raise ValueError(f"invalid {kind} name {name!r}")
    return name


def _list_files(root: str) -> list[str]:
    """All regular files under ``root``, relative paths, sorted."""
    out: list[str] = []
    for r, _dirs, files in os.walk(root):
        for fn in files:
            out.append(os.path.relpath(os.path.join(r, fn), root))
    return sorted(out)


class RenameCommitter:
    """Metadata-rename protocol (POSIX/HDFS).  Atomic per rename."""

    name = "rename"

    def put_file(self, dst: str, data: bytes | None = None,
                 preserve_mtime_of: str | None = None,
                 src_path: str | None = None) -> None:
        _atomic_put_file(dst, data, preserve_mtime_of, src_path)

    def swap(self, live: str, staged: str) -> None:
        """Replace ``live``'s contents with ``staged`` (which is consumed).
        A crash between the renames leaves ``_old_<name>`` (the original
        data) and no live dir; ``recover()`` restores it — data is never
        deleted until its replacement is in place."""
        old = _old_path(live)
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(live):
            os.replace(live, old)
        os.replace(staged, live)
        shutil.rmtree(old, ignore_errors=True)

    def move_files(self, src: str, dst: str) -> None:
        """Relocate every non-hidden file from ``src`` into ``dst``."""
        os.makedirs(dst, exist_ok=True)
        for fname in os.listdir(src):
            if not fname.startswith((".", "_")):
                os.replace(os.path.join(src, fname), os.path.join(dst, fname))

    def recover(self, root: str) -> list[str]:
        """Heal interrupted swaps under ``root``: an ``_old_<name>``
        without a live ``<name>`` is restored; with one, it is
        completed-swap debris and dropped.  A stage is only discardable
        debris when it carries NO commit marker — a commit-ready stage
        from the put or manifest protocol (pipeline restarted under a
        different commit_protocol) may be the ONLY copy of the data, so
        it is replayed, never deleted (round-3 advice: unconditional
        stage rmtree here silently destroyed committed put-protocol
        data on a protocol switch)."""
        healed: list[str] = []
        if not os.path.isdir(root):
            return healed
        for name in sorted(os.listdir(root)):
            if name.startswith(STAGE_PREFIX):
                staged = os.path.join(root, name)
                live = os.path.join(root, _demangle(name[len(STAGE_PREFIX):]))
                if os.path.exists(os.path.join(staged, PUBLISH_MARKER)):
                    _publish_from_marker(self, staged, live)
                    healed.append(live)
                elif os.path.exists(os.path.join(staged, PutCommitter.MARKER)):
                    PutCommitter()._replay(staged, live)
                    healed.append(live)
                else:
                    shutil.rmtree(staged, ignore_errors=True)
                continue
            if not name.startswith(OLD_PREFIX):
                continue
            live = os.path.join(root, _demangle(name[len(OLD_PREFIX):]))
            old = os.path.join(root, name)
            if not os.path.isdir(live):
                os.replace(old, live)
                healed.append(live)
            else:
                shutil.rmtree(old, ignore_errors=True)
        return healed


class PutCommitter:
    """Object-store-safe protocol: put/delete/list only, no renames.

    ``swap`` ordering (each step idempotent, so the whole sequence is
    replayable from the marker):

    1. put ``<stage>/_COMMIT_READY`` — a manifest naming every staged
       file (a single-object put: atomic on object stores);
    2. delete the live directory's objects;
    3. put (copy) each staged file into the live directory;
    4. delete the staged directory (removing the marker ends the
       protocol — only then does the stage stop being authoritative).

    A crash anywhere re-runs 2-4 from the marker in ``recover()``.
    """

    name = "put"
    MARKER = "_COMMIT_READY"

    def put_file(self, dst: str, data: bytes | None = None,
                 preserve_mtime_of: str | None = None,
                 src_path: str | None = None) -> None:
        """A single-object PUT — atomic by the object-store contract
        (readers see the whole object or none of it).  The local
        emulation stages through a hidden temp + replace, which is how
        a filesystem approximates that contract."""
        _atomic_put_file(dst, data, preserve_mtime_of, src_path)

    # -- object-store primitive emulations (the only fs ops used) --------
    @staticmethod
    def _put_copy(src: str, dst: str) -> None:
        # routed through the atomic temp+replace path: a present
        # destination object must ALWAYS be complete, because both
        # move_files' idempotence check and recover()'s replay treat
        # existence as done — a plain open/write here could crash
        # mid-copy and leave a truncated file the retry then keeps
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        _atomic_put_file(dst, src_path=src)

    @staticmethod
    def _put_bytes(path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as fo:
            fo.write(data)

    @staticmethod
    def _delete_tree(path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    # -- protocol ---------------------------------------------------------
    def _replay(self, staged: str, live: str) -> None:
        with open(os.path.join(staged, self.MARKER), "rb") as fh:
            files = json.loads(fh.read())["files"]
        self._delete_tree(live)
        for rel in files:
            self._put_copy(os.path.join(staged, rel), os.path.join(live, rel))
        self._delete_tree(staged)

    def swap(self, live: str, staged: str) -> None:
        canonical = stage_path(live)
        if os.path.abspath(staged) != os.path.abspath(canonical):
            # a foreign stage would need adopting under the canonical
            # name BEFORE the marker exists — a crash mid-adoption
            # strands the only copy in an unmarked stage that recover()
            # discards.  No caller stages anywhere else; refuse instead
            # of carrying an unprotected window.
            raise ValueError(
                f"PutCommitter.swap requires staging at stage_path(live) "
                f"({canonical!r}); got {staged!r}"
            )
        files = [f for f in _list_files(canonical) if f != self.MARKER]
        self._put_bytes(
            os.path.join(canonical, self.MARKER),
            json.dumps({"files": files}).encode(),
        )
        self._replay(canonical, live)

    def move_files(self, src: str, dst: str) -> None:
        """Copy-then-delete per file.  Destination names equal the
        (unique, deterministic) source part-file names and an
        already-present destination is skipped, so retrying the SAME
        interrupted move is idempotent — a crash between copy and delete
        re-presents at most that one file's rows until the batch rerun
        clears both dirs (the documented at-least-once DLQ window)."""
        os.makedirs(dst, exist_ok=True)
        for fname in sorted(os.listdir(src)):
            if fname.startswith((".", "_")):
                continue
            target = os.path.join(dst, fname)
            if not os.path.exists(target):
                self._put_copy(os.path.join(src, fname), target)
            os.remove(os.path.join(src, fname))

    def recover(self, root: str) -> list[str]:
        """Replay (marker present) or discard (no marker: the stage never
        reached commit-ready, so live was never touched) every
        interrupted stage under ``root``.  Also heals the OTHER
        protocols' artifacts left by a restart under a different
        commit_protocol: manifest-protocol stages are replayed from
        their publish marker, and a rename-protocol ``_old_<name>``
        whose live dir is missing is the only copy of that data — it is
        restored (copy, not rename: this committer stays rename-free)."""
        healed: list[str] = []
        if not os.path.isdir(root):
            return healed
        for name in sorted(os.listdir(root)):
            full = os.path.join(root, name)
            if name.startswith(OLD_PREFIX):
                live = os.path.join(root, _demangle(name[len(OLD_PREFIX):]))
                if not os.path.isdir(live):
                    for rel in _list_files(full):
                        self._put_copy(os.path.join(full, rel),
                                       os.path.join(live, rel))
                    healed.append(live)
                self._delete_tree(full)
                continue
            if not name.startswith(STAGE_PREFIX):
                continue
            staged = full
            live = os.path.join(root, _demangle(name[len(STAGE_PREFIX):]))
            if os.path.exists(os.path.join(staged, PUBLISH_MARKER)):
                try:
                    _publish_from_marker(self, staged, live)
                except CommitConflict:
                    # the staged commit LOST its optimistic-concurrency
                    # race (another writer advanced the generation):
                    # replaying it would clobber the winner — the
                    # staged work is discarded, never published
                    self._delete_tree(staged)
                    continue
                healed.append(live)
            elif os.path.exists(os.path.join(staged, self.MARKER)):
                self._replay(staged, live)
                healed.append(live)
            else:
                self._delete_tree(staged)
        return healed


# ---------------------------------------------------------------------------
# Manifest-pointer table commits (the Iceberg-style plan-A read path)
# ---------------------------------------------------------------------------
#
# A committed batch directory carries a ``_FILES.json`` manifest naming
# its data files.  Readers that resolve file lists through the manifest
# (read_routed / read_routed_as_of) get SNAPSHOT ISOLATION across
# in-place rewrites: a compaction publishes its replacement files under
# fresh unique names ALONGSIDE the old generation, then flips the
# manifest with one atomic single-object put — the commit point — and
# only afterwards vacuums the unreferenced old files.  A reader that
# resolved before the flip keeps reading the old generation's files; one
# that resolves after sees exactly the new ones; no reader ever sees a
# mix.  (On a real object store the vacuum would be deferred by a
# retention window, exactly like Iceberg snapshot expiry / Delta VACUUM;
# locally ``manifest_swap`` vacuums immediately by default so footer
# walks keep counting one generation.)
#
# The swap uses ONLY put/delete/list + the atomic single-file publish —
# no renames — so the SAME protocol is correct under both committers.

FILE_MANIFEST = "_FILES.json"
PUBLISH_MARKER = "_PUBLISH_READY"
#: per-dir snapshot log: every ``manifest_swap`` archives the manifest
#: it supersedes as ``_history/<generation>.json`` (plus its
#: ``superseded_at``) — Iceberg's snapshot list on the plain layout.
#: Underscore-prefixed, so data listings and vacuums never see it.
HISTORY_DIR = "_history"


def data_files(root: str) -> list[str]:
    """Relative paths of the data files under ``root`` (what a manifest
    names): parquet only, hidden/underscore names skipped at every
    level — mirrors Spark's own listing rules."""
    out: list[str] = []
    for r, dirs, files in os.walk(root):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for fn in files:
            if fn.endswith(".parquet") and not fn.startswith((".", "_")):
                out.append(os.path.relpath(os.path.join(r, fn), root))
    return sorted(out)


def read_file_manifest(live: str) -> dict | None:
    """The committed file manifest of a batch dir, or None (legacy dirs
    written before manifests, or foreign layouts — callers fall back to
    directory listing, which is correct whenever no rewrite is racing).
    A corrupt/unreadable manifest also degrades to the listing fallback
    instead of making the whole table unreadable; the next
    recover+compaction rewrites it."""
    path = os.path.join(live, FILE_MANIFEST)
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def write_file_manifest(committer, live: str, files: list[str],
                        generation: int = 0,
                        stats: dict[str, dict] | None = None,
                        retired: list[dict] | None = None,
                        extra: dict | None = None,
                        committed_at: float | None = None) -> None:
    """Atomically (re)publish ``live``'s manifest — the commit point of
    every generation flip.  ``stats`` (per-file ``{"rows": n, "bytes":
    b}``, keyed by relative path) is the manifest-carried metadata that
    lets every later consumer — partition lineage, the DLQ cap, the
    metrics gauge — answer row/size questions WITHOUT re-opening parquet
    footers: at a 10⁶-file batch the per-batch footer re-walks are
    minutes of serial driver I/O, the analogue of the reference losing
    its metadata cache (metadata_cache.rs:37-100)."""
    doc = _manifest_doc(files, generation, stats=stats, retired=retired,
                        extra=extra, committed_at=committed_at)
    committer.put_file(
        os.path.join(live, FILE_MANIFEST), json.dumps(doc).encode(),
    )


def _manifest_doc(files: list[str], generation: int,
                  stats: dict[str, dict] | None = None,
                  retired: list[dict] | None = None,
                  extra: dict | None = None,
                  committed_at: float | None = None) -> dict:
    doc: dict = {"generation": generation, "files": files}
    if committed_at is not None:
        # snapshot timestamp (time travel / snapshot log); taken ONCE
        # at commit-decision time and carried through crash replays so
        # a replayed flip keeps its original time
        doc["committed_at"] = committed_at
    if stats is not None:
        doc["stats"] = stats
    if retired:
        doc["retired"] = retired
    if extra:
        # table-specific metadata riding the manifest (e.g. the DLQ
        # generation's resolved codec — dlq.py's redrive n_tok contract)
        doc.update(extra)
    return doc


# ---------------------------------------------------------------------------
# Snapshot log, time travel, rollback (Iceberg's snapshot list on the
# plain layout)
# ---------------------------------------------------------------------------
#
# Every ``manifest_swap`` archives the manifest it supersedes as
# ``_history/<generation>.json`` (stamped with ``superseded_at``)
# before flipping the live pointer, and the live manifest carries its
# own ``committed_at``.  Together they are the table's snapshot log:
# ``snapshot_log`` lists it, ``read_file_manifest_at`` resolves a
# manifest by generation or timestamp, ``snapshot_files`` additionally
# proves the snapshot is still READABLE (its files survive only until
# retention expiry — exactly Iceberg's contract: time travel works
# within the snapshot-retention window, fails loudly past it), and
# ``rollback_to_generation`` re-publishes an old file list as a NEW
# generation (Iceberg ``rollback_to_snapshot``: history moves forward,
# it is never rewritten).  Metadata is one small JSON per commit; the
# expiry sweep (``vacuum_expired``) prunes log entries together with
# the data files they describe, so the log stays bounded.


def _history_path(live: str, generation: int) -> str:
    return os.path.join(live, HISTORY_DIR, f"{generation}.json")


def archive_manifest(committer, live: str, man: dict,
                     superseded_at: float | None = None) -> None:
    """Archive a superseded manifest into the snapshot log.  Skips when
    the entry already exists so a crash-replayed flip neither restamps
    ``superseded_at`` nor re-puts the object."""
    import time as _time  # noqa: PLC0415

    path = _history_path(live, man["generation"])
    if os.path.exists(path):
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    doc = dict(man)
    doc["superseded_at"] = (_time.time() if superseded_at is None
                            else superseded_at)
    committer.put_file(path, json.dumps(doc).encode())


def claim_generation(live: str, prev_man: dict, token: str,
                     superseded_at: float | None = None,
                     intent: dict | None = None) -> dict | None:
    """Claim the exclusive right to commit generation ``prev+1`` by
    atomically creating the snapshot-log archive of ``prev_man`` — the
    optimistic-concurrency commit point: every flip from generation g
    must archive g first, so exclusive creation of
    ``_history/<g>.json`` admits exactly ONE winner per generation no
    matter how many writers staged against it (Iceberg's CAS on the
    metadata pointer, realized with the log entry the flip had to
    write anyway).  ``token`` identifies the commit so a crash REPLAY
    of the same commit passes while a racer fails; ``intent`` (the
    complete next-manifest document) makes marker-less commits
    roll-forwardable: a writer that finds a claim whose flip never
    landed completes it from the intent before conflicting, so a
    crashed claimer can never wedge the table.  Returns None when the
    claim is won, else the existing claim document."""
    import time as _time  # noqa: PLC0415

    doc = dict(prev_man)
    doc["superseded_at"] = (_time.time() if superseded_at is None
                            else superseded_at)
    doc["superseded_by"] = token
    if intent is not None:
        doc["commit_intent"] = intent
    path = _history_path(live, prev_man["generation"])
    if _put_file_exclusive(path, json.dumps(doc).encode()):
        return None
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        # claim present but unreadable mid-race: treat as a foreign
        # claim with unknown token — the caller conflicts, never clobbers
        return {"superseded_by": "<unreadable>"}


def _roll_forward_claim(committer, live: str, claim: dict) -> None:
    """Complete a crashed marker-less commit from its claim's
    ``commit_intent``: if the claimed generation's flip never reached
    the live manifest, publish the intent now.  Idempotent — a live
    manifest at or past the intent's generation is left alone.  Claims
    without an intent (marker-driven swaps) are finished by the
    committer's ``recover`` from their staged marker instead."""
    intent = claim.get("commit_intent")
    if intent is None:
        return
    cur = read_file_manifest(live)
    if cur is not None and cur["generation"] >= intent["generation"]:
        return
    if any(not os.path.exists(os.path.join(live, f))
           for f in intent["files"]):
        # a marker-backed commit still mid-put (or crashed before its
        # data landed): publishing its manifest now would point readers
        # at missing files — its own replay / recover() completes it
        return
    committer.put_file(os.path.join(live, FILE_MANIFEST),
                       json.dumps(intent).encode())


def _heal_regression(committer, live: str) -> None:
    """Re-advance ``live`` from the immutable claim chain.  A claimer
    whose manifest put lands LATE — after a racer rolled its intent
    forward and later generations committed on top — would regress the
    live pointer to its own (older) generation.  Every claim stores the
    complete manifest it publishes, so the chain
    ``_history/<g>.json → intent(g+1)`` deterministically reconstructs
    the newest committed state: walk it from the current generation
    until no further claim exists.  Every writer runs this right after
    its put (one ``exists()`` in the no-race common case), so a
    regression is healed by the writer that caused it; ``recover`` and
    any later writer converge the residual crash window."""
    while True:
        cur = read_file_manifest(live)
        if cur is None:
            return
        path = _history_path(live, cur["generation"])
        if not os.path.exists(path):
            return  # nothing committed past us
        try:
            with open(path) as fh:
                claim = json.load(fh)
        except (OSError, ValueError):
            return
        if claim.get("commit_intent") is None:
            return  # marker-path crash: recover() replays its stage
        _roll_forward_claim(committer, live, claim)
        if read_file_manifest(live)["generation"] == cur["generation"]:
            return  # no progress — stop rather than spin


def _history_entries(live: str) -> list[dict]:
    hist = os.path.join(live, HISTORY_DIR)
    out: list[dict] = []
    try:
        names = os.listdir(hist)
    except OSError:
        return out
    for name in names:
        # skip dot-prefixed names (crash-left '.put-*'/'.claim-*' temps),
        # mirroring list_tags: parsing debris as snapshot entries can
        # resurrect a vacuum-pruned generation and falsely mark
        # consolidation coverage 'exact' after expiry
        if not name.endswith(".json") or name.startswith("."):
            continue
        try:
            with open(os.path.join(hist, name)) as fh:
                out.append(json.load(fh))
        except (OSError, ValueError):
            continue  # partial/corrupt entry: that snapshot is just absent
    return sorted(out, key=lambda m: m["generation"])


def snapshot_log(live: str) -> list[dict]:
    """The dir's snapshot log, oldest→current: one summary row per
    generation (``generation``, ``committed_at``, ``superseded_at`` —
    None for the current one — ``n_files``, ``rows`` when the manifest
    carried stats, ``is_current``).  Empty for manifest-less dirs."""
    cur = read_file_manifest(live)
    entries = _history_entries(live)
    if cur is not None and (not entries
                            or entries[-1]["generation"] < cur["generation"]):
        entries.append(cur)

    def _row(man: dict) -> dict:
        stats = man.get("stats")
        rows = (sum(int(stats[f]["rows"]) for f in man["files"])
                if stats is not None and all(f in stats for f in man["files"])
                else None)
        return {"generation": man["generation"],
                "committed_at": man.get("committed_at"),
                "superseded_at": man.get("superseded_at"),
                "n_files": len(man["files"]),
                "rows": rows,
                "is_current": cur is not None
                and man["generation"] == cur["generation"]}

    return [_row(m) for m in entries]


def read_file_manifest_at(live: str, generation: int | None = None,
                          as_of: float | None = None) -> dict:
    """Resolve the manifest of a specific snapshot: by ``generation``,
    or the latest whose ``committed_at`` <= ``as_of`` (timestamp time
    travel; entries predating the committed_at stamp sort first by
    generation and an un-stamped entry is only chosen when nothing
    stamped qualifies — generation order IS commit order).  Raises
    ``LookupError`` when no snapshot matches: absent from the log means
    expired or never existed, and silently returning the current
    generation would be a wrong-answer bug."""
    if (generation is None) == (as_of is None):
        raise ValueError("pass exactly one of generation / as_of")
    cur = read_file_manifest(live)
    entries = _history_entries(live)
    if cur is not None and (not entries
                            or entries[-1]["generation"] < cur["generation"]):
        entries.append(cur)
    if generation is not None:
        for man in entries:
            if man["generation"] == generation:
                return man
        raise LookupError(
            f"no snapshot with generation {generation} under {live!r} "
            f"(have {[m['generation'] for m in entries]}) — expired or "
            f"never committed")
    best = None
    fallback = None  # newest UN-stamped entry — only wins when no
    for man in entries:  # generation order == commit order
        ts = man.get("committed_at")
        if ts is None:
            fallback = man  # stamped entry qualifies (its commit time
        elif ts <= as_of:  # is unknown, possibly AFTER as_of)
            best = man
    if best is None:
        best = fallback
    if best is None:
        raise LookupError(
            f"no snapshot committed at or before {as_of} under {live!r}")
    return best


def snapshot_files(live: str, generation: int | None = None,
                   as_of: float | None = None) -> list[str]:
    """The resolved snapshot's file list, VERIFIED readable: every file
    must still exist (current files, or retired ones inside the
    retention window).  Raises ``FileNotFoundError`` naming the missing
    files when the snapshot has expired — loud, never a partial read."""
    man = read_file_manifest_at(live, generation=generation, as_of=as_of)
    missing = [f for f in man["files"]
               if not os.path.exists(os.path.join(live, f))]
    if missing:
        raise FileNotFoundError(
            f"snapshot generation {man['generation']} under {live!r} has "
            f"expired: {len(missing)} of {len(man['files'])} files vacuumed "
            f"(first: {missing[0]!r})")
    return list(man["files"])


def rollback_to_generation(committer, live: str, generation: int) -> dict:
    """Roll the dir back to ``generation``'s file list by publishing it
    as a NEW generation (current+1) — history only moves forward, so
    the rollback is itself a snapshot and itself reversible.  The
    now-superseded current files retire under the retention window
    (they are NOT deleted here).  Requires the target snapshot to still
    be readable (inside retention).  Returns the new manifest."""
    import time as _time  # noqa: PLC0415
    import uuid as _uuid  # noqa: PLC0415

    target = read_file_manifest_at(live, generation=generation)
    snapshot_files(live, generation=generation)  # readable, or raise
    cur = read_file_manifest(live)
    if cur is None:
        raise LookupError(f"no current manifest under {live!r}")
    if cur["generation"] == generation:
        return cur  # already there
    now = _time.time()
    new_gen = cur["generation"] + 1
    retired = list(cur.get("retired", []))
    gone = [f for f in cur["files"] if f not in set(target["files"])]
    if gone:
        retired.append({"generation": cur["generation"], "files": gone,
                        "superseded_at": now})
    known = {"generation", "files", "stats", "retired", "committed_at",
             "superseded_at", "operation", "added", "tombstones_added",
             "commit_token", "superseded_by", "commit_intent"}
    tok = _uuid.uuid4().hex
    doc = _manifest_doc(
        list(target["files"]), new_gen,
        stats=target.get("stats"), retired=retired, committed_at=now,
        extra={**{k: v for k, v in target.items() if k not in known},
               "rollback_of": generation,
               # content jumps to an arbitrary past state: incremental
               # readers must refuse ranges crossing a rollback
               "operation": "rollback", "added": [],
               "commit_token": tok})
    existing = claim_generation(live, cur, tok, superseded_at=now,
                                intent=doc)
    if existing is not None and \
            existing.get("superseded_by") not in (None, tok):
        _roll_forward_claim(committer, live, existing)
        raise CommitConflict(
            f"generation {new_gen} of {live!r} was committed by "
            f"another writer")
    committer.put_file(os.path.join(live, FILE_MANIFEST),
                       json.dumps(doc).encode())
    _heal_regression(committer, live)
    return read_file_manifest(live)


def incremental_files(live: str, from_generation: int,
                      to_generation: int | None = None) -> list[dict]:
    """The APPEND lineage of ``live`` over ``(from_generation,
    to_generation]`` — Iceberg's incremental append scan on the plain
    layout.  Returns one ``{"generation", "files", "stats"}`` entry per
    append snapshot in the range, where ``files`` is exactly what that
    snapshot added; ``replace`` snapshots (compactions — row-count-
    verified content-preserving rewrites) are SKIPPED, and any snapshot
    that changed logical content (``overwrite`` = COW delete / merge
    update, ``rollback``, or a pre-lineage legacy flip whose kind is
    unknowable) raises ``ValueError``: an incremental reader that
    silently returned appends across a delete would resurrect retracted
    rows downstream.  Files are verified still present (an appended
    file rewritten by a later compaction survives as a retired
    retention copy only inside the window — expired → loud
    FileNotFoundError, exactly ``snapshot_files``'s contract)."""
    cur = read_file_manifest(live)
    if cur is None:
        raise LookupError(f"no manifest under {live!r}")
    if to_generation is None:
        to_generation = cur["generation"]
    # anchor must still resolve: a vacuumed-away from_generation means
    # the incremental chain is broken, not empty
    read_file_manifest_at(live, generation=from_generation)
    out: list[dict] = []
    for gen in range(from_generation + 1, to_generation + 1):
        man = read_file_manifest_at(live, generation=gen)
        op = man.get("operation")
        if op == "replace":
            continue
        if op != "append":
            raise ValueError(
                f"generation {gen} of {live!r} is "
                f"{op or 'of unknown kind (pre-lineage)'} — incremental "
                f"append read is undefined across it")
        added = man.get("added", [])
        missing = [f for f in added
                   if not os.path.exists(os.path.join(live, f))]
        if missing:
            raise FileNotFoundError(
                f"incremental read of {live!r} generation {gen}: "
                f"{len(missing)} of {len(added)} appended files expired "
                f"(first: {missing[0]!r})")
        stats = man.get("stats") or {}
        out.append({"generation": gen, "files": list(added),
                    "stats": {f: stats[f] for f in added if f in stats}})
    return out


def commit_metadata_snapshot(committer, live: str, man: dict,
                             updates: dict, operation: str,
                             lineage_extra: dict | None = None) -> dict:
    """Publish a metadata-only change (same files, same stats) as a NEW
    snapshot: archive the current manifest into the log and flip to
    generation+1 with ``updates`` applied to the extra metadata (a None
    value drops the key).  Cost is two small JSON puts — O(1) in table
    size, like Iceberg committing a delete-file snapshot — but unlike
    an in-place rewrite the change is part of history: time travel to
    the prior generation shows the table WITHOUT it, and the changelog
    can attribute it.  Used for deferred-delete tombstones, whose
    in-place predecessor silently edited already-committed snapshots
    (a tombstone applied at read time to generation g's manifest
    retroactively changed what ``read_batch_snapshot(generation=g)``
    returned).

    Concurrency: the flip claims its generation (``claim_generation``)
    carrying the complete next manifest as its roll-forwardable intent;
    a racer raises ``CommitConflict`` (after completing the winner's
    flip if it crashed), and the caller retries against the re-read
    manifest — the metadata-only recompute is cheap by construction."""
    import time as _time  # noqa: PLC0415
    import uuid as _uuid  # noqa: PLC0415

    now = _time.time()
    known = {"generation", "files", "stats", "retired", "committed_at",
             "superseded_at", "operation", "added", "tombstones_added",
             "commit_token", "superseded_by", "commit_intent"}
    extra = {k: v for k, v in man.items() if k not in known}
    for k, v in updates.items():
        if v is None:
            extra.pop(k, None)
        else:
            extra[k] = v
    extra["operation"] = operation
    extra["added"] = []
    if lineage_extra:
        extra.update(lineage_extra)
    tok = _uuid.uuid4().hex
    extra["commit_token"] = tok
    doc = _manifest_doc(list(man["files"]), man["generation"] + 1,
                        stats=man.get("stats"), retired=man.get("retired"),
                        extra=extra, committed_at=now)
    existing = claim_generation(live, man, tok, superseded_at=now,
                                intent=doc)
    if existing is not None and \
            existing.get("superseded_by") not in (None, tok):
        _roll_forward_claim(committer, live, existing)
        raise CommitConflict(
            f"generation {man['generation'] + 1} of {live!r} was "
            f"committed by another writer")
    committer.put_file(os.path.join(live, FILE_MANIFEST),
                       json.dumps(doc).encode())
    # a racer may have rolled our intent forward and committed past it
    # while our own put was in flight — re-advance from the claim chain
    _heal_regression(committer, live)
    return read_file_manifest(live)


def changelog_entries(live: str, from_generation: int,
                      to_generation: int | None = None,
                      elide_consolidations: bool = False) -> list[dict]:
    """The CHANGE lineage of ``live`` over ``(from_generation,
    to_generation]`` — the metadata half of an Iceberg changelog scan,
    the general sibling of ``incremental_files`` that handles deletes
    instead of refusing them.  One entry per content-changing snapshot
    in the range, carrying the file diff against the previous snapshot
    (``added`` / ``dropped`` / ``kept``) and the tombstone diff
    (``filters_added`` / ``filters_removed``), plus each side's FULL
    filter list (``filters_prev`` / ``filters_new``) so a reader can
    compute the exact logical diff: rows visible under the previous
    snapshot's filters minus rows visible under the new one's.

    ``replace`` snapshots (compactions, tombstone materializations) are
    elided AND advanced over: every rewrite row-count-verifies logical
    content before flipping, so diffing straight across one is exact —
    and restricting later diffs to files changed SINCE the rewrite keeps
    the cost proportional to actual churn, never to compaction volume.
    A legacy snapshot (no recorded operation) raises ValueError — its
    kind is unknowable, and guessing could fabricate or hide changes.
    ``added``/``dropped`` files are verified still present (dropped
    files live on as retention copies; expired → FileNotFoundError,
    ``snapshot_files``'s contract)."""
    cur = read_file_manifest(live)
    if cur is None:
        raise LookupError(f"no manifest under {live!r}")
    if to_generation is None:
        to_generation = cur["generation"]
    man_prev = read_file_manifest_at(live, generation=from_generation)
    out: list[dict] = []
    for gen in range(from_generation + 1, to_generation + 1):
        man = read_file_manifest_at(live, generation=gen)
        op = man.get("operation")
        if op is None:
            raise ValueError(
                f"generation {gen} of {live!r} is of unknown kind "
                f"(pre-lineage) — changelog read is undefined across it")
        if op == "replace":
            man_prev = man  # content-preserving: diff across it
            continue
        prev_c = man_prev.get("consolidates") or []
        cur_c = man.get("consolidates") or []
        if elide_consolidations and op == "append" and cur_c != prev_c \
                and not all(str(b).startswith("merge-")
                            for b in set(cur_c) - set(prev_c)):
            # a table consolidation's append: its added rows MOVED here
            # from per-batch dirs (row-count-verified, compact_table) —
            # content-preserving at TABLE level, so a table-scoped CDC
            # reader diffs straight across it.  The marker is the
            # cumulative ``consolidates`` id list advancing; metadata
            # snapshots and COW rewrites carry the list forward
            # unchanged, so only genuine consolidation flips match —
            # EXCEPT merge_into's insert flip, which also advances the
            # list (its synthetic ``merge-*`` id) but ADDS logical
            # rows: that one stays a real append in the changelog.
            man_prev = man
            continue
        prev_files = set(man_prev["files"])
        cur_files = set(man["files"])
        added = sorted(cur_files - prev_files)
        dropped = sorted(prev_files - cur_files)
        filters_prev = [list(map(list, e))
                        for e in man_prev.get("delete_filters") or []]
        filters_new = [list(map(list, e))
                       for e in man.get("delete_filters") or []]
        missing = [f for f in added + dropped
                   if not os.path.exists(os.path.join(live, f))]
        if missing:
            raise FileNotFoundError(
                f"changelog read of {live!r} generation {gen}: "
                f"{len(missing)} changed files expired "
                f"(first: {missing[0]!r})")
        out.append({
            "generation": gen, "operation": op,
            "added": added, "dropped": dropped,
            "kept": sorted(cur_files & prev_files),
            "filters_prev": filters_prev, "filters_new": filters_new,
            "filters_added": [e for e in filters_new
                              if e not in filters_prev],
            "filters_removed": [e for e in filters_prev
                                if e not in filters_new],
            "man": man, "man_prev": man_prev,
        })
        man_prev = man
    return out


def consolidation_coverage(live: str) -> dict[str, dict]:
    """Which consolidation flip of the ``live`` (consolidated) dir
    absorbed each batch id, from the snapshot log alone: ``batch_id ->
    {"flip_generation", "source_generation"}``.  ``flip_generation`` is
    the EARLIEST generation whose cumulative ``consolidates`` list
    names the id (the absorbing flip); ``source_generation`` is the
    absorbed per-batch dir's own final generation at absorption time
    (``consolidated_gens``, recorded by compact_table) — None for
    flips committed before that lineage existed.  A CDC follower uses
    this to prove a reaped source dir had no unconsumed changes."""
    mans = _history_entries(live)
    cur = read_file_manifest(live)
    if cur is not None and (not mans
                            or mans[-1]["generation"] < cur["generation"]):
        mans.append(cur)
    surviving = {m["generation"] for m in mans}
    out: dict[str, dict] = {}
    for man in mans:  # ascending: first sighting wins
        gens = man.get("consolidated_gens") or {}
        for b in man.get("consolidates") or []:
            if b not in out:
                # the sighting is EXACT only when the immediately
                # preceding generation still survives (so nothing
                # between the true flip and this one was pruned) or
                # this is the dir's first generation; after snapshot
                # expiry the first SURVIVING sighting may be later than
                # the true absorbing flip, and a CDC baseline built on
                # it would silently skip the deletes in between — so
                # callers must treat inexact coverage as expired
                # lineage (loud, never silent)
                g = man["generation"]
                out[b] = {"flip_generation": g,
                          "source_generation": gens.get(b),
                          "exact": g == 1 or (g - 1) in surviving}
    return out


#: longest string bound stored in a manifest — a column whose min/max
#: exceed this is simply recorded without bounds (absent stats = never
#: pruned = always correct), keeping manifests small at 10⁶ files
STAT_STRING_CAP = 64


def _encode_bound(v):
    """JSON-safe, ORDER-PRESERVING encoding of a parquet column bound.
    Numbers stay numbers; timestamps/dates become fixed-width ISO
    strings (lexicographic == chronological); strings pass through when
    short enough.  Returns None for types we don't prune on (bytes,
    decimals, booleans, nested) — the caller must treat None as
    "no usable bound"."""
    import datetime  # noqa: PLC0415

    if isinstance(v, bool):
        return None
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str) and len(v) <= STAT_STRING_CAP:
        return v
    return None


def _type_tag(v) -> str | None:
    """Domain tag of a python value in the encoded-bound space:
    ``i``/``f`` numeric, ``s`` string, ``d`` date, ``t`` timestamp —
    None for values we never prune on.  ``datetime`` is checked before
    ``date`` (subclass)."""
    import datetime  # noqa: PLC0415

    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, int):
        return "i"
    if isinstance(v, float):
        return "f"
    if isinstance(v, str):
        return "s"
    if isinstance(v, datetime.datetime):
        return "t"
    if isinstance(v, datetime.date):
        return "d"
    return None


def _arrow_type_tag(typ) -> str | None:
    """The ``_type_tag`` domain of an arrow field type."""
    import pyarrow as pa  # noqa: PLC0415

    if pa.types.is_boolean(typ):
        return None
    if pa.types.is_integer(typ):
        return "i"
    if pa.types.is_floating(typ):
        return "f"
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return "s"
    if pa.types.is_timestamp(typ):
        return "t"
    if pa.types.is_date(typ):
        return "d"
    return None


_MIDNIGHT_SUFFIX = "T00:00:00.000000"


def _align_domains(lo, hi, btag: str | None, val, vtag: str | None):
    """``(lo', hi', val')`` re-expressed in ONE comparable domain, or
    None when the pair can't be PROVABLY aligned (then no pruning).

    The date/timestamp cross is the interesting case: Spark compares a
    DATE column to a TIMESTAMP value by casting the date to its
    midnight instant, so date bounds (fixed-width ISO days) must be
    suffixed to midnight instants before comparing against an encoded
    timestamp — without this a midnight-equality predicate FALSELY
    excludes the file holding exactly that day.  Legacy manifests
    (bounds without a tag, ``btag`` None) only support same-shape
    compares: numeric-vs-numeric and string-vs-string; every
    date/timestamp predicate against them is no-prune."""
    if btag is None:  # legacy 2-element bounds: shape-matched only
        num_b = isinstance(lo, (int, float)) and not isinstance(lo, bool)
        if num_b and vtag in ("i", "f"):
            return lo, hi, val
        if isinstance(lo, str) and vtag == "s":
            return lo, hi, val
        return None
    if btag == vtag or {btag, vtag} <= {"i", "f"}:
        return lo, hi, val
    if btag == "d" and vtag == "t":
        # every row of a date column casts to its midnight instant
        return lo + _MIDNIGHT_SUFFIX, hi + _MIDNIGHT_SUFFIX, val
    if btag == "t" and vtag == "d":
        # a date literal promotes to its midnight timestamp
        return lo, hi, val + _MIDNIGHT_SUFFIX
    return None


# --- membership metadata: per-file value sets and bloom filters -----------
#
# min/max bounds cannot prune a point lookup on a scattered
# high-cardinality key (every file's [min, max] spans the probe).  For
# the columns in ``detail_cols`` the commit also records MEMBERSHIP
# metadata per file: the exact distinct-value set when tiny, else a
# small bloom filter — so a needle query (pod_name == X, doc_id == Y)
# prunes from the manifest alone down to the files that may really
# hold the key.  In a log table keys have strong temporal locality (a
# pod exists for hours, not the table's lifetime), so this turns a
# 10⁶-file scan into the handful of batches the pod was alive in.

#: distinct values <= this → exact value set (prunes every op)
MEMB_SET_CAP = 16
#: distinct values <= this → bloom filter (prunes ==); beyond it the
#: column gets no membership entry (absent = never pruned, never wrong)
BLOOM_MAX_DISTINCT = 4096
BLOOM_BITS_PER_KEY = 10
BLOOM_MIN_BITS = 64
#: hard per-column-per-file ceiling (4 KiB of bits, ~5.5 KiB b64) so a
#: 10⁶-file table's manifests stay driver-readable JSON
BLOOM_MAX_BITS = 32_768
BLOOM_K = 7


def _bloom_key(v, tag: str) -> bytes:
    """Canonical, type-prefixed hash input for one value — identical at
    build (file column values) and probe (predicate literal) time, the
    invariant that makes bloom false negatives impossible."""
    if tag == "i":
        body = str(int(v))
    elif tag in ("d", "t"):
        body = _encode_bound(v)  # UTC-normalized fixed-width ISO
    else:
        body = v
    return tag.encode() + b"\x00" + body.encode("utf-8")


def _bloom_hashes(key: bytes, m_bits: int):
    """``BLOOM_K`` bit indexes via double hashing of one blake2b-64."""
    import hashlib  # noqa: PLC0415

    h = int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big")
    h1, h2 = h & 0xFFFFFFFF, (h >> 32) | 1
    mask = m_bits - 1  # m_bits is a power of two
    return [(h1 + i * h2) & mask for i in range(BLOOM_K)]


def _membership_entry(values, tag: str | None) -> dict | None:
    """The manifest membership entry for one file's column: ``{"t",
    "set"}`` (exact distinct values, encoded) when tiny, ``{"t", "k",
    "b64"}`` (bloom) when moderate, None when high-cardinality or the
    domain isn't hashable."""
    import base64  # noqa: PLC0415

    if tag is None or tag == "f" or not values:
        return None  # float equality pruning is a footgun; skip
    if len(values) <= MEMB_SET_CAP:
        enc = [_encode_bound(v) for v in values]
        if all(e is not None for e in enc):
            return {"t": tag, "set": sorted(enc)}
        # over-long strings etc.: fall through to the bloom tier
    if len(values) > BLOOM_MAX_DISTINCT:
        return None
    m = BLOOM_MIN_BITS
    while m < len(values) * BLOOM_BITS_PER_KEY and m < BLOOM_MAX_BITS:
        m *= 2
    bits = bytearray(m // 8)
    for v in values:
        for idx in _bloom_hashes(_bloom_key(v, tag), m):
            bits[idx >> 3] |= 1 << (idx & 7)
    return {"t": tag, "k": BLOOM_K,
            "b64": base64.b64encode(bytes(bits)).decode("ascii")}


def _membership_excludes(ent: dict, op: str, raw_val) -> bool:
    """True when the membership entry PROVES no row satisfies
    ``col <op> raw_val``.  A value set serves every op (the file's
    column holds exactly these values); a bloom serves ``==`` only, and
    only on an exact domain-tag match."""
    import base64  # noqa: PLC0415

    vtag = _type_tag(raw_val)
    if vtag is None:
        return False
    btag = ent.get("t")
    if "set" in ent:
        val = _encode_bound(raw_val)
        if val is None:
            return False
        for member in ent["set"]:
            a = _align_domains(member, member, btag, val, vtag)
            if a is None or not _bound_excludes(a[0], a[1], op, a[2]):
                return False  # some member may satisfy the predicate
        return True
    if op != "==" or btag != vtag:
        return False
    bits = base64.b64decode(ent["b64"])
    m = len(bits) * 8
    for idx in _bloom_hashes(_bloom_key(raw_val, vtag), m):
        if not bits[idx >> 3] & (1 << (idx & 7)):
            return True  # definitely absent
    return False  # maybe present


def _file_stats_one(full: str, detail_cols: tuple) -> dict:
    """The ``collect_file_stats`` entry for ONE parquet file — a pure
    module-level function so the distributed path can ship it to
    executors by reference (the package travels via --py-files /
    PYTHONPATH, never by value)."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    pf = pq.ParquetFile(full)
    md = pf.metadata
    tags = {f.name: _arrow_type_tag(f.type) for f in pf.schema_arrow}
    cols: dict[str, list] = {}
    dropped: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            if "." in name or name in dropped:
                continue  # nested leaves: no file-level column bound
            st = c.statistics
            lo = _encode_bound(st.min) if st and st.has_min_max else None
            hi = _encode_bound(st.max) if st and st.has_min_max else None
            # NaN min/max (floats): unusable — min()/max() folding
            # across row groups is undefined under NaN ordering
            if isinstance(lo, float) and lo != lo:
                lo = None
            if isinstance(hi, float) and hi != hi:
                hi = None
            if lo is None or hi is None:
                dropped.add(name)
                cols.pop(name, None)
                continue
            if name in cols:
                cols[name][0] = min(cols[name][0], lo)
                cols[name][1] = max(cols[name][1], hi)
            else:
                cols[name] = [lo, hi, tags.get(name)]
    ent: dict = {"rows": md.num_rows, "bytes": os.path.getsize(full)}
    if cols:
        ent["cols"] = cols
    want = [c for c in detail_cols
            if tags.get(c) not in (None, "f") and md.num_rows > 0]
    if want:
        memb: dict[str, dict] = {}
        tbl = pf.read(columns=want)
        for c in want:
            vals = tbl.column(c).drop_null().unique().to_pylist()
            m = _membership_entry(vals, tags[c])
            if m is not None:
                memb[c] = m
        if memb:
            ent["memb"] = memb
    return ent


#: commits below this file count stay on the driver — a task-scheduling
#: round trip costs more than reading the footers locally.  Measured on
#: this host (round 6): a 135-file commit with membership cols is 0.49 s
#: serial / ~0.15 s with the thread pool on the driver, while the RDD
#: path's Python-job overhead alone is ~4 s — so the break-even is in
#: the thousands of files, not 64.  On an object store the per-file
#: latency is larger but the thread pool hides it the same way; the
#: distributed path exists for the 10⁵-10⁶-file consolidation case.
DISTRIBUTED_STATS_MIN_FILES = int(
    os.environ.get("SPARK_GRAFT_DIST_STATS_MIN_FILES", "4096")
)

#: driver-side stats thread pool width: footer/membership reads are
#: I/O-bound and pyarrow releases the GIL, so threads overlap well
_STATS_THREADS = 16


def collect_file_stats(root: str, files: list[str],
                       detail_cols=(), spark=None) -> dict[str, dict]:
    """Per-file ``{"rows", "bytes", "cols"[, "memb"]}`` from the parquet
    footers — run ONCE at commit time over the just-written files, so
    every later metadata consumer reads the manifest instead of the
    footers.

    ``cols`` maps each flat primitive column to its ``[min, max, tag]``
    bounds aggregated across the file's row groups (the manifest-level
    column statistics Iceberg carries for scan planning; ``tag`` is the
    ``_type_tag`` domain the bounds live in): a reader with a predicate
    prunes files from the manifest ALONE — zero footer opens, zero file
    listings of irrelevant data — which at a 100 TB table is the
    difference between planning from a few KB of JSON and opening 10⁶
    footers.  A column is dropped from ``cols`` the moment any row
    group lacks usable stats (all-null chunk, unencodable type,
    over-long string): absent bounds are never wrong, only unprunable.

    ``detail_cols`` names columns that additionally get MEMBERSHIP
    metadata (``memb``: exact value set or bloom filter, see above) —
    this tier reads the named columns' values back (one columnar read
    per file, at commit time, of data just written and still in page
    cache), so it is opt-in per table (``PipelineConfig.
    stats_detail_cols``).

    When ``spark`` is given and the commit is large (>=
    ``DISTRIBUTED_STATS_MIN_FILES`` files), the per-file work runs ON
    THE EXECUTORS — one map task per slice of files, results collected
    as the (small) stats dicts — so commit-time metadata cost scales
    with the cluster instead of serializing on the driver: a 10⁶-file
    consolidation's footer+membership pass is minutes of parallel I/O,
    not hours of driver I/O.  Requires the files to be reachable from
    the executors (object store / shared FS in production; trivially
    true on local[N]).  Small commits stay on the driver — the common
    micro-batch writes O(cores) files and a task round-trip would cost
    more than it saves."""
    dcols = tuple(detail_cols)
    if spark is not None and len(files) >= DISTRIBUTED_STATS_MIN_FILES:
        sc = spark.sparkContext
        n = min(len(files), sc.defaultParallelism * 2)
        pairs = (
            sc.parallelize([os.path.join(root, rel) for rel in files], n)
            .map(lambda full: (full, _file_stats_one(full, dcols)))
            .collect()
        )
        by_full = dict(pairs)
        return {rel: by_full[os.path.join(root, rel)] for rel in files}
    if len(files) > 1:
        from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

        with ThreadPoolExecutor(min(_STATS_THREADS, len(files))) as pool:
            ents = pool.map(
                lambda rel: _file_stats_one(os.path.join(root, rel), dcols),
                files,
            )
            return dict(zip(files, ents))
    return {rel: _file_stats_one(os.path.join(root, rel), dcols)
            for rel in files}


_PRUNE_OPS = ("==", ">=", ">", "<=", "<")


def _bound_excludes(lo, hi, op: str, val) -> bool:
    """True when a file whose column spans ``[lo, hi]`` provably holds
    NO row satisfying ``col <op> val``.  Incomparable domains (numeric
    bound vs string value or vice versa) never exclude — pruning must
    only ever drop files it can PROVE empty for the predicate.  NaN
    anywhere also never excludes: parquet min/max ignore NaN rows, and
    Spark orders NaN ABOVE every value, so [1, 5] bounds say nothing
    about ``col > 10`` when the file may hold NaNs."""
    if any(isinstance(x, float) and x != x for x in (lo, hi, val)):
        return False
    num_b = isinstance(lo, (int, float)) and not isinstance(lo, bool)
    num_v = isinstance(val, (int, float)) and not isinstance(val, bool)
    if num_b != num_v:
        return False
    if op == "==":
        return val < lo or val > hi
    if op == ">=":
        return hi < val
    if op == ">":
        return hi <= val
    if op == "<=":
        return lo > val
    if op == "<":
        return lo >= val
    return False


#: Hive/Spark sentinel directory value for a null partition value
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

_DATE_RE = re.compile(r"\d{4}-\d{2}-\d{2}$")


def _path_partition_values(rel: str) -> dict[str, str]:
    """``col -> raw value`` from the ``col=value`` path segments of a
    manifest-relative data-file path (Spark's partition-dir layout) —
    the partition half of manifest pruning: partition columns are never
    IN the data files (the writer drops them), so their only
    manifest-visible trace is the path.  Values carrying escape
    sequences (Spark %XX-escapes special chars on write) or the Hive
    null sentinel are omitted: absent = never pruned, never wrong."""
    out: dict[str, str] = {}
    for seg in rel.split("/")[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            if "%" not in v and v != _HIVE_NULL:
                out[k] = v
    return out


def _partition_bound(raw: str, val):
    """``raw`` (a path partition value) re-expressed in the encoded
    domain of predicate value ``val`` so ``_bound_excludes`` can compare
    them — or None when the domains can't be PROVABLY aligned.  The
    predicate value's python type is the authority for the column type
    (matching how Spark would coerce the partition value):

    - numeric ``val``: the path value must parse as a number;
    - datetime ``val``: a date-shaped path value means every row holds
      that DATE, which Spark compares to a timestamp by casting to
      midnight — so the aligned bound IS the midnight instant (exact,
      not conservative);
    - date/str ``val``: the raw string (ISO date order == lexicographic;
      Spark string comparison is binary, same as python's)."""
    import datetime  # noqa: PLC0415

    if isinstance(val, bool) or val is None:
        return None
    if isinstance(val, (int, float)):
        try:
            return float(raw) if isinstance(val, float) else int(raw)
        except ValueError:
            return None
    if isinstance(val, datetime.datetime):
        if _DATE_RE.match(raw):
            return raw + "T00:00:00.000000"
        return None
    if isinstance(val, datetime.date):
        return raw if _DATE_RE.match(raw) else None
    if isinstance(val, str):
        return raw
    return None


def prune_manifest_files(man: dict, predicates,
                         files: list[str] | None = None) -> list[str]:
    """The subset of ``man["files"]`` (or the ``files`` subset of it)
    that may hold rows satisfying ALL of ``predicates``
    (``[(col, op, value), ...]``, op one of ``== >= > <= <``) —
    manifest-only data skipping.  Two bound sources serve each
    predicate: the commit-time column statistics (``stats[f]["cols"]``)
    and, for partition columns that exist only as ``col=value`` path
    segments, the path value itself as an exact [v, v] bound.  Files
    without either are kept (bounds are advisory: pruning is an
    optimization, never a filter — callers still apply the exact
    predicate Spark-side)."""
    files = list(man.get("files", [])) if files is None else list(files)
    if not predicates:
        return files
    enc = []
    for col, op, val in predicates:
        if op not in _PRUNE_OPS:
            raise ValueError(
                f"unsupported prune op {op!r}; one of {_PRUNE_OPS}")
        enc.append((col, op, _encode_bound(val), val, _type_tag(val)))
    stats = man.get("stats") or {}
    kept = []
    for f in files:
        st = stats.get(f) or {}
        cols = st.get("cols") or {}
        memb = st.get("memb") or {}
        pvals = _path_partition_values(f)
        for col, op, val, raw_val, vtag in enc:
            b = cols.get(col)
            if b is not None and val is not None:
                btag = b[2] if len(b) > 2 else None
                a = _align_domains(b[0], b[1], btag, val, vtag)
                if a is not None and _bound_excludes(a[0], a[1], op, a[2]):
                    break
            if col in memb and _membership_excludes(memb[col], op, raw_val):
                break
            if b is None and val is not None and col in pvals:
                pv = _partition_bound(pvals[col], raw_val)
                if pv is not None and _bound_excludes(pv, pv, op, val):
                    break
        else:
            kept.append(f)
    return kept


def prune_files_by_id_set(man: dict, col: str, ids) -> list[str]:
    """Files whose ``col`` metadata (min/max bounds and, when present,
    membership set/bloom) may contain ANY of ``ids`` — the IN-predicate
    shape of manifest pruning (an as-of read over the consolidated
    generation prunes its files by batch_id bounds here before Spark
    ever lists them)."""
    trip = [(_encode_bound(i), i, _type_tag(i)) for i in ids]
    if any(e is None for e, _, _ in trip):
        return list(man.get("files", []))
    stats = man.get("stats") or {}
    kept = []
    for f in man.get("files", []):
        st = stats.get(f) or {}
        b = (st.get("cols") or {}).get(col)
        ment = (st.get("memb") or {}).get(col)

        def may_hold(v, raw, vtag, b=b, ment=ment):
            if b is not None:
                btag = b[2] if len(b) > 2 else None
                a = _align_domains(b[0], b[1], btag, v, vtag)
                if a is not None and _bound_excludes(a[0], a[1], "==", a[2]):
                    return False
            return ment is None or not _membership_excludes(ment, "==", raw)

        if (b is None and ment is None) or any(
                may_hold(*t) for t in trip):
            kept.append(f)
    return kept


# ---------------------------------------------------------------------------
# Manifest-carried schema (add-column evolution on the plain layout)
# ---------------------------------------------------------------------------

def manifest_schema(man: dict | None):
    """The physical data-file schema a manifest records (written by the
    pipeline commit and carried across compaction flips), as a Spark
    ``StructType`` — or None for legacy/absent manifests."""
    sj = (man or {}).get("schema")
    if not sj:
        return None
    from pyspark.sql.types import StructType  # noqa: PLC0415

    return StructType.fromJson(sj)


def merge_schemas(schemas):
    """Union a sequence of ``StructType``s by field NAME into the table
    read schema (first-seen order, later-added columns appended) — the
    add-column half of schema evolution: a scan with the merged schema
    reads files missing a column as nulls, with zero footer opens
    (Spark's ``mergeSchema`` derives the same thing by reading every
    footer).  All merged fields are nullable (an added column is
    necessarily absent, hence null, in pre-evolution files).  A column
    appearing with two different types raises — type-changing evolution
    needs an explicit rewrite, never a silent cast."""
    from pyspark.sql.types import StructField, StructType  # noqa: PLC0415

    fields: dict[str, StructField] = {}
    order: list[str] = []
    for s in schemas:
        for f in s.fields:
            prev = fields.get(f.name)
            if prev is None:
                fields[f.name] = StructField(f.name, f.dataType, True)
                order.append(f.name)
            elif prev.dataType != f.dataType:
                raise ValueError(
                    f"schema evolution conflict on column {f.name!r}: "
                    f"{prev.dataType.simpleString()} vs "
                    f"{f.dataType.simpleString()} — type changes require "
                    f"a table rewrite"
                )
    return StructType([fields[n] for n in order])


def manifest_rows(live: str) -> int | None:
    """Row count of ``live``'s CURRENT generation from its manifest, or
    None when no manifest exists.  Prefers the manifest-carried stats
    (zero footer opens); a stats-less legacy manifest is resolved by
    footer-reading exactly the files it references (the logical
    generation — a raw directory walk would also count files a deferred
    vacuum has not yet reaped)."""
    man = read_file_manifest(live)
    if man is None:
        return None
    stats = man.get("stats")
    if stats is not None and all(f in stats for f in man["files"]):
        return sum(int(stats[f]["rows"]) for f in man["files"])
    from logfowd2_spark.ioutil import footer_num_rows  # noqa: PLC0415

    return sum(
        footer_num_rows(os.path.join(live, f)) for f in man["files"]
    )


def vacuum_unreferenced(live: str) -> list[str]:
    """Delete data files the current manifest does not reference (the
    superseded generation).  Files held by a RETIRED entry (a deferred
    retention window — see ``vacuum_expired``) are kept.  Returns the
    removed relative paths.  No-op without a manifest."""
    man = read_file_manifest(live)
    if man is None:
        return []
    keep = set(man["files"])
    for ent in man.get("retired", []):
        keep.update(ent["files"])
    removed = []
    for rel in data_files(live):
        if rel not in keep:
            os.remove(os.path.join(live, rel))
            removed.append(rel)
    _prune_empty_dirs(live)
    return removed


def _prune_empty_dirs(live: str) -> None:
    """Drop now-empty partition dirs so listings don't accumulate husks."""
    for r, dirs, files in os.walk(live, topdown=False):
        if r != live and not dirs and not files:
            try:
                os.rmdir(r)
            except OSError:
                pass


def vacuum_expired(committer, live: str, retention_s: float,
                   now: float | None = None,
                   pinned=frozenset()) -> list[str]:
    """Snapshot expiry — the deferred half of the retention model
    (Iceberg ``expire_snapshots`` / Delta ``VACUUM`` on the plain
    layout): delete retired generations whose supersession is at least
    ``retention_s`` old, and atomically rewrite the manifest without
    the expired entries.  A reader that resolved the OLD manifest
    before the flip keeps its complete generation until the window
    passes — the isolation guarantee ``manifest_swap`` alone only gave
    until its immediate vacuum.  Returns the removed relative paths.

    ``pinned`` generations (table TAGS — maintenance.create_tag) are
    exempt: a retired entry holding any pinned generation's file is
    kept whole (files stay manifest-tracked, so no later sweep can
    mistake them for debris), and pinned snapshot-log entries survive
    so the pinned manifest stays resolvable — Iceberg's tags-pin-
    snapshots-against-expiry contract."""
    import time as _time  # noqa: PLC0415

    man = read_file_manifest(live)
    if man is None:
        return []
    now = _time.time() if now is None else now
    pinned = set(pinned)
    pinned_files: set[str] = set()
    for g in pinned:
        try:
            pinned_files |= set(
                read_file_manifest_at(live, generation=g)["files"])
        except LookupError as exc:
            # a live pin MUST resolve (tags keep their snapshot-log
            # entry pinned); an unresolvable one means corruption —
            # sweeping on would delete the files the pin exists to
            # protect, in the same pass that failed to see them
            raise RuntimeError(
                f"pinned generation {g} of {live!r} is unresolvable "
                f"({exc}); refusing to sweep with partial pins") from exc
    keep_current = set(man["files"])
    remaining: list[dict] = []
    removed: list[str] = []
    for ent in man.get("retired", []):
        if now - ent["superseded_at"] >= retention_s and \
                not (pinned_files and pinned_files & set(ent["files"])):
            for rel in ent["files"]:
                if rel in keep_current:
                    continue
                try:
                    os.remove(os.path.join(live, rel))
                except OSError:
                    pass
                removed.append(rel)
        else:
            remaining.append(ent)
    if len(remaining) != len(man.get("retired", [])):
        # preserve table-specific metadata keys (e.g. the consolidation
        # phase-1 record) across the rewrite
        known = {"generation", "files", "stats", "retired"}
        write_file_manifest(committer, live, man["files"],
                            man["generation"], stats=man.get("stats"),
                            retired=remaining,
                            extra={k: v for k, v in man.items()
                                   if k not in known})
        _prune_empty_dirs(live)
    # expire the snapshot LOG together with the data it described
    # (Iceberg expire_snapshots removes the snapshot metadata too):
    # archived manifests whose supersession is past the window go away,
    # keeping the log bounded at ~retention_window/commit_interval
    # entries no matter how many commits the dir has seen
    # History pruning requires a POSITIVE retention window: under
    # retention_s == 0 the age test is trivially true for every entry,
    # including the current generation's predecessor — whose archive
    # doubles as the OCC claim (claim_generation) — so an immediate
    # prune would let a stale writer re-claim an already-committed
    # generation and clobber a metadata-only commit.  With a positive
    # window the operator has bounded writer staleness explicitly, and
    # entries past it expire together with their data (time travel to
    # them raises, the tested contract).  Unstamped entries are never
    # provably expired and always survive.
    if retention_s > 0:
        for ent in _history_entries(live):
            sup = ent.get("superseded_at")
            if sup is None:
                continue  # no supersession stamp: not provably expired
            if now - sup >= retention_s and ent["generation"] not in pinned:
                try:
                    os.remove(_history_path(live, ent["generation"]))
                except OSError:
                    pass
    return removed


def _publish_from_marker(committer, staged: str, live: str,
                         vacuum: bool = True) -> None:
    """Steps 2-5 of ``manifest_swap`` — idempotent, replayable from the
    marker after a crash at any point.  The stage (and with it the
    replay marker) is deleted LAST: until the vacuum has removed the
    superseded generation, directory-listing consumers of ``live`` see
    both generations, and only the surviving marker lets ``recover()``
    drive the state back to a single one."""
    with open(os.path.join(staged, PUBLISH_MARKER)) as fh:
        marker = json.load(fh)
    # archive the manifest this flip supersedes into the snapshot log —
    # BEFORE the flip, so no window exists where the old pointer is
    # gone from both places.  The archive doubles as the OPTIMISTIC
    # CONCURRENCY commit point (claim_generation): exactly one writer
    # per generation wins it; a crash replay of the SAME commit (same
    # token) passes, a racer raises CommitConflict with the table left
    # exactly as the winner published it — validated BEFORE any staged
    # file lands in ``live``, so a losing commit leaves zero debris.
    prev = read_file_manifest(live)
    tok = marker.get("commit_token")
    extra = dict(marker.get("extra") or {})
    if tok is not None:
        extra["commit_token"] = tok
    if "operation" in marker:
        # snapshot lineage for incremental readers: what KIND of change
        # this flip was, and which files it physically added
        extra["operation"] = marker["operation"]
        extra["added"] = marker.get("publish", marker["files"])
    doc = _manifest_doc(marker["files"], marker["generation"],
                        stats=marker.get("stats"),
                        retired=marker.get("retired"), extra=extra,
                        committed_at=marker.get("committed_at"))
    if prev is not None:
        if prev["generation"] > marker["generation"]:
            raise CommitConflict(
                f"stale commit for {live!r}: staged against generation "
                f"{marker['generation'] - 1} but the table is at "
                f"{prev['generation']}")
        if prev["generation"] == marker["generation"]:
            # flip already landed: OUR crash replay finishes cleanup;
            # a DIFFERENT commit at this generation means we lost
            if tok is not None and \
                    prev.get("commit_token") not in (None, tok):
                raise CommitConflict(
                    f"generation {marker['generation']} of {live!r} was "
                    f"committed by another writer")
        else:
            if prev["generation"] != marker["generation"] - 1:
                raise CommitConflict(
                    f"commit for {live!r} skips generations: staged "
                    f"{marker['generation']}, live {prev['generation']}")
            if tok is None:
                # pre-token marker (written before optimistic
                # concurrency): legacy skip-if-exists archive, so its
                # crash replays keep passing
                archive_manifest(committer, live, prev,
                                 superseded_at=marker.get("committed_at"))
            else:
                existing = claim_generation(
                    live, prev, tok,
                    superseded_at=marker.get("committed_at"), intent=doc)
                if existing is not None and \
                        existing.get("superseded_by") not in (None, tok):
                    # a racer holds the claim: finish its flip if it
                    # crashed marker-less (roll-forward), then concede
                    _roll_forward_claim(committer, live, existing)
                    raise CommitConflict(
                        f"generation {marker['generation']} of {live!r} "
                        f"is claimed by another writer")
    # "publish" = the files physically staged here; "files" = the full
    # new-generation list (a consolidating append keeps the previous
    # generation's files in place — they are immutable and re-listed,
    # not re-copied).  Markers written before the split carry only
    # "files", all of which were staged.
    for rel in marker.get("publish", marker["files"]):
        dst = os.path.join(live, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        committer.put_file(dst, src_path=os.path.join(staged, rel))
    committer.put_file(os.path.join(live, FILE_MANIFEST),
                       json.dumps(doc).encode())
    # a racer may have rolled our intent forward and committed past it
    # while our own put was in flight — re-advance from the claim chain
    _heal_regression(committer, live)
    if vacuum:
        # retired entries are protected inside vacuum_unreferenced, so
        # this only reaps genuinely untracked debris on a retained swap
        vacuum_unreferenced(live)
    shutil.rmtree(staged, ignore_errors=True)


def manifest_swap(committer, live: str, staged: str,
                  vacuum: bool = True,
                  stats: dict[str, dict] | None = None,
                  retain_previous: bool = False,
                  keep_prev_files: bool = False,
                  drop_files: list[str] | None = None,
                  extra: dict | None = None,
                  expected_generation: int | None = None) -> None:
    """Replace ``live``'s data with ``staged``'s via a manifest flip:

    1. put ``<stage>/_PUBLISH_READY`` (files + next generation) — from
       here the swap is committed-to and replayable;
    2. put each staged file into ``live`` under its (unique) name —
       invisible to manifest readers until step 3;
    3. put ``live/_FILES.json`` naming exactly the new files — the
       ATOMIC commit point for every reader;
    4. delete the stage;
    5. vacuum the superseded generation — immediately by default, or,
       with ``retain_previous``, NOT AT ALL here: the old generation is
       recorded as a ``retired`` manifest entry (files +
       ``superseded_at``) and reaped later by ``vacuum_expired`` once a
       retention window passes — Iceberg's snapshot-expiry model, so a
       reader that resolved the pre-swap manifest keeps a complete old
       generation across AND past the flip.

    Unlike the directory-swap protocols, readers holding the old
    manifest keep a complete, undisturbed old generation until step 5.
    The supersession timestamp is taken once here and carried in the
    replay marker, so a crash-replayed swap retires with the ORIGINAL
    time (idempotent; the window never restarts).

    ``drop_files`` (with ``keep_prev_files``) is the PARTIAL-rewrite
    shape — a copy-on-write row-level delete: the named previous files
    are superseded by the staged rewrite while every other previous
    file stays listed untouched.  Dropped files retire under the
    retention window when ``retain_previous``, else step 5's vacuum
    reaps them as unreferenced."""
    import time as _time  # noqa: PLC0415
    import uuid as _uuid  # noqa: PLC0415

    man = read_file_manifest(live)
    if expected_generation is not None:
        have = man["generation"] if man else None
        if have != expected_generation:
            # early optimistic-concurrency abort: the snapshot this
            # rewrite was computed from is no longer current — fail
            # BEFORE staging a marker (nothing to recover/discard)
            raise CommitConflict(
                f"{live!r} is at generation {have}, rewrite was computed "
                f"against {expected_generation}")
    gen = (man["generation"] + 1) if man else 1
    staged_files = [f for f in data_files(staged)]
    if stats is None:
        stats = collect_file_stats(staged, staged_files)
    files = list(staged_files)
    retired: list[dict] = []
    if keep_prev_files and man is not None:
        # consolidating APPEND: the previous generation's files stay
        # live and re-listed (immutable, never re-copied); their stats
        # carry over from the old manifest — minus ``drop_files``, the
        # superseded originals of a copy-on-write partial rewrite
        dropped = set(drop_files or ())
        prev = [f for f in man["files"]
                if f not in set(staged_files) and f not in dropped]
        files = prev + staged_files
        old_stats = man.get("stats") or {}
        stats = {**{f: old_stats[f] for f in prev if f in old_stats},
                 **stats}
        retired = list(man.get("retired", []))
        gone = [f for f in man["files"] if f in dropped]
        if gone and retain_previous:
            retired.append({
                "generation": man["generation"],
                "files": gone,
                "superseded_at": _time.time(),
            })
    elif retain_previous and man is not None:
        retired = list(man.get("retired", []))
        prev = [f for f in man["files"] if f not in set(staged_files)]
        if prev:
            retired.append({
                "generation": man["generation"],
                "files": prev,
                "superseded_at": _time.time(),
            })
    # classify the flip for incremental readers (Iceberg snapshot
    # `operation`): a consolidating append adds logical rows; a partial
    # rewrite (COW delete / merge update) changes logical content; a
    # full rewrite (compaction) preserves it — the row-count verify
    # every caller runs before flipping is what makes "replace" safe to
    # SKIP in an incremental scan.  Callers may override via extra.
    if extra and "operation" in extra:
        operation = extra["operation"]
    elif keep_prev_files:
        operation = "overwrite" if drop_files else "append"
    else:
        operation = "replace"
    committer.put_file(
        os.path.join(staged, PUBLISH_MARKER),
        json.dumps({"generation": gen, "files": files,
                    "publish": staged_files,
                    "committed_at": _time.time(),
                    "operation": operation,
                    # commit identity: lets a crash REPLAY of this swap
                    # pass the generation claim while a racer conflicts
                    "commit_token": _uuid.uuid4().hex,
                    "stats": stats, "retired": retired,
                    "extra": extra or {}}).encode(),
    )
    _publish_from_marker(committer, staged, live, vacuum=vacuum)


# ---------------------------------------------------------------------------
# Table-level manifest (cross-batch consolidation pointer)
# ---------------------------------------------------------------------------
#
# ``_TABLE.json`` at the routed root records which batch ids have been
# consolidated into the ``_consolidated`` generation (maintenance.
# compact_table).  It is the table-level commit point: readers that see
# it scan the consolidated files for those ids (batch_id preserved as a
# data column, so as-of filters prune by parquet row-group stats) and
# the per-batch dirs only for ids not yet consolidated.  Superseded
# per-batch dirs are listed in ``pending_dirs`` until the retention
# window reaps them — a crash between the pointer put and the dir
# removal only leaves retention copies that readers already exclude.

TABLE_MANIFEST = "_TABLE.json"
CONSOLIDATED_DIR = "_consolidated"


def read_table_manifest(root: str) -> dict | None:
    try:
        with open(os.path.join(root, TABLE_MANIFEST)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def write_table_manifest(committer, root: str, doc: dict) -> None:
    committer.put_file(os.path.join(root, TABLE_MANIFEST),
                       json.dumps(doc).encode())


COMMITTERS = {"rename": RenameCommitter, "put": PutCommitter}


def get_committer(protocol: str):
    try:
        return COMMITTERS[protocol]()
    except KeyError:
        raise ValueError(
            f"unknown commit protocol {protocol!r}; one of {sorted(COMMITTERS)}"
        ) from None
