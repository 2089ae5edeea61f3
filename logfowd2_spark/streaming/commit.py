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
  whose marker still exists.  This is the plan-B stand-in for the plan-A
  answer (an Iceberg-style metadata-pointer commit, SURVEY.md §7 risk d);
  it gives durability/no-loss, while reader *isolation* during the swap
  window remains the table format's job.

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
    derives generation age from file mtimes)."""
    tmp = os.path.join(os.path.dirname(dst), ".put-" + os.path.basename(dst))
    if src_path is not None:
        with open(src_path, "rb") as fi, open(tmp, "wb") as fo:
            shutil.copyfileobj(fi, fo)
    else:
        with open(tmp, "wb") as fo:
            fo.write(data or b"")
    if preserve_mtime_of is not None:
        m = os.path.getmtime(preserve_mtime_of)
        os.utime(tmp, (m, m))
    os.replace(tmp, dst)


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
        completed-swap debris and dropped.  Stale stages are always
        safe to drop (their swap never started)."""
        healed: list[str] = []
        if not os.path.isdir(root):
            return healed
        for name in sorted(os.listdir(root)):
            if name.startswith(STAGE_PREFIX):
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
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
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(src, "rb") as fi, open(dst, "wb") as fo:
            shutil.copyfileobj(fi, fo)

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
        os.makedirs(dst, exist_ok=True)
        for fname in sorted(os.listdir(src)):
            if fname.startswith((".", "_")):
                continue
            self._put_copy(os.path.join(src, fname), os.path.join(dst, fname))
            os.remove(os.path.join(src, fname))

    def recover(self, root: str) -> list[str]:
        """Replay (marker present) or discard (no marker: the stage never
        reached commit-ready, so live was never touched) every
        interrupted stage under ``root``."""
        healed: list[str] = []
        if not os.path.isdir(root):
            return healed
        for name in sorted(os.listdir(root)):
            if not name.startswith(STAGE_PREFIX):
                continue
            staged = os.path.join(root, name)
            live = os.path.join(root, _demangle(name[len(STAGE_PREFIX):]))
            if os.path.exists(os.path.join(staged, self.MARKER)):
                self._replay(staged, live)
                healed.append(live)
            else:
                self._delete_tree(staged)
        return healed


COMMITTERS = {"rename": RenameCommitter, "put": PutCommitter}


def get_committer(protocol: str):
    try:
        return COMMITTERS[protocol]()
    except KeyError:
        raise ValueError(
            f"unknown commit protocol {protocol!r}; one of {sorted(COMMITTERS)}"
        ) from None
