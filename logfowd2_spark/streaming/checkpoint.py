"""Checkpoint / lineage manifest — the rebuild of AppState persistence.

The reference snapshots per-file offsets to JSON every 10 s with a
SHA-256 integrity checksum, writing ``.tmp`` → backup → atomic rename and
falling back to the backup on corruption (src/domain/state.rs:43-160,
259-285; src/watcher.rs:168-218).  Here the unit of progress is a
*micro-batch* (a set of input files / an input snapshot), and the commit
protocol is: write outputs → append manifest entry → atomic rename.
A batch present in the manifest is complete; a crashed batch left no
manifest entry and is re-run idempotently (overwrite by batch dir).
That upgrades the reference's at-least-once delivery (SURVEY.md §3.2)
to effectively-exactly-once at batch granularity.
"""

from __future__ import annotations

import contextlib as _contextlib
import fcntl as _fcntl
import hashlib
import json
import os
import shutil
from dataclasses import asdict, dataclass, field
from typing import Any

MANIFEST_VERSION = 1


@dataclass
class BatchRecord:
    batch_id: str
    input_files: list[str]
    rows_in: int
    rows_parsed: int
    parse_failures: int
    sink_counts: dict[str, int]
    partition_metrics: list[dict[str, Any]] = field(default_factory=list)
    # per-failure-reason counts (typed error taxonomy, ≈ errors_total)
    failure_counts: dict[str, int] = field(default_factory=dict)
    # dedup-store indexing completion record (None = not indexed yet;
    # run_pipeline replays indexing for committed batches missing it,
    # closing the crash window between batch commit and store append)
    dedup: dict[str, Any] | None = None


@dataclass
class Manifest:
    version: int = MANIFEST_VERSION
    batches: dict[str, BatchRecord] = field(default_factory=dict)
    checksum: str | None = None
    # explicit COMMIT order of the batch log.  dict insertion order is
    # not durable (the canonical form sorts for deterministic
    # checksums), and lexicographic id order diverges from commit order
    # as soon as id families mix (batch-* vs stream-* vs merge-*) or a
    # zero-padded counter rolls over — and every positional consumer
    # (read_routed_between, consumer-group followers) needs the TRUE
    # append order
    order: list[str] = field(default_factory=list)

    def committed(self, batch_id: str) -> bool:
        return batch_id in self.batches

    def record(self, rec: BatchRecord) -> None:
        """Append a commit to the log (idempotent per batch id)."""
        if rec.batch_id not in self.batches:
            self.order.append(rec.batch_id)
        self.batches[rec.batch_id] = rec

    def committed_ids(self) -> list[str]:
        """Batch ids in commit order (legacy manifests without an
        ``order`` list fall back to the old sorted-key order, which
        was commit order for single-family zero-padded ids)."""
        if self.order:
            known = [b for b in self.order if b in self.batches]
            seen = set(known)
            rest = sorted(b for b in self.batches if b not in seen)
            return known + rest
        return sorted(self.batches.keys())


def _record_dict(rec: BatchRecord) -> dict:
    d = asdict(rec)
    # back-compat: default-valued OPTIONAL fields are omitted from the
    # canonical form, so manifests written before a field existed still
    # checksum-verify after an upgrade (otherwise load_manifest would
    # silently discard all committed history and re-run every batch)
    if not d.get("failure_counts"):
        d.pop("failure_counts", None)
    if d.get("dedup") is None:
        d.pop("dedup", None)
    return d


def _canonical_json(man: Manifest) -> str:
    body = {
        "version": man.version,
        "batches": {k: _record_dict(v) for k, v in sorted(man.batches.items())},
    }
    # the commit-order list is part of the canonical form only when it
    # carries information (differs from sorted-key order) — manifests
    # written before it existed, and single-family zero-padded logs,
    # keep their original checksum and byte shape
    if man.order and list(man.order) != sorted(man.batches.keys()):
        body["order"] = list(man.order)
    # deterministically sorted, like the reference's checksum input
    # (state.rs:259-285)
    return json.dumps(body, sort_keys=True, separators=(",", ":"))


def _checksum(payload: str) -> str:
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


@_contextlib.contextmanager
def manifest_lock(path: str):
    """Advisory exclusive lock serializing load→record→save cycles on a
    checkpoint manifest across PROCESSES on the same host: merge_into's
    insert-batch registration, recover_compactions' backfill, and the
    streaming trigger's per-batch registration all read-modify-write
    ``manifest.json``, and two unsynchronized cycles interleaving would
    erase each other's just-committed BatchRecord (lost update) — rows
    permanently invisible to every log-axis consumer.  flock on a
    sibling ``.lock`` file (never the manifest itself: save_manifest
    replaces it, which would drop the lock identity).  POSIX-local by
    design, like the rename commit protocol; the single-writer batch
    driver holds its manifest in memory across batches and is
    documented as the sole *ingest* writer."""
    lock_path = path + ".lock"
    os.makedirs(os.path.dirname(lock_path) or ".", exist_ok=True)
    fh = open(lock_path, "a")
    try:
        _fcntl.flock(fh.fileno(), _fcntl.LOCK_EX)
        yield
    finally:
        _fcntl.flock(fh.fileno(), _fcntl.LOCK_UN)
        fh.close()


def save_manifest(man: Manifest, path: str) -> None:
    """Atomic save with backup, ≈ save_to_file_atomic (state.rs:119-160)."""
    payload = _canonical_json(man)
    doc = {"data": json.loads(payload), "checksum": _checksum(payload)}
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
        fh.flush()
        os.fsync(fh.fileno())
    if os.path.exists(path):
        shutil.copy2(path, path + ".backup")
    os.replace(tmp, path)


def _load_one(path: str) -> Manifest | None:
    try:
        with open(path) as fh:
            doc = json.load(fh)
        data = doc["data"]
        man = Manifest(
            version=data["version"],
            batches={
                k: BatchRecord(**v) for k, v in data["batches"].items()
            },
            order=list(data.get("order") or []),
        )
        if _checksum(_canonical_json(man)) != doc.get("checksum"):
            return None  # corrupt — like state.rs checksum mismatch
        if not man.order:
            man.order = sorted(man.batches.keys())  # legacy manifests
        return man
    except (OSError, KeyError, ValueError, TypeError):
        return None


def load_manifest(path: str) -> Manifest:
    """Load with backup fallback, ≈ load_from_file (state.rs:43-113)."""
    man = _load_one(path)
    if man is None:
        man = _load_one(path + ".backup")
    return man if man is not None else Manifest()
