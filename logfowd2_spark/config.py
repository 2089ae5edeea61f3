"""Pipeline configuration — the rebuild of the reference's config surface.

Mirrors the *spirit* of ``Settings`` (reference src/config/settings.rs:6-53,
defaults at /root/reference/config.json): input location, batch sizing,
line-size limits, sink routing, and the same hard-fail validation style
(settings.rs:131-260).  Knobs that configured the reference's hand-rolled
channel/backpressure machinery (settings.rs channels.*) have no Spark
analogue and are intentionally absent — partition sizing and AQE replace
them (SURVEY.md §2.7, §4.1).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


DEFAULT_LEVELS = ["DEBUG", "INFO", "WARN", "ERROR", "FATAL"]

# Generalization of the reference's daily ES index routing
# (pool.rs:856-865): route key is (source, level); "*" is a wildcard;
# first match wins, deterministic order.
DEFAULT_ROUTES: list[tuple[str, str, str]] = [
    ("app", "ERROR", "logs-app-error"),
    ("app", "FATAL", "logs-app-error"),
    ("app", "*", "logs-app"),
    ("ingress", "*", "logs-ingress"),
    ("sidecar", "ERROR", "logs-sidecar-error"),
    ("sidecar", "*", "logs-sidecar"),
    ("batch", "*", "logs-batch"),
    ("system", "FATAL", "logs-system-fatal"),
    ("*", "*", "logs-default"),
]


@dataclass
class PipelineConfig:
    """All pipeline knobs, validated like the reference validates Settings."""

    # --- input / output locations (≈ log_path / es.* of the reference)
    input_path: str = ""
    output_path: str = ""
    checkpoint_path: str = ""

    # --- reference-parity knobs
    # max_line_size: lines longer than this are truncated with a marker
    # suffix (reference src/watcher.rs:86 default 1 MiB; src/domain/
    # file.rs:553-634).
    max_line_size: int = 1_048_576
    truncation_suffix: str = "... [TRUNCATED]"
    # read_existing_on_startup ≈ start from snapshot 0 vs current
    # watermark (reference src/domain/file.rs:233-248).
    read_existing_on_startup: bool = True
    # bulk_size ≈ rows per written file / micro-batch sizing hint
    # (reference config.json:34 default 300; we scale it up because a
    # Spark task amortizes far more than an HTTP bulk call did).
    bulk_size: int = 100_000
    # index_name ≈ sink table prefix (reference es.index_name).
    index_name: str = "logs"

    # --- routing
    routes: list[tuple[str, str, str]] = field(
        default_factory=lambda: list(DEFAULT_ROUTES)
    )
    default_sink: str = "logs-default"

    # --- scale knobs (no reference analogue: Spark-specific)
    # salt buckets used when repartitioning by sink_id before the fan-out
    # write; bounds the damage of a hot sink (SURVEY.md §4.3).
    write_salt_buckets: int = 16
    shuffle_partitions: int = 32

    # --- DLQ (reference dead_letter_queue.rs:31-40)
    dlq_max_retry_count: int = 5
    # quarantine capacity, drop-oldest on overflow (reference
    # dead_letter_queue.rs:84-94: max_queue_size=10_000 + pop_front)
    dlq_max_size: int = 10_000

    # --- codec path.  "arrow" decodes tokens via the mapInArrow buffer
    # kernel — true multi-byte UTF-8 with the reference's full byte-level
    # sanitize (incl. lossy U+FFFD) fused into the decode; fastest WITH
    # dedicated executor cores (the arrays cross the Arrow boundary once
    # and die there), but its JVM+Python pipelining uses up to ~2 host
    # cores per task slot, so it degrades ~2x faster than the jvm codec
    # when local[N] ≈ host cores (BENCH/NOTES.md).  "jvm" is the pure
    # whole-stage-codegen chr() mapping: ASCII-exact, zero Python
    # workers, all compute inside task-slot accounting.  "auto" (the
    # default) resolves per run via ``resolve_codec``: arrow only when
    # the host has the ~2-cores-per-slot headroom arrow needs, else jvm
    # — so the default path wins on both dedicated-core clusters and
    # oversubscribed hosts.
    codec: str = "auto"

    # --- sink fault injection (reference transient-error taxonomy,
    # pool.rs:165-313: timeout/429/5xx are retryable; error.rs:28-62).
    # When set, rows routed to ``sink_fault_sink`` are REJECTED with
    # reason 'sink_unavailable' (class transient) while the delivery
    # attempt number (0 for the initial batch, retry_count+1 on a
    # redrive) is < ``sink_fault_until_retry`` — a deterministic
    # stand-in for a sink that recovers after N attempts, driving the
    # DLQ retry loop end-to-end.  None disables injection (the
    # production default).
    sink_fault_sink: str | None = None
    sink_fault_until_retry: int = 1

    # --- incremental dedup store (streaming/dedup_store.py).  When
    # enabled, every committed batch appends its MinHash signatures +
    # LSH band index to <output>/dedup/ and emits dup_pairs for
    # incoming-vs-corpus hits — continuous dedup against all history
    # with no corpus re-hash (the production flow of the LSH family the
    # catalog proves with lsh_incremental_dups).
    dedup_store_enabled: bool = False
    # minimum MinHash-estimated Jaccard for a flagged pair (estimator
    # std-dev at k=128 is <= 0.088)
    dedup_est_threshold: float = 0.5

    # --- manifest membership metadata (streaming/commit.py).  Columns
    # listed here get per-file MEMBERSHIP entries in every commit's
    # _FILES.json on top of the always-on min/max bounds: the exact
    # distinct-value set when tiny, else a small (<= 4 KiB) bloom
    # filter.  Point lookups on these columns (pod_name == X) then
    # prune from the manifests alone down to the files that may hold
    # the key — min/max cannot do that for a scattered high-cardinality
    # key, and in a log table such keys have strong temporal locality.
    # Cost: one columnar read-back of these columns per committed file
    # (commit-time, pages still hot).  () disables the tier.
    stats_detail_cols: tuple = ("pod_name", "namespace")

    # --- sort-order compaction (streaming/maintenance.py).  When
    # non-empty, compaction rewrites range-partition + sort each output
    # partition on (sink_id, log_date, *these columns) instead of the
    # default hash rebalance — Iceberg's sort-order rewrite: each
    # rewritten file then covers a NARROW slice of the cluster columns'
    # domain, so the manifest min/max bounds (and membership sets)
    # recorded at the flip prune point lookups to ~one file per
    # partition instead of every file.  Ingest keeps arrival order (the
    # extra shuffle doesn't belong on the hot path); clustering is the
    # compactor's job, exactly as in Iceberg/Delta.  () = keep the
    # rebalance layout.
    compact_cluster_cols: tuple = ()

    # --- how the cluster columns order the rewrite: "sort" =
    # lexicographic (best when lookups lead with the first column, or
    # the columns are hierarchically correlated); "zorder" =
    # bit-interleaved Z-values (Iceberg/Delta Z-ORDER): each file covers
    # a narrow HYPERCUBE of the columns' joint domain instead of a
    # narrow slice of the first one, so manifest bounds/membership prune
    # point lookups on ANY clustered column, not just the leading one.
    # Z-values are derived from the values themselves (scaled against
    # domains read from the source manifests' commit-time bounds — no
    # extra pass over the data), never from ranks: no per-column global
    # sorts.  Ignored with < 2 cluster columns (plain sort is optimal).
    compact_cluster_mode: str = "sort"

    # --- snapshot-retention window for compaction swaps (seconds).
    # 0 = vacuum the superseded generation at the flip (single-writer
    # local default, keeps exactly one generation on disk); > 0 = the
    # old generation is RETAINED as a ``retired`` manifest entry and
    # reaped by the ``vacuum_expired`` maintenance pass only once this
    # window passes — Iceberg snapshot expiry on the plain layout, so a
    # reader that resolved the pre-swap manifest survives both the flip
    # AND the vacuum for at least this long (streaming/commit.py).
    vacuum_retention_s: float = 0.0

    # --- automatic table service: after a driver run commits its
    # batches, consolidate once the count of not-yet-consolidated batch
    # dirs reaches this threshold (maintenance.compact_table).  0 =
    # manual only (--compact-table).  At 10^5 committed micro-batches
    # the per-scan cost is 10^5 dir listings + manifest reads — a real
    # deployment compacts on a policy, not by hand.  Batch-driver only:
    # inside a streaming trigger the rewrite would stall the cadence
    # (run it from a parallel maintenance invocation instead — every
    # commit is protected by the OCC layer).
    auto_compact_min_batches: int = 0

    # --- commit protocol for in-place table mutations (quarantine move,
    # compaction swap, DLQ trim): "rename" = POSIX/HDFS metadata renames
    # (atomic rename assumed); "put" = object-store-safe replayable
    # staging (put/delete/list only, no renames).  See streaming/commit.py.
    commit_protocol: str = "rename"

    def validate(self) -> "PipelineConfig":
        """Hard-fail validation, same style as settings.rs:131-260."""
        if self.max_line_size < 4:
            # one UTF-8 codepoint must fit (the byte-exact truncation cut
            # probes up to 4 trailing bytes; reference default is 1 MiB)
            raise ValueError("max_line_size must be >= 4")
        if self.bulk_size <= 0:
            # reference settings.rs:194-196
            raise ValueError("bulk_size must be > 0")
        if self.write_salt_buckets <= 0:
            raise ValueError("write_salt_buckets must be > 0")
        # ES index-name rules (reference settings.rs:169-192): non-empty,
        # no leading -_+, no uppercase, no whitespace.
        name = self.index_name
        if not name:
            raise ValueError("index_name must not be empty")
        if name[0] in "-_+":
            raise ValueError("index_name must not start with '-', '_' or '+'")
        if name != name.lower() or any(c.isspace() for c in name):
            raise ValueError("index_name must be lowercase with no whitespace")
        if not self.routes:
            raise ValueError("routes must not be empty")
        if self.codec not in ("auto", "jvm", "arrow"):
            raise ValueError("codec must be 'auto', 'jvm' or 'arrow'")
        if self.commit_protocol not in ("rename", "put"):
            raise ValueError("commit_protocol must be 'rename' or 'put'")
        if self.dlq_max_size <= 0:
            raise ValueError("dlq_max_size must be > 0")
        if self.vacuum_retention_s < 0:
            raise ValueError("vacuum_retention_s must be >= 0")
        if self.auto_compact_min_batches < 0:
            raise ValueError("auto_compact_min_batches must be >= 0")
        if not all(isinstance(c, str) and c for c in self.stats_detail_cols):
            raise ValueError("stats_detail_cols must be non-empty "
                             "column names")
        if not all(isinstance(c, str) and c
                   for c in self.compact_cluster_cols):
            raise ValueError("compact_cluster_cols must be non-empty "
                             "column names")
        if self.compact_cluster_mode not in ("sort", "zorder"):
            raise ValueError("compact_cluster_mode must be 'sort' or "
                             "'zorder'")
        if not 0.0 < self.dedup_est_threshold <= 1.0:
            raise ValueError("dedup_est_threshold must be in (0, 1]")
        if self.sink_fault_sink is not None and self.sink_fault_until_retry < 1:
            raise ValueError("sink_fault_until_retry must be >= 1 when "
                             "sink_fault_sink is set")
        for src, lvl, sink in self.routes:
            if not sink:
                raise ValueError(f"route ({src},{lvl}) has empty sink")
        return self

    @classmethod
    def load(cls, path: str | None = None) -> "PipelineConfig":
        """Load from JSON; env override ``CFG_PATH`` like settings.rs:116."""
        path = path or os.environ.get("CFG_PATH")
        if path is None:
            return cls().validate()
        with open(path) as fh:
            raw = json.load(fh)
        routes = [tuple(r) for r in raw.pop("routes", DEFAULT_ROUTES)]
        return cls(routes=routes, **raw).validate()


def resolve_codec(codec: str, parallelism: int) -> str:
    """Resolve codec='auto' against measured host headroom.

    The arrow path pipelines a JVM task thread with a Python worker per
    task slot — roughly 2 host cores per slot of concurrent demand that
    local[N] task accounting doesn't see (BENCH/NOTES.md; the round-3
    driver bench had arrow 3.2x slower than jvm at local[32] on a
    32-core host, yet 30% faster at 16 slots on an idle 32-core host).
    Pick arrow only when the host's spare cores cover that demand:
    ``cpu_count - loadavg_1m >= 2 * parallelism``.  On a real cluster,
    executors get dedicated cores and ``parallelism`` is the
    per-executor core count, so the same rule selects arrow there.
    Explicit 'jvm'/'arrow' pass through untouched.
    """
    if codec != "auto":
        return codec
    try:
        host = os.cpu_count() or 0
        load = os.getloadavg()[0]
    except OSError:
        return "jvm"
    return "arrow" if host - load >= 2 * parallelism else "jvm"
