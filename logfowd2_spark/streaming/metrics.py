"""Pipeline metrics — parity with the reference's Prometheus counters.

Maps collector.rs metric families (src/infrastructure/metrics/
collector.rs:60-167) onto values computed from the batch DataFrames and
recorded in the lineage manifest:

- events_processed_total  → rows_in / rows_parsed / rows_routed
- errors_total / DLQ size → parse_failures (+ dlq_stats)
- files_tracked           → distinct doc count per namespace
- batch_size histogram    → per-partition row counts (partition_metrics)
                            + per-sink distribution (pipe_batch_size_hist)
- NetworkStats EMA (A6)   → RuntimeGauges: batch wall-clock EMA with the
                            reference's exact smoothing (0.9·old+0.1·new,
                            pool.rs:63-82) and the derived adaptive
                            timeout (pool.rs:94-121); the referent is the
                            batch job, Spark's analogue of the bulk call
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class BatchMetrics:
    rows_in: int = 0
    rows_parsed: int = 0
    parse_failures: int = 0
    rows_routed: int = 0
    sink_counts: dict[str, int] = field(default_factory=dict)
    partition_metrics: list[dict] = field(default_factory=list)
    failure_counts: dict[str, int] = field(default_factory=dict)
    wall_ms: float = 0.0

    def conservation_ok(self) -> bool:
        """rows_in == rows_routed + parse_failures (FIXTURES.md §4)."""
        return self.rows_in == self.rows_routed + self.parse_failures


@dataclass
class RuntimeGauges:
    """A6 parity: the reference's NetworkStats keeps an EMA of request
    latency (alpha=0.1: ``0.9*old + 0.1*new``, pool.rs:63-82) plus a
    consecutive-failure count, and derives an adaptive timeout from them
    (base 30 s ×1/×1.5/×2 by failure streak, capped at 120 s,
    pool.rs:94-121).  The Spark referent for a 'request' is the batch
    job; the gauges ride the driver loop — zero extra Spark work."""

    ema_batch_ms: float = 0.0
    consecutive_failures: int = 0
    batches_seen: int = 0

    BASE_TIMEOUT_MS: float = 30_000.0
    MAX_TIMEOUT_MS: float = 120_000.0

    def observe(self, wall_ms: float, failed: bool = False) -> None:
        if wall_ms > 0:
            # a failed batch with no meaningful wall (it threw) bumps the
            # streak only — the reference likewise has no latency sample
            # for a timed-out request
            if self.batches_seen == 0:
                self.ema_batch_ms = wall_ms  # seed, like the reference's first sample
            else:
                self.ema_batch_ms = 0.9 * self.ema_batch_ms + 0.1 * wall_ms
            self.batches_seen += 1
        self.consecutive_failures = self.consecutive_failures + 1 if failed else 0

    def adaptive_timeout_ms(self) -> float:
        """pool.rs:94-121: scale the base timeout by failure streak and
        observed latency, capped."""
        mult = 1.0 if self.consecutive_failures == 0 else (
            1.5 if self.consecutive_failures <= 2 else 2.0
        )
        # never time out below 3x the observed EMA (slow-but-healthy sink)
        t = max(self.BASE_TIMEOUT_MS * mult, 3.0 * self.ema_batch_ms)
        return min(t, self.MAX_TIMEOUT_MS)


# --- Prometheus text exposition (reference metrics/server.rs:185) ----------

#: reference histogram buckets (collector.rs:72-84)
BATCH_SIZE_BUCKETS = [1.0, 5.0, 10.0, 50.0, 100.0, 500.0, 1000.0, 5000.0]
DURATION_BUCKETS = [0.001, 0.005, 0.01, 0.05, 0.1, 0.5, 1.0, 5.0, 10.0]

#: failure classes → the reference's error_type label values
#: (collector.rs:115: file_read|network|parse|timeout; our schema-class
#: reasons are parse failures, the transient sink class is network)
_ERROR_TYPE = {"schema": "parse", "transient": "network"}


def _histogram(lines: list[str], name: str, labels: str,
               values: list[float], buckets: list[float]) -> None:
    """Cumulative-bucket text exposition for one labeled histogram."""
    n = 0
    for le in buckets:
        n = sum(1 for v in values if v <= le)
        lines.append(f'{name}_bucket{{{labels},le="{le}"}} {n}')
    lines.append(f'{name}_bucket{{{labels},le="+Inf"}} {len(values)}')
    lines.append(f'{name}_sum{{{labels}}} {sum(values)}')
    lines.append(f'{name}_count{{{labels}}} {len(values)}')


def prometheus_exposition(batches: list[BatchMetrics],
                          gauges: "RuntimeGauges | None" = None,
                          dlq_size: int | None = None) -> str:
    """The run's metrics in Prometheus text format, using the
    reference's metric FAMILIES verbatim (collector.rs:60-167, served at
    metrics/server.rs:185).  The component label is ``sender`` — the
    Spark batch job is the analogue of the reference's send path.
    Families whose referent doesn't exist under Spark's execution model
    (workers_active, backpressure_active, circuit_breaker_state,
    notify_*) are intentionally absent — SURVEY.md §2.7 declares that
    machinery replaced by the scheduler/AQE.  Two engine-specific gauges
    (suffixed _ms) expose the A6 runtime gauges the reference keeps
    internal to NetworkStats."""
    from logfowd2_spark.operators.parse import FAILURE_CLASSES  # noqa: PLC0415

    lines: list[str] = []

    def fam(name: str, typ: str, help_: str) -> None:
        lines.append(f"# HELP {name} {help_}")
        lines.append(f"# TYPE {name} {typ}")

    routed = sum(m.rows_routed for m in batches)
    failed = sum(m.parse_failures for m in batches)
    fam("logfowd_events_processed_total", "counter",
        "Total number of log events processed")
    lines.append('logfowd_events_processed_total'
                 f'{{component="sender",status="success"}} {routed}')
    lines.append('logfowd_events_processed_total'
                 f'{{component="sender",status="error"}} {failed}')

    fam("logfowd_errors_total", "counter", "Total number of errors")
    by_type: dict[str, int] = {}
    for m in batches:
        for reason, n in m.failure_counts.items():
            etype = _ERROR_TYPE.get(
                FAILURE_CLASSES.get(reason, "transient"), "parse")
            by_type[etype] = by_type.get(etype, 0) + n
    for etype in sorted(by_type):
        lines.append('logfowd_errors_total'
                     f'{{component="sender",error_type="{etype}"}} '
                     f'{by_type[etype]}')

    fam("logfowd_dead_letter_queue_size", "gauge",
        "Current size of the dead letter queue")
    # a GAUGE must report the queue's CURRENT contents (post-trim,
    # post-redrive), not the cumulative quarantined count — the caller
    # passes the persisted-row count; cumulative failures stay on the
    # errors_total counter above
    lines.append(f'logfowd_dead_letter_queue_size{{queue_type="events"}} '
                 f'{failed if dlq_size is None else dlq_size}')

    total_wall_s = sum(m.wall_ms for m in batches) / 1000.0
    fam("logfowd_events_per_second", "gauge",
        "Current events processing rate per second")
    rate = routed / total_wall_s if total_wall_s > 0 else 0.0
    lines.append(f'logfowd_events_per_second{{component="sender"}} '
                 f'{round(rate, 1)}')

    fam("logfowd_batch_size", "histogram", "Distribution of batch sizes")
    sizes = [float(p["rows_routed"]) for m in batches
             for p in m.partition_metrics]
    _histogram(lines, "logfowd_batch_size", 'component="sender"',
               sizes, BATCH_SIZE_BUCKETS)

    fam("logfowd_processing_duration_seconds", "histogram",
        "Time spent processing events")
    # a carry record (continuous streaming folds evicted batches'
    # COUNTERS into one accumulator) is not a batch sample — it feeds
    # the counters and the rate denominator, never the histograms
    walls = [m.wall_ms / 1000.0 for m in batches
             if m.wall_ms > 0 and not getattr(m, "is_carry", False)]
    _histogram(lines, "logfowd_processing_duration_seconds",
               'component="sender",operation="send_batch"',
               walls, DURATION_BUCKETS)

    if gauges is not None:
        fam("logfowd_network_ema_ms", "gauge",
            "EMA of batch wall time (NetworkStats, pool.rs:63-82)")
        lines.append(f"logfowd_network_ema_ms "
                     f"{round(gauges.ema_batch_ms, 1)}")
        fam("logfowd_adaptive_timeout_ms", "gauge",
            "Adaptive batch timeout (pool.rs:94-121)")
        lines.append(f"logfowd_adaptive_timeout_ms "
                     f"{round(gauges.adaptive_timeout_ms(), 1)}")
    return "\n".join(lines) + "\n"


def emit_metrics(output_path: str, batches: list[BatchMetrics],
                 gauges: "RuntimeGauges | None" = None,
                 commit_protocol: str = "rename") -> str:
    """Publish the exposition atomically at ``<output>/metrics/
    metrics.prom`` — the file-sink analogue of the reference's scrape
    endpoint (a node exporter's textfile collector consumes exactly
    this layout).  Returns the path."""
    import os  # noqa: PLC0415

    from logfowd2_spark.streaming.commit import get_committer  # noqa: PLC0415

    from logfowd2_spark.ioutil import tree_num_rows  # noqa: PLC0415

    # the queue gauge reads the quarantine's ACTUAL persisted rows
    # (parquet footers, driver-side, no Spark job) — trims and redrives
    # are reflected, unlike the cumulative parse_failures counter
    dlq_size = tree_num_rows(os.path.join(output_path, "parse_failures"))
    path = os.path.join(output_path, "metrics", "metrics.prom")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    get_committer(commit_protocol).put_file(
        path, prometheus_exposition(batches, gauges, dlq_size).encode()
    )
    return path
