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
