"""Pipeline metrics — parity with the reference's Prometheus counters.

Maps collector.rs metric families (src/infrastructure/metrics/
collector.rs:60-167) onto values computed from the batch DataFrames and
recorded in the lineage manifest:

- events_processed_total  → rows_in / rows_parsed / rows_routed
- errors_total / DLQ size → parse_failures (+ dlq_stats)
- files_tracked           → distinct doc count per namespace
- batch_size histogram    → per-partition row counts (partition_metrics)
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

    def conservation_ok(self) -> bool:
        """rows_in == rows_routed + parse_failures (FIXTURES.md §4)."""
        return self.rows_in == self.rows_routed + self.parse_failures
