"""Aggregate stage: per-sink stats — metrics promoted to data.

The reference only aggregates into Prometheus counters
(events_processed_total / batch_size histograms,
src/infrastructure/metrics/collector.rs:60-77); the north star promotes
them to first-class outputs whose values must match exactly.  A plain
``groupBy(sink_id)`` gets partial (map-side) aggregation from Spark for
free — at 100 TB the shuffle carries one row per (task, sink), not per
event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sink_stats(routed: DataFrame) -> DataFrame:
    """(sink_id, event_count, token_total, byte_total)."""
    return routed.groupBy("sink_id").agg(
        F.count("*").alias("event_count"),
        F.sum("n_tok").cast("bigint").alias("token_total"),
        F.sum("byte_len").cast("bigint").alias("byte_total"),
    )


def namespace_stats(routed: DataFrame) -> DataFrame:
    """files_tracked analogue (collector.rs:124-128): distinct docs per
    namespace + event count."""
    return routed.groupBy("namespace").agg(
        F.count("*").alias("event_count"),
        F.countDistinct("doc_id").alias("distinct_docs"),
    )


def partition_manifest_rows(routed: DataFrame) -> DataFrame:
    """Per-partition lineage metrics: rows/sinks seen by each task.

    Feeds the lineage manifest (per-partition rows routed + sink set) —
    the distributed analogue of the reference's AppState bookkeeping
    (src/domain/state.rs:18-23).
    """
    return (
        routed.groupBy(F.spark_partition_id().alias("partition_id"), "sink_id")
        .agg(
            F.count("*").alias("rows_routed"),
            F.sum("n_tok").alias("token_total"),
            F.sum("byte_len").alias("byte_total"),
        )
    )
