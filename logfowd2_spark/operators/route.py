"""Route stage: (source, level) → sink_id fan-out.

Generalizes the reference's daily-index routing
(``{index_name}-{YYYY.MM.dd}`` at src/infrastructure/elasticsearch/
pool.rs:856-865): the sink key is (source, level) with "*" wildcards and
first-match-wins precedence, plus the original date component surviving
as a partition column on every sink table.

The routing map is configuration (a handful of rows), so it is folded
into a literal ``CASE WHEN`` chain at plan time: zero joins, zero
shuffles, pure whole-stage codegen.  The fan-out write repartitions by
``(sink_id, salt)`` — the salt bounds the damage of a hot sink/namespace
(ns-hot owns ~40% of rows by construction) so no single task owns an
entire hot sink's output (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logfowd2_spark.config import PipelineConfig


def route_expr(routes: list[tuple[str, str, str]], source: Column,
               level: Column, default_sink: str = "logs-default") -> Column:
    """Build the first-match-wins CASE chain from the routing map."""
    expr: Column | None = None
    for src, lvl, sink in routes:
        cond = F.lit(True)
        if src != "*":
            cond = cond & (source == src)
        if lvl != "*":
            cond = cond & (level == lvl)
        expr = F.when(cond, F.lit(sink)) if expr is None else expr.when(cond, F.lit(sink))
    assert expr is not None
    return expr.otherwise(F.lit(default_sink))


def route_stage(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Adds ``sink_id`` and the daily partition column ``log_date``."""
    return df.withColumn(
        "sink_id", route_expr(cfg.routes, F.col("source"), F.col("level"), cfg.default_sink)
    ).withColumn("log_date", F.to_date("ts"))


def repartition_for_write(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """AQE-rebalanced partitioning for the fan-out write.

    ``REBALANCE(sink_id)`` clusters rows by sink but lets AQE split hot
    sinks across tasks (runtime salting) and coalesce cold sinks to the
    advisory partition size — so output files land near the target size
    at ANY scale, instead of cores×sinks tiny files at small scale and
    one giant task per hot sink at 100 TB.  ``salted_repartition`` below
    is the static fallback when AQE is off.
    """
    return df.hint("rebalance", "sink_id")


def salted_repartition(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Static salting: ``hash(doc_id) % salt_buckets`` splits each sink
    into ``write_salt_buckets`` groups (the explicit-salt variant of
    skew handling; superseded by the AQE rebalance hint above)."""
    return df.repartition(
        cfg.shuffle_partitions,
        F.col("sink_id"),
        F.pmod(F.xxhash64("doc_id"), F.lit(cfg.write_salt_buckets)),
    )


def write_routed(df: DataFrame, out_path: str, mode: str = "append",
                 max_records_per_file: int = 0) -> None:
    """Fan-out write: one directory partition per (sink_id, log_date).

    Partitioned parquet stands in for per-sink Iceberg tables (plan B per
    SURVEY.md §7 risk d); the layout — `.../sink_id=X/log_date=D/` — is
    the analogue of the reference's per-day ES indices.
    ``max_records_per_file`` (cfg.bulk_size) is the rebuild of the
    reference's bulk batch bound (B1, sender.rs:58-67): it caps rows per
    output file the way bulk_size capped events per ES _bulk call.
    """
    w = df.write.mode(mode).partitionBy("sink_id", "log_date")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(out_path)
