"""Dead-letter quarantine — the reference's DLQ as a first-class table.

The reference keeps failed events in a bounded deque flushed to JSON and
retries them on a backoff schedule, dropping after max_retry_count=5
(src/infrastructure/elasticsearch/dead_letter_queue.rs:31-40,69-217;
retry loop at pool.rs:358-470).  Here failed-parse rows land in a
``parse_failures`` parquet table (append, partitioned by batch) and a
re-drive pass re-parses quarantined raw lines on the next run,
incrementing ``retry_count`` and dropping rows past the cap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logfowd2_spark.config import PipelineConfig

DLQ_COLUMNS = ["doc_id", "source", "raw_line", "failure_reason", "retry_count"]


def write_dlq(dlq: DataFrame, dlq_path: str, batch_id: str) -> None:
    (
        dlq.withColumn("batch_id", F.lit(batch_id))
        .write.mode("append")
        .partitionBy("batch_id")
        .parquet(dlq_path)
    )


DLQ_DDL = (
    "doc_id string, source string, raw_line string, "
    "failure_reason string, retry_count int"
)


def read_dlq(spark: SparkSession, dlq_path: str) -> DataFrame:
    """DLQ projection over parse_failures.  Files may carry the full
    routed schema (quarantine rows come off the unified fan-out write)
    or the narrow redrive schema — mergeSchema + select normalizes."""
    import glob

    if not glob.glob(os.path.join(dlq_path, "**", "*.parquet"), recursive=True):
        return spark.createDataFrame([], DLQ_DDL)
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(dlq_path)
        .select(*DLQ_COLUMNS)
    )


def redrive_candidates(spark: SparkSession, dlq_path: str,
                       cfg: PipelineConfig) -> DataFrame:
    """Quarantined rows still eligible for retry (retry_count < cap),
    ≈ take_batch (dead_letter_queue.rs:110-180)."""
    df = read_dlq(spark, dlq_path)
    return df.filter(F.col("retry_count") < cfg.dlq_max_retry_count)


def redrive_pass(spark: SparkSession, cfg: PipelineConfig,
                 pods: DataFrame, generation: int) -> dict:
    """One DLQ redrive generation ≈ the reference's retry task
    (pool.rs:358-470 + take_batch/return_failed, dead_letter_queue.rs:
    110-180): re-parse every still-eligible quarantined line; recovered
    rows flow through enrich+route into a ``redrive-N`` batch dir,
    still-failing rows are re-quarantined with retry_count+1, rows past
    ``dlq_max_retry_count`` are dropped (permanently failed).  The
    consumed generation dirs are replaced by the new one (take-off-queue
    semantics).
    """
    import shutil

    from pyspark.sql import functions as F  # noqa: PLC0415

    from logfowd2_spark.operators.enrich import enrich_stage
    from logfowd2_spark.operators.parse import parse_lines, split_parsed
    from logfowd2_spark.operators.route import route_stage, write_routed

    dlq_path = os.path.join(cfg.output_path, "parse_failures")
    old_dirs = [
        os.path.join(dlq_path, d)
        for d in sorted(os.listdir(dlq_path))
        if d.startswith("batch_id=")
    ]
    df = read_dlq(spark, dlq_path)
    eligible = df.filter(F.col("retry_count") < cfg.dlq_max_retry_count)
    dropped = df.filter(F.col("retry_count") >= cfg.dlq_max_retry_count)

    reparsed = parse_lines(
        eligible.select("doc_id", "source", F.col("raw_line").alias("line"),
                        "retry_count"),
        cfg,
    )
    good, still_bad = split_parsed(reparsed)
    # split_parsed resets retry_count to 0; restore the incremented count
    still_bad = still_bad.drop("retry_count").join(
        eligible.select("doc_id", F.col("retry_count").alias("_rc")), "doc_id"
    ).withColumn("retry_count", F.col("_rc") + 1).drop("_rc")

    tag = f"redrive-{generation:05d}"
    n_recovered = 0
    if good.limit(1).count():
        from logfowd2_spark.codec import encode_line_sql  # noqa: PLC0415

        good = good.withColumn("tokens", encode_line_sql(F.col("line")))
        good = good.withColumn("n_tok", F.size("tokens")).drop("retry_count")
        # same output shape as regular batches (line/body not persisted)
        recovered = route_stage(enrich_stage(good, pods), cfg).drop("line", "body")
        out_dir = os.path.join(cfg.output_path, "routed", f"batch_id={tag}")
        write_routed(recovered.hint("rebalance", "sink_id"), out_dir, "overwrite")
        n_recovered = spark.read.parquet(out_dir).count()

    requeued_rows = still_bad.select(*DLQ_COLUMNS).collect()
    # permanently-failed rows are RETAINED (marked by retry_count ≥ cap),
    # matching the reference's permanently_failed accounting
    # (dead_letter_queue.rs:48-55) — only recovered rows leave the queue
    dropped_rows = dropped.select(*DLQ_COLUMNS).collect()
    for d in old_dirs:
        shutil.rmtree(d, ignore_errors=True)
    new_rows = requeued_rows + dropped_rows
    if new_rows:
        spark.createDataFrame(new_rows, DLQ_DDL).withColumn(
            "batch_id", F.lit(tag)
        ).write.mode("append").partitionBy("batch_id").parquet(dlq_path)
    return {
        "recovered": n_recovered,
        "requeued": len(requeued_rows),
        "permanently_failed": len(dropped_rows),
    }


def dlq_stats(spark: SparkSession, dlq_path: str,
              cfg: PipelineConfig) -> DataFrame:
    """DLQ observability ≈ DeadLetterStats (dead_letter_queue.rs:48-55)."""
    df = read_dlq(spark, dlq_path)
    return df.agg(
        F.count("*").alias("total_failed"),
        F.sum(
            (F.col("retry_count") < cfg.dlq_max_retry_count).cast("int")
        ).alias("in_queue"),
        F.sum(
            (F.col("retry_count") >= cfg.dlq_max_retry_count).cast("int")
        ).alias("permanently_failed"),
    )
