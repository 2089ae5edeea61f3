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


def read_dlq(spark: SparkSession, dlq_path: str) -> DataFrame:
    return spark.read.parquet(dlq_path)


def redrive_candidates(spark: SparkSession, dlq_path: str,
                       cfg: PipelineConfig) -> DataFrame:
    """Quarantined rows still eligible for retry (retry_count < cap),
    ≈ take_batch (dead_letter_queue.rs:110-180)."""
    df = read_dlq(spark, dlq_path)
    return df.filter(F.col("retry_count") < cfg.dlq_max_retry_count)


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
