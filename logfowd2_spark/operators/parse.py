"""Parse stage: tokens → line → structured fields (vectorized end-to-end).

The only Python in this stage is the Arrow codec UDF (token→utf8 decode);
sanitization, truncation, and the grok regex all stay JVM-side inside
whole-stage codegen.  This is the columnar rebuild of the reference's
read-loop kernels: line read (src/domain/file.rs:160-230), truncation
(file.rs:553-634), sanitization (file.rs:660-721), and metadata regex
(src/watcher.rs:31,595-638), extended per the north star with
timestamp/level extraction from the line body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logfowd2_spark.codec import decode_tokens
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.functions.kernels import (
    grok_line,
    sanitize_content,
    truncate_line,
)

#: columns produced by the parse stage beyond the input ones
PARSED_COLUMNS = [
    "line", "byte_len", "ts", "level", "namespace", "pod_name",
    "pod_id", "container_name", "body", "parse_ok", "failure_reason",
]

TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ssXXX"


def parse_stage(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Decode + sanitize + truncate + grok.  Adds PARSED_COLUMNS.

    Rows that fail the grok get ``parse_ok = false`` and a
    ``failure_reason`` (the DLQ split happens downstream, mirroring the
    reference's per-batch DLQ capture at pool.rs:786-791).
    """
    line = decode_tokens(F.col("tokens"))
    df = df.withColumn("line", line)
    df = df.withColumn("line", sanitize_content(F.col("line")))
    df = df.withColumn(
        "line",
        truncate_line(F.col("line"), cfg.max_line_size, cfg.truncation_suffix),
    )
    df = df.withColumn("byte_len", F.octet_length("line"))

    groks = grok_line(F.col("line"))
    df = df.withColumns(
        {
            "ts_raw": groks["ts_raw"],
            "level": groks["level"],
            "namespace": groks["namespace"],
            "pod_name": groks["pod_name"],
            "pod_id": groks["pod_id"],
            "container_name": groks["container_name"],
            "body": groks["body"],
        }
    )
    df = df.withColumn("ts", F.try_to_timestamp(F.col("ts_raw"), F.lit(TS_FORMAT)))
    df = df.withColumn(
        "parse_ok",
        (F.col("level") != "") & F.col("ts").isNotNull(),
    )
    df = df.withColumn(
        "failure_reason",
        F.when(F.col("parse_ok"), F.lit(None).cast("string"))
        .when(F.col("level") == "", F.lit("grok_no_match"))
        .otherwise(F.lit("bad_timestamp")),
    )
    return df.drop("ts_raw")


def split_parsed(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good rows, DLQ rows).  DLQ shape ≈ DeadLetter
    (reference dead_letter_queue.rs:14-20): original payload + reason.
    """
    good = df.filter(F.col("parse_ok")).drop("parse_ok", "failure_reason")
    dlq = df.filter(~F.col("parse_ok")).select(
        "doc_id",
        "source",
        F.col("line").alias("raw_line"),
        "failure_reason",
        F.lit(0).alias("retry_count"),
    )
    return good, dlq
