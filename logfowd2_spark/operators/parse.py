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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logfowd2_spark.codec import decode_tokens_sql, with_decoded_line
from logfowd2_spark.config import PipelineConfig, resolve_codec
from logfowd2_spark.functions.kernels import (
    K8S_PATH_RE,
    sanitize_content,
    strip_line_endings,
    truncate_line,
)

#: columns produced by the parse stage beyond the input ones
PARSED_COLUMNS = [
    "line", "byte_len", "ts", "level", "namespace", "pod_name",
    "pod_id", "container_name", "body", "parse_ok", "failure_reason",
]

#: Failure taxonomy ≈ the reference's typed error enum (src/error.rs:28-62,
#: classified at pool.rs:165-313: timeout/429/5xx are retryable, 4xx is
#: permanent).  Parse failures are all data-shaped ('schema' — a retry
#: cannot fix the bytes, the redrive exists for *transient* classes that a
#: sink adapter quarantines, e.g. rate-limit/unavailable).  Unknown
#: reasons (e.g. injected sink-side classes) default to 'transient'.
FAILURE_REASONS = [
    "empty_line", "missing_fields", "bad_timestamp", "bad_level", "bad_path",
]
#: sink-side reasons (produced by the sink adapter, not the parser) —
#: the retryable branch of the reference taxonomy (pool.rs:165-313)
SINK_FAILURE_REASONS = ["sink_unavailable"]
ALL_FAILURE_REASONS = FAILURE_REASONS + SINK_FAILURE_REASONS
FAILURE_CLASSES = {
    "empty_line": "schema",
    "missing_fields": "schema",
    "bad_timestamp": "schema",
    "bad_level": "schema",
    "bad_path": "schema",
    "sink_unavailable": "transient",
}


def failure_class_expr(reason: Column) -> Column:
    """reason → class (schema | transient); plan-time literal CASE."""
    expr = None
    for r, c in FAILURE_CLASSES.items():
        expr = F.when(reason == r, F.lit(c)) if expr is None else expr.when(
            reason == r, F.lit(c))
    return expr.otherwise(
        F.when(reason.isNull(), F.lit(None).cast("string"))
        .otherwise(F.lit("transient"))
    )



def parse_stage(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Decode + sanitize + truncate + grok.  Adds PARSED_COLUMNS.

    Rows that fail the grok get ``parse_ok = false`` and a
    ``failure_reason`` (the DLQ split happens downstream, mirroring the
    reference's per-batch DLQ capture at pool.rs:786-791).

    The token array is consumed here and dropped: ``n_tok`` is already a
    materialized input column, so nothing downstream needs the array —
    carrying it through the fan-out shuffle and into the routed parquet
    would multiply both by ~4× for zero information (the line itself is
    the decoded payload; tokens are re-derivable via the encode codec).
    """
    codec = resolve_codec(
        cfg.codec, df.sparkSession.sparkContext.defaultParallelism
    )
    if codec == "arrow":
        # true UTF-8 decode via Arrow batches (Python workers), with the
        # reference's BYTE-level sanitize fused into the same pass
        # (corrupted → '?'-replacement, invalid UTF-8 → lossy U+FFFD;
        # file.rs:660-721) — so the string-level sanitize is skipped.
        # drop_input: the array dies at the IPC boundary, not after it.
        df = with_decoded_line(df, "tokens", "line", sanitize=True,
                               drop_input=True)
        byte_len = F.octet_length("line")
        return parse_lines(df, cfg, byte_len, sanitize=False)
    # pure-JVM byte↔char decode: stays inside whole-stage codegen,
    # no Python round-trip; chars == original bytes, so length()
    # is the byte length
    df = df.withColumn("line", decode_tokens_sql(F.col("tokens"))).drop("tokens")
    byte_len = F.length("line")
    return parse_lines(df, cfg, byte_len)


def parse_lines(df: DataFrame, cfg: PipelineConfig,
                byte_len: Column | None = None,
                sanitize: bool = True) -> DataFrame:
    """Sanitize + truncate + field-extract a DataFrame that already has a
    ``line`` column (shared by the token path above and the DLQ redrive,
    which re-parses quarantined raw lines).  ``sanitize=False`` when the
    upstream codec already sanitized at the byte level."""
    if byte_len is None:
        byte_len = F.octet_length("line")
    df = df.withColumn("line", strip_line_endings(F.col("line")))
    if sanitize:
        df = df.withColumn("line", sanitize_content(F.col("line")))
    df = df.withColumn(
        "line",
        truncate_line(F.col("line"), cfg.max_line_size, cfg.truncation_suffix),
    )
    # Single-pass field extraction: the grammar is space-delimited
    # (<ts> <level> <path> <body>), so one split(limit=4) replaces eight
    # full-line regex matches.  The path is validated with ONE anchored
    # rlike and its groups taken by '/'-and-'_' splits — legal because
    # the reference's character classes (watcher.rs:31) exclude both
    # separators, so the splits are unambiguous exactly when the regex
    # matches (asserted against the regex-based pandas oracle in tests).
    # try_element_at throughout: under ANSI (Spark 4 default) a plain
    # element_at on a short split (e.g. an empty line) would throw.
    # batched with byte_len: one analysis pass instead of two
    df = df.withColumns({"byte_len": byte_len,
                         "_parts": F.split("line", " ", 4)})
    ts_raw = F.try_element_at("_parts", F.lit(1))
    level = F.try_element_at("_parts", F.lit(2))
    path = F.try_element_at("_parts", F.lit(3))
    body = F.try_element_at("_parts", F.lit(4))

    ts_ok = ts_raw.rlike(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?Z$")
    level_ok = level.isin("DEBUG", "INFO", "WARN", "ERROR", "FATAL")
    path_ok = path.rlike("^" + K8S_PATH_RE + "$")
    segs = F.split(path, "/")
    mid = F.split(F.try_element_at(segs, F.lit(5)), "_")

    def pseg(col):
        # miss ⇒ '' (same contract as regexp_extract's no-match)
        return F.when(path_ok, col).otherwise(F.lit(""))

    df = df.withColumns(
        {
            "level": F.when(level_ok, level).otherwise(F.lit("")),
            "namespace": pseg(F.try_element_at(mid, F.lit(1))),
            "pod_name": pseg(F.try_element_at(mid, F.lit(2))),
            "pod_id": pseg(F.try_element_at(mid, F.lit(3))),
            "container_name": pseg(F.try_element_at(segs, F.lit(6))),
            "body": F.coalesce(body, F.lit("")),
            # ISO-8601 with optional fractional seconds: the ANSI cast
            # accepts '...T..:..:..[.f+]Z' uniformly, so a grammar-valid
            # '2024-03-01T00:00:00.123Z' parses instead of being
            # quarantined (a fixed-pattern to_timestamp would reject the
            # fraction the ts_ok regex accepts)
            "ts": F.when(ts_ok, ts_raw.try_cast("timestamp")).otherwise(
                F.lit(None).cast("timestamp")
            ),
        }
    )
    # parse_ok + failure_reason in ONE batched projection (driver-side
    # analysis is per-batch latency); the ok predicate is cheap boolean
    # work over already-materialized columns, so inlining it into the
    # failure CASE costs nothing at run time
    ok = (
        (F.col("level") != "")
        & F.col("ts").isNotNull()
        & (F.col("namespace") != "")
        & (F.size("_parts") == 4)
    )
    df = df.withColumns(
        {
            "parse_ok": ok,
            # granular reasons, first-match priority (structure first)
            "failure_reason":
                F.when(ok, F.lit(None).cast("string"))
                # \s (not trim): trim strips spaces only, but a tab-only
                # line is whitespace-empty too (matches the oracle's
                # str.strip contract)
                .when(F.length(
                    F.regexp_replace(F.col("line"), r"\s", "")) == 0,
                    F.lit("empty_line"))
                .when(F.size("_parts") < 4, F.lit("missing_fields"))
                .when(~ts_ok | F.col("ts").isNull(),
                      F.lit("bad_timestamp"))
                .when(~level_ok, F.lit("bad_level"))
                .otherwise(F.lit("bad_path")),
        }
    )
    return df.drop("_parts")


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
