"""The batch/micro-batch driver: plan → run batches → commit.

This replaces the reference's entire tokio task graph (main.rs:61-192:
Watcher → channel → Sender → channel → EsWorkerPool) with one declarative
DataFrame DAG per micro-batch:

    read batch files → parse (decode/sanitize/truncate/grok)
                     → split good/DLQ
                     → enrich (broadcast dim join)
                     → route (CASE sink_id) → salted repartition
                     → fan-out write (partitioned parquet per sink/day)
                     → sink_stats aggregate
                     → manifest commit (atomic)

A "micro-batch" is a fixed slice of the input file list (the stand-in
for an Iceberg snapshot range).  Idempotent re-runs: each batch writes
under its own ``batch_id=...`` directory which is cleared before a
retry, so a crash between write and manifest-commit cannot duplicate
data (the reference instead replays up to 10 s of events and duplicates
docs — SURVEY.md §3.2; this is the deliberate upgrade).
"""

from __future__ import annotations

import shutil
import os

from pyspark.sql import DataFrame, SparkSession

from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.operators.aggregate import partition_manifest_rows
from logfowd2_spark.operators.enrich import enrich_stage
from logfowd2_spark.operators.parse import parse_stage, split_parsed
from logfowd2_spark.operators.route import (
    repartition_for_write,
    route_stage,
    write_routed,
)
from logfowd2_spark.streaming.checkpoint import (
    BatchRecord,
    Manifest,
    load_manifest,
    save_manifest,
)
from logfowd2_spark.streaming.metrics import BatchMetrics


def _parquet_num_rows(files: list[str]) -> int:
    """Row count from parquet footers — driver-side, no Spark job."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def _write_stats_pyarrow(stats_dir: str, agg: dict[str, dict[str, int]]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(stats_dir, exist_ok=True)
    keys = sorted(agg)
    tbl = pa.table(
        {
            "sink_id": pa.array(keys, pa.string()),
            "event_count": pa.array([agg[k]["event_count"] for k in keys], pa.int64()),
            "token_total": pa.array([agg[k]["token_total"] for k in keys], pa.int64()),
            "byte_total": pa.array([agg[k]["byte_total"] for k in keys], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(stats_dir, "part-00000.parquet"))


def list_input_files(spark: SparkSession, input_path: str) -> list[str]:
    """Deterministic, sorted input file listing (the 'snapshot')."""
    if os.path.isdir(input_path):
        names = sorted(
            os.path.join(input_path, n)
            for n in os.listdir(input_path)
            if n.endswith(".parquet")
        )
        return names
    return [input_path]


def plan_batches(files: list[str], files_per_batch: int) -> list[tuple[str, list[str]]]:
    out = []
    for b in range(0, len(files), files_per_batch):
        chunk = files[b : b + files_per_batch]
        out.append((f"batch-{b // files_per_batch:05d}", chunk))
    return out


def load_routes(spark: SparkSession, routes_path: str) -> list[tuple[str, str, str]]:
    """Routing map is config-sized; collect it once at plan time."""
    rows = spark.read.parquet(routes_path).collect()
    return [(r["source"], r["level"], r["sink_id"]) for r in rows]


def transform_batch(df: DataFrame, pods: DataFrame,
                    cfg: PipelineConfig) -> tuple[DataFrame, DataFrame]:
    """The pure (no-IO) part of the DAG: returns (routed, dlq)."""
    parsed = parse_stage(df, cfg)
    good, dlq = split_parsed(parsed)
    enriched = enrich_stage(good, pods)
    routed = route_stage(enriched, cfg)
    return routed, dlq


DLQ_SINK = "__dlq__"
DLQ_DATE = "9999-01-01"


def transform_batch_unified(df: DataFrame, pods: DataFrame,
                            cfg: PipelineConfig) -> DataFrame:
    """Single-output variant: failed-parse rows are routed to the
    reserved ``__dlq__`` sink instead of a second branch, so ONE pass
    (decode + parse + enrich + route) feeds one fan-out write; the
    ``__dlq__`` partition directory is then *moved* into the
    parse_failures table by the driver (a metadata rename, no data job).
    Halves the per-batch compute vs. writing routed and DLQ separately.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    from logfowd2_spark.operators.route import route_expr  # noqa: PLC0415

    parsed = parse_stage(df, cfg)
    enriched = enrich_stage(parsed, pods)
    ok = F.col("parse_ok")
    out = enriched.withColumns(
        {
            "sink_id": F.when(
                ok, route_expr(cfg.routes, F.col("source"), F.col("level"),
                               cfg.default_sink)
            ).otherwise(F.lit(DLQ_SINK)),
            "log_date": F.when(ok, F.to_date("ts")).otherwise(
                F.to_date(F.lit(DLQ_DATE))
            ),
            # quarantined rows keep their raw line for the redrive pass;
            # good rows drop it (derivable from tokens)
            "raw_line": F.when(ok, F.lit(None).cast("string")).otherwise(
                F.col("line")
            ),
            "retry_count": F.when(ok, F.lit(None).cast("int")).otherwise(
                F.lit(0)
            ),
        }
    )
    return out.drop("line", "body", "parse_ok")


def run_batch(
    spark: SparkSession,
    batch_id: str,
    files: list[str],
    pods: DataFrame,
    cfg: PipelineConfig,
) -> BatchMetrics:
    """Execute one micro-batch end-to-end and return its metrics."""
    out_dir = os.path.join(cfg.output_path, "routed", f"batch_id={batch_id}")
    stats_dir = os.path.join(cfg.output_path, "sink_stats", f"batch_id={batch_id}")
    dlq_dir = os.path.join(cfg.output_path, "parse_failures")
    dlq_batch_dir = os.path.join(dlq_dir, f"batch_id={batch_id}")
    # idempotent retry: clear any partial output of a crashed attempt
    for d in (out_dir, stats_dir, dlq_batch_dir):
        shutil.rmtree(d, ignore_errors=True)

    df = spark.read.parquet(*files)
    # ONE pass over the data: failed rows ride the same fan-out write
    # under the reserved __dlq__ sink, then their partition directory is
    # renamed into the parse_failures table (metadata-only).  Nothing is
    # persisted/cached: a cache would never hold a 100 TB batch.
    unified = transform_batch_unified(df, pods, cfg)
    write_routed(repartition_for_write(unified, cfg), out_dir, mode="overwrite",
                 max_records_per_file=cfg.bulk_size)

    # move the quarantine partition out of the routed table
    dlq_src = os.path.join(out_dir, f"sink_id={DLQ_SINK}")
    if os.path.isdir(dlq_src):
        os.makedirs(dlq_batch_dir, exist_ok=True)
        date_dir = os.path.join(dlq_src, f"log_date={DLQ_DATE}")
        src = date_dir if os.path.isdir(date_dir) else dlq_src
        for fname in os.listdir(src):
            if not fname.startswith("."):
                os.replace(os.path.join(src, fname),
                           os.path.join(dlq_batch_dir, fname))
        shutil.rmtree(dlq_src, ignore_errors=True)

    # metrics + aggregate stage, computed from the *committed* batch
    # output in ONE pass: the per-partition lineage rows fold up to the
    # per-sink stats driver-side (both are tiny: tasks × sinks rows)
    committed = spark.read.parquet(out_dir)
    part_rows = [r.asDict() for r in partition_manifest_rows(committed).collect()]
    agg: dict[str, dict[str, int]] = {}
    for r in part_rows:
        s = agg.setdefault(
            r["sink_id"], {"event_count": 0, "token_total": 0, "byte_total": 0}
        )
        s["event_count"] += r["rows_routed"]
        s["token_total"] += r["token_total"]
        s["byte_total"] += r["byte_total"]
    # stats + input counts are driver-side pyarrow (a handful of rows /
    # parquet footer metadata) — no Spark jobs for bookkeeping
    _write_stats_pyarrow(stats_dir, agg)
    sink_counts = {k: v["event_count"] for k, v in agg.items()}

    m = BatchMetrics(
        rows_in=_parquet_num_rows(files),
        rows_routed=sum(sink_counts.values()),
        sink_counts=sink_counts,
        partition_metrics=part_rows,
    )
    m.parse_failures = m.rows_in - m.rows_routed
    m.rows_parsed = m.rows_routed
    return m


def run_pipeline(
    spark: SparkSession,
    cfg: PipelineConfig,
    pods_path: str,
    routes_path: str,
    files_per_batch: int = 0,
    max_batches: int | None = None,
) -> list[BatchMetrics]:
    """Run all uncommitted batches; resume from the manifest.

    ``files_per_batch=0`` means one batch over the whole input (pure
    batch mode); >0 slices the file list into micro-batches.
    ``read_existing_on_startup=False`` (reference file.rs:233-248) marks
    all *current* batches committed without processing — 'seek to EOF'.
    """
    cfg.validate()
    cfg.routes = load_routes(spark, routes_path)
    pods = spark.read.parquet(pods_path)

    files = list_input_files(spark, cfg.input_path)
    fpb = files_per_batch or len(files)
    batches = plan_batches(files, max(1, fpb))

    manifest_path = os.path.join(cfg.checkpoint_path, "manifest.json")
    man = load_manifest(manifest_path)

    results: list[BatchMetrics] = []
    done = 0
    for batch_id, chunk in batches:
        if man.committed(batch_id):
            continue
        if not cfg.read_existing_on_startup:
            # skip-existing semantics: record watermark, emit nothing
            man.batches[batch_id] = BatchRecord(
                batch_id, chunk, 0, 0, 0, {}, []
            )
            save_manifest(man, manifest_path)
            continue
        m = run_batch(spark, batch_id, chunk, pods, cfg)
        man.batches[batch_id] = BatchRecord(
            batch_id=batch_id,
            input_files=chunk,
            rows_in=m.rows_in,
            rows_parsed=m.rows_parsed,
            parse_failures=m.parse_failures,
            sink_counts=m.sink_counts,
            partition_metrics=m.partition_metrics,
        )
        save_manifest(man, manifest_path)  # commit point
        results.append(m)
        done += 1
        if max_batches is not None and done >= max_batches:
            break
    return results


def read_routed(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """All committed routed rows (partition columns recovered from paths)."""
    return spark.read.option("basePath", os.path.join(cfg.output_path, "routed")).parquet(
        os.path.join(cfg.output_path, "routed")
    )
