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

Single-pass accounting: per-sink stats ride the write job as
``df.observe()`` metrics (one CollectMetrics node, zero extra jobs) and
per-partition lineage comes from the written parquet footers
(driver-side metadata reads) — the input data is scanned EXACTLY once
per batch.  At 100 TB a second stats scan would double the pipeline's
I/O; observe() makes the same numbers free.
"""

from __future__ import annotations

import shutil
import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from logfowd2_spark.config import PipelineConfig
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
from logfowd2_spark.streaming.metrics import (
    BatchMetrics,
    RuntimeGauges,
    emit_metrics,
)


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
    from logfowd2_spark.operators.route import route_expr  # noqa: PLC0415

    parsed = parse_stage(df, cfg)
    enriched = enrich_stage(parsed, pods)
    ok = F.col("parse_ok")
    sink0 = route_expr(cfg.routes, F.col("source"), F.col("level"),
                       cfg.default_sink)
    # sink fault injection (the transient branch of the reference's
    # error taxonomy, pool.rs:165-313): a parse-clean row whose sink is
    # currently rejecting is quarantined with class 'transient' instead
    # of delivered — attempt number 0 here, so the fault fires whenever
    # until_retry >= 1; the redrive pass re-checks with attempt =
    # retry_count + 1 and genuinely delivers once the sink 'recovers'.
    if cfg.sink_fault_sink is not None and cfg.sink_fault_until_retry > 0:
        faulted = ok & (sink0 == cfg.sink_fault_sink)
    else:
        faulted = F.lit(False)
    deliver = ok & ~faulted
    out = enriched.withColumns(
        {
            "failure_reason": F.when(
                faulted, F.lit("sink_unavailable")
            ).otherwise(F.col("failure_reason")),
            "sink_id": F.when(deliver, sink0).otherwise(F.lit(DLQ_SINK)),
            "log_date": F.when(deliver, F.to_date("ts")).otherwise(
                F.to_date(F.lit(DLQ_DATE))
            ),
            # quarantined rows keep their raw line for the redrive pass;
            # good rows drop it (derivable from tokens)
            "raw_line": F.when(deliver, F.lit(None).cast("string")).otherwise(
                F.col("line")
            ),
            "retry_count": F.when(deliver, F.lit(None).cast("int")).otherwise(
                F.lit(0)
            ),
        }
    )
    return out.drop("line", "body", "parse_ok")


def _all_sinks(cfg: PipelineConfig) -> list[str]:
    """The sink universe is known at plan time (routes are config)."""
    sinks = {sink for _src, _lvl, sink in cfg.routes} | {cfg.default_sink}
    return sorted(sinks) + [DLQ_SINK]


def _observe_exprs(sinks: list[str]) -> list:
    """Per-sink conditional aggregates for ``df.observe`` — the sink set
    is config-sized, so the CollectMetrics row stays tiny (3 values per
    sink + 1 per failure class) regardless of data scale."""
    from logfowd2_spark.operators.parse import ALL_FAILURE_REASONS  # noqa: PLC0415

    exprs = [F.count(F.lit(1)).alias("rows_in")]
    for i, s in enumerate(sinks):
        hit = F.col("sink_id") == s
        exprs += [
            F.sum(F.when(hit, 1).otherwise(0)).alias(f"c{i}"),
            F.sum(F.when(hit, F.col("n_tok"))).alias(f"t{i}"),
            F.sum(F.when(hit, F.col("byte_len"))).alias(f"b{i}"),
        ]
    # per-failure-reason counts (the reference's typed error counters,
    # collector.rs errors_total{type=...} ≈ error.rs classes) — parse
    # reasons plus the sink-adapter's transient reasons
    for j, r in enumerate(ALL_FAILURE_REASONS):
        exprs.append(
            F.sum(
                F.when(
                    (F.col("sink_id") == DLQ_SINK)
                    & (F.col("failure_reason") == r), 1
                ).otherwise(0)
            ).alias(f"f{j}")
        )
    return exprs


def _stats_from_observation(vals: dict, sinks: list[str]) -> dict[str, dict[str, int]]:
    agg: dict[str, dict[str, int]] = {}
    for i, s in enumerate(sinks):
        n = int(vals.get(f"c{i}") or 0)
        if n == 0:
            continue
        agg[s] = {
            "event_count": n,
            "token_total": int(vals.get(f"t{i}") or 0),
            "byte_total": int(vals.get(f"b{i}") or 0),
        }
    return agg


def _lineage_from_stats(files: list[str], stats: dict[str, dict]) -> list[dict]:
    """Per-partition lineage derived from the manifest file list + its
    commit-time stats — NO footer reads (the one footer pass happened
    when the stats were collected at commit).  The task (= write
    partition) id is encoded in the file name (``part-NNNNN-...``);
    partition values come from the relative path."""
    rows: list[dict] = []
    for rel in sorted(files):
        parts = dict(
            seg.split("=", 1)
            for seg in rel.split("/")[:-1]
            if "=" in seg
        )
        fn = os.path.basename(rel)
        try:
            pid = int(fn.split("-")[1])
        except (IndexError, ValueError):
            pid = -1
        rows.append(
            {
                "partition_id": pid,
                "sink_id": parts.get("sink_id", ""),
                "log_date": parts.get("log_date", ""),
                "rows_routed": int(stats[rel]["rows"]),
                "file_bytes": int(stats[rel]["bytes"]),
            }
        )
    return rows


def _move_dlq_partition(out_dir: str, dlq_batch_dir: str,
                        cfg: PipelineConfig) -> None:
    """Relocate the reserved ``__dlq__`` sink partition into the
    parse_failures table, through the configured commit protocol
    (streaming/commit.py: metadata renames on POSIX/HDFS, replayable
    puts on an object store — SURVEY.md §7 risk d)."""
    from logfowd2_spark.streaming.commit import get_committer  # noqa: PLC0415

    dlq_src = os.path.join(out_dir, f"sink_id={DLQ_SINK}")
    if not os.path.isdir(dlq_src):
        return
    date_dir = os.path.join(dlq_src, f"log_date={DLQ_DATE}")
    src = date_dir if os.path.isdir(date_dir) else dlq_src
    get_committer(cfg.commit_protocol).move_files(src, dlq_batch_dir)
    shutil.rmtree(dlq_src, ignore_errors=True)


def _parquet_num_rows(files: list[str]) -> int:
    """Row count from parquet footers — driver-side, no Spark job.  An
    INDEPENDENT input-side count: the observe() totals are computed on
    the post-transform rows, so they alone cannot detect a transform
    that fans out or drops rows (e.g. a duplicate key in the pods
    dimension); the conservation check compares against this number."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def execute_unified_batch(
    df: DataFrame,
    pods: DataFrame,
    cfg: PipelineConfig,
    batch_tag: str,
    rows_in_true: int | None = None,
) -> BatchMetrics:
    """ONE Spark job per batch: transform → observe → fan-out write.

    Shared by batch mode (``run_batch``) and the streaming path
    (``foreachBatch``), so both produce the identical output layout —
    routed/batch_id=<tag>/sink_id=S/log_date=D plus a
    parse_failures/batch_id=<tag> quarantine partition and a
    sink_stats/batch_id=<tag> stats table.
    """
    out_dir = os.path.join(cfg.output_path, "routed", f"batch_id={batch_tag}")
    stats_dir = os.path.join(cfg.output_path, "sink_stats", f"batch_id={batch_tag}")
    dlq_batch_dir = os.path.join(cfg.output_path, "parse_failures",
                                 f"batch_id={batch_tag}")
    # idempotent retry: clear any partial output of a crashed attempt
    for d in (out_dir, stats_dir, dlq_batch_dir):
        shutil.rmtree(d, ignore_errors=True)

    sinks = _all_sinks(cfg)
    obs = Observation()
    unified = transform_batch_unified(df, pods, cfg).observe(
        obs, *_observe_exprs(sinks)
    )
    write_routed(repartition_for_write(unified, cfg), out_dir, mode="overwrite",
                 max_records_per_file=cfg.bulk_size)
    from logfowd2_spark.streaming.dlq import observation_values  # noqa: PLC0415

    vals = observation_values(obs)  # populated by the write job — no second scan

    # ONE commit-time footer pass over the just-written files feeds
    # everything downstream: the partition lineage, the batch's
    # ``_FILES.json`` manifest (files + per-file rows/bytes stats), and
    # the quarantine generation's manifest — so no later consumer
    # (metrics gauge, DLQ cap, lineage reads) ever re-walks footers
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        collect_file_stats, data_files, get_committer, write_file_manifest,
    )

    committer = get_committer(cfg.commit_protocol)
    files_all = data_files(out_dir)  # still includes sink_id=__dlq__/...
    stats_all = collect_file_stats(out_dir, files_all,
                                   detail_cols=cfg.stats_detail_cols,
                                   spark=df.sparkSession)
    dlq_prefix = f"sink_id={DLQ_SINK}/"
    routed_files = [f for f in files_all if not f.startswith(dlq_prefix)]
    lineage = _lineage_from_stats(routed_files, stats_all)
    _move_dlq_partition(out_dir, dlq_batch_dir, cfg)

    # publish the batch's file manifest (generation 0) — the pointer
    # manifest-resolving readers use, and the anchor every later
    # compaction's generation flip replaces atomically (commit.py).
    # "schema" records the physical data-file schema (written columns
    # minus the partition dirs): table reads merge these across batches
    # so a column added by a NEWER writer version surfaces as nulls on
    # old batches with zero footer opens (add-column evolution)
    data_schema = unified.drop("sink_id", "log_date").schema
    write_file_manifest(committer, out_dir, routed_files, generation=0,
                        stats={f: stats_all[f] for f in routed_files},
                        committed_at=time.time(),
                        extra={"schema": data_schema.jsonValue(),
                               # snapshot lineage: the batch's first
                               # commit appends everything it lists
                               "operation": "append",
                               "added": routed_files})
    if os.path.isdir(dlq_batch_dir):
        # the moved quarantine files keep their (unique) basenames and
        # contents, so the pre-move stats carry over 1:1
        dlq_stats = {
            os.path.basename(f): stats_all[f]
            for f in files_all if f.startswith(dlq_prefix)
        }
        from logfowd2_spark.config import resolve_codec  # noqa: PLC0415

        # record the codec that DECODED these raw lines (resolved the
        # same way parse_stage resolves it) — a later-process redrive
        # reads it from here instead of re-resolving 'auto' against a
        # different loadavg (the n_tok formula depends on it)
        used_codec = resolve_codec(
            cfg.codec, df.sparkSession.sparkContext.defaultParallelism
        )
        write_file_manifest(committer, dlq_batch_dir,
                            sorted(dlq_stats), generation=0,
                            stats=dlq_stats,
                            extra={"codec": used_codec})

    agg = _stats_from_observation(vals, sinks)
    dlq_stats_row = agg.pop(DLQ_SINK, None)
    _write_stats_pyarrow(stats_dir, agg)
    sink_counts = {k: v["event_count"] for k, v in agg.items()}

    from logfowd2_spark.operators.parse import ALL_FAILURE_REASONS  # noqa: PLC0415

    n_failed = dlq_stats_row["event_count"] if dlq_stats_row else 0
    failure_counts = {
        r: int(vals.get(f"f{j}") or 0)
        for j, r in enumerate(ALL_FAILURE_REASONS)
    }
    failure_counts = {r: n for r, n in failure_counts.items() if n}
    other = n_failed - sum(failure_counts.values())
    if other:  # sink-adapter classes outside the parse taxonomy
        failure_counts["other"] = other

    rows_seen = int(vals.get("rows_in") or 0)
    m = BatchMetrics(
        # prefer the independent input-side count (parquet footers) so
        # conservation_ok detects transform fan-out/loss; the streaming
        # path has no footers and falls back to the observed total
        rows_in=rows_seen if rows_in_true is None else rows_in_true,
        rows_routed=sum(sink_counts.values()),
        sink_counts=sink_counts,
        partition_metrics=lineage,
        failure_counts=failure_counts,
    )
    m.parse_failures = n_failed
    m.rows_parsed = m.rows_routed

    # bound the quarantine after EVERY batch — batch and streaming mode
    # alike (reference dead_letter_queue.rs:84-94 caps on every push)
    from logfowd2_spark.streaming.dlq import enforce_dlq_cap  # noqa: PLC0415

    enforce_dlq_cap(df.sparkSession,
                    os.path.join(cfg.output_path, "parse_failures"), cfg)
    return m


def run_batch(
    spark: SparkSession,
    batch_id: str,
    files: list[str],
    pods: DataFrame,
    cfg: PipelineConfig,
) -> BatchMetrics:
    """Execute one micro-batch end-to-end and return its metrics."""
    import time  # noqa: PLC0415

    t0 = time.perf_counter()
    df = spark.read.parquet(*files)
    m = execute_unified_batch(df, pods, cfg, batch_id,
                              rows_in_true=_parquet_num_rows(files))
    m.wall_ms = (time.perf_counter() - t0) * 1000.0
    return m


def run_pipeline(
    spark: SparkSession,
    cfg: PipelineConfig,
    pods_path: str,
    routes_path: str,
    files_per_batch: int = 0,
    max_batches: int | None = None,
    gauges: RuntimeGauges | None = None,
) -> list[BatchMetrics]:
    """Run all uncommitted batches; resume from the manifest.

    ``files_per_batch=0`` means one batch over the whole input (pure
    batch mode); >0 slices the file list into micro-batches.
    ``read_existing_on_startup=False`` (reference file.rs:233-248) marks
    all *current* batches committed without processing — 'seek to EOF'.
    """
    cfg.validate()
    # pin codec='auto' to ONE concrete codec for the whole run: the two
    # codecs differ semantically on non-ASCII bytes (arrow = real UTF-8
    # with lossy U+FFFD, jvm = byte→char mapping), so resolution must
    # not flip between batches of one run as loadavg moves — and a
    # pinned cfg also keeps the DLQ redrive's n_tok formula consistent
    # with the batches that quarantined the rows (same-run contract;
    # pin codec explicitly in config when mixing runs over non-ASCII
    # data with a long-lived quarantine)
    from logfowd2_spark.config import resolve_codec  # noqa: PLC0415

    cfg.codec = resolve_codec(cfg.codec,
                              spark.sparkContext.defaultParallelism)
    cfg.routes = load_routes(spark, routes_path)
    pods = spark.read.parquet(pods_path)

    # heal interrupted maintenance commits BEFORE any read: a crash
    # mid-compaction or mid-trim leaves transient dirs that only the
    # committer's recovery resolves (until then they are invisible to
    # readers, so the un-swapped original data is what gets read)
    from logfowd2_spark.streaming.commit import get_committer  # noqa: PLC0415

    committer = get_committer(cfg.commit_protocol)
    committer.recover(os.path.join(cfg.output_path, "routed"))
    committer.recover(os.path.join(cfg.output_path, "parse_failures"))
    if cfg.vacuum_retention_s > 0:
        # snapshot-expiry maintenance: reap retired generations whose
        # retention window has passed (manifest reads only, no Spark job)
        from logfowd2_spark.streaming.maintenance import (  # noqa: PLC0415
            vacuum_expired_table,
        )

        vacuum_expired_table(cfg)

    files = list_input_files(spark, cfg.input_path)
    fpb = files_per_batch or len(files)
    batches = plan_batches(files, max(1, fpb))

    manifest_path = os.path.join(cfg.checkpoint_path, "manifest.json")
    man = load_manifest(manifest_path)

    if cfg.dedup_store_enabled:
        # resume sweep: replay dedup-store indexing for committed
        # batches whose completion record is missing (a crash landed
        # between batch commit and store append, or the store was
        # enabled after those batches ran).  update_dedup_store is
        # idempotent per batch, so a replay racing its own earlier
        # crash converges.  Skip-existing watermark records
        # (rows_in == 0, never processed) are not indexed.
        from logfowd2_spark.streaming.dedup_store import (  # noqa: PLC0415
            update_dedup_store,
        )

        import warnings  # noqa: PLC0415

        for bid, rec in man.batches.items():
            if rec.dedup is None and rec.rows_in > 0 and rec.input_files:
                missing = [f for f in rec.input_files
                           if not os.path.exists(f)]
                if missing:
                    # historical inputs rotated away (e.g. the store was
                    # enabled long after those batches ran): the batch
                    # cannot be indexed, but it must not brick the
                    # pipeline — warn and move on; the sweep re-probes
                    # on every startup in case the files come back
                    warnings.warn(
                        f"dedup-store sweep: skipping {bid} — "
                        f"{len(missing)} input file(s) no longer exist",
                        stacklevel=2,
                    )
                    continue
                rec.dedup = update_dedup_store(
                    spark, cfg, bid,
                    spark.read.parquet(*rec.input_files)
                    .select("doc_id", "tokens"),
                )
                save_manifest(man, manifest_path)

    results: list[BatchMetrics] = []
    done = 0
    for batch_id, chunk in batches:
        if man.committed(batch_id):
            continue
        if not cfg.read_existing_on_startup:
            # skip-existing semantics: record watermark, emit nothing
            man.record(BatchRecord(
                batch_id, chunk, 0, 0, 0, {}, []
            ))
            save_manifest(man, manifest_path)
            continue
        try:
            m = run_batch(spark, batch_id, chunk, pods, cfg)
        except Exception:
            if gauges is not None:
                # a thrown batch is the reference's failed-request case:
                # bump the streak so a retrying caller sees the widened
                # adaptive timeout (pool.rs:94-121), then surface the error
                gauges.observe(0.0, failed=True)
            raise
        if gauges is not None:
            # A6 gauges ride the driver loop (pool.rs:63-121 analogue);
            # a conservation break counts as a failed delivery — it is
            # the batch-mode analogue of a bulk call that lost docs
            gauges.observe(m.wall_ms, failed=not m.conservation_ok())
        man.record(BatchRecord(
            batch_id=batch_id,
            input_files=chunk,
            rows_in=m.rows_in,
            rows_parsed=m.rows_parsed,
            parse_failures=m.parse_failures,
            sink_counts=m.sink_counts,
            partition_metrics=m.partition_metrics,
            failure_counts=m.failure_counts,
        ))
        save_manifest(man, manifest_path)  # commit point
        results.append(m)
        if cfg.dedup_store_enabled:
            # maintenance stage: dedup this batch against ALL committed
            # history via the signature store (no corpus re-hash), then
            # index it for future batches (streaming/dedup_store.py).
            # Completion is RECORDED in the checkpoint manifest — a
            # crash between batch commit and store append is replayed
            # by the resume sweep below, so the store never silently
            # misses a committed batch.
            from logfowd2_spark.streaming.dedup_store import (  # noqa: PLC0415
                update_dedup_store,
            )

            m.dedup = update_dedup_store(
                spark, cfg, batch_id,
                spark.read.parquet(*chunk).select("doc_id", "tokens"),
            )
            man.batches[batch_id].dedup = m.dedup
            save_manifest(man, manifest_path)
        # per-batch metrics exposition (reference metrics/server.rs:185
        # scrape endpoint → atomic textfile publish; A4/A6 families)
        emit_metrics(cfg.output_path, results, gauges,
                     commit_protocol=cfg.commit_protocol)
        done += 1
        if max_batches is not None and done >= max_batches:
            break
    if cfg.auto_compact_min_batches > 0:
        # automatic table service (policy knob, config.py): consolidate
        # once enough batch dirs accumulated — at 10^5 micro-batches
        # per-scan metadata cost is the bottleneck, and a production
        # table compacts on a policy, not by hand.  Runs AFTER the
        # batch commits so a compaction failure never loses ingest
        # progress (the next run retries it).
        from logfowd2_spark.streaming.commit import read_table_manifest  # noqa: PLC0415
        from logfowd2_spark.streaming.maintenance import compact_table  # noqa: PLC0415

        root = os.path.join(cfg.output_path, "routed")
        tman = read_table_manifest(root)
        cons = set(tman["consolidated_ids"]) if tman else set()
        # only dir-backed ids count: skip-existing watermark records
        # have no routed dir and nothing to consolidate
        pending = [b for b in man.committed_ids() if b not in cons
                   and os.path.isdir(os.path.join(root, f"batch_id={b}"))]
        if len(pending) >= cfg.auto_compact_min_batches:
            compact_table(spark, cfg)
    return results


def read_routed(spark: SparkSession, cfg: PipelineConfig,
                predicates=None) -> DataFrame:
    """All committed routed rows (partition columns recovered from
    paths).  Each batch's file list resolves through its ``_FILES.json``
    manifest pointer when present (snapshot isolation across concurrent
    compaction swaps — streaming/commit.py); batch dirs without one
    (legacy layouts) fall back to directory listing.  Consolidated ids
    scan the ``_consolidated`` generation; leftover per-batch dirs of
    those ids are retention copies ``table_scan`` excludes by id.

    ``predicates`` prune files from the manifests' commit-time column
    bounds before Spark lists anything (data skipping); the result may
    be a SUPERSET of the matching rows — use ``scan_routed`` for exact
    predicate semantics."""
    root = os.path.join(cfg.output_path, "routed")
    if not os.path.isdir(root):
        return spark.read.option("basePath", root).parquet(root)
    from logfowd2_spark.streaming.commit import read_table_manifest  # noqa: PLC0415
    from logfowd2_spark.streaming.maintenance import table_scan  # noqa: PLC0415

    tman = read_table_manifest(root)
    dir_ids = [
        name.split("=", 1)[1]
        for name in sorted(os.listdir(root))
        if name.startswith("batch_id=")
    ]
    ids = (sorted(set(tman["consolidated_ids"]) | set(dir_ids))
           if tman is not None else dir_ids)
    if not ids:
        return spark.read.option("basePath", root).parquet(root)
    return table_scan(spark, cfg, ids, predicates=predicates)


def scan_routed(spark: SparkSession, cfg: PipelineConfig,
                predicates) -> DataFrame:
    """Exact predicate scan over the routed table with manifest-level
    data skipping: files are pruned by the commit-time column bounds in
    the ``_FILES.json`` manifests (driver-side, a few KB of JSON — at a
    100 TB table this replaces listing and footer-reading 10⁶ files
    with metadata the commit already paid for), then the SAME predicate
    is applied Spark-side, where it also pushes down to the surviving
    parquet scans' row-group stats.  ``predicates`` is
    ``[(col, op, value), ...]`` with op one of ``== >= > <= <``;
    conjunction (AND) semantics."""
    from logfowd2_spark.streaming.maintenance import predicate_expr  # noqa: PLC0415

    df = read_routed(spark, cfg, predicates=predicates)
    expr = predicate_expr(predicates or [])
    return df if expr is None else df.filter(expr)
