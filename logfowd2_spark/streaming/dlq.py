"""Dead-letter quarantine — the reference's DLQ as a first-class table.

The reference keeps failed events in a bounded deque flushed to JSON and
retries them on a backoff schedule, dropping after max_retry_count=5
(src/infrastructure/elasticsearch/dead_letter_queue.rs:31-40,69-217;
retry loop at pool.rs:358-470).  Here failed-parse rows land in a
``parse_failures`` parquet table (append, partitioned by batch) and a
re-drive pass re-parses quarantined raw lines on the next run,
incrementing ``retry_count`` and dropping rows past the cap.

Everything is distributed: the redrive writes its new generation with
DataFrame writes and counts via ``df.observe`` — no ``collect()``
anywhere, so a TB-sized DLQ after a bad-parser day cannot OOM the
driver.  The capacity cap (reference dead_letter_queue.rs:84-94:
max_queue_size=10_000, drop-oldest) is enforced from parquet footers
(driver-side metadata) plus at most one boundary-trim job.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.ioutil import tree_num_rows

DLQ_COLUMNS = ["doc_id", "source", "raw_line", "failure_reason", "retry_count"]


def observation_values(obs: Observation) -> dict:
    """Read an observation defensively: a write whose AQE-planned output
    is empty (zero tasks) never executes its CollectMetrics node, and
    ``Observation.get`` then fails converting the missing row — which
    simply means 'no rows flowed', i.e. every aggregate is 0/None."""
    try:
        return obs.get or {}
    except Exception:  # noqa: BLE001 - missing metrics row == empty batch
        return {}


def _obs_n(obs: Observation) -> int:
    return int(observation_values(obs).get("n") or 0)


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


def _dlq_batch_dirs(dlq_path: str) -> list[str]:
    if not os.path.isdir(dlq_path):
        return []
    return [
        os.path.join(dlq_path, d)
        for d in sorted(os.listdir(dlq_path))
        if d.startswith("batch_id=")
    ]


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
    ``dlq_max_retry_count`` are RETAINED marked permanently-failed
    (dead_letter_queue.rs:48-55 accounting).  The consumed generation
    dirs are replaced by the new one (take-off-queue semantics).

    Fully distributed: the quarantined rows never visit the driver; the
    re-parse carries ``retry_count`` straight through the parse stage
    (no restore join — the round-1 doc_id equi-join could fan out rows
    quarantined twice), and all counts come from ``df.observe`` on the
    writes.

    Delivery contract: at-least-once per generation, like the reference
    (a crash between the new-generation write and the old-dir removal
    re-presents rows on the next pass).

    Plan note: the good/still_bad filters reference ``parse_ok``, and
    filter pushdown substitutes the full parse expression (sanitize +
    truncate + split) into the scan's DataFilters — large enough that
    janino may refuse the generated method and Spark falls back to
    interpreted evaluation for this stage.  That is accepted here: the
    redrive input is bounded by ``dlq_max_size`` (default 10k rows), so
    interpreted evaluation is noise; the HOT path (the unified batch
    write) has no parse_ok filter at all and stays fully codegen'd.  Re-running the SAME generation
    number after a crash is idempotent: any partial ``redrive-N`` output
    of the crashed attempt is discarded up front — its rows derive
    entirely from the old generations, which are still present (they are
    removed only as the final step) — so the rerun re-reads exactly the
    crashed attempt's input instead of consuming (and concurrently
    overwriting) its half-written output.
    """
    from logfowd2_spark.operators.enrich import enrich_stage  # noqa: PLC0415
    from logfowd2_spark.operators.parse import parse_lines  # noqa: PLC0415
    from logfowd2_spark.operators.route import (  # noqa: PLC0415
        route_expr,
        route_stage,
        write_routed,
    )

    import json  # noqa: PLC0415

    tag = f"redrive-{generation:05d}"
    dlq_path = os.path.join(cfg.output_path, "parse_failures")
    new_dir = os.path.join(dlq_path, f"batch_id={tag}")
    marker = os.path.join(new_dir, "_COMMITTED.json")
    # heal any interrupted boundary trim FIRST: in the trim crash window
    # both the original and its trim-<orig> replacement exist, and a
    # naive read would re-drive the straddling file's rows twice
    _recover_trims(dlq_path)
    if os.path.exists(marker):
        # a prior attempt of THIS generation fully committed (marker is
        # written after all three writes) but crashed mid-removal of the
        # consumed input dirs: resume the removal and return the recorded
        # counts — rebuilding would read the new generation as input.
        # Only the dirs the marker RECORDS as consumed are removed: any
        # generation that arrived after the commit (new batches ran
        # before the redrive was retried) was never redriven and must
        # survive for the next generation.
        with open(marker) as fh:
            committed = json.load(fh)
        for name in committed.get("consumed_dirs", []):
            shutil.rmtree(os.path.join(dlq_path, name), ignore_errors=True)
        # back-compat: an early marker format stored the counts flat
        # (no consumed_dirs recorded — nothing more can safely be
        # removed); never KeyError on a crash-recovery path
        return committed.get("result", committed)
    # crash-rerun idempotence: drop this generation's own UNCOMMITTED
    # partial output BEFORE listing/reading, so it is never both source
    # and sink (its rows derive entirely from the still-present inputs)
    shutil.rmtree(new_dir, ignore_errors=True)
    old_dirs = _dlq_batch_dirs(dlq_path)
    df = read_dlq(spark, dlq_path)
    eligible = df.filter(F.col("retry_count") < cfg.dlq_max_retry_count)
    dropped = df.filter(F.col("retry_count") >= cfg.dlq_max_retry_count)

    # retry_count rides through the parse stage untouched — its new value
    # is (old + 1) for rows that fail again, no join needed
    reparsed = parse_lines(
        eligible.select("doc_id", "source", F.col("raw_line").alias("line"),
                        "retry_count"),
        cfg,
    )
    # sink-side transient check at delivery attempt = retry_count + 1
    # (attempt 0 was the original batch): a parse-clean row whose sink is
    # still rejecting goes back to the quarantine as 'sink_unavailable';
    # once attempt >= until_retry the sink has 'recovered' and the row is
    # genuinely delivered (reference retry loop, pool.rs:358-470)
    if cfg.sink_fault_sink is not None:
        prospective = route_expr(cfg.routes, F.col("source"), F.col("level"),
                                 cfg.default_sink)
        fault_hit = (
            F.col("parse_ok")
            & (prospective == cfg.sink_fault_sink)
            & (F.col("retry_count") + 1 < cfg.sink_fault_until_retry)
        )
    else:
        fault_hit = F.lit(False)
    reparsed = reparsed.withColumn("_fault", fault_hit)
    good = reparsed.filter(F.col("parse_ok") & ~F.col("_fault")).drop(
        "parse_ok", "failure_reason", "retry_count", "_fault"
    )
    still_bad = reparsed.filter(~F.col("parse_ok") | F.col("_fault")).select(
        "doc_id", "source", F.col("line").alias("raw_line"),
        F.when(F.col("_fault"), F.lit("sink_unavailable"))
        .otherwise(F.col("failure_reason")).alias("failure_reason"),
        (F.col("retry_count") + 1).alias("retry_count"),
    )

    # recovered rows: same output shape as regular batches.  n_tok for a
    # recovered row is the token count the encode codec would produce
    # from the quarantined raw_line — without building the array.  The
    # token:char mapping depends on which codec DECODED it: arrow is
    # byte-level (octet_length), while the jvm codec mapped each input
    # byte to one char, so bytes 0x80-0xFF became 2-byte UTF-8 chars and
    # the token count is the CHAR count (F.length).  The decoding codec
    # is read from the consumed generations' manifests (the quarantine
    # writer records it — pipeline.py/this pass), so a redrive in a
    # LATER PROCESS under different load uses the formula of the run
    # that actually quarantined the rows; only manifest-less legacy
    # generations (or a mixed-codec quarantine, the documented
    # pin-explicitly residual) fall back to re-resolving 'auto'.
    from logfowd2_spark.config import resolve_codec  # noqa: PLC0415
    from logfowd2_spark.streaming.commit import read_file_manifest  # noqa: PLC0415

    recorded = {
        (read_file_manifest(d) or {}).get("codec") for d in old_dirs
    } - {None}
    if len(recorded) == 1:
        codec = recorded.pop()
    else:
        codec = resolve_codec(
            cfg.codec, spark.sparkContext.defaultParallelism
        )
    n_tok = F.length("line") if codec == "jvm" else F.octet_length("line")
    good = good.withColumn("n_tok", n_tok)
    recovered = route_stage(enrich_stage(good, pods), cfg).drop("line", "body")
    out_dir = os.path.join(cfg.output_path, "routed", f"batch_id={tag}")
    rec_obs = Observation()
    write_routed(
        recovered.observe(rec_obs, F.count(F.lit(1)).alias("n"))
        .hint("rebalance", "sink_id"),
        out_dir, "overwrite",
    )
    n_recovered = _obs_n(rec_obs)
    # redrive batches are routed batches like any other: publish the
    # generation-0 file manifest (files + commit-time stats) so
    # manifest-resolving readers (and a later compaction's generation
    # flip) get the same snapshot isolation and footer-free metadata
    # here as on regular batch dirs
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        collect_file_stats, data_files, get_committer, write_file_manifest,
    )

    rec_files = data_files(out_dir)
    write_file_manifest(get_committer(cfg.commit_protocol), out_dir,
                        rec_files, generation=0,
                        stats=collect_file_stats(out_dir, rec_files))

    # new DLQ generation: requeued + permanently-failed rows, written
    # distributed into a fresh batch_id dir (created after the source
    # listing, so the reads above never see it)
    rq_obs, pf_obs = Observation(), Observation()
    (
        still_bad.observe(rq_obs, F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite").parquet(new_dir)
    )
    (
        dropped.select(*DLQ_COLUMNS)
        .observe(pf_obs, F.count(F.lit(1)).alias("n"))
        .write.mode("append").parquet(new_dir)
    )
    n_requeued = _obs_n(rq_obs)
    n_dropped = _obs_n(pf_obs)
    # the new quarantine generation carries its manifest too — the DLQ
    # cap and the metrics gauge count it without opening footers.  The
    # codec is PROPAGATED (the requeued raw lines were decoded by the
    # original run's codec, not by whatever this process resolved)
    new_files = data_files(new_dir)
    write_file_manifest(get_committer(cfg.commit_protocol), new_dir,
                        new_files, generation=0,
                        stats=collect_file_stats(new_dir, new_files),
                        extra={"codec": codec})
    result = {
        "recovered": n_recovered,
        "requeued": n_requeued,
        "permanently_failed": n_dropped,
    }
    # commit point: the marker (underscore-prefixed — invisible to Spark
    # and to the footer walks) records that every write of this
    # generation completed AND which input dirs it consumed, so a rerun
    # RESUMES the removal of exactly those dirs instead of rebuilding
    # from a partially-deleted input set (which would lose the
    # already-removed generations' rows) or wiping generations that
    # arrived after the commit.  Published through the commit seam
    # (atomic single-object put under both protocols).  A crash between
    # marker and removals followed by a pass at a NEW generation number
    # re-presents the old rows — the documented at-least-once contract.
    from logfowd2_spark.streaming.commit import get_committer  # noqa: PLC0415

    os.makedirs(new_dir, exist_ok=True)
    get_committer(cfg.commit_protocol).put_file(
        marker,
        json.dumps({
            "result": result,
            "consumed_dirs": [os.path.basename(d) for d in old_dirs],
        }).encode(),
    )
    for d in old_dirs:
        shutil.rmtree(d, ignore_errors=True)
    return result


def next_redrive_generation(dlq_path: str) -> int:
    """First unused redrive generation number (rerunning an EXISTING
    number is reserved for crash resume — redrive_pass is idempotent
    per generation, so the scheduler must not reuse one for new work)."""
    gens = [
        int(d.split("redrive-", 1)[1])
        for d in os.listdir(dlq_path) if d.startswith("batch_id=redrive-")
    ] if os.path.isdir(dlq_path) else []
    return (max(gens) + 1) if gens else 0


def redrive_loop(spark: SparkSession, cfg: PipelineConfig, pods: DataFrame,
                 max_generations: int = 10,
                 base_delay_s: float = 30.0, max_delay_s: float = 300.0,
                 gauges=None, sleep_fn=None) -> dict:
    """The retry SCHEDULER the reference runs around its DLQ: generations
    on a cadence with exponential backoff — base 30 s, doubled per
    consecutive failed attempt, capped at 300 s (pool.rs:358-470 retry
    task + dead_letter_queue.rs:31-40 config).  A generation that
    recovers nothing while rows remain queued counts as a failed
    delivery attempt (the sink is still down) and doubles the next
    delay; any recovery resets the streak.  The failure streak lives in
    ``RuntimeGauges`` (A6), so the same counter that widens the adaptive
    timeout spaces the retry cadence — exactly the reference's coupling
    of NetworkStats to its retry loop.

    The reference also bounds each retry to 100-event bulk calls; that
    bound exists because its retry unit is one HTTP request.  Here a
    generation is a distributed job and the per-request bound maps to
    the per-file write bound (``maxRecordsPerFile=bulk_size``) — a
    row-LIMIT per generation would silently DROP the un-taken rows,
    because a pass consumes its input generations whole.

    Stops when no eligible rows remain (drained or all permanently
    failed) or after ``max_generations``.  ``sleep_fn`` injects the
    waiter for tests (defaults to ``time.sleep``).  Returns the
    schedule: per-generation (generation, delay_s, result) plus totals.
    """
    import time  # noqa: PLC0415

    from logfowd2_spark.streaming.metrics import RuntimeGauges  # noqa: PLC0415

    sleep = sleep_fn if sleep_fn is not None else time.sleep
    gauges = gauges if gauges is not None else RuntimeGauges()
    dlq_path = os.path.join(cfg.output_path, "parse_failures")
    schedule: list[dict] = []
    totals = {"recovered": 0, "requeued": 0, "permanently_failed": 0}
    for _ in range(max_generations):
        if redrive_candidates(spark, dlq_path, cfg).limit(1).count() == 0:
            break
        delay = 0.0
        if schedule:  # the first attempt runs immediately, like take_batch
            # exponent is (streak - 1): after ONE failed generation the
            # schedule starts at the configured base delay (30 s,
            # dead_letter_queue.rs:31-40), doubling per further failure
            # — 2**streak skipped the base and started at 60 s
            delay = min(
                base_delay_s * (2 ** max(0, gauges.consecutive_failures - 1)),
                max_delay_s,
            )
            sleep(delay)
        gen = next_redrive_generation(dlq_path)
        t0 = time.perf_counter()
        result = redrive_pass(spark, cfg, pods, generation=gen)
        wall_ms = (time.perf_counter() - t0) * 1000.0
        failed = result["recovered"] == 0 and result["requeued"] > 0
        gauges.observe(wall_ms, failed=failed)
        schedule.append({"generation": gen, "delay_s": delay, **result})
        totals["recovered"] += result["recovered"]
        totals["permanently_failed"] = result["permanently_failed"]
        totals["requeued"] = result["requeued"]
    return {"schedule": schedule, "totals": totals,
            "consecutive_failures": gauges.consecutive_failures}


_TRIM_PREFIX = "trim-"


def _gen_file_stats(d: str) -> list[tuple[str, int, str]]:
    """(path, num_rows, min_doc_id) per parquet file in a generation dir,
    from footers only (column statistics of the first/last row groups) —
    no Spark job, no data read."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    out = []
    for fn in sorted(os.listdir(d)):
        if not fn.endswith(".parquet") or fn.startswith((".", "_")):
            continue
        full = os.path.join(d, fn)
        md = pq.ParquetFile(full).metadata
        mins = []
        for rg in range(md.num_row_groups):
            col = next(
                (md.row_group(rg).column(i)
                 for i in range(md.row_group(rg).num_columns)
                 if md.row_group(rg).column(i).path_in_schema == "doc_id"),
                None,
            )
            if col is not None and col.statistics and col.statistics.has_min_max:
                mins.append(col.statistics.min)
        out.append((full, md.num_rows, min(mins) if mins else ""))
    return out


def _recover_trims(dlq_path: str) -> None:
    """Heal interrupted boundary trims: the trim protocol writes the
    trimmed replacement file (named ``trim-<original>``) BEFORE deleting
    the original, so a crash in between leaves both — the replacement's
    existence records the committed intent, and the original is deleted
    here.  Stale staging dirs are dropped (never visible to readers)."""
    if not os.path.isdir(dlq_path):
        return
    for d in _dlq_batch_dirs(dlq_path):
        for fn in os.listdir(d):
            if fn.startswith((".put-", "." + _TRIM_PREFIX)):
                # half-written temp from a crash mid-publish: never
                # became the committed file, safe to discard
                os.remove(os.path.join(d, fn))
            elif fn.startswith(_TRIM_PREFIX):
                orig = os.path.join(d, fn[len(_TRIM_PREFIX):])
                if os.path.exists(orig):
                    os.remove(orig)
    for name in os.listdir(dlq_path):
        if name.startswith("_trimstage"):
            shutil.rmtree(os.path.join(dlq_path, name), ignore_errors=True)


def _generation_age_key(d: str):
    """Drop-oldest order across mixed tag prefixes (batch-*/stream-*/
    redrive-*): lexicographic names would always sacrifice 'batch-*'
    generations first regardless of real age, so age is the oldest data
    file's mtime (a generation is written once; a boundary trim rewrites
    at most one file and PRESERVES its mtime via os.utime, so the min
    is stable), with the dir name as the deterministic tiebreak."""
    mtimes = [
        os.path.getmtime(os.path.join(d, fn))
        for fn in os.listdir(d)
        if fn.endswith(".parquet") and not fn.startswith((".", "_"))
    ]
    return (min(mtimes) if mtimes else os.path.getmtime(d), d)


def enforce_dlq_cap(spark: SparkSession, dlq_path: str,
                    cfg: PipelineConfig) -> int:
    """Bound the quarantine at ``dlq_max_size`` rows, dropping oldest
    first (reference dead_letter_queue.rs:84-94: push_back + pop_front
    at capacity).

    Everything is metadata-sized except at most ONE bounded job: whole
    stale generations are deleted via footer counts; inside the single
    boundary generation, whole oldest FILES are deleted via footer
    ``doc_id`` statistics (doc_id ascending is the age proxy; writers
    emit files in doc_id order, so file min-stats order the files), and
    only the one straddling file is rewritten — a sort-limit over ≤ one
    file (bounded by ``maxRecordsPerFile``), never over the generation.
    The round-2 version global-sorted the whole boundary generation
    through a single-partition limit: at dlq_max_size=10⁸ that is a
    one-task job; this version's only Spark job is O(file).

    Crash-safe without renames: deletions are replayable (the next call
    recomputes overflow from what remains) and the straddling-file swap
    writes the ``trim-<orig>`` replacement before deleting the original
    (``_recover_trims`` resolves the both-exist window).  Returns the
    number of rows dropped.
    """
    _recover_trims(dlq_path)
    dirs = sorted(_dlq_batch_dirs(dlq_path), key=_generation_age_key)
    counts = [(d, tree_num_rows(d)) for d in dirs]
    total = sum(n for _d, n in counts)
    overflow = total - cfg.dlq_max_size
    if overflow <= 0:
        return 0
    dropped = 0
    for d, n in counts:  # oldest generation first
        if overflow <= 0:
            break
        if n <= overflow:
            shutil.rmtree(d, ignore_errors=True)
            overflow -= n
            dropped += n
            continue
        # boundary generation: drop its oldest `overflow` rows.  The
        # generation's manifest is DELETED first and rewritten after the
        # mutation — in the crash window between, counts fall back to
        # footer reads of the actual surviving files instead of trusting
        # stats that still reference deleted ones
        from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
            FILE_MANIFEST, collect_file_stats, data_files, get_committer,
            read_file_manifest, write_file_manifest,
        )

        old_man = read_file_manifest(d) or {}
        try:
            os.remove(os.path.join(d, FILE_MANIFEST))
        except OSError:
            pass
        acc = 0
        for path, rows, _min_doc in sorted(
            _gen_file_stats(d), key=lambda t: (t[2], t[0])
        ):
            if acc >= overflow:
                break
            if acc + rows <= overflow:
                os.remove(path)  # whole file older than the cut
                acc += rows
                continue
            # straddling file: keep its newest (rows - needed) rows
            keep_k = rows - (overflow - acc)
            stage = os.path.join(dlq_path, "_trimstage")
            shutil.rmtree(stage, ignore_errors=True)
            (
                spark.read.parquet(path)
                .orderBy(F.col("doc_id").desc()).limit(keep_k)
                .coalesce(1).write.mode("overwrite").parquet(stage)
            )
            part = next(
                fn for fn in sorted(os.listdir(stage))
                if fn.endswith(".parquet")
            )
            trimmed = os.path.join(d, _TRIM_PREFIX + os.path.basename(path))
            # publish the replacement through the commit seam's atomic
            # single-file put — a half-written trim file must never
            # exist under the trim-<orig> name, because _recover_trims
            # treats its presence as committed intent and deletes the
            # original.  preserve_mtime_of keeps the original's mtime:
            # generation age (drop-oldest order) derives from file
            # mtimes, and a fresh timestamp on the trimmed survivor
            # would make this OLDEST generation look newest.  Then
            # put-then-delete: replacement whole and visible first, the
            # original's deletion is the commit (see _recover_trims).
            from logfowd2_spark.streaming.commit import get_committer  # noqa: PLC0415

            get_committer(cfg.commit_protocol).put_file(
                trimmed, preserve_mtime_of=path,
                src_path=os.path.join(stage, part),
            )
            os.remove(path)
            shutil.rmtree(stage, ignore_errors=True)
            acc = overflow
        surviving = data_files(d)
        # the rewritten manifest keeps the generation's recorded codec
        # (the redrive n_tok contract) across the trim
        keep_codec = old_man.get("codec")
        write_file_manifest(get_committer(cfg.commit_protocol), d,
                            surviving, generation=0,
                            stats=collect_file_stats(d, surviving),
                            extra={"codec": keep_codec} if keep_codec
                            else None)
        dropped += acc
        overflow = 0
    return dropped


def dlq_reason_stats(spark: SparkSession, dlq_path: str) -> DataFrame:
    """Per-failure-reason/class counts — the reference's typed error
    counters (errors_total{type}, collector.rs; classes error.rs:28-62)
    over the quarantine table."""
    from logfowd2_spark.operators.parse import failure_class_expr  # noqa: PLC0415

    df = read_dlq(spark, dlq_path)
    return (
        df.groupBy(
            "failure_reason",
            failure_class_expr(F.col("failure_reason")).alias("failure_class"),
        )
        .agg(F.count("*").alias("n"))
    )


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
