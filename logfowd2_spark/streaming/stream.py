"""Structured Streaming variant of the pipeline.

The reference is a continuous forwarder (inotify → channels → ES); its
Spark-native translation is a file-source stream: new parquet files
landing in the input directory are the analogue of new log lines
appearing in tailed files (SURVEY.md §2.1 S2).  Two entry points:

- ``streaming_pipeline``: readStream → (same transform_batch as batch
  mode) → per-sink partitioned parquet via ``foreachBatch``, with
  Spark's own checkpoint dir providing exactly-once file-source
  progress (replaces our manifest for the streaming path).
- ``windowed_level_counts``: event-time tumbling-window counts per
  (sink, level) with a watermark for late data — the streaming analogue
  of the reference's flush-interval batching (B2, sender.rs:40-55)
  upgraded from processing-time to event-time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.pipeline import transform_batch
from logfowd2_spark.synth import SEQUENCES_ARROW_SCHEMA  # noqa: F401 (doc)

SEQUENCES_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def read_sequences_stream(spark: SparkSession, cfg: PipelineConfig,
                          max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over the sequences directory.

    ``maxFilesPerTrigger`` is the micro-batch size knob — the analogue
    of the reference's read_chunk_size (watcher.rs:85).
    """
    return (
        spark.readStream.schema(SEQUENCES_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(cfg.input_path)
    )


def streaming_pipeline(spark: SparkSession, cfg: PipelineConfig,
                       pods: DataFrame, available_now: bool = True,
                       max_files_per_trigger: int = 4,
                       redrive_every: int = 0,
                       redrive_max_every: int | None = None,
                       redrive_log: list | None = None,
                       gauges=None):
    """Start the stream: each micro-batch runs the SAME single-pass
    unified transform+write as batch mode (``execute_unified_batch``),
    so the streaming path shares batch mode's output layout exactly —
    including the ``parse_failures/batch_id=...`` quarantine partitioning
    that the redrive pass consumes (one DLQ layout across modes) and the
    per-batch sink_stats table.  Returns the StreamingQuery.

    ``redrive_every=N`` wires the DLQ retry SCHEDULER into the stream:
    after every N committed micro-batches a redrive generation runs
    BETWEEN triggers (driver-side in ``foreachBatch``, exactly where the
    reference's retry task interleaves with its send loop,
    pool.rs:358-470).  Wall-clock backoff makes no sense inside a
    trigger cadence, so the backoff unit is micro-batches: a generation
    that recovers nothing while rows remain doubles the wait to the
    next attempt (N·2^(streak-1) batches, streak via ``RuntimeGauges``
    — the same counter that widens the adaptive timeout), CAPPED at
    ``redrive_max_every`` (default 10·N — the reference's 300 s cap is
    10x its 30 s base) so a long outage can never push the next attempt
    beyond a bounded horizon; any recovery resets the streak.  Each
    attempt is appended to ``redrive_log`` (generation, at_batch,
    result) for observability."""
    from logfowd2_spark.config import resolve_codec  # noqa: PLC0415
    from logfowd2_spark.streaming.pipeline import execute_unified_batch  # noqa: PLC0415

    # one codec per stream (see run_pipeline: the codecs differ
    # semantically on non-ASCII bytes — never flip mid-stream)
    cfg.codec = resolve_codec(cfg.codec,
                              spark.sparkContext.defaultParallelism)
    stream = read_sequences_stream(
        spark, cfg, max_files_per_trigger=max_files_per_trigger
    )
    if gauges is None:
        from logfowd2_spark.streaming.metrics import RuntimeGauges  # noqa: PLC0415

        gauges = RuntimeGauges()  # A6 gauges ride the stream loop too
    state = {"batches": 0, "next_at": redrive_every}

    def _maybe_redrive() -> None:
        import os  # noqa: PLC0415
        import time  # noqa: PLC0415

        from logfowd2_spark.streaming.dlq import (  # noqa: PLC0415
            next_redrive_generation,
            redrive_candidates,
            redrive_pass,
        )

        if not redrive_every or state["batches"] < state["next_at"]:
            return
        dlq_path = os.path.join(cfg.output_path, "parse_failures")
        if redrive_candidates(spark, dlq_path, cfg).limit(1).count() == 0:
            state["next_at"] = state["batches"] + redrive_every
            return
        gen = next_redrive_generation(dlq_path)
        t0 = time.perf_counter()
        result = redrive_pass(spark, cfg, pods, generation=gen)
        gauges.observe((time.perf_counter() - t0) * 1000.0,
                       failed=result["recovered"] == 0
                       and result["requeued"] > 0)
        # backoff in micro-batches: N·2^(streak-1) after a failure,
        # straight N after progress — same schedule shape as
        # redrive_loop, including its cap (without one, a long outage
        # pushes next_at past the stream's remaining lifetime and the
        # quarantine never drains after the sink recovers)
        cap = (redrive_max_every if redrive_max_every is not None
               else 10 * redrive_every)
        step = redrive_every * (
            2 ** max(0, gauges.consecutive_failures - 1)
            if gauges.consecutive_failures else 1
        )
        state["next_at"] = state["batches"] + min(step, cap)
        if redrive_log is not None:
            redrive_log.append({"generation": gen,
                                "at_batch": state["batches"], **result})

    # BOUNDED metrics state for a continuous stream: counters are
    # cumulative forever (folded into a carry record as batches leave
    # the window), histograms cover the trailing window — an unbounded
    # per-batch list would grow driver memory and per-trigger emit cost
    # linearly for the stream's whole lifetime
    from collections import deque  # noqa: PLC0415

    from logfowd2_spark.streaming.metrics import BatchMetrics  # noqa: PLC0415

    window: deque = deque(maxlen=256)
    carry = BatchMetrics()
    carry.is_carry = True  # excluded from histogram samples

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os  # noqa: PLC0415
        import time  # noqa: PLC0415

        from logfowd2_spark.streaming.checkpoint import (  # noqa: PLC0415
            BatchRecord, load_manifest, manifest_lock, save_manifest,
        )
        from logfowd2_spark.streaming.metrics import emit_metrics  # noqa: PLC0415

        t0 = time.perf_counter()
        bid = f"stream-{batch_id:05d}"
        m = execute_unified_batch(batch_df, pods, cfg, bid)
        m.wall_ms = (time.perf_counter() - t0) * 1000.0
        # record the commit in the SAME batch-log manifest the batch
        # driver writes: the table-maintenance stack (compact_table,
        # delete_where, as-of/between reads) and consumer-group
        # followers key off committed_batch_ids, so a streaming-
        # committed batch must appear there too.  Input-file dedup
        # stays Spark's job (the streaming source checkpoint); a
        # crash-replayed trigger rewrites the SAME deterministic batch
        # dir and the committed() guard keeps the log append-only.
        manifest_path = os.path.join(cfg.checkpoint_path, "manifest.json")
        # kept on the driver between triggers (foreachBatch is single-
        # threaded per query) so the steady state skips the O(committed
        # batches) re-parse — revalidated by (mtime_ns, size) against
        # the file, and the whole revalidate→record→save cycle runs
        # under manifest_lock: another writer (merge_into registering
        # its insert batch, recover_compactions backfilling) may save
        # between our load and save, and without the lock the stat
        # check only narrows the lost-update window, it cannot close it
        with manifest_lock(manifest_path):
            try:
                st = os.stat(manifest_path)
                sig = (st.st_mtime_ns, st.st_size)
            except OSError:
                sig = None
            if state.get("manifest_sig") != sig or "manifest" not in state:
                state["manifest"] = load_manifest(manifest_path)
            man = state["manifest"]
            if not man.committed(bid):
                man.record(BatchRecord(
                    batch_id=bid,
                    input_files=[],  # tracked by the stream's source log
                    rows_in=m.rows_in,
                    rows_parsed=m.rows_parsed,
                    parse_failures=m.parse_failures,
                    sink_counts=m.sink_counts,
                    partition_metrics=m.partition_metrics,
                    failure_counts=m.failure_counts,
                ))
                save_manifest(man, manifest_path)
                try:  # our own save is the new baseline for staleness
                    st = os.stat(manifest_path)
                    state["manifest_sig"] = (st.st_mtime_ns, st.st_size)
                except OSError:
                    state.pop("manifest_sig", None)
        state["batches"] += 1
        gauges.observe(m.wall_ms, failed=not m.conservation_ok())
        if len(window) == window.maxlen:
            old = window[0]  # evicted below — keep its counters
            carry.rows_in += old.rows_in
            carry.rows_routed += old.rows_routed
            carry.parse_failures += old.parse_failures
            carry.wall_ms += old.wall_ms
            for k, v in old.failure_counts.items():
                carry.failure_counts[k] = carry.failure_counts.get(k, 0) + v
        window.append(m)
        # same per-batch metrics exposition as the batch driver loop
        # (reference metrics/server.rs:185 scrape endpoint) — the
        # streaming path publishes the identical family set
        emit_metrics(cfg.output_path, [carry, *window], gauges,
                     commit_protocol=cfg.commit_protocol)
        _maybe_redrive()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", cfg.checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_dedup_stream(spark: SparkSession, cfg: PipelineConfig,
                          queryName: str = "dedup_stream",
                          ttl_ms: int = 24 * 3600 * 1000,
                          continuous: bool = False):
    """Custom stateful operator via ``applyInPandasWithState``:
    cross-micro-batch exact dedup by doc_id.  State per key is a single
    seen-flag; only a key's first occurrence within the TTL is emitted.
    This is the canonical shape for custom stateful streaming ops the
    built-in operators can't express (``dropDuplicates`` on a stream
    keeps unbounded state — this variant shows the user-controlled state
    surface INCLUDING its eviction).

    State is BOUNDED: every live key carries a processing-time timeout of
    ``ttl_ms``; when it fires the key's state is removed, so total state
    is O(distinct keys per TTL window), not O(stream lifetime).  A
    duplicate arriving after its key expired is re-emitted — the standard
    TTL-dedup trade (exactly the reference's own dedup horizon: it
    replays up to 10 s of events on restart and re-sends them,
    SURVEY.md §3.2; an unbounded exact guarantee needs an offline pass).

    ``continuous=True`` runs a periodic processing-time trigger instead
    of availableNow — required when ``ttl_ms`` is short relative to the
    input: with availableNow + armed short timeouts the planner keeps
    scheduling timeout-draining batches past the data, and a memory-sink
    query cannot be restarted on its checkpoint to observe eviction, so
    a live query polled via ``lastProgress`` is the observable shape.
    """
    import pandas as pd  # noqa: PLC0415

    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: PLC0415

    stream = read_sequences_stream(spark, cfg, max_files_per_trigger=1)

    def dedup_fn(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()  # TTL eviction: the key may dedup anew
            return
        if state.exists:
            seen = True
        else:
            seen = False
            state.update((1,))
        state.setTimeoutDuration(ttl_ms)  # (re)arm the TTL
        if not seen:
            first = None
            for pdf in pdf_iter:
                if len(pdf):
                    first = pdf.iloc[[0]][["doc_id", "source", "n_tok"]]
                    break
            if first is not None:
                yield first
        else:
            for _ in pdf_iter:  # drain
                pass

    out = stream.groupBy("doc_id").applyInPandasWithState(
        dedup_fn,
        outputStructType="doc_id string, source string, n_tok int",
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(queryName)
        .outputMode("append")
        .option("checkpointLocation", cfg.checkpoint_path)
    )
    if continuous:
        writer = writer.trigger(processingTime="500 milliseconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _fmt_session_ts(us: int) -> str:
    """µs epoch → microsecond-precision string (byte-comparable by the
    batch oracles)."""
    import pandas as pd  # noqa: PLC0415

    return pd.Timestamp(us * 1000).strftime("%Y-%m-%d %H:%M:%S.%f")


def _session_fold(stamps, s0, last, n, gap_us, key_val, closed):
    """The ONE session state machine both sessionizer backends run:
    fold sorted µs timestamps into the open session ``(s0, last, n)``,
    appending closed sessions to ``closed``.  A gap > ``gap_us`` closes
    the session IMMEDIATELY; a late-but-within-watermark event from an
    earlier micro-batch may PRECEDE the open session's bounds and
    merges by WIDENING (never move ``last`` backward — that would
    corrupt session_end and make the next gap check split a live
    session; no retroactive re-splitting — the standard
    streaming-sessionization contract).  Returns the updated
    ``(s0, last, n)``."""
    for t in stamps:
        if last is None:
            s0, last, n = t, t, 1
        elif t - last > gap_us:
            closed.append((key_val, _fmt_session_ts(s0),
                           _fmt_session_ts(last), n))
            s0, last, n = t, t, 1
        else:
            s0, last, n = min(s0, t), max(last, t), n + 1
    return s0, last, n


def sessionize(stream: DataFrame, key: str = "k", ts: str = "ts",
               gap_s: int = 7200, delay: str = "1 hour",
               key_ddl: str = "k int") -> DataFrame:
    """Session windows as a reusable CUSTOM STATEFUL streaming operator
    with EVENT-TIME timeouts (``applyInPandasWithState``) — the shape
    built-in operators can't express when per-session state is richer
    than a count.  Per key the state is the open session
    ``(start, last, n)``; an arriving event either extends it or closes
    it (gap exceeded ⇒ the closed session is EMITTED IMMEDIATELY, not
    at watermark), and the state's timeout is re-armed at
    ``last + gap`` in EVENT time, so a session with no successor closes
    exactly when the watermark (max event time − ``delay``) passes its
    gap deadline — at which point the state row is REMOVED (bounded
    state: O(open sessions), observable via ``lastProgress``'s
    ``stateOperators[].numRowsTotal``).

    The streaming upgrade of the reference's flush-interval close (B2,
    sender.rs:40-55) for session- rather than wall-clock windows.
    Returns the transformed (unstarted) DataFrame; the caller attaches
    ``writeStream``.  Timestamps are emitted as microsecond-precision
    strings so batch oracles can compare them byte-for-byte.
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: PLC0415

    gap_us = gap_s * 1_000_000

    def sessionize_fn(key_tuple, pdf_iter, state):
        if state.hasTimedOut:
            s0, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(key_tuple[0], _fmt_session_ts(s0), _fmt_session_ts(last),
                  n)],
                columns=[key, "session_start", "session_end", "n_events"],
            )
            return
        rows = pd.concat(list(pdf_iter))
        stamps = sorted(t.value // 1000 for t in rows[ts])  # ns → µs
        s0, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        s0, last, n = _session_fold(stamps, s0, last, n, gap_us,
                                    key_tuple[0], closed)
        state.update((s0, last, n))
        state.setTimeoutTimestamp((last + gap_us) // 1000)  # epoch ms
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[key, "session_start", "session_end", "n_events"],
            )

    return (
        stream.withWatermark(ts, delay)
        .groupBy(key)
        .applyInPandasWithState(
            sessionize_fn,
            outputStructType=(
                f"{key_ddl}, session_start string, session_end string, "
                "n_events int"
            ),
            stateStructType="s0 long, last long, n int",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def make_session_processor(key: str = "k", ts: str = "ts",
                           gap_s: int = 7200):
    """The ``transformWithStateInPandas`` processor behind
    ``sessionize_tws``, built at MODULE level so its logic is unit-
    testable without a Spark runner: tests drive ``handleInputRows`` /
    ``handleExpiredTimer`` directly against a fake handle (protobuf —
    which Spark's streaming Python runner needs and this sandbox lacks —
    is only required to RUN the stream, not to exercise the processor).
    Only the Spark wiring below stays env-gated."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming import StatefulProcessor  # noqa: PLC0415

    gap_us = gap_s * 1_000_000
    out_cols = [key, "session_start", "session_end", "n_events"]

    class SessionProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self.handle = handle
            self.session = handle.getValueState(
                "session", "s0 long, last long, n int"
            )

        def handleInputRows(self, key_tuple, rows, timerValues):
            stamps = sorted(
                t.value // 1000 for pdf in rows for t in pdf[ts]
            )
            if self.session.exists():
                s0, last, n = self.session.get()
                # re-arm: the old gap deadline is superseded
                for t_old in self.handle.listTimers():
                    self.handle.deleteTimer(t_old)
            else:
                s0, last, n = None, None, 0
            closed = []
            s0, last, n = _session_fold(stamps, s0, last, n, gap_us,
                                        key_tuple[0], closed)
            self.session.update((s0, last, n))
            self.handle.registerTimer((last + gap_us) // 1000)  # epoch ms
            if closed:
                yield pd.DataFrame(closed, columns=out_cols)

        def handleExpiredTimer(self, key_tuple, timerValues, info):
            if self.session.exists():
                s0, last, n = self.session.get()
                self.session.clear()
                yield pd.DataFrame(
                    [(key_tuple[0], _fmt_session_ts(s0),
                      _fmt_session_ts(last), n)],
                    columns=out_cols,
                )

        def close(self) -> None:
            pass

    return SessionProcessor()


def sessionize_tws(stream: DataFrame, key: str = "k", ts: str = "ts",
                   gap_s: int = 7200, delay: str = "1 hour",
                   key_ddl: str = "k int") -> DataFrame:
    """The SAME sessionizer on Spark 4's modern arbitrary-state API
    (``transformWithStateInPandas``): typed ValueState + explicit
    event-time TIMERS replace applyInPandasWithState's single state
    tuple + timeout conf.  Semantics are identical to ``sessionize``
    (a pytest asserts output equality on the same input; the processor
    itself is additionally unit-tested against ``_session_fold`` via
    ``make_session_processor`` + a fake handle, so only this Spark
    WIRING is trust-the-code where protobuf is absent); this variant
    exists because transformWithState is the forward-looking state API
    — per-key timer management (register/delete), multiple typed state
    variables, TTL support — and the pipeline should demonstrate both
    generations of the interface.  Requires the RocksDB state store
    provider (the caller sets
    ``spark.sql.streaming.stateStore.providerClass``) and a working
    ``google.protobuf`` for Spark's driver-side streaming Python runner
    — the comparison test skips, documented, where protobuf is absent
    (this sandbox; no pip installs allowed)."""
    return (
        stream.withWatermark(ts, delay)
        .groupBy(key)
        .transformWithStateInPandas(
            statefulProcessor=make_session_processor(key, ts, gap_s),
            outputStructType=(
                f"{key_ddl}, session_start string, session_end string, "
                "n_events int"
            ),
            outputMode="append",
            timeMode="eventTime",
        )
    )


def windowed_level_counts(spark: SparkSession, cfg: PipelineConfig,
                          pods: DataFrame, window: str = "1 minute",
                          watermark: str = "5 minutes"):
    """Event-time tumbling-window aggregation with late-data watermark:
    per (window, sink_id, level) event counts written as complete-mode
    memory table ``windowed_counts`` (test-observable)."""
    stream = read_sequences_stream(spark, cfg)
    routed, _dlq = transform_batch(stream, pods, cfg)
    agg = (
        routed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "sink_id", "level")
        .agg(F.count("*").alias("event_count"))
        .select(
            F.col("w.start").alias("window_start"),
            "sink_id", "level", "event_count",
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName("windowed_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
