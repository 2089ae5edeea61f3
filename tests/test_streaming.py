"""Structured Streaming tests: the streaming path must produce the same
routed totals as batch mode (one transform, two execution modes), and
the event-time windowed aggregation must match a batch recomputation."""

import os

import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.stream import streaming_pipeline, windowed_level_counts

N_ROWS = 1000


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    paths = synth.write_dataset(str(d / "in"), n_rows=N_ROWS, seed=7, n_files=4)
    return d, paths


def test_streaming_matches_batch(spark, dataset):
    d, paths = dataset
    pods = spark.read.parquet(paths["pods"])
    from logfowd2_spark.streaming.pipeline import load_routes, run_pipeline

    # batch reference run
    bcfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "batch-out"),
        checkpoint_path=str(d / "batch-ckpt"),
        max_line_size=256,
    )
    bm = run_pipeline(spark, bcfg, paths["pods"], paths["routes"])
    batch_counts = bm[0].sink_counts

    # streaming run (availableNow drains the directory then stops)
    scfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "stream-out"),
        checkpoint_path=str(d / "stream-ckpt"),
        max_line_size=256,
    )
    scfg.routes = load_routes(spark, paths["routes"])
    q = streaming_pipeline(spark, scfg, pods)
    q.awaitTermination(120)

    routed = spark.read.parquet(str(d / "stream-out" / "routed"))
    got = {
        r["sink_id"]: r["n"]
        for r in routed.groupBy("sink_id").count().withColumnRenamed("count", "n").collect()
    }
    assert got == batch_counts
    # multiple micro-batches actually happened (maxFilesPerTrigger=4 on 4
    # files → at least 1; checkpoint offsets exist)
    assert os.path.exists(str(d / "stream-ckpt" / "offsets"))

    # cross-mode DLQ layout: streaming quarantine uses the SAME
    # batch_id=... partition dirs as batch mode, so read_dlq sees every
    # quarantined row and the redrive pass can consume them (round-1 bug:
    # flat-file DLQ writes were silently dropped next to partitioned ones)
    from logfowd2_spark.streaming.dlq import read_dlq

    s_dlq = read_dlq(spark, str(d / "stream-out" / "parse_failures"))
    b_dlq = read_dlq(spark, str(d / "batch-out" / "parse_failures"))
    assert s_dlq.count() == b_dlq.count() == bm[0].parse_failures
    assert bm[0].parse_failures > 0
    dirs = os.listdir(str(d / "stream-out" / "parse_failures"))
    assert all(x.startswith("batch_id=") for x in dirs)
    # conservation across modes
    assert routed.count() + s_dlq.count() == N_ROWS


def test_windowed_event_time_counts(spark, dataset):
    d, paths = dataset
    pods = spark.read.parquet(paths["pods"])
    from logfowd2_spark.streaming.pipeline import load_routes, transform_batch

    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "win-out"),
        checkpoint_path=str(d / "win-ckpt"),
        max_line_size=256,
    )
    cfg.routes = load_routes(spark, paths["routes"])
    q = windowed_level_counts(spark, cfg, pods, window="1 minute")
    q.awaitTermination(120)

    got = {
        (str(r["window_start"]), r["sink_id"], r["level"]): r["event_count"]
        for r in spark.sql("SELECT * FROM windowed_counts").collect()
    }

    # batch recomputation of the same aggregation
    from pyspark.sql import functions as F

    df = spark.read.parquet(paths["sequences"])
    routed, _ = transform_batch(df, pods, cfg)
    want = {
        (str(r["window_start"]), r["sink_id"], r["level"]): r["event_count"]
        for r in routed.groupBy(
            F.window("ts", "1 minute").start.alias("window_start"),
            "sink_id", "level",
        ).agg(F.count("*").alias("event_count")).collect()
    }
    assert got == want and len(got) > 10


def test_streaming_redrive_recovers_transient_sink(spark, tmp_path):
    """The streaming edition of the pipe_transient_redrive invariant:
    a sink that rejects until retry attempt 2 quarantines its rows in
    the stream's micro-batches, the redrive scheduler wired into
    foreachBatch recovers them BETWEEN triggers, and the final routed
    table equals the healthy-sink batch run — same per-sink counts,
    same doc_ids, nothing lost or duplicated."""
    from logfowd2_spark.streaming.dlq import redrive_candidates, redrive_pass
    from logfowd2_spark.streaming.pipeline import load_routes, run_pipeline

    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=600, seed=17,
                                n_files=6)
    pods = spark.read.parquet(paths["pods"])

    # healthy-sink batch reference
    bcfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "healthy-out"),
        checkpoint_path=str(tmp_path / "healthy-ckpt"),
    )
    run_pipeline(spark, bcfg, paths["pods"], paths["routes"])
    healthy = spark.read.parquet(str(tmp_path / "healthy-out" / "routed"))

    # faulted stream: logs-ingress rejects attempts 0 and 1; redrive
    # after every micro-batch (6 files / 2 per trigger = 3 batches)
    scfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "stream-out"),
        checkpoint_path=str(tmp_path / "stream-ckpt"),
        sink_fault_sink="logs-ingress",
        sink_fault_until_retry=2,
    )
    scfg.routes = load_routes(spark, paths["routes"])
    log: list = []
    q = streaming_pipeline(spark, scfg, pods, max_files_per_trigger=2,
                           redrive_every=1, redrive_log=log)
    q.awaitTermination(180)

    # redrives genuinely ran BETWEEN micro-batches, not only at the end
    assert len(log) >= 2
    assert max(e["at_batch"] for e in log) >= 2
    assert sum(e["recovered"] for e in log) > 0

    # drain the tail quarantined by the last micro-batch (the stream
    # ended before its scheduler slot) with the same pass the scheduler
    # runs; attempt numbers continue, so the sink has recovered
    dlq_path = os.path.join(scfg.output_path, "parse_failures")
    from logfowd2_spark.streaming.dlq import next_redrive_generation

    for _ in range(3):
        if redrive_candidates(spark, dlq_path, scfg).limit(1).count() == 0:
            break
        redrive_pass(spark, scfg, pods,
                     generation=next_redrive_generation(dlq_path))

    routed = spark.read.parquet(str(tmp_path / "stream-out" / "routed"))
    got = {r["sink_id"]: r["n"] for r in
           routed.groupBy("sink_id").count()
           .withColumnRenamed("count", "n").collect()}
    want = {r["sink_id"]: r["n"] for r in
            healthy.groupBy("sink_id").count()
            .withColumnRenamed("count", "n").collect()}
    assert got == want
    assert (sorted(r["doc_id"] for r in routed.select("doc_id").collect())
            == sorted(r["doc_id"] for r in healthy.select("doc_id").collect()))


def test_streaming_emits_metrics_exposition(spark, tmp_path):
    """The streaming path publishes the same per-batch Prometheus text
    exposition as the batch driver (<output>/metrics/metrics.prom with
    the reference's metric families)."""
    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=200, seed=43,
                                n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    from logfowd2_spark.streaming.pipeline import load_routes

    cfg.routes = load_routes(spark, paths["routes"])
    pods = spark.read.parquet(paths["pods"])
    q = streaming_pipeline(spark, cfg, pods, max_files_per_trigger=1)
    q.awaitTermination(120)
    prom = open(os.path.join(cfg.output_path, "metrics",
                             "metrics.prom")).read()
    assert "logfowd_events_processed_total" in prom
    assert "logfowd_processing_duration_seconds_count" in prom
    assert "logfowd_network_ema_ms" in prom  # gauges ride the stream
