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
