"""DLQ capacity bound (reference dead_letter_queue.rs:84-94: bounded
deque, drop-oldest on overflow) + single-pass accounting regression."""

import os

import pytest
from pyspark.sql import functions as F

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.dlq import enforce_dlq_cap, read_dlq, write_dlq


def _mk_rows(spark, n, batch_id, start=0):
    rows = [
        (f"doc-{i:06d}", "app", f"bad line {i}", "grok_no_match", 0)
        for i in range(start, start + n)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, source string, raw_line string, "
        "failure_reason string, retry_count int",
    )
    return df


def test_dlq_cap_drop_oldest(spark, tmp_path):
    dlq_path = str(tmp_path / "parse_failures")
    cfg = PipelineConfig(dlq_max_size=40)
    # three generations, oldest first: 30 + 40 + 10 = 80 rows
    write_dlq(_mk_rows(spark, 30, "g", 0), dlq_path, "batch-00000")
    write_dlq(_mk_rows(spark, 40, "g", 100), dlq_path, "batch-00001")
    write_dlq(_mk_rows(spark, 10, "g", 200), dlq_path, "batch-00002")

    dropped = enforce_dlq_cap(spark, dlq_path, cfg)
    assert dropped == 40
    left = read_dlq(spark, dlq_path)
    assert left.count() == 40
    # the whole oldest generation is gone (30 <= remaining overflow)
    assert not os.path.isdir(os.path.join(dlq_path, "batch_id=batch-00000"))
    # the boundary generation (batch-00001) was trimmed to its newest 30
    # rows by the deterministic doc_id-desc order
    b1 = (
        spark.read.parquet(os.path.join(dlq_path, "batch_id=batch-00001"))
        .select("doc_id").toPandas()["doc_id"]
    )
    assert len(b1) == 30
    assert min(b1) == "doc-000110"  # oldest 10 of that generation dropped
    # newest generation untouched
    b2 = spark.read.parquet(os.path.join(dlq_path, "batch_id=batch-00002"))
    assert b2.count() == 10


def test_dlq_cap_mixed_prefix_age_order(spark, tmp_path):
    """Drop-oldest across mixed generation tags must follow real age
    (file mtime), not lexicographic names: a 'redrive-*' generation
    written BEFORE a 'batch-*' one is the older and must be sacrificed
    first (lexicographic order would always drop 'batch-*' first)."""
    import time

    dlq_path = str(tmp_path / "parse_failures")
    cfg = PipelineConfig(dlq_max_size=20)
    write_dlq(_mk_rows(spark, 20, "g", 0), dlq_path, "redrive-00003")
    time.sleep(0.05)
    write_dlq(_mk_rows(spark, 20, "g", 100), dlq_path, "batch-00007")

    dropped = enforce_dlq_cap(spark, dlq_path, cfg)
    assert dropped == 20
    assert not os.path.isdir(os.path.join(dlq_path, "batch_id=redrive-00003"))
    assert os.path.isdir(os.path.join(dlq_path, "batch_id=batch-00007"))


def test_dlq_trim_crash_recovery(spark, tmp_path):
    """The boundary trim publishes the trimmed replacement BEFORE
    deleting the original file; a crash in that window leaves both, and
    the next cap enforcement must resolve it to exactly the trimmed
    rows (no duplicates, no loss)."""
    import shutil

    dlq_path = str(tmp_path / "parse_failures")
    cfg = PipelineConfig(dlq_max_size=30)
    write_dlq(_mk_rows(spark, 40, "g", 0), dlq_path, "batch-00000")
    gen = os.path.join(dlq_path, "batch_id=batch-00000")
    # simulate the crash window: a trimmed twin exists for some original
    orig = sorted(
        f for f in os.listdir(gen)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )[0]
    shutil.copyfile(os.path.join(gen, orig),
                    os.path.join(gen, "trim-" + orig))
    before = read_dlq(spark, dlq_path).count()  # both visible pre-recovery
    assert before > 40
    dropped = enforce_dlq_cap(spark, dlq_path, cfg)
    # recovery removed the original (its trim committed), then the cap
    # trimmed down to exactly dlq_max_size
    left = read_dlq(spark, dlq_path)
    assert left.count() == 30
    assert left.select("doc_id").distinct().count() == 30  # no duplicates
    assert dropped == 10


def test_dlq_cap_noop_under_limit(spark, tmp_path):
    dlq_path = str(tmp_path / "parse_failures")
    cfg = PipelineConfig(dlq_max_size=100)
    write_dlq(_mk_rows(spark, 40, "g"), dlq_path, "batch-00000")
    assert enforce_dlq_cap(spark, dlq_path, cfg) == 0
    assert read_dlq(spark, dlq_path).count() == 40


def test_single_pass_batch_accounting(spark, tmp_path):
    """The unified batch must (a) scan its input exactly once — the
    whole batch is ONE write job (+1 AQE shuffle-stage job); the round-1
    stats re-read added extra full-scan jobs — and (b) reconcile its
    observe()-based stats with the parquet-footer lineage."""
    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=1000, seed=5,
                                n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_line_size=256,
    )
    from logfowd2_spark.streaming.pipeline import (
        execute_unified_batch, load_routes,
    )

    cfg.routes = load_routes(spark, paths["routes"])
    pods = spark.read.parquet(paths["pods"])
    df = spark.read.parquet(paths["sequences"])

    sc = spark.sparkContext
    sc.setJobGroup("unified-batch", "single-pass check")
    try:
        m = execute_unified_batch(df, pods, cfg, "batch-jobcount")
    finally:
        sc.setJobGroup(None, None)
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("unified-batch"))
    assert 1 <= n_jobs <= 3, f"expected a single-pass write, got {n_jobs} jobs"

    # observe()-based stats == footer-based lineage, row for row
    assert m.conservation_ok()
    # typed failure taxonomy: per-reason counts sum to the DLQ total
    assert sum(m.failure_counts.values()) == m.parse_failures
    assert set(m.failure_counts) <= {
        "empty_line", "missing_fields", "bad_timestamp", "bad_level",
        "bad_path", "other",
    }
    lineage_by_sink: dict[str, int] = {}
    for r in m.partition_metrics:
        lineage_by_sink[r["sink_id"]] = (
            lineage_by_sink.get(r["sink_id"], 0) + r["rows_routed"]
        )
    assert lineage_by_sink == m.sink_counts


def test_all_failures_batch_commits(spark, tmp_path):
    """A poison batch (every row fails parsing) must commit with
    rows_routed=0 instead of wedging the pipeline (round-1 bug: the
    stats re-read threw UNABLE_TO_INFER_SCHEMA on the empty out dir)."""
    from logfowd2_spark.streaming.pipeline import run_pipeline

    import pyarrow as pa
    import pyarrow.parquet as pq

    from logfowd2_spark.codec import encode_lines_arrow
    import pandas as pd

    seq_dir = str(tmp_path / "in" / "sequences")
    os.makedirs(seq_dir)
    lines = pd.Series([f"totally unparseable {i}" for i in range(20)])
    toks = encode_lines_arrow(lines)
    tbl = pa.table(
        {
            "doc_id": pa.array([f"doc-{i:04d}" for i in range(20)]),
            "tokens": pa.array(list(toks), pa.list_(pa.int32())),
            "n_tok": pa.array([len(t) for t in toks], pa.int32()),
            "source": pa.array(["app"] * 20),
        }
    )
    pq.write_table(tbl, os.path.join(seq_dir, "part-00000.parquet"))
    base = synth.write_dataset(str(tmp_path / "dims"), n_rows=2, seed=1,
                               n_files=1)

    cfg = PipelineConfig(
        input_path=seq_dir,
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    m = run_pipeline(spark, cfg, base["pods"], base["routes"])
    assert len(m) == 1
    assert m[0].rows_in == 20
    assert m[0].rows_routed == 0
    assert m[0].parse_failures == 20
    # rerun: the manifest committed, nothing re-runs
    assert run_pipeline(spark, cfg, base["pods"], base["routes"]) == []
