"""DLQ redrive tests (≈ reference retry task semantics: recover
transient failures, cap retries, drop permanently-failed)."""

import os

import pytest
from pyspark.sql import functions as F

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.dlq import dlq_stats, redrive_pass
from logfowd2_spark.streaming.pipeline import load_routes, run_pipeline

N_ROWS = 800


@pytest.fixture(scope="module")
def ran(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dlq")
    paths = synth.write_dataset(str(d / "in"), n_rows=N_ROWS, seed=11, n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        max_line_size=256,
        dlq_max_retry_count=2,
    )
    m = run_pipeline(spark, cfg, paths["pods"], paths["routes"])
    cfg.routes = load_routes(spark, paths["routes"])
    pods = spark.read.parquet(paths["pods"])
    return cfg, pods, m[0]


def test_redrive_recovers_transient_failure(spark, ran):
    cfg, pods, m = ran
    dlq_path = os.path.join(cfg.output_path, "parse_failures")
    n_fail = m.parse_failures
    assert n_fail > 0

    # inject a 'transient' failure: a perfectly valid line that was
    # quarantined (the reference's HTTP-failure case — data is fine)
    valid_line = (
        "2024-03-01T00:00:09Z ERROR "
        "/var/log/pods/ns-1_pod-1_pid-000001/main/0.log transient blip"
    )
    spark.createDataFrame(
        [("doc-transient", "app", valid_line, "transient", 0)],
        "doc_id string, source string, raw_line string, failure_reason string, retry_count int",
    ).withColumn("batch_id", F.lit("batch-injected")).write.mode("append").partitionBy(
        "batch_id"
    ).parquet(dlq_path)

    r1 = redrive_pass(spark, cfg, pods, generation=1)
    assert r1["recovered"] == 1            # the transient row came back
    assert r1["requeued"] == n_fail        # deterministic failures requeued
    assert r1["permanently_failed"] == 0

    # the recovered row landed in the routed output with full schema
    routed = spark.read.parquet(os.path.join(cfg.output_path, "routed"))
    rec = routed.filter(F.col("doc_id") == "doc-transient").collect()
    assert len(rec) == 1
    assert rec[0]["sink_id"] == "logs-app-error"
    assert rec[0]["n_tok"] == len(valid_line)

    # generation 2: retry_count hits the cap (2) for everything left
    r2 = redrive_pass(spark, cfg, pods, generation=2)
    assert r2["recovered"] == 0 and r2["requeued"] == n_fail
    r3 = redrive_pass(spark, cfg, pods, generation=3)
    assert r3["requeued"] == 0 and r3["permanently_failed"] == n_fail

    stats = dlq_stats(spark, dlq_path, cfg).collect()[0]
    assert stats["in_queue"] == 0
    assert stats["permanently_failed"] == n_fail

    # typed error taxonomy over the quarantine (error.rs:28-62 analogue)
    from logfowd2_spark.streaming.dlq import dlq_reason_stats

    rs = {r["failure_reason"]: (r["failure_class"], r["n"])
          for r in dlq_reason_stats(spark, dlq_path).collect()}
    assert sum(n for _c, n in rs.values()) == n_fail
    assert all(c == "schema" for _r, (c, _n) in rs.items())


def test_redrive_rerun_resumes_committed_generation(spark, tmp_path):
    """Crash-after-commit rerun: once a generation's _COMMITTED.json
    marker exists (written after all three writes), a rerun of the SAME
    generation must NOT rebuild — the consumed inputs may be partially
    deleted, so rebuilding would lose the already-removed generations'
    rows.  It resumes the input removal and returns the recorded
    counts."""
    import json

    from logfowd2_spark.streaming.dlq import (
        _dlq_batch_dirs,
        read_dlq,
        write_dlq,
    )

    cfg = PipelineConfig(
        input_path=str(tmp_path / "unused"),
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    dlq_path = os.path.join(cfg.output_path, "parse_failures")
    mk = lambda i: spark.createDataFrame(  # noqa: E731
        [(f"doc-{i}", "app", "bad line", "missing_fields", 0)],
        "doc_id string, source string, raw_line string, "
        "failure_reason string, retry_count int",
    )
    # two consumed-input generations still on disk (crash mid-removal)
    write_dlq(mk(0), dlq_path, "batch-00000")
    write_dlq(mk(1), dlq_path, "batch-00001")
    # one generation that arrived AFTER the commit (new batches ran
    # before the redrive retry): NOT in consumed_dirs — must survive
    write_dlq(mk(3), dlq_path, "batch-00002")
    # the committed redrive generation: data + marker recording inputs
    write_dlq(mk(2), dlq_path, "redrive-00001")
    new_dir = os.path.join(dlq_path, "batch_id=redrive-00001")
    recorded = {"recovered": 5, "requeued": 1, "permanently_failed": 0}
    with open(os.path.join(new_dir, "_COMMITTED.json"), "w") as fh:
        json.dump({"result": recorded,
                   "consumed_dirs": ["batch_id=batch-00000",
                                     "batch_id=batch-00001"]}, fh)

    res = redrive_pass(spark, cfg, pods=None, generation=1)
    assert res == recorded                      # no rebuild — recorded counts
    assert _dlq_batch_dirs(dlq_path) == [       # consumed removed, late kept
        os.path.join(dlq_path, "batch_id=batch-00002"), new_dir,
    ]
    rows = sorted(r["doc_id"] for r in read_dlq(spark, dlq_path).collect())
    assert rows == ["doc-2", "doc-3"]           # committed + late rows intact


def test_redrive_loop_backoff_schedule(spark, tmp_path):
    """The retry SCHEDULER (reference pool.rs:358-470 cadence +
    dead_letter_queue.rs:31-40 backoff): with a sink that recovers at
    attempt 3, the loop runs generation 0 immediately, doubles the delay
    after each recovery-free generation (failure streak via
    RuntimeGauges), honors the cap, delivers every transient row on the
    recovery attempt, and stops on its own when nothing is eligible."""
    from logfowd2_spark.streaming.dlq import redrive_loop
    from logfowd2_spark.streaming.metrics import RuntimeGauges

    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=400, seed=13,
                                n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        sink_fault_sink="logs-ingress",
        sink_fault_until_retry=3,
        dlq_max_retry_count=3,
    )
    m = run_pipeline(spark, cfg, paths["pods"], paths["routes"])
    cfg.routes = load_routes(spark, paths["routes"])
    pods = spark.read.parquet(paths["pods"])
    n_transient = sum(b.failure_counts.get("sink_unavailable", 0) for b in m)
    n_schema = sum(n for b in m for r, n in b.failure_counts.items()
                   if r != "sink_unavailable")
    assert n_transient > 0 and n_schema > 0

    slept: list[float] = []
    gauges = RuntimeGauges()
    out = redrive_loop(
        spark, cfg, pods,
        max_generations=10, base_delay_s=30.0, max_delay_s=100.0,
        gauges=gauges, sleep_fn=slept.append,
    )
    sched = out["schedule"]
    # gen 0 immediate; after one recovery-free generation the schedule
    # STARTS at the configured base delay (30 = 30*2^0, the reference's
    # documented base, dead_letter_queue.rs:31-40), then doubles (60);
    # a further failure would hit the cap (30*2^2=120 → 100)
    assert [s["delay_s"] for s in sched] == [0.0, 30.0, 60.0]
    assert slept == [30.0, 60.0]
    assert [s["recovered"] for s in sched] == [0, 0, n_transient]
    assert sched[-1]["generation"] == 2
    assert out["totals"]["recovered"] == n_transient
    assert out["consecutive_failures"] == 0  # recovery reset the streak

    # delivery matches the healthy-sink answer (pipe_transient_redrive's
    # invariant): every transient row routed to its sink exactly once
    routed = spark.read.parquet(os.path.join(cfg.output_path, "routed"))
    assert routed.filter(F.col("sink_id") == "logs-ingress").count() \
        == n_transient
    # nothing eligible remains; only capped schema rows are retained
    from logfowd2_spark.streaming.dlq import dlq_stats

    stats = dlq_stats(
        spark, os.path.join(cfg.output_path, "parse_failures"), cfg
    ).collect()[0]
    assert stats["in_queue"] == 0
    assert stats["permanently_failed"] == n_schema


def test_sink_fault_transient_recovery(spark, tmp_path):
    """End-to-end transient class (reference pool.rs:165-313 + retry
    loop pool.rs:358-470): with a fault-injected sink that recovers at
    attempt 2, the initial batch quarantines the sink's rows as
    'sink_unavailable' (class transient), the first redrive re-presents
    and REQUEUES them (attempt 1 still faulted, retry_count → 1), and
    the second redrive genuinely delivers them — routed output ends up
    with exactly the rows a healthy sink would have received."""
    from logfowd2_spark.streaming.dlq import dlq_reason_stats

    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=400, seed=13,
                                n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        sink_fault_sink="logs-ingress",
        sink_fault_until_retry=2,
    )
    m = run_pipeline(spark, cfg, paths["pods"], paths["routes"])
    cfg.routes = load_routes(spark, paths["routes"])
    pods = spark.read.parquet(paths["pods"])
    total = sum(b.rows_in for b in m)
    n_transient = sum(b.failure_counts.get("sink_unavailable", 0) for b in m)
    n_schema = sum(
        n for b in m for r, n in b.failure_counts.items()
        if r != "sink_unavailable"
    )
    assert n_transient > 0
    # conservation incl. the quarantined transient rows
    assert sum(b.rows_routed for b in m) + n_transient + n_schema == total

    routed_dir = os.path.join(cfg.output_path, "routed")
    dlq_path = os.path.join(cfg.output_path, "parse_failures")
    routed = spark.read.parquet(routed_dir)
    assert routed.filter(F.col("sink_id") == "logs-ingress").count() == 0

    rs = {r["failure_reason"]: (r["failure_class"], r["n"])
          for r in dlq_reason_stats(spark, dlq_path).collect()}
    assert rs["sink_unavailable"] == ("transient", n_transient)

    # attempt 1: sink still down — transient rows requeued, count bumped
    r1 = redrive_pass(spark, cfg, pods, generation=1)
    assert r1["recovered"] == 0
    assert r1["requeued"] == n_transient + n_schema
    # attempt 2: sink recovered — every transient row delivered
    r2 = redrive_pass(spark, cfg, pods, generation=2)
    assert r2["recovered"] == n_transient
    got = spark.read.parquet(routed_dir) \
        .filter(F.col("sink_id") == "logs-ingress").count()
    assert got == n_transient
    left = {r["failure_reason"]: r["n"]
            for r in dlq_reason_stats(spark, dlq_path).collect()}
    assert "sink_unavailable" not in left


def test_redrive_uses_recorded_codec_not_host_load(spark, tmp_path, monkeypatch):
    """The n_tok formula for recovered rows follows the codec RECORDED
    in the consumed quarantine generations' manifests (the codec that
    decoded the raw lines), not a fresh 'auto' resolution against the
    redrive-time loadavg — the cross-process divergence the round-4
    advice flagged."""
    from logfowd2_spark import config as config_mod
    from logfowd2_spark.streaming.commit import read_file_manifest
    from logfowd2_spark.streaming.dlq import redrive_pass

    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=200, seed=31,
                                n_files=1)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        codec="jvm",  # the run that quarantines decodes with jvm
        sink_fault_sink="logs-ingress",
        sink_fault_until_retry=1,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"])
    dlq_root = os.path.join(cfg.output_path, "parse_failures")
    gen_dirs = [os.path.join(dlq_root, n) for n in os.listdir(dlq_root)
                if n.startswith("batch_id=")]
    assert gen_dirs
    for d in gen_dirs:
        assert read_file_manifest(d)["codec"] == "jvm"

    # a LATER PROCESS redrives with codec='auto'; sabotage resolve_codec
    # so a fresh resolution would pick the OTHER codec — the recorded
    # one must still win
    cfg2 = PipelineConfig(
        input_path=cfg.input_path, output_path=cfg.output_path,
        checkpoint_path=cfg.checkpoint_path, codec="auto",
        sink_fault_sink="logs-ingress", sink_fault_until_retry=1,
    )
    cfg2.routes = load_routes(spark, paths["routes"])
    pods = spark.read.parquet(paths["pods"])
    calls = []

    def fake_resolve(codec, parallelism):
        calls.append(codec)
        return "arrow" if codec == "auto" else codec

    monkeypatch.setattr(config_mod, "resolve_codec", fake_resolve)
    res = redrive_pass(spark, cfg2, pods, generation=0)
    assert res["recovered"] > 0
    # the recovered batch's n_tok matches the jvm formula (= the healthy
    # no-fault run's answer); with ASCII synth data both formulas agree
    # numerically, so assert the DECISION instead: the recorded codec
    # was used and 'auto' was never re-resolved for the formula
    assert "auto" not in calls
    # the propagated codec survives into the new quarantine generation
    new_gens = [os.path.join(dlq_root, n) for n in os.listdir(dlq_root)
                if n.startswith("batch_id=redrive-")]
    for d in new_gens:
        assert read_file_manifest(d)["codec"] == "jvm"
