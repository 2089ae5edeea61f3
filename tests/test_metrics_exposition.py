"""Prometheus exposition tests: the emitted families carry the
reference's metric names (collector.rs:60-167, served at
metrics/server.rs:185) with values that match the BatchMetrics they
were derived from, and the pipeline publishes the file per batch."""

import math
import os

from logfowd2_spark.streaming.metrics import (
    BatchMetrics,
    RuntimeGauges,
    prometheus_exposition,
)


def _parse(text: str) -> dict[str, float]:
    out = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        key, val = line.rsplit(" ", 1)
        out[key] = float(val)
    return out


def _mk_batches() -> list[BatchMetrics]:
    m1 = BatchMetrics(
        rows_in=100, rows_routed=90, parse_failures=10,
        sink_counts={"a": 50, "b": 40},
        failure_counts={"bad_level": 7, "sink_unavailable": 3},
        partition_metrics=[{"rows_routed": 30}, {"rows_routed": 60}],
        wall_ms=2000.0,
    )
    m2 = BatchMetrics(
        rows_in=50, rows_routed=50, parse_failures=0,
        sink_counts={"a": 50},
        partition_metrics=[{"rows_routed": 50}],
        wall_ms=500.0,
    )
    return [m1, m2]


def test_families_match_batch_metrics():
    gauges = RuntimeGauges()
    gauges.observe(2000.0)
    gauges.observe(500.0, failed=True)
    text = prometheus_exposition(_mk_batches(), gauges)
    vals = _parse(text)

    assert vals['logfowd_events_processed_total{component="sender",status="success"}'] == 140
    assert vals['logfowd_events_processed_total{component="sender",status="error"}'] == 10
    # error taxonomy → reference error_type labels (schema→parse,
    # transient→network; collector.rs:115)
    assert vals['logfowd_errors_total{component="sender",error_type="parse"}'] == 7
    assert vals['logfowd_errors_total{component="sender",error_type="network"}'] == 3
    assert vals['logfowd_dead_letter_queue_size{queue_type="events"}'] == 10
    assert vals['logfowd_events_per_second{component="sender"}'] == 56.0  # 140/2.5s

    # batch_size histogram over per-file rows [30, 60, 50] with the
    # reference's buckets (collector.rs:76)
    assert vals['logfowd_batch_size_bucket{component="sender",le="10.0"}'] == 0
    assert vals['logfowd_batch_size_bucket{component="sender",le="50.0"}'] == 2
    assert vals['logfowd_batch_size_bucket{component="sender",le="100.0"}'] == 3
    assert vals['logfowd_batch_size_bucket{component="sender",le="+Inf"}'] == 3
    assert vals['logfowd_batch_size_sum{component="sender"}'] == 140
    assert vals['logfowd_batch_size_count{component="sender"}'] == 3

    # duration histogram over [2.0, 0.5] s
    k = 'logfowd_processing_duration_seconds'
    assert vals[f'{k}_bucket{{component="sender",operation="send_batch",le="0.5"}}'] == 1
    assert vals[f'{k}_bucket{{component="sender",operation="send_batch",le="5.0"}}'] == 2
    assert vals[f'{k}_count{{component="sender",operation="send_batch"}}'] == 2
    assert math.isclose(
        vals[f'{k}_sum{{component="sender",operation="send_batch"}}'], 2.5)

    # A6 gauges: EMA 0.9*2000 + 0.1*500 = 1850; streak 1 → timeout
    # max(30000*1.5, 3*1850) = 45000
    assert vals["logfowd_network_ema_ms"] == 1850.0
    assert vals["logfowd_adaptive_timeout_ms"] == 45000.0

    # family declarations present for every emitted family
    for fam in ("logfowd_events_processed_total", "logfowd_errors_total",
                "logfowd_dead_letter_queue_size", "logfowd_events_per_second",
                "logfowd_batch_size", "logfowd_processing_duration_seconds"):
        assert f"# TYPE {fam} " in text


def test_pipeline_publishes_exposition(spark, tmp_path):
    from logfowd2_spark import synth
    from logfowd2_spark.config import PipelineConfig
    from logfowd2_spark.streaming.pipeline import run_pipeline

    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=300, seed=5,
                                n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_line_size=256,
    )
    metrics = run_pipeline(spark, cfg, paths["pods"], paths["routes"])
    prom = os.path.join(cfg.output_path, "metrics", "metrics.prom")
    assert os.path.exists(prom)
    vals = _parse(open(prom).read())
    assert vals['logfowd_events_processed_total{component="sender",status="success"}'] \
        == sum(m.rows_routed for m in metrics)
    assert vals['logfowd_events_processed_total{component="sender",status="error"}'] \
        == sum(m.parse_failures for m in metrics)
