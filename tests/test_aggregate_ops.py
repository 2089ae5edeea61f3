"""Aggregate-operator consistency: the standalone aggregate ops must
reproduce the pipeline's observe()-based accounting when run over the
same data — a cross-check between the two stat paths (in-flight
CollectMetrics vs post-hoc groupBy)."""

import os

import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.operators.aggregate import (
    namespace_stats,
    partition_manifest_rows,
    sink_stats,
)
from logfowd2_spark.streaming.pipeline import (
    read_routed,
    run_pipeline,
)


@pytest.fixture(scope="module")
def ran(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("aggops")
    paths = synth.write_dataset(str(d / "in"), n_rows=900, seed=33, n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        max_line_size=256,
    )
    m = run_pipeline(spark, cfg, paths["pods"], paths["routes"])
    return cfg, m[0]


def test_sink_stats_matches_observe_accounting(spark, ran):
    cfg, m = ran
    routed = read_routed(spark, cfg)
    got = {r["sink_id"]: r["event_count"] for r in sink_stats(routed).collect()}
    assert got == m.sink_counts
    # and the persisted stats table agrees too
    tbl = spark.read.parquet(os.path.join(cfg.output_path, "sink_stats"))
    persisted = {r["sink_id"]: r["event_count"] for r in tbl.collect()}
    assert persisted == m.sink_counts


def test_namespace_stats_shape(spark, ran):
    cfg, m = ran
    rows = namespace_stats(read_routed(spark, cfg)).collect()
    assert sum(r["event_count"] for r in rows) == m.rows_routed
    assert all(r["distinct_docs"] <= r["event_count"] for r in rows)


def test_partition_manifest_rows_conserves(spark, ran):
    cfg, m = ran
    rows = partition_manifest_rows(read_routed(spark, cfg)).collect()
    assert sum(r["rows_routed"] for r in rows) == m.rows_routed
    # footer-based lineage recorded in the manifest agrees on totals
    assert sum(r["rows_routed"] for r in m.partition_metrics) == m.rows_routed
