"""End-to-end pipeline test against the independent pandas oracle
(FIXTURES.md §4-§5): routed row sets with per-row token equality,
sink_stats exact equality, conservation invariant, determinism, resume.
"""

import os

import pandas as pd
import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.checkpoint import load_manifest
from logfowd2_spark.streaming.pipeline import read_routed, run_pipeline
from tests.oracle import oracle_transform

N_ROWS = 2000
MAX_LINE = 256  # small so the oversize-corruption rows actually truncate


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    paths = synth.write_dataset(str(d / "in"), n_rows=N_ROWS, seed=42, n_files=4)
    return d, paths


def make_cfg(d, paths, tag):
    return PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / f"out-{tag}"),
        checkpoint_path=str(d / f"ckpt-{tag}"),
        max_line_size=MAX_LINE,
    )


def oracle_outputs():
    pods = synth.gen_pods(seed=42)
    seq = synth.gen_sequences(N_ROWS, pods, seed=42)
    routes = [tuple(r) for r in synth.gen_routes().itertuples(index=False)]
    return oracle_transform(seq, pods, routes, MAX_LINE)


@pytest.fixture(scope="module")
def oracle(dataset):
    return oracle_outputs()


def run_and_read(spark, d, paths, tag, **kw):
    cfg = make_cfg(d, paths, tag)
    metrics = run_pipeline(spark, cfg, paths["pods"], paths["routes"], **kw)
    routed = read_routed(spark, cfg).toPandas()
    return cfg, metrics, routed


def normalize(pdf):
    pdf = pdf.copy()
    pdf["ts"] = pdf["ts"].astype(str).str.replace(" ", "T").str.slice(0, 19)
    pdf["log_date"] = pdf["log_date"].astype(str)
    cols = [
        "doc_id", "sink_id", "level", "namespace", "pod_name", "pod_id",
        "container_name", "source", "n_tok", "byte_len", "node",
        "workload_kind", "dim_hit", "ts", "log_date",
    ]
    return pdf[cols].sort_values("doc_id").reset_index(drop=True)


def test_e2e_matches_oracle(spark, dataset, oracle):
    d, paths = dataset
    cfg, metrics, routed = run_and_read(spark, d, paths, "main")
    o_routed, o_dlq, o_stats = oracle

    assert len(metrics) == 1
    m = metrics[0]
    # conservation invariant: rows_in == routed + failures
    assert m.conservation_ok()
    assert m.rows_in == N_ROWS
    assert m.parse_failures == len(o_dlq)

    got = normalize(routed)
    want = o_routed.copy()
    want["ts"] = want["ts"].str.slice(0, 19)
    want = normalize(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # per-sink aggregates exact (north-star contract)
    stats = (
        spark.read.parquet(os.path.join(cfg.output_path, "sink_stats"))
        .toPandas()[["sink_id", "event_count", "token_total", "byte_total"]]
        .sort_values("sink_id")
        .reset_index(drop=True)
    )
    o_stats = o_stats.sort_values("sink_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(stats, o_stats, check_dtype=False)


def test_dlq_contents(spark, dataset, oracle):
    d, paths = dataset
    cfg = make_cfg(d, paths, "main")  # reuse main run outputs
    _, o_dlq, _ = oracle
    dlq = spark.read.parquet(os.path.join(cfg.output_path, "parse_failures")).toPandas()
    assert sorted(dlq["doc_id"]) == sorted(o_dlq["doc_id"])
    # per-row failure-taxonomy agreement with the independent oracle
    got_r = dlq.sort_values("doc_id")[["doc_id", "failure_reason"]]
    want_r = o_dlq.sort_values("doc_id")[["doc_id", "failure_reason"]]
    assert got_r.values.tolist() == want_r.values.tolist()
    assert (dlq["retry_count"] == 0).all()


def test_jvm_codec_e2e_equivalence(spark, dataset, oracle):
    """The explicit jvm codec (pure-codegen chr decode + string-level
    sanitize) must produce row-identical output to the default
    (auto-resolved) path on the synthetic corpus (whose corruption
    classes are ASCII, where the byte- and string-level sanitize
    semantics provably coincide) — which also makes any codec='auto'
    resolution outcome row-equivalent here."""
    d, paths = dataset
    cfg = make_cfg(d, paths, "jvmc")
    cfg.codec = "jvm"
    metrics = run_pipeline(spark, cfg, paths["pods"], paths["routes"])
    assert metrics[0].conservation_ok()
    got = normalize(read_routed(spark, cfg).toPandas())
    # arrow side: reuses the main run's output when it exists (the rerun
    # is a manifest no-op), or produces it when running standalone
    _, _, arrow_routed = run_and_read(spark, d, paths, "main")
    want = normalize(arrow_routed)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_determinism(spark, dataset):
    d, paths = dataset
    _, _, r1 = run_and_read(spark, d, paths, "det1")
    _, _, r2 = run_and_read(spark, d, paths, "det2")
    pd.testing.assert_frame_equal(normalize(r1), normalize(r2))


def test_resume_micro_batches(spark, dataset):
    """Kill between batches → rerun → identical outputs, no loss/dup
    (FIXTURES.md §5 resume tier)."""
    d, paths = dataset
    cfg = make_cfg(d, paths, "resume")
    # run only the first of 2 micro-batches (2 files each), then 'crash'
    m1 = run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                      files_per_batch=2, max_batches=1)
    assert len(m1) == 1
    man = load_manifest(os.path.join(cfg.checkpoint_path, "manifest.json"))
    assert len(man.batches) == 1
    # resume: only the remaining batch runs
    m2 = run_pipeline(spark, cfg, paths["pods"], paths["routes"], files_per_batch=2)
    assert len(m2) == 1
    man = load_manifest(os.path.join(cfg.checkpoint_path, "manifest.json"))
    assert len(man.batches) == 2

    resumed = read_routed(spark, cfg).toPandas()
    _, _, whole = run_and_read(spark, d, paths, "whole")
    pd.testing.assert_frame_equal(normalize(resumed), normalize(whole))
    # rerun again: nothing new to do
    m3 = run_pipeline(spark, cfg, paths["pods"], paths["routes"], files_per_batch=2)
    assert m3 == []


def test_skip_existing_semantics(spark, dataset):
    """read_existing_on_startup=False ⇒ watermark advances, no rows
    (reference src/domain/file.rs:233-248)."""
    d, paths = dataset
    cfg = make_cfg(d, paths, "skip")
    cfg.read_existing_on_startup = False
    out = run_pipeline(spark, cfg, paths["pods"], paths["routes"])
    assert out == []
    man = load_manifest(os.path.join(cfg.checkpoint_path, "manifest.json"))
    assert len(man.batches) == 1  # committed as watermark
    assert not os.path.exists(os.path.join(cfg.output_path, "routed"))
