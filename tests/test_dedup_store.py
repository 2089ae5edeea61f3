"""Incremental dedup store e2e: run 2 flags planted duplicates against
run 1's signature store WITHOUT re-hashing run 1's corpus — the corpus
side of the dup plan reads only the stored signature/band tables (proved
via DataFrame.inputFiles), and the planted pairs surface as
incoming_vs_corpus with estimated Jaccard 1.0."""

import os

import pyarrow.parquet as pq
import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.dedup_store import (
    incoming_dup_pairs,
    store_paths,
)
from logfowd2_spark.streaming.pipeline import run_pipeline

N_PLANTED = 5


@pytest.fixture(scope="module")
def ran(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dedupstore")
    paths = synth.write_dataset(str(d / "in"), n_rows=400, seed=19, n_files=2)
    seq_dir = paths["sequences"]
    # plant duplicates: copy 5 token sequences from the FIRST input file
    # under fresh doc_ids into a third file (sorts last → lands in the
    # last batch, long after the originals were indexed)
    first = sorted(os.listdir(seq_dir))[0]
    tbl = pq.read_table(os.path.join(seq_dir, first)).slice(0, N_PLANTED)
    import pyarrow as pa

    planted = tbl.set_column(
        tbl.schema.get_field_index("doc_id"), "doc_id",
        pa.array([f"planted-{i}" for i in range(N_PLANTED)], pa.string()),
    )
    pq.write_table(planted, os.path.join(seq_dir, "part-zz-planted.parquet"))
    orig_ids = [str(v) for v in tbl.column("doc_id").to_pylist()]

    cfg = PipelineConfig(
        input_path=seq_dir,
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        dedup_store_enabled=True,
    )
    metrics = run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                           files_per_batch=1)
    return cfg, metrics, orig_ids


def test_planted_dups_flagged_against_corpus(spark, ran):
    cfg, metrics, orig_ids = ran
    assert len(metrics) == 3
    # every batch got indexed; the planted batch flagged pairs
    assert all(m.dedup["docs_indexed"] > 0 for m in metrics)
    # synthetic log lines share templates, so intra-batch near-dups are
    # genuine — but batch 0 has no corpus yet, so every pair it flags
    # must be incoming_vs_incoming
    dup = spark.read.parquet(store_paths(cfg)["dup_pairs"])
    b0 = dup.where("batch_id = 'batch-00000'")
    assert b0.where("pair_type <> 'incoming_vs_incoming'").count() == 0
    assert metrics[2].dedup["dup_pairs"] >= N_PLANTED
    hits = {
        (r["a_id"], r["b_id"]): (r["pair_type"], r["est_jaccard"])
        for r in dup.collect()
    }
    for i, orig in enumerate(orig_ids):
        key = (f"planted-{i}", orig)
        assert key in hits, f"planted pair {key} not flagged"
        ptype, est = hits[key]
        assert ptype == "incoming_vs_corpus"
        assert est == 1.0  # identical token sequence → identical signature


def test_corpus_side_reads_store_only(spark, ran):
    """The 100 TB contract: the dup plan for an incoming batch reads the
    incoming batch's WRITTEN signatures plus the stored corpus tables —
    never the corpus' raw input (no re-hash).  DataFrame.inputFiles is
    the ground truth for what the scan touches."""
    cfg, metrics, _ = ran
    paths = store_paths(cfg)
    sig2 = spark.read.parquet(
        os.path.join(paths["signatures"], "batch_id=batch-00002"))
    dup = incoming_dup_pairs(spark, cfg, sig2, exclude_batch="batch-00002")
    files = dup.inputFiles()
    assert files
    roots = {paths["signatures"], paths["bands"]}
    for f in files:
        local = f.split("://", 1)[-1]  # file:///x -> /x
        assert any(local.startswith(r) for r in roots), \
            f"dup plan reads outside the store: {f}"
    # raw sequence input never touched
    assert not any(cfg.input_path in f for f in files)
    # and the store's earlier batches ARE the corpus side
    assert any("batch_id=batch-00000" in f for f in files)


def test_rerun_is_idempotent(spark, ran):
    """Re-running the maintenance step for a batch overwrites its own
    store partitions — counts unchanged, no duplicate index rows."""
    from logfowd2_spark.streaming.dedup_store import update_dedup_store

    cfg, metrics, _ = ran
    docs = spark.read.parquet(
        os.path.join(cfg.input_path, "part-zz-planted.parquet")
    ).select("doc_id", "tokens")
    again = update_dedup_store(spark, cfg, "batch-00002", docs)
    assert again["dup_pairs"] == metrics[2].dedup["dup_pairs"]
    sig = spark.read.parquet(store_paths(cfg)["signatures"])
    assert sig.groupBy("doc_id").count().where("count > 1").count() == 0


def test_crashed_indexing_is_replayed_on_resume(spark, tmp_path):
    """A crash between a batch's commit and its store append must not
    silently drop the batch from the corpus: the resume sweep replays
    indexing for committed batches whose manifest completion record is
    missing (round-5 review finding)."""
    import shutil

    from logfowd2_spark.streaming.checkpoint import (
        load_manifest,
        save_manifest,
    )

    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=300, seed=37,
                                n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        dedup_store_enabled=True,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    mpath = os.path.join(cfg.checkpoint_path, "manifest.json")
    man = load_manifest(mpath)
    assert all(rec.dedup is not None for rec in man.batches.values())
    victim = list(man.batches)[1]
    sp = store_paths(cfg)

    # simulate the crash: completion record gone, store partitions gone
    man.batches[victim].dedup = None
    save_manifest(man, mpath)
    for key in ("signatures", "bands", "dup_pairs"):
        shutil.rmtree(os.path.join(sp[key], f"batch_id={victim}"),
                      ignore_errors=True)
    sig = spark.read.parquet(sp["signatures"])
    assert sig.where(f"batch_id = '{victim}'").count() == 0

    # resume: no new batches, but the sweep re-indexes the victim
    out = run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                       files_per_batch=1)
    assert out == []  # everything was already committed
    sig = spark.read.parquet(sp["signatures"])
    assert sig.where(f"batch_id = '{victim}'").count() > 0
    assert load_manifest(mpath).batches[victim].dedup is not None


def test_retry_with_single_batch_store(spark, tmp_path):
    """Idempotent retry when the retried batch is the ONLY one in the
    store: the rmtree leaves empty store roots, and the corpus probe
    must see 'no data', not choke on schema inference (round-5 review
    finding)."""
    from logfowd2_spark.streaming.dedup_store import update_dedup_store

    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=100, seed=41,
                                n_files=1)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        dedup_store_enabled=True,
    )
    docs = spark.read.parquet(paths["sequences"]).select("doc_id", "tokens")
    first = update_dedup_store(spark, cfg, "batch-00000", docs)
    again = update_dedup_store(spark, cfg, "batch-00000", docs)  # retry
    assert again == first
    dup = spark.read.parquet(store_paths(cfg)["dup_pairs"])
    assert dup.where("pair_type <> 'incoming_vs_incoming'").count() == 0
