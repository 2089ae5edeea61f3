"""MERGE INTO the routed table (``maintenance.merge_into``) —
copy-on-write upsert on the manifest layer: matched keys update their
shared non-key columns in place (only files actually holding matches
rewritten, row counts verified unchanged), unmatched keys insert as a
synthetic ``merge-NNNNN`` consolidated batch under the same two-phase
commit as cross-batch compaction.  Covers update-only, insert-only and
mixed merges, idempotent re-runs, partial update columns, consolidated-
generation merges, untouched-file preservation, and input validation."""

import os

import pytest
from pyspark.sql import functions as F

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.commit import (
    CONSOLIDATED_DIR,
    read_file_manifest,
    read_table_manifest,
)
from logfowd2_spark.streaming.maintenance import (
    compact_table,
    merge_into,
)
from logfowd2_spark.streaming.pipeline import read_routed, run_pipeline


def _mk(spark, tmp_path_factory, name, **kw):
    d = tmp_path_factory.mktemp(name)
    paths = synth.write_dataset(str(d / "in"), n_rows=600, seed=53,
                                n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        bulk_size=60,
        **kw,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    return cfg


def _norm(pdf):
    pdf = pdf.copy()
    pdf["ts"] = pdf["ts"].astype(str)
    pdf["log_date"] = pdf["log_date"].astype(str)
    return (pdf.sort_values("doc_id")
            .reindex(sorted(pdf.columns), axis=1).reset_index(drop=True))


def test_update_only_merge(spark, tmp_path_factory):
    cfg = _mk(spark, tmp_path_factory, "mrg-upd")
    before = read_routed(spark, cfg).toPandas()
    root = os.path.join(cfg.output_path, "routed")
    old_files = {
        n: set(read_file_manifest(os.path.join(root, n))["files"])
        for n in os.listdir(root) if n.startswith("batch_id=")
    }

    # patch 5 existing docs: bump n_tok, relabel level
    sample = before.sort_values("doc_id").head(5)
    updates = spark.createDataFrame(
        sample[["doc_id", "sink_id", "log_date"]]
        .assign(n_tok=999, level="PATCHED")
    )
    res = merge_into(spark, cfg, updates)
    assert res["updated_rows"] == 5
    assert res["inserted_rows"] == 0
    assert res["insert_batch_id"] is None
    assert res["files_rewritten"] >= 1

    after = read_routed(spark, cfg).toPandas()
    assert len(after) == len(before)  # updates never change row count
    got = after[after["doc_id"].isin(sample["doc_id"])]
    assert (got["n_tok"] == 999).all() and (got["level"] == "PATCHED").all()
    # absent columns kept their table values (partial update)
    merged = got.sort_values("doc_id").reset_index(drop=True)
    exp = sample.sort_values("doc_id").reset_index(drop=True)
    assert (merged["pod_name"].to_numpy()
            == before.set_index("doc_id").loc[merged["doc_id"]]
            ["pod_name"].to_numpy()).all()
    assert (exp["doc_id"].to_numpy() == merged["doc_id"].to_numpy()).all()
    # untouched rows byte-identical
    rest_a = _norm(after[~after["doc_id"].isin(sample["doc_id"])])
    rest_b = _norm(before[~before["doc_id"].isin(sample["doc_id"])])
    assert rest_a.equals(rest_b)
    # only hit files replaced; everything else carried by reference
    for n, files in old_files.items():
        man = read_file_manifest(os.path.join(root, n))
        assert files & set(man["files"]), "untouched files must carry"


def test_insert_only_then_idempotent_rerun(spark, tmp_path_factory):
    cfg = _mk(spark, tmp_path_factory, "mrg-ins")
    before = read_routed(spark, cfg).toPandas()
    updates = spark.createDataFrame(
        [("new-doc-%02d" % i, "logs-app", before["log_date"].iloc[0],
          7, "INFO", "pod-new", "ns-new") for i in range(8)],
        "doc_id string, sink_id string, log_date date, n_tok int, "
        "level string, pod_name string, namespace string",
    )
    res = merge_into(spark, cfg, updates)
    assert res == {**res, "updated_rows": 0, "inserted_rows": 8}
    mid = res["insert_batch_id"]
    assert mid and mid.startswith("merge-")

    root = os.path.join(cfg.output_path, "routed")
    tman = read_table_manifest(root)
    assert mid in tman["consolidated_ids"]
    man = read_file_manifest(os.path.join(root, CONSOLIDATED_DIR))
    assert mid in man["consolidates"]

    after = read_routed(spark, cfg).toPandas()
    assert len(after) == len(before) + 8
    got = after[after["doc_id"].str.startswith("new-doc-")]
    assert len(got) == 8
    assert (got["batch_id"] == mid).all()
    assert (got["pod_name"] == "pod-new").all()
    # columns the updates lacked read as null on inserted rows
    assert got["source"].isna().all()

    # idempotent re-run: the inserted keys now MATCH → update path,
    # zero new rows
    res2 = merge_into(spark, cfg, updates)
    assert res2["inserted_rows"] == 0
    assert res2["updated_rows"] == 8
    assert len(read_routed(spark, cfg).toPandas()) == len(before) + 8


def test_mixed_merge_and_consolidated_target(spark, tmp_path_factory):
    cfg = _mk(spark, tmp_path_factory, "mrg-mix")
    compact_table(spark, cfg, target_records_per_file=100_000)
    before = read_routed(spark, cfg).toPandas()
    sample = before.sort_values("doc_id").head(3)
    updates = spark.createDataFrame(
        [(d, s, ld, 5555) for d, s, ld in zip(
            sample["doc_id"], sample["sink_id"], sample["log_date"])]
        + [("brand-new", "logs-app", sample["log_date"].iloc[0], 5555)],
        "doc_id string, sink_id string, log_date date, n_tok int",
    )
    res = merge_into(spark, cfg, updates)
    assert res["updated_rows"] == 3 and res["inserted_rows"] == 1

    after = read_routed(spark, cfg).toPandas()
    assert len(after) == len(before) + 1
    assert (after.set_index("doc_id").loc[list(sample["doc_id"])
                                          + ["brand-new"]]["n_tok"]
            == 5555).all()
    # consolidated metadata survived the in-place update flip
    man = read_file_manifest(
        os.path.join(cfg.output_path, "routed", CONSOLIDATED_DIR))
    assert set(man["consolidates"]) >= set(
        read_table_manifest(os.path.join(cfg.output_path, "routed"))
        ["consolidated_ids"][:1])
    # as-of an ORIGINAL batch id excludes the merge batch but reflects
    # in-place updates (current manifests)
    from logfowd2_spark.streaming.maintenance import (
        committed_batch_ids,
        read_routed_as_of,
    )
    ids = committed_batch_ids(cfg)
    # the insert batch is itself part of the batch log now
    assert ids[-1] == res["insert_batch_id"]
    last_orig = [b for b in ids if not b.startswith("merge-")][-1]
    asof = read_routed_as_of(spark, cfg, last_orig).toPandas()
    assert "brand-new" not in set(asof["doc_id"])
    # ...and as-of the merge batch includes its inserts
    asof2 = read_routed_as_of(spark, cfg, ids[-1]).toPandas()
    assert "brand-new" in set(asof2["doc_id"])


def test_merge_validation(spark, tmp_path_factory):
    cfg = _mk(spark, tmp_path_factory, "mrg-val")
    dup = spark.createDataFrame(
        [("d", "s", "2021-01-01"), ("d", "s", "2021-01-01")],
        "doc_id string, sink_id string, log_date string",
    ).withColumn("log_date", F.col("log_date").cast("date"))
    with pytest.raises(ValueError, match="unique per key"):
        merge_into(spark, cfg, dup)
    with pytest.raises(ValueError, match="must carry"):
        merge_into(spark, cfg, dup.select("doc_id"))
