"""Table tags (maintenance.create_tag/read_tagged/drop_tag): immutable
named cross-dir snapshots that PIN their generations against retention
expiry — Iceberg's tags-pin-snapshots contract on the plain layout.
The tagged read must stay byte-exact through COW deletes, deferred
tombstones, MERGE upserts, table consolidation, and a forced expiry
sweep; dropping the tag releases the pins to the next sweep.
"""

import os
import time

import pandas as pd
import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.maintenance import (
    compact_table,
    create_tag,
    delete_where,
    drop_tag,
    list_tags,
    merge_into,
    read_tagged,
    vacuum_expired_table,
)
from logfowd2_spark.streaming.pipeline import read_routed, run_pipeline

FAR_FUTURE = time.time() + 10 * 365 * 24 * 3600.0


@pytest.fixture()
def table(spark, tmp_path):
    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=300,
                                seed=21, n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_line_size=256,
        commit_protocol="rename",
        vacuum_retention_s=3600.0,  # deferred expiry: the tag contract
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    return cfg


def _norm(df):
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return (pdf[cols].astype(str).sort_values(cols)
            .reset_index(drop=True))


def test_tag_survives_full_lifecycle_and_expiry(spark, table):
    cfg = table
    at_tag = _norm(read_routed(spark, cfg))
    doc = create_tag(cfg, "v1")
    assert doc["dirs"] and doc["batch_log"]

    # mutate everything mutable
    pdf = read_routed(spark, cfg).toPandas()
    pod = pdf["pod_name"].value_counts().index[0]
    delete_where(spark, cfg, [("pod_name", "==", pod)])
    pod2 = read_routed(spark, cfg).toPandas()["pod_name"] \
        .value_counts().index[0]
    delete_where(spark, cfg, [("pod_name", "==", pod2)], mode="defer")
    ld = pdf["log_date"].iloc[0]
    merge_into(spark, cfg, spark.createDataFrame(
        [("tagged-new", "logs-app", ld, 3)],
        "doc_id string, sink_id string, log_date date, n_tok int"))
    compact_table(spark, cfg)
    # force the retention window: everything unpinned expires
    swept = vacuum_expired_table(cfg, now=FAR_FUTURE)
    assert swept is not None

    # the tag still answers byte-exact
    pd.testing.assert_frame_equal(_norm(read_tagged(spark, cfg, "v1")),
                                  at_tag)
    # while the live table moved on
    live = _norm(read_routed(spark, cfg))
    assert not live.equals(at_tag)
    assert "tagged-new" in set(live["doc_id"])

    # drop the pin: the next sweep may reap, and the tag is gone
    assert drop_tag(cfg, "v1") is True
    assert drop_tag(cfg, "v1") is False
    vacuum_expired_table(cfg, now=FAR_FUTURE)
    with pytest.raises((LookupError, FileNotFoundError)):
        read_tagged(spark, cfg, "v1").collect()


def test_tag_pins_consolidation_superseded_dirs(spark, table):
    """A tag created BEFORE consolidation keeps the per-batch dirs (the
    tag's only copy) across the pending-dir reap."""
    cfg = table
    at_tag = _norm(read_routed(spark, cfg))
    create_tag(cfg, "pre-compact")
    cfg.vacuum_retention_s = 0.0  # immediate reap... except for pins
    compact_table(spark, cfg)
    root = os.path.join(cfg.output_path, "routed")
    kept = [n for n in os.listdir(root) if n.startswith("batch_id=")]
    assert kept, "tag-pinned dirs must survive the reap"
    pd.testing.assert_frame_equal(
        _norm(read_tagged(spark, cfg, "pre-compact")), at_tag)
    # dropping the tag releases the dirs to the next sweep
    drop_tag(cfg, "pre-compact")
    vacuum_expired_table(cfg, now=FAR_FUTURE)
    assert not [n for n in os.listdir(root)
                if n.startswith("batch_id=")]


def test_tag_immutability_and_validation(spark, table):
    cfg = table
    create_tag(cfg, "once")
    with pytest.raises(ValueError, match="already exists"):
        create_tag(cfg, "once")
    assert set(list_tags(cfg)) == {"once"}
    for bad in ("..", "", "a/b", "_x"):
        with pytest.raises(ValueError, match="invalid tag name"):
            create_tag(cfg, bad)
    # immediate-vacuum configs cannot honor the pin contract: refused
    cfg.vacuum_retention_s = 0.0
    with pytest.raises(ValueError, match="deferred expiry"):
        create_tag(cfg, "unpinnable")


def test_claim_debris_is_not_a_tag(spark, table):
    """_put_file_exclusive's crash debris (dot-prefixed claim temps in
    _TAGS) must be invisible to the listing AND to the reaper's pin
    computation, while a genuinely corrupt tag file makes the sweep
    refuse to run rather than sweep with partial pins."""
    from logfowd2_spark.streaming.maintenance import _tags_root

    cfg = table
    create_tag(cfg, "real")
    troot = _tags_root(cfg)
    with open(os.path.join(troot, ".claim-deadbeef-real.json"), "w") as fh:
        fh.write('{"name": "real", "dirs": {"batch_id=zzz": 1}}')
    assert set(list_tags(cfg)) == {"real"}
    vacuum_expired_table(cfg)  # debris ignored, no phantom pins

    with open(os.path.join(troot, "corrupt.json"), "w") as fh:
        fh.write("{not json")
    assert set(list_tags(cfg)) == {"real"}  # listing stays lenient
    with pytest.raises(RuntimeError, match="partial pins"):
        vacuum_expired_table(cfg)  # the reaper does not
    os.remove(os.path.join(troot, "corrupt.json"))


def test_read_tagged_empty_table(spark, tmp_path):
    cfg = PipelineConfig(
        input_path=str(tmp_path / "in"),
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        vacuum_retention_s=3600.0,
    )
    os.makedirs(cfg.output_path, exist_ok=True)
    os.makedirs(cfg.checkpoint_path, exist_ok=True)
    doc = create_tag(cfg, "empty")
    assert doc["dirs"] == {}
    assert read_tagged(spark, cfg, "empty").count() == 0
