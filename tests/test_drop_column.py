"""Logical drop-column schema evolution (maintenance.drop_column):
every table-surface scan projects the column out — old batches, new
batches, followers — as pure metadata, reversibly; generation-axis
readers (snapshots, tags) keep showing committed history; table
rewrites (consolidation, merge) carry the drop list forward.
"""

import os

import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.follower import poll
from logfowd2_spark.streaming.maintenance import (
    compact_table,
    create_tag,
    drop_column,
    read_tagged,
    undrop_column,
)
from logfowd2_spark.streaming.pipeline import read_routed, run_pipeline


@pytest.fixture()
def table(spark, tmp_path):
    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=300,
                                seed=37, n_files=4)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_line_size=256,
        vacuum_retention_s=3600.0,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1, max_batches=2)
    return cfg, paths


def test_drop_column_surface(spark, table):
    cfg, paths = table
    before = read_routed(spark, cfg)
    assert "node" in before.columns
    n = before.count()

    res = drop_column(cfg, "node")
    assert res["dropped_columns"] == ["node"]
    after = read_routed(spark, cfg)
    assert "node" not in after.columns
    assert after.count() == n  # rows untouched

    # new batches committed AFTER the drop are surfaced without it too
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    df = read_routed(spark, cfg)
    assert "node" not in df.columns and df.count() > n
    # followers see the surfaced schema
    got = poll(spark, cfg, "g")
    assert "node" not in got.df.columns

    # the drop survives a consolidation's table-pointer rewrite
    compact_table(spark, cfg)
    assert "node" not in read_routed(spark, cfg).columns

    # reversible: the values were never destroyed
    undrop = undrop_column(cfg, "node")
    assert undrop["existed"] is True and undrop["dropped_columns"] == []
    revived = read_routed(spark, cfg)
    assert "node" in revived.columns
    assert revived.filter(revived["node"].isNull()).count() == 0


def test_drop_column_history_and_guards(spark, table):
    cfg, _ = table
    tag_before = create_tag(cfg, "pre-drop")
    assert tag_before["dirs"]
    drop_column(cfg, "workload_kind")
    # generation-axis readers keep committed history intact
    assert "workload_kind" in read_tagged(spark, cfg, "pre-drop").columns
    # partition/lineage columns are refused
    for col in ("batch_id", "sink_id", "log_date", "doc_id"):
        with pytest.raises(ValueError, match="cannot be dropped"):
            drop_column(cfg, col)
    # undropping a never-dropped column is a no-op report
    assert undrop_column(cfg, "node")["existed"] is False


def test_rename_column_surface(spark, table):
    from logfowd2_spark.streaming.maintenance import rename_column

    cfg, paths = table
    before = read_routed(spark, cfg).select("doc_id", "node").toPandas()
    res = rename_column(cfg, "node", "host")
    assert res["renamed_columns"] == {"node": "host"}
    df = read_routed(spark, cfg)
    assert "host" in df.columns and "node" not in df.columns
    got = df.select("doc_id", "host").toPandas()
    key = before.sort_values("doc_id").reset_index(drop=True)
    assert (got.sort_values("doc_id").reset_index(drop=True)["host"]
            == key["node"]).all()

    # new batches written after the rename surface under the new name
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    df = read_routed(spark, cfg)
    assert "host" in df.columns and "node" not in df.columns
    assert df.filter(df["host"].isNull()).count() == 0

    # drop by the SURFACED name resolves to the physical column
    drop_column(cfg, "host")
    assert "host" not in read_routed(spark, cfg).columns
    undrop_column(cfg, "node")

    # rename back = undo (mapping removed)
    res = rename_column(cfg, "host", "node")
    assert res["renamed_columns"] == {}
    assert "node" in read_routed(spark, cfg).columns


def test_rename_column_guards(spark, table):
    from logfowd2_spark.streaming.maintenance import rename_column

    cfg, _ = table
    with pytest.raises(ValueError, match="already exists"):
        rename_column(cfg, "node", "namespace")
    with pytest.raises(ValueError, match="cannot be renamed"):
        rename_column(cfg, "sink_id", "sink")
    with pytest.raises(ValueError, match="cannot be renamed"):
        rename_column(cfg, "node", "batch_id")
    with pytest.raises(ValueError, match="invalid column name"):
        rename_column(cfg, "node", "bad name")
