"""Table-maintenance tests: manifest-driven time travel and atomic
small-file compaction over the routed output."""

import os

import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.maintenance import (
    compact_batch,
    committed_batch_ids,
    read_routed_as_of,
)
from logfowd2_spark.streaming.pipeline import read_routed, run_pipeline


@pytest.fixture(scope="module")
def ran(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("maint")
    paths = synth.write_dataset(str(d / "in"), n_rows=1200, seed=21, n_files=4)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        max_line_size=256,
        bulk_size=50,  # tiny maxRecordsPerFile → many small files
    )
    metrics = run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                           files_per_batch=2)
    return cfg, metrics


def test_time_travel_reads_only_committed_prefix(spark, ran):
    cfg, metrics = ran
    ids = committed_batch_ids(cfg)
    assert len(ids) == 2
    first = read_routed_as_of(spark, cfg, ids[0])
    assert first.count() == metrics[0].rows_routed
    both = read_routed_as_of(spark, cfg, ids[1])
    assert both.count() == sum(m.rows_routed for m in metrics)
    with pytest.raises(ValueError):
        read_routed_as_of(spark, cfg, "batch-nope")


def test_compaction_preserves_rows_and_shrinks_files(spark, ran):
    cfg, metrics = ran
    ids = committed_batch_ids(cfg)
    before = (
        read_routed_as_of(spark, cfg, ids[0])
        .orderBy("doc_id").select("doc_id", "sink_id", "n_tok").toPandas()
    )
    stats = compact_batch(spark, cfg, ids[0], target_records_per_file=100_000)
    assert stats["rows"] == metrics[0].rows_routed
    assert stats["files_after"] < stats["files_before"]
    after = (
        read_routed_as_of(spark, cfg, ids[0])
        .orderBy("doc_id").select("doc_id", "sink_id", "n_tok").toPandas()
    )
    assert before.values.tolist() == after.values.tolist()
    # table total unchanged
    assert read_routed(spark, cfg).count() == sum(m.rows_routed for m in metrics)


def test_ndjson_bulk_export(spark, ran, tmp_path):
    """ES _bulk-shaped NDJSON export: 2 lines per event, action line
    carries the daily index + deterministic _id, doc line parses as
    JSON with the @timestamp field (reference make_body semantics)."""
    import json

    from logfowd2_spark.streaming.maintenance import export_ndjson_bulk

    cfg, metrics = ran
    ids = committed_batch_ids(cfg)
    out = str(tmp_path / "bulk")
    n = export_ndjson_bulk(spark, cfg, ids[0], out)
    assert n == metrics[0].rows_routed

    got = spark.read.text(out)
    # 2 physical NDJSON lines per event (action + document)
    rows = [r["value"] for r in got.collect()]
    assert len(rows) == 2 * n
    actions = [r for r in rows if r.startswith('{"index"')]
    docs = [r for r in rows if not r.startswith('{"index"')]
    assert len(actions) == n and len(docs) == n
    action, doc = json.loads(actions[0]), json.loads(docs[0])
    assert "_id" in action["index"] and "-" in action["index"]["_index"]
    assert "@timestamp" in doc and "doc_id" in doc
    # every sink dir present
    import os as _os

    sinks = {d.split("=", 1)[1] for d in _os.listdir(out) if d.startswith("sink_id=")}
    assert sinks == set(metrics[0].sink_counts)


def test_recover_interrupted_compaction(spark, ran):
    """Crash window between compact_batch's two renames: the ``_old_``
    dir holds the original data with no live dir — recovery must restore
    it (rows are never lost), and while un-recovered the debris is
    INVISIBLE to readers (underscore prefix: no phantom partition
    values, the round-2 '.old' suffix leaked into read_routed)."""
    from logfowd2_spark.streaming.commit import _old_path
    from logfowd2_spark.streaming.maintenance import recover_compactions

    cfg, metrics = ran
    ids = committed_batch_ids(cfg)
    root = os.path.join(cfg.output_path, "routed")
    batch_dir = os.path.join(root, f"batch_id={ids[1]}")
    # simulate the crash: data moved aside, swap never completed
    os.replace(batch_dir, _old_path(batch_dir))
    assert not os.path.isdir(batch_dir)
    # the in-flight state never surfaces as data (no bogus partitions)
    assert read_routed(spark, cfg).count() == metrics[0].rows_routed
    restored = recover_compactions(cfg)
    assert restored == [batch_dir]
    assert read_routed(spark, cfg).count() == sum(m.rows_routed for m in metrics)
