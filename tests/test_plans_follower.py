"""Physical-plan hygiene for the consumer-group follower scans: a
poll must plan exactly the unconsumed data — manifest-pruned file
lists, no full-table listing — and a predicate-carrying poll must
prune at the MANIFEST layer (fewer scanned files), since at 100 TB the
difference between "scan the new batch" and "scan the table" is the
whole point of tailing.
"""

import pytest
from pyspark.sql import functions as F

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.follower import commit_cursor, poll
from logfowd2_spark.streaming.pipeline import run_pipeline


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fplans")
    paths = synth.write_dataset(str(d / "in"), n_rows=400, seed=17,
                                n_files=4)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        max_line_size=256,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    return cfg


def scanned_files(df) -> set:
    return {r["f"] for r in df.select(
        F.input_file_name().alias("f")).distinct().collect()}


def test_poll_scans_only_unconsumed_batches(spark, env):
    cfg = env
    first = poll(spark, cfg, "pp", max_batches=2)
    commit_cursor(cfg, "pp", first.cursor)
    nxt = poll(spark, cfg, "pp")
    consumed_files = scanned_files(first.df)
    new_files = scanned_files(nxt.df)
    assert new_files, "second wave must scan something"
    # the poll's scan never touches a consumed batch's files
    assert not (new_files & consumed_files)
    for f in new_files:
        assert any(f"batch_id={b}/" in f for b in nxt.batch_ids)


def test_poll_predicates_prune_at_manifest_layer(spark, env):
    cfg = env
    full = poll(spark, cfg, "pr1")
    # sink_id is a partition column carried in the manifests' partition
    # -path values: the pruned poll must plan strictly fewer files
    pruned = poll(spark, cfg, "pr2",
                  predicates=[("sink_id", "==", "logs-system-fatal")])
    n_full = len(scanned_files(full.df))
    n_pruned = len(scanned_files(pruned.df))
    assert n_pruned < n_full
    # bounds are advisory: the superset is allowed, emptiness is not
    # (unless the sink truly has no rows anywhere)
    got = pruned.df.filter(F.col("sink_id") == "logs-system-fatal")
    want = full.df.filter(F.col("sink_id") == "logs-system-fatal")
    assert got.count() == want.count()
