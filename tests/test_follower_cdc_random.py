"""Randomized CDC lifecycle: seeded op sequences over the routed table
(COW deletes, deferred tombstones, materialization, table
consolidation, MERGE upserts and inserts) interleaved with CDC polls,
asserting the replay invariant `inserts ∖ deletes == visible content`
at every commit point.  The fixed-path lifecycle test pins the happy
ordering; this one walks arbitrary orderings the fixed path can't.
(Rollback is excluded: a rollback is a content change the changelog
delivers faithfully, but it makes the oracle non-monotonic — covered
separately in test_changelog.)
"""

import collections
import random

import pytest
from pyspark.sql import functions as F

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.follower import commit_cursor, poll_changes
from logfowd2_spark.streaming.maintenance import (
    compact_table,
    delete_where,
    materialize_deletes,
    merge_into,
)
from logfowd2_spark.streaming.pipeline import read_routed, run_pipeline

OPS = ("cow", "defer", "mat", "compact", "merge_ins", "merge_upd", "poll")


def _apply(counts, got):
    if got.df is None:
        return
    rows = got.df.select("doc_id", "_change_type", "_change_generation",
                         "_change_source").collect()
    rows.sort(key=lambda r: (r["_change_type"] != "insert"
                             or r["_change_generation"] > 0,
                             r["_change_source"],
                             r["_change_generation"]))
    for r in rows:
        counts[r["doc_id"]] += 1 if r["_change_type"] == "insert" else -1


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_cdc_random_lifecycle(spark, tmp_path, seed):
    rng = random.Random(seed)
    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=300,
                                seed=seed, n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_line_size=256,
        commit_protocol="rename",
        vacuum_retention_s=3600.0,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    counts: collections.Counter = collections.Counter()
    group = f"rand-{seed}"
    merged_seq = 0

    def visible():
        return {r["doc_id"] for r in
                read_routed(spark, cfg).select("doc_id").collect()}

    def do_poll():
        got = poll_changes(spark, cfg, group)
        _apply(counts, got)
        commit_cursor(cfg, group, got.cursor)
        bad = {k: v for k, v in counts.items() if v not in (0, 1)}
        assert not bad, f"seed={seed}: corrupt multiset {bad}"
        live = {k for k, v in counts.items() if v == 1}
        assert live == visible(), f"seed={seed}: replay diverged"

    def pick_pod():
        pdf = read_routed(spark, cfg).select("pod_name").toPandas()
        pods = sorted(p for p in pdf["pod_name"].unique() if p is not None)
        return rng.choice(pods) if pods else None

    def merge_updates(n, new):
        nonlocal merged_seq
        pdf = read_routed(spark, cfg).toPandas()
        if pdf.empty:
            return None
        ld = pdf["log_date"].iloc[0]
        if new:
            rows = []
            for _ in range(n):
                rows.append((f"rnd-{seed}-{merged_seq}", "logs-app", ld, 9))
                merged_seq += 1
        else:
            take = pdf.sample(n=min(n, len(pdf)), random_state=seed)
            rows = [(d, s, l, 9) for d, s, l in zip(
                take["doc_id"], take["sink_id"], take["log_date"])]
        return spark.createDataFrame(
            rows, "doc_id string, sink_id string, log_date date, n_tok int")

    do_poll()  # initial inserts
    # a tag taken here must stay byte-frozen through every op below
    from logfowd2_spark.streaming.maintenance import create_tag, read_tagged

    create_tag(cfg, f"t{seed}")
    cols = sorted(read_routed(spark, cfg).columns)

    def frozen(df):
        pdf = df.toPandas()
        return (pdf[cols].astype(str).sort_values(cols)
                .reset_index(drop=True))

    at_tag = frozen(read_routed(spark, cfg))
    for step in range(10):
        op = rng.choice(OPS)
        if op in ("cow", "defer"):
            pod = pick_pod()
            if pod is not None:
                delete_where(spark, cfg, [("pod_name", "==", pod)],
                             mode="cow" if op == "cow" else "defer")
        elif op == "mat":
            materialize_deletes(spark, cfg)
        elif op == "compact":
            compact_table(spark, cfg)
        elif op == "merge_ins":
            u = merge_updates(2, new=True)
            if u is not None:
                merge_into(spark, cfg, u)
        elif op == "merge_upd":
            u = merge_updates(2, new=False)
            if u is not None:
                merge_into(spark, cfg, u)
        else:
            do_poll()
    do_poll()  # final convergence check
    import pandas as pd

    pd.testing.assert_frame_equal(
        frozen(read_tagged(spark, cfg, f"t{seed}")), at_tag)
