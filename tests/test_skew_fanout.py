"""Behavioral skew test: the fan-out write's AQE REBALANCE(sink_id)
must actually SPLIT a hot sink across tasks (runtime salting), not just
carry the hint in the plan (test_plans_physical pins the node; this
pins the effect).  At 100 TB a single hot sink/namespace is the
pipeline's canonical skew hazard — one giant task would serialize the
write and blow past executor memory."""

import os
from glob import glob

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.pipeline import run_pipeline


def test_hot_sink_write_is_split_across_tasks(spark, tmp_path):
    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=4000, seed=17,
                                n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_line_size=256,
    )
    conf_key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    prior = spark.conf.get(conf_key)
    # a small advisory so the hot partition is oversized relative to it
    # (the local test input is tiny; at scale the default 64 MiB plays
    # the same role against a multi-GB hot sink)
    spark.conf.set(conf_key, "16384")
    try:
        m = run_pipeline(spark, cfg, paths["pods"], paths["routes"])
        # route EVERY row to one sink: skew in the extreme
        import shutil

        shutil.rmtree(str(tmp_path / "out"), ignore_errors=True)
        shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)
        hot = PipelineConfig(
            input_path=paths["sequences"],
            output_path=str(tmp_path / "hot-out"),
            checkpoint_path=str(tmp_path / "hot-ckpt"),
            max_line_size=256,
            routes=[("*", "*", "logs-hot")],
        )
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        routes_path = str(tmp_path / "hot-routes.parquet")
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(
            {"source": ["*"], "level": ["*"], "sink_id": ["logs-hot"]}
        )), routes_path)
        mh = run_pipeline(spark, hot, paths["pods"], routes_path)
    finally:
        spark.conf.set(conf_key, prior)

    # every routed row landed on the single hot sink...
    assert list(mh[0].sink_counts) == ["logs-hot"]
    assert mh[0].conservation_ok()
    # ...and the write was SPLIT into multiple tasks/files — AQE
    # rebalance salted the oversized partition instead of funneling
    # the whole sink through one task
    files = glob(os.path.join(
        hot.output_path, "routed", "batch_id=*", "sink_id=logs-hot",
        "*", "*.parquet",
    ))
    assert len(files) >= 2, (
        f"hot sink written as {len(files)} file(s) — rebalance did not "
        "split the skewed partition"
    )
    # the baseline (normal routes) run stays healthy too
    assert m[0].conservation_ok()
