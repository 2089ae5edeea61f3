"""B1 parity: bulk_size caps rows per output file (the reference's bulk
batch bound, sender.rs:58-67, rebuilt as maxRecordsPerFile)."""

import os

import duckdb

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.pipeline import run_pipeline


def test_bulk_size_bounds_output_files(spark, tmp_path):
    paths = synth.write_dataset(str(tmp_path / "in"), n_rows=1500, seed=9, n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_line_size=256,
        bulk_size=300,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"])
    routed_dir = os.path.join(cfg.output_path, "routed")
    files = [
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(routed_dir)
        for f in fn if f.endswith(".parquet")
    ]
    assert files
    for f in files:
        n = duckdb.sql(f"SELECT count(*) FROM '{f}'").fetchone()[0]
        assert n <= 300, f"{f} has {n} rows > bulk_size"
