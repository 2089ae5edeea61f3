"""Data-skipping micro-benchmark: what manifest pruning buys a point
lookup on the routed table.

Builds a many-batch routed table with the real pipeline, then measures
a pod point-lookup (``pod_name == X``) three ways:

  naive       spark.read over the table root + filter — lists and
              row-group-prunes EVERY file (what a reader without the
              manifest layer pays);
  manifest    ``scan_routed`` — files pruned driver-side from the
              commit-time membership metadata (bloom/value sets) before
              Spark lists anything;
  clustered   the same after ``compact_table`` with
              ``compact_cluster_cols=("pod_name",)`` — the sort-order
              rewrite makes per-file bounds disjoint, so the lookup
              keeps ~one file per partition.

Reports files listed + wall seconds per variant (identical counts
asserted).  File COUNTS are the scale-invariant signal: the sandbox
table is small, so wall-clock deltas here are driver/JVM overhead, but
files-listed is exactly the 10⁶-file table's I/O multiplier.

Usage: python tools/bench_skipping.py [n_rows] [n_files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from logfowd2_spark import synth  # noqa: E402
from logfowd2_spark.config import PipelineConfig  # noqa: E402
from logfowd2_spark.session import build_session  # noqa: E402
from logfowd2_spark.streaming.maintenance import compact_table  # noqa: E402
from logfowd2_spark.streaming.pipeline import (  # noqa: E402
    read_routed,
    run_pipeline,
    scan_routed,
)


def _timed_count(df):
    t0 = time.monotonic()
    n = df.count()
    return n, time.monotonic() - t0, len(df.inputFiles())


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    work = "/dev/shm/logfowd2_skip_bench"
    shutil.rmtree(work, ignore_errors=True)
    paths = synth.write_dataset(os.path.join(work, "in"), n_rows=n_rows,
                                seed=97, n_files=n_files)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=os.path.join(work, "out"),
        checkpoint_path=os.path.join(work, "ckpt"),
        compact_cluster_cols=("pod_name",),
    )
    spark = build_session("skip-bench")
    try:
        run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                     files_per_batch=1)
        root = os.path.join(cfg.output_path, "routed")
        total_files = sum(
            1 for _, _, fs in os.walk(root)
            for f in fs if f.endswith(".parquet")
        )
        # a pod from the middle of the table, not the global first row
        target = (read_routed(spark, cfg)
                  .select("pod_name").distinct().orderBy("pod_name")
                  .collect())[3][0]

        from pyspark.sql import functions as F
        naive = spark.read.option("basePath", root).parquet(root) \
            .filter(F.col("pod_name") == target)
        n0, t0, f0 = _timed_count(naive)

        n1, t1, f1 = _timed_count(
            scan_routed(spark, cfg, [("pod_name", "==", target)]))
        assert n1 == n0 > 0, (n0, n1)

        rows = compact_table(spark, cfg, target_records_per_file=2_000)
        n2, t2, f2 = _timed_count(
            scan_routed(spark, cfg, [("pod_name", "==", target)]))
        assert n2 == n0, (n0, n2)

        print(json.dumps({
            "rows_in_table": rows["rows"],
            "pod": target,
            "pod_rows": n0,
            "table_files": total_files,
            "naive": {"files": f0, "sec": round(t0, 3)},
            "manifest_pruned": {"files": f1, "sec": round(t1, 3)},
            "clustered_pruned": {"files": f2, "sec": round(t2, 3),
                                 "table_files_after_compaction":
                                     rows["files_after"]},
        }))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
