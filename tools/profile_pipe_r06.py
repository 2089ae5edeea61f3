"""Phase-level timing of one pipeline_e2e run (round-6 profiling).

Times: input read, transform+write job, post-write commit machinery
(file stats, manifests, DLQ cap), using the same config bench.py uses.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (frozen harness, reused for data/cfg parity)


def main() -> None:
    codec = sys.argv[1] if len(sys.argv) > 1 else "jvm"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_GRAFT_ADVISORY_BYTES", str(8 * 1024 * 1024))

    from logfowd2_spark.session import build_session

    data_dir = bench.ensure_pipe_data(bench.PIPE_ROWS)
    spark = build_session(app_name="pipe_profile", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)
    spark.read.parquet(f"{data_dir}/sequences").count()  # warm cache

    import shutil

    from logfowd2_spark.config import PipelineConfig
    from logfowd2_spark.streaming import pipeline as P

    out = "/tmp/logfowd2_profile_out"
    shutil.rmtree(out, ignore_errors=True)
    cfg = PipelineConfig(
        input_path=os.path.join(data_dir, "sequences"),
        output_path=os.path.join(out, "data"),
        checkpoint_path=os.path.join(out, "ckpt"),
        max_line_size=4096,
        shuffle_partitions=cpus,
        codec=codec,
    )
    cfg.validate()
    from logfowd2_spark.config import resolve_codec
    cfg.codec = resolve_codec(cfg.codec, cpus)
    cfg.routes = P.load_routes(spark, os.path.join(data_dir, "routes.parquet"))
    pods = spark.read.parquet(os.path.join(data_dir, "pods.parquet"))

    files = P.list_input_files(spark, cfg.input_path)
    t0 = time.perf_counter()
    df = spark.read.parquet(*files)
    rows_in = P._parquet_num_rows(files)
    t1 = time.perf_counter()
    print(f"read+footers: {t1-t0:.3f}s rows={rows_in}")

    # phase A: transform + observe + write (the main Spark job)
    from pyspark.sql import Observation
    out_dir = os.path.join(cfg.output_path, "routed", "batch_id=batch-00000")
    sinks = P._all_sinks(cfg)
    obs = Observation()
    unified = P.transform_batch_unified(df, pods, cfg).observe(
        obs, *P._observe_exprs(sinks))
    t2 = time.perf_counter()
    print(f"plan-build: {t2-t1:.3f}s")
    from logfowd2_spark.operators.route import repartition_for_write, write_routed
    write_routed(repartition_for_write(unified, cfg), out_dir,
                 mode="overwrite", max_records_per_file=cfg.bulk_size)
    t3 = time.perf_counter()
    print(f"transform+write job: {t3-t2:.3f}s")

    from logfowd2_spark.streaming.dlq import observation_values
    vals = observation_values(obs)
    t4 = time.perf_counter()
    print(f"observation_values: {t4-t3:.3f}s")

    from logfowd2_spark.streaming.commit import (
        collect_file_stats, data_files, get_committer, write_file_manifest,
    )
    committer = get_committer(cfg.commit_protocol)
    files_all = data_files(out_dir)
    t5 = time.perf_counter()
    print(f"data_files list ({len(files_all)}): {t5-t4:.3f}s")
    stats_all = collect_file_stats(out_dir, files_all,
                                   detail_cols=cfg.stats_detail_cols,
                                   spark=spark)
    t6 = time.perf_counter()
    print(f"collect_file_stats: {t6-t5:.3f}s")
    lineage = P._lineage_from_stats(
        [f for f in files_all if not f.startswith("sink_id=__dlq__/")],
        stats_all)
    P._move_dlq_partition(out_dir, os.path.join(cfg.output_path,
                          "parse_failures", "batch_id=batch-00000"), cfg)
    data_schema = unified.drop("sink_id", "log_date").schema
    write_file_manifest(committer, out_dir,
                        [f for f in files_all
                         if not f.startswith("sink_id=__dlq__/")],
                        generation=0, stats=stats_all,
                        committed_at=time.time(),
                        extra={"schema": data_schema.jsonValue(),
                               "operation": "append", "added": files_all})
    t7 = time.perf_counter()
    print(f"manifest+dlq-move: {t7-t6:.3f}s")
    agg = P._stats_from_observation(vals, sinks)
    agg.pop(P.DLQ_SINK, None)
    P._write_stats_pyarrow(os.path.join(cfg.output_path, "sink_stats",
                                        "batch_id=batch-00000"), agg)
    from logfowd2_spark.streaming.dlq import enforce_dlq_cap
    enforce_dlq_cap(spark, os.path.join(cfg.output_path, "parse_failures"),
                    cfg)
    t8 = time.perf_counter()
    print(f"stats-write+dlq-cap: {t8-t7:.3f}s")
    print(f"TOTAL: {t8-t0:.3f}s  codec={cfg.codec} lineage={len(lineage)}")
    spark.stop()


if __name__ == "__main__":
    main()
