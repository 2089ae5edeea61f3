"""SparkSession construction tuned for the pipeline.

Local-mode testing stands in for a multi-executor cluster; every knob
here is chosen to also be correct at cluster scale (AQE on, skew-join
handling on, Arrow on, explicit shuffle partition sizing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "logfowd2_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the core count — on a real cluster
    this would be sized to ~2-3× total executor cores / target partition
    bytes; the point is that it is explicit, never the 200 default.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism of the master string when it is local[N]
        if master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = int(master[6:-1])
        else:
            shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # INT96 (Spark's legacy default) carries NO parquet statistics,
        # which would blind both row-group pruning and the manifest's
        # commit-time column bounds on every timestamp column; micros
        # is the modern standard type and is stats-bearing
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow IPC batch size for pandas/mapInArrow UDFs: bigger batches
        # amortize the per-batch Python round-trip in the decode kernel
        # (which is pure buffer arithmetic, so batch memory is the only
        # ceiling: 32k rows × ~200 B lines ≈ 6 MiB per in-flight batch).
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "32768"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # At 100 TB the input splits dominate: 128 MiB splits keeps
        # ~800k tasks for the scan, which AQE coalesces post-shuffle.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # AQE target partition size after rebalance/coalesce.  64-128 MiB
        # is right on a cluster; locally the default would coalesce a
        # small bench input to fewer partitions than cores, serializing
        # the fan-out write — override via env for local benching.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_BYTES", "67108864"),
        )
    )
    # On a cluster every executor brings its own shuffle disks, so I/O
    # bandwidth scales with executor count; on this single VM one virtio
    # disk is shared by all cores.  For scaling benches, point shuffle
    # space at tmpfs to emulate per-executor-local I/O (env-gated;
    # production leaves Spark's default local dirs).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
