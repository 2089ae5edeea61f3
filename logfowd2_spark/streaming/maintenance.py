"""Table maintenance: snapshot reads and small-file compaction.

The manifest (checkpoint.py) already gives batch-granular lineage —
these operators turn it into Iceberg-style table services on the plain
partitioned-parquet layout (SURVEY.md §7 plan-B):

- ``read_routed_as_of``: time travel — read the routed table as of a
  committed batch (snapshot isolation comes free from batch-atomic
  commits: uncommitted/later batch dirs are simply not selected).
- ``compact_batch``: rewrite one batch's fan-out output into
  target-sized files (the analogue of Iceberg's rewrite_data_files /
  ES segment merges).  Read → coalesced rewrite into a temp dir →
  footer-verified row-count equality → atomic directory swap, so a
  crash mid-compaction never loses or duplicates rows.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.checkpoint import load_manifest


def committed_batch_ids(cfg: PipelineConfig) -> list[str]:
    man = load_manifest(os.path.join(cfg.checkpoint_path, "manifest.json"))
    return list(man.batches.keys())  # insertion order == commit order


def resolve_batch_paths(root: str, batch_id: str) -> list[str]:
    """The scan paths for one batch dir: resolved through its committed
    ``_FILES.json`` manifest when present (snapshot-isolated against a
    concurrent compaction's generation flip — streaming/commit.py), else
    the directory itself (legacy dirs; correct whenever no rewrite is
    racing)."""
    from logfowd2_spark.streaming.commit import read_file_manifest  # noqa: PLC0415

    d = os.path.join(root, f"batch_id={batch_id}")
    man = read_file_manifest(d)
    if man is not None:
        return [os.path.join(d, rel) for rel in man["files"]]
    return [d] if os.path.isdir(d) else []


def read_routed_as_of(spark: SparkSession, cfg: PipelineConfig,
                      batch_id: str) -> DataFrame:
    """The routed table as of (and including) ``batch_id`` — only batch
    dirs committed up to that point are scanned (partition pruning by
    construction: later data is never listed, let alone read), and each
    batch's file list comes from its manifest pointer, so an in-place
    compaction racing this reader is invisible (old-or-new generation,
    never a mix).

    Heals interrupted compactions first: after a mid-compaction crash
    the batch's live dir may not be fully published yet — without
    recovery the batch would be silently absent from the snapshot."""
    recover_compactions(cfg)
    ids = committed_batch_ids(cfg)
    if batch_id not in ids:
        raise ValueError(f"batch {batch_id!r} is not committed")
    upto = ids[: ids.index(batch_id) + 1]
    root = os.path.join(cfg.output_path, "routed")
    paths = [p for b in upto for p in resolve_batch_paths(root, b)]
    return spark.read.option("basePath", root).parquet(*paths)


from logfowd2_spark.ioutil import tree_num_files as _tree_num_files  # noqa: E402
from logfowd2_spark.ioutil import tree_num_rows as _tree_num_rows  # noqa: E402


def recover_compactions(cfg: PipelineConfig) -> list[str]:
    """Heal interrupted compaction commits under the routed root via the
    configured commit protocol (streaming/commit.py): restores originals
    from ``_old_`` safety dirs (rename protocol) or replays commit-ready
    stages (put protocol).  Returns the batch dirs healed."""
    from logfowd2_spark.streaming.commit import get_committer  # noqa: PLC0415

    return get_committer(cfg.commit_protocol).recover(
        os.path.join(cfg.output_path, "routed")
    )


def vacuum_expired_table(cfg: PipelineConfig,
                         now: float | None = None) -> dict[str, list[str]]:
    """Snapshot-expiry maintenance over the whole routed table: run
    ``vacuum_expired`` (commit.py) on every batch dir, reaping retired
    generations older than ``cfg.vacuum_retention_s``.  Metadata-only —
    manifest reads plus deletes of expired files; no Spark job.  Returns
    {batch_dir_name: removed_files} for the dirs that changed."""
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        get_committer, vacuum_expired,
    )

    committer = get_committer(cfg.commit_protocol)
    root = os.path.join(cfg.output_path, "routed")
    out: dict[str, list[str]] = {}
    if not os.path.isdir(root):
        return out
    for name in sorted(os.listdir(root)):
        if not name.startswith("batch_id="):
            continue
        removed = vacuum_expired(committer, os.path.join(root, name),
                                 cfg.vacuum_retention_s, now=now)
        if removed:
            out[name] = removed
    return out


def export_ndjson_bulk(spark: SparkSession, cfg: PipelineConfig,
                       batch_id: str, out_dir: str) -> int:
    """Export one committed batch as Elasticsearch ``_bulk``-shaped
    NDJSON — the reference's actual wire format (make_body,
    pool.rs:821-849): per event an action line (deterministic ``_id``,
    daily index name ≈ pool.rs:856-865) followed by the document line
    (ISO-8601 ``@timestamp``, message fields).  Written with Spark's
    text sink partitioned by sink, one pass, no driver collect.

    Returns the number of events exported (2 NDJSON lines per event).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    root = os.path.join(cfg.output_path, "routed")
    batch_dir = os.path.join(root, f"batch_id={batch_id}")
    paths = resolve_batch_paths(root, batch_id) or [batch_dir]
    df = spark.read.option("basePath", batch_dir).parquet(*paths)
    action = F.concat(
        F.lit('{"index":{"_index":"'),
        F.col("sink_id"), F.lit("-"),
        F.date_format("ts", "yyyy.MM.dd"),
        F.lit('","_id":"'), F.md5(F.col("doc_id")), F.lit('"}}'),
    )
    doc = F.to_json(F.struct(
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").alias("@timestamp"),
        F.col("doc_id"), F.col("source"), F.col("level"),
        F.col("namespace"), F.col("pod_name"), F.col("container_name"),
        F.col("n_tok"), F.col("byte_len"),
    ))
    lines = df.select(
        "sink_id",
        F.concat(action, F.lit("\n"), doc).alias("value"),
    )
    (
        lines.hint("rebalance", "sink_id")
        .write.mode("overwrite").partitionBy("sink_id").text(out_dir)
    )
    # events exported == batch rows, counted over the SAME resolved
    # file set the export read (a directory walk would double-count in
    # the unrecovered window of an interrupted generation swap); a
    # manifest-bearing dir answers from its commit-time stats
    from logfowd2_spark.streaming.commit import manifest_rows  # noqa: PLC0415

    if paths == [batch_dir]:
        return _tree_num_rows(batch_dir)
    n = manifest_rows(batch_dir)
    if n is not None:
        return n
    import pyarrow.parquet as pq  # noqa: PLC0415

    return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)


def compact_batch(spark: SparkSession, cfg: PipelineConfig, batch_id: str,
                  target_records_per_file: int = 1_000_000) -> dict:
    """Compact one committed batch dir to ~target-sized files.

    One pass: read the batch subtree, REBALANCE by the partition keys
    (AQE sizes output splits), rewrite into the committer's staging dir
    (``_stage_<name>``: underscore-prefixed, so Spark partition
    discovery never sees in-flight data), verify row counts from parquet
    footers, then commit via a MANIFEST FLIP (``manifest_swap``): the
    new generation's files are published under fresh unique names, the
    batch's ``_FILES.json`` pointer is atomically replaced, and only
    then is the old generation vacuumed — a manifest-resolving reader
    racing the swap sees exactly-old or exactly-new rows, never a mix.
    Crash recovery is ``recover_compactions`` (run here on entry, at
    pipeline startup, and in ``read_routed_as_of``), so rows are never
    lost, only a compaction retried.
    Returns {files_before, files_after, rows}.
    """
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        collect_file_stats, data_files, get_committer, manifest_swap,
        stage_path,
    )

    import pyarrow.parquet as pq  # noqa: PLC0415

    committer = get_committer(cfg.commit_protocol)
    recover_compactions(cfg)
    root = os.path.join(cfg.output_path, "routed")
    batch_dir = os.path.join(root, f"batch_id={batch_id}")
    if not os.path.isdir(batch_dir):
        raise ValueError(f"no such batch dir: {batch_dir}")
    tmp = stage_path(batch_dir)
    shutil.rmtree(tmp, ignore_errors=True)

    # read AND count through the manifest resolution: a directory walk
    # would pick up unreferenced files (a deliberately deferred vacuum)
    # and the rewrite would silently COMMIT the doubled rows — both
    # sides of the row-count guard would agree on the wrong number.
    # tree_num_rows/files are manifest-resolving, so a manifest-bearing
    # batch dir answers from commit-time stats with zero footer opens.
    paths = resolve_batch_paths(root, batch_id) or [batch_dir]
    files_before = _tree_num_files(batch_dir)
    df = spark.read.option("basePath", batch_dir).parquet(*paths)
    (
        df.hint("rebalance", "sink_id")
        .write.mode("overwrite")
        .partitionBy("sink_id", "log_date")
        .option("maxRecordsPerFile", str(target_records_per_file))
        .parquet(tmp)
    )
    if paths == [batch_dir]:
        rows_before = _tree_num_rows(batch_dir)
    else:
        rows_before = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    # ONE footer pass over the fresh generation serves both the verify
    # guard and the swapped-in manifest's stats
    new_files = data_files(tmp)
    new_stats = collect_file_stats(tmp, new_files)
    rows_after = sum(s["rows"] for s in new_stats.values())
    if rows_before != rows_after:  # never swap a lossy rewrite
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {rows_before} -> {rows_after}"
        )
    # vacuum_retention_s > 0 defers the old generation's removal to the
    # vacuum_expired maintenance pass (snapshot expiry), so a reader
    # that resolved the pre-swap manifest survives flip AND vacuum
    manifest_swap(committer, batch_dir, tmp, stats=new_stats,
                  vacuum=cfg.vacuum_retention_s <= 0,
                  retain_previous=cfg.vacuum_retention_s > 0)
    return {
        "files_before": files_before,
        "files_after": _tree_num_files(batch_dir),
        "rows": rows_after,
    }
