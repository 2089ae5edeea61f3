"""CLI driver: ``spark-submit --py-files logfowd2_spark.zip -m`` or
``python -m logfowd2_spark`` — the rebuild of the reference's ``main()``
(src/main.rs:61-192), collapsed to: load config → build session → run
uncommitted batches → print metrics.
"""

from __future__ import annotations

import argparse
import json
import sys

from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.session import build_session
from logfowd2_spark.streaming.metrics import RuntimeGauges
from logfowd2_spark.streaming.pipeline import run_pipeline


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="logfowd2_spark")
    ap.add_argument("--config", help="JSON config file (or $CFG_PATH)")
    ap.add_argument("--input", help="sequences parquet dir (overrides config)")
    ap.add_argument("--output", help="output root dir (overrides config)")
    ap.add_argument("--checkpoint", help="checkpoint dir (overrides config)")
    ap.add_argument("--pods", help="pods dimension parquet (required to "
                                   "run ingest batches / --redrive)")
    ap.add_argument("--routes", help="routes map parquet (required to "
                                     "run ingest batches)")
    ap.add_argument("--files-per-batch", type=int, default=0,
                    help="0 = single batch over the whole input")
    ap.add_argument("--master", default=None, help="spark master override")
    ap.add_argument("--redrive", type=int, default=0, metavar="N",
                    help="after the batches, run up to N DLQ redrive "
                         "generations with exponential backoff "
                         "(reference retry task, pool.rs:358-470)")
    ap.add_argument("--redrive-base-delay", type=float, default=30.0,
                    help="backoff base seconds (dead_letter_queue.rs:31-40)")
    ap.add_argument("--redrive-max-delay", type=float, default=300.0,
                    help="backoff cap seconds")
    ap.add_argument("--dedup-store", action="store_true",
                    help="maintain the incremental dedup store: after "
                         "each batch commit, flag dups vs all history "
                         "and index the batch (streaming/dedup_store.py)")
    ap.add_argument("--auto-compact", type=int, default=0, metavar="N",
                    help="automatic table service: consolidate once N "
                         "or more not-yet-consolidated batch dirs have "
                         "accumulated (0 = manual only)")
    ap.add_argument("--compact-table", action="store_true",
                    help="after the batches, bin-pack all committed "
                         "batch dirs into the consolidated generation "
                         "(maintenance.compact_table; as-of reads stay "
                         "exact)")
    ap.add_argument("--delete-where", metavar="PREDICATES",
                    help="copy-on-write row-level delete after the "
                         "batches: JSON list of [col, op, value] "
                         "triples (AND; op one of == >= > <= <), e.g. "
                         "'[[\"pod_name\", \"==\", \"pod-7\"]]' — only "
                         "files provably holding matches are rewritten "
                         "(maintenance.delete_where)")
    ap.add_argument("--delete-mode", choices=("cow", "defer"),
                    default="cow",
                    help="cow = rewrite hit files now; defer = record a "
                         "metadata-only tombstone applied at scan time "
                         "and materialized by the next compaction (or "
                         "--materialize-deletes)")
    ap.add_argument("--merge-from", metavar="PARQUET",
                    help="MERGE INTO the routed table from this parquet "
                         "of updates: matched keys update in place, "
                         "unmatched insert as a merge-NNNNN batch "
                         "(maintenance.merge_into)")
    ap.add_argument("--merge-key", default="doc_id",
                    help="merge key column (default doc_id)")
    ap.add_argument("--materialize-deletes", action="store_true",
                    help="physically apply all pending deferred-delete "
                         "tombstones (maintenance.materialize_deletes)")
    ap.add_argument("--snapshot-log", action="store_true",
                    help="print the routed table's snapshot logs (one "
                         "commit-ordered generation list per dir) as "
                         "JSON — metadata-only")
    ap.add_argument("--rollback", metavar="DIR:GEN",
                    help="roll one table dir back to a previous "
                         "generation (undo a compaction/delete/merge), "
                         "e.g. 'batch-00000:1' or '_consolidated:2'; "
                         "publishes the old file list as a NEW "
                         "generation (maintenance.rollback_batch)")
    ap.add_argument("--deliver", metavar="GROUP:DEST",
                    help="tail the routed table into the parquet table "
                         "at DEST as consumer group GROUP with "
                         "exactly-once delivery (the group cursor "
                         "advances inside DEST's manifest flip — "
                         "follower.deliver_exactly_once)")
    ap.add_argument("--deliver-mode", choices=("appends", "changes"),
                    default="appends",
                    help="appends = mirror new batches; changes = CDC "
                         "changelog feed (_change_type rows, deletes "
                         "included) — a destination is permanently one "
                         "mode")
    ap.add_argument("--consumer-lag", metavar="GROUP",
                    help="print GROUP's consumer lag (batches/rows "
                         "behind the committed log) as JSON — "
                         "metadata-only, no Spark job")
    ap.add_argument("--tag", metavar="NAME",
                    help="tag the table's current state under an "
                         "immutable name: a consistent cross-dir "
                         "snapshot whose generations are pinned "
                         "against retention expiry (read back with "
                         "maintenance.read_tagged) — metadata-only")
    ap.add_argument("--drop-tag", metavar="NAME",
                    help="remove a tag; its pinned generations become "
                         "ordinary retired state for the next sweep")
    ap.add_argument("--tags", action="store_true",
                    help="print all tags as JSON — metadata-only")
    ap.add_argument("--drop-column", metavar="COL",
                    help="logical drop-column schema evolution: every "
                         "table-surface scan projects COL out (pure "
                         "metadata, reversible with --undrop-column; "
                         "history/tag reads keep showing it)")
    ap.add_argument("--undrop-column", metavar="COL",
                    help="reverse a logical --drop-column")
    ap.add_argument("--rename-column", metavar="OLD:NEW",
                    help="logical rename-column evolution: readers see "
                         "NEW, writers keep writing OLD (pure metadata; "
                         "rename back to undo)")
    ap.add_argument("--vacuum-expired", action="store_true",
                    help="run the snapshot-expiry sweep: reap retired "
                         "generations and consolidation-superseded "
                         "batch dirs past vacuum_retention_s")
    args = ap.parse_args(argv)

    cfg = PipelineConfig.load(args.config)
    if args.input:
        cfg.input_path = args.input
    if args.output:
        cfg.output_path = args.output
    if args.checkpoint:
        cfg.checkpoint_path = args.checkpoint
    if args.dedup_store:
        cfg.dedup_store_enabled = True
    if args.auto_compact:
        cfg.auto_compact_min_batches = args.auto_compact
    # the ingest stage needs the full surface; maintenance-only
    # invocations (compaction / deletes / merge / vacuum against an
    # already-committed table) need only the table root + checkpoint
    ingest = bool(args.pods or args.routes)
    maintenance_only = any((args.compact_table, args.delete_where,
                            args.merge_from, args.materialize_deletes,
                            args.vacuum_expired, args.snapshot_log,
                            args.rollback, args.deliver,
                            args.consumer_lag, args.tag, args.drop_tag,
                            args.tags, args.drop_column,
                            args.undrop_column, args.rename_column))
    if ingest:
        if not (args.pods and args.routes):
            ap.error("--pods and --routes must be given together")
        if not (cfg.input_path and cfg.output_path and cfg.checkpoint_path):
            ap.error("input/output/checkpoint must be set via flags "
                     "or config")
    elif not maintenance_only:
        ap.error("--pods/--routes are required to run ingest batches "
                 "(or pass a maintenance flag: --compact-table, "
                 "--delete-where, --merge-from, --materialize-deletes, "
                 "--vacuum-expired, --snapshot-log, --rollback, "
                 "--deliver, --consumer-lag)")
    elif not (cfg.output_path and cfg.checkpoint_path):
        ap.error("output/checkpoint must be set via flags or config")
    if args.redrive > 0 and not args.pods:
        ap.error("--redrive needs --pods (enrichment dimension)")
    rollback_target = None
    if args.rollback:
        name, _, gen = args.rollback.rpartition(":")
        if not name or not gen.isdigit():
            ap.error("--rollback wants DIR:GEN, e.g. batch-00000:1")
        rollback_target = (name, int(gen))
    deliver_target = None
    if args.deliver:
        grp, _, dest = args.deliver.partition(":")
        if not grp or not dest:
            ap.error("--deliver wants GROUP:DEST, e.g. indexer:/data/mirror")
        deliver_target = (grp, dest)
    cfg.validate()

    # pure-metadata ops (lag gauge, tag create/list/drop) skip the JVM
    # entirely when nothing else was asked for
    metadata_only = (args.consumer_lag or args.tag or args.drop_tag
                     or args.tags or args.drop_column
                     or args.undrop_column
                     or args.rename_column) and not ingest and not any(
        (args.compact_table, args.delete_where, args.merge_from,
         args.materialize_deletes, args.vacuum_expired, args.snapshot_log,
         args.rollback, args.deliver, args.redrive > 0))
    if metadata_only:
        if args.tag:
            from logfowd2_spark.streaming.maintenance import create_tag

            try:
                print(json.dumps({"tag": create_tag(cfg, args.tag)}))
            except ValueError as exc:
                print(f"error: {exc}", file=sys.stderr)
                return 2
        if args.drop_tag:
            from logfowd2_spark.streaming.maintenance import drop_tag

            print(json.dumps({"drop_tag": {
                "name": args.drop_tag,
                "existed": drop_tag(cfg, args.drop_tag)}}))
        if args.tags:
            from logfowd2_spark.streaming.maintenance import list_tags

            print(json.dumps({"tags": list_tags(cfg)}))
        if args.drop_column:
            from logfowd2_spark.streaming.maintenance import drop_column

            try:
                print(json.dumps(
                    {"drop_column": drop_column(cfg, args.drop_column)}))
            except ValueError as exc:
                print(f"error: {exc}", file=sys.stderr)
                return 2
        if args.undrop_column:
            from logfowd2_spark.streaming.maintenance import undrop_column

            print(json.dumps({"undrop_column":
                              undrop_column(cfg, args.undrop_column)}))
        if args.rename_column:
            from logfowd2_spark.streaming.maintenance import rename_column

            old, _, new = args.rename_column.partition(":")
            if not old or not new:
                print("error: --rename-column wants OLD:NEW",
                      file=sys.stderr)
                return 2
            try:
                print(json.dumps(
                    {"rename_column": rename_column(cfg, old, new)}))
            except ValueError as exc:
                print(f"error: {exc}", file=sys.stderr)
                return 2
        if args.consumer_lag:
            from logfowd2_spark.streaming.follower import group_lag

            print(json.dumps(
                {"consumer_lag": group_lag(cfg, args.consumer_lag)}))
        return 0

    spark = build_session(master=args.master,
                          shuffle_partitions=cfg.shuffle_partitions)
    try:
        gauges = RuntimeGauges()
        metrics = run_pipeline(
            spark, cfg, args.pods, args.routes,
            files_per_batch=args.files_per_batch,
            gauges=gauges,
        ) if ingest else []
        for m in metrics:
            print(json.dumps({
                "rows_in": m.rows_in,
                "rows_routed": m.rows_routed,
                "parse_failures": m.parse_failures,
                "failure_counts": m.failure_counts,
                "sink_counts": m.sink_counts,
                "conservation_ok": m.conservation_ok(),
                **({"dedup": m.dedup} if hasattr(m, "dedup") else {}),
            }))
        if args.redrive > 0:
            from logfowd2_spark.streaming.dlq import redrive_loop

            pods = spark.read.parquet(args.pods)
            summary = redrive_loop(
                spark, cfg, pods,
                max_generations=args.redrive,
                base_delay_s=args.redrive_base_delay,
                max_delay_s=args.redrive_max_delay,
                gauges=gauges,
            )
            print(json.dumps({"redrive": summary}))
        if args.tag:
            # tag BEFORE the mutating maintenance ops below: the natural
            # use of the combined form is a pre-mutation snapshot —
            # and a refused tag aborts those ops (same clean error the
            # metadata-only path gives, not a traceback mid-sequence)
            from logfowd2_spark.streaming.maintenance import create_tag

            try:
                print(json.dumps({"tag": create_tag(cfg, args.tag)}))
            except ValueError as exc:
                print(f"error: {exc}", file=sys.stderr)
                return 2
        if args.delete_where:
            from logfowd2_spark.streaming.maintenance import delete_where

            preds = [tuple(p) for p in json.loads(args.delete_where)]
            print(json.dumps({"delete_where": delete_where(
                spark, cfg, preds, mode=args.delete_mode)}))
        if args.merge_from:
            from logfowd2_spark.streaming.maintenance import merge_into

            print(json.dumps({"merge_into": merge_into(
                spark, cfg, spark.read.parquet(args.merge_from),
                key_col=args.merge_key)}))
        if args.materialize_deletes:
            from logfowd2_spark.streaming.maintenance import (
                materialize_deletes,
            )

            print(json.dumps({"materialize_deletes":
                              materialize_deletes(spark, cfg)}))
        if args.compact_table:
            from logfowd2_spark.streaming.maintenance import compact_table

            print(json.dumps({"compact_table": compact_table(spark, cfg)}))
        if rollback_target is not None:
            from logfowd2_spark.streaming.maintenance import rollback_batch

            print(json.dumps(
                {"rollback": rollback_batch(cfg, *rollback_target)}))
        if deliver_target is not None:
            from logfowd2_spark.streaming.follower import (
                deliver_exactly_once,
            )

            from logfowd2_spark.streaming.follower import CursorDiverged

            try:
                print(json.dumps({"deliver": deliver_exactly_once(
                    spark, cfg, deliver_target[0], deliver_target[1],
                    mode=args.deliver_mode)}))
            except (ValueError, CursorDiverged) as exc:
                print(f"error: {exc}", file=sys.stderr)
                return 2
        if args.consumer_lag:
            from logfowd2_spark.streaming.follower import group_lag

            print(json.dumps(
                {"consumer_lag": group_lag(cfg, args.consumer_lag)}))
        if args.snapshot_log:
            from logfowd2_spark.streaming.maintenance import (
                snapshot_log_table,
            )

            print(json.dumps({"snapshot_log": snapshot_log_table(cfg)}))
        if args.vacuum_expired:
            from logfowd2_spark.streaming.maintenance import (
                vacuum_expired_table,
            )

            print(json.dumps(
                {"vacuum_expired": vacuum_expired_table(cfg)}))
        if args.drop_column:
            from logfowd2_spark.streaming.maintenance import drop_column

            try:
                print(json.dumps(
                    {"drop_column": drop_column(cfg, args.drop_column)}))
            except ValueError as exc:
                print(f"error: {exc}", file=sys.stderr)
                return 2
        if args.undrop_column:
            from logfowd2_spark.streaming.maintenance import undrop_column

            print(json.dumps({"undrop_column":
                              undrop_column(cfg, args.undrop_column)}))
        if args.rename_column:
            # same OLD:NEW contract as the metadata-only path above —
            # previously the rename was silently dropped whenever any
            # Spark-path flag (ingest, --compact-table, --deliver, ...)
            # routed execution through this branch
            from logfowd2_spark.streaming.maintenance import rename_column

            old, _, new = args.rename_column.partition(":")
            if not old or not new:
                print("error: --rename-column wants OLD:NEW",
                      file=sys.stderr)
                return 2
            try:
                print(json.dumps(
                    {"rename_column": rename_column(cfg, old, new)}))
            except ValueError as exc:
                print(f"error: {exc}", file=sys.stderr)
                return 2
        if args.drop_tag:
            from logfowd2_spark.streaming.maintenance import drop_tag

            print(json.dumps({"drop_tag": {
                "name": args.drop_tag,
                "existed": drop_tag(cfg, args.drop_tag)}}))
        if args.tags:
            from logfowd2_spark.streaming.maintenance import list_tags

            print(json.dumps({"tags": list_tags(cfg)}))
        print(json.dumps({
            "batches_run": len(metrics),
            # run_pipeline pinned 'auto' to a concrete codec for the run
            "codec": cfg.codec,
            # A6 runtime gauges (reference NetworkStats, pool.rs:63-121)
            "ema_batch_ms": round(gauges.ema_batch_ms, 1),
            "adaptive_timeout_ms": round(gauges.adaptive_timeout_ms(), 1),
        }))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
