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
    return man.committed_ids()  # durable COMMIT order (Manifest.order)


def resolve_batch_paths(root: str, batch_id: str,
                        predicates=None) -> list[str]:
    """The scan paths for one batch dir: resolved through its committed
    ``_FILES.json`` manifest when present (snapshot-isolated against a
    concurrent compaction's generation flip — streaming/commit.py), else
    the directory itself (legacy dirs; correct whenever no rewrite is
    racing).  ``predicates`` (``[(col, op, value), ...]``) prune the
    manifest's file list by its commit-time column bounds — data
    skipping from the manifest alone, no footer opens, no listings."""
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        prune_manifest_files, read_file_manifest,
    )

    d = os.path.join(root, f"batch_id={batch_id}")
    man = read_file_manifest(d)
    if man is not None:
        rels = prune_manifest_files(man, predicates)
        return [os.path.join(d, rel) for rel in rels]
    return [d] if os.path.isdir(d) else []


#: partition columns recovered from directory names — never present in
#: the data files, appended by Spark after the (manifest-carried) data
#: schema; listed here so a provably-empty pruned scan can still build
#: the full result schema without touching storage
_PARTITION_FIELDS = (("batch_id", "string"), ("sink_id", "string"),
                     ("log_date", "date"))


def table_scan(spark: SparkSession, cfg: PipelineConfig,
               ids: list[str], predicates=None) -> DataFrame:
    """``_table_scan_resolve`` plus the table-level schema surface:
    columns dropped by ``drop_column`` (recorded in ``_TABLE.json``)
    are projected out of every result uniformly — logical drop-column
    evolution without touching a single data file.  Generation-axis
    readers (``read_batch_snapshot``, tags, changelogs) intentionally
    bypass it: history keeps showing what was committed."""
    from logfowd2_spark.streaming.commit import read_table_manifest  # noqa: PLC0415

    df = _table_scan_resolve(spark, cfg, ids, predicates=predicates)
    return apply_table_surface(df, cfg)


def apply_table_surface(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """The table-level schema surface (drop/rename evolution recorded
    in ``_TABLE.json``) applied to an arbitrary frame of this table's
    rows — shared by ``table_scan`` and the CDC changelog assembly in
    ``follower.poll_changes`` so inserts and retractions always union
    under the SAME column set (a mixed union pads with nulls and the
    multiset replay invariant silently breaks on evolved tables)."""
    from logfowd2_spark.streaming.commit import read_table_manifest  # noqa: PLC0415

    tman = read_table_manifest(os.path.join(cfg.output_path, "routed"))
    dropped = [c for c in (tman or {}).get("dropped_columns", [])
               if c in df.columns]
    if dropped:
        df = df.drop(*dropped)
    for phys, surfaced in ((tman or {}).get("renamed_columns")
                           or {}).items():
        if phys in df.columns:
            df = df.withColumnRenamed(phys, surfaced)
    return df


def _table_scan_resolve(spark: SparkSession, cfg: PipelineConfig,
                        ids: list[str], predicates=None) -> DataFrame:
    """Scan exactly the batches in ``ids``, resolving each through the
    table's metadata layers: ids consolidated by ``compact_table`` come
    from the ``_consolidated`` generation (batch_id preserved as a DATA
    column — the as-of filter is an ``IN`` predicate parquet row-group
    stats prune on), the rest from their per-batch dirs via the
    ``_FILES.json`` pointers.  A consolidated id's leftover per-batch
    dir (a retention copy awaiting expiry) is never read — the id set
    partitions exactly.

    Two manifest-metadata layers ride the same resolution pass:

    - **Data skipping**: ``predicates`` prune each manifest's file list
      by its commit-time column bounds (and the consolidated generation
      additionally by the wanted-id set against its ``batch_id``
      bounds) BEFORE Spark lists or opens anything.  Bounds are
      advisory — the scan may return a superset, and callers that need
      exact results apply the predicate Spark-side (``scan_routed``).
    - **Schema evolution**: when every scanned source carries a
      manifest schema, the scan runs under their by-name MERGE, so a
      column added by a newer writer reads as null from pre-evolution
      batches — zero footer opens, unlike ``mergeSchema``.  Legacy
      (manifest-less) sources keep today's uniform-schema read.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        CONSOLIDATED_DIR, manifest_schema, merge_schemas,
        prune_files_by_id_set, prune_manifest_files, read_file_manifest,
        read_table_manifest,
    )

    root = os.path.join(cfg.output_path, "routed")
    tman = read_table_manifest(root)
    cons_ids = set(tman["consolidated_ids"]) if tman else set()
    want_cons = [b for b in ids if b in cons_ids]
    want_dirs = [b for b in ids if b not in cons_ids]

    # ---- resolve every source's manifest first: the schemas must merge
    # across ALL scanned sources before any read is planned
    live = os.path.join(root, CONSOLIDATED_DIR)
    cons_man = read_file_manifest(live) if want_cons else None
    if want_cons and cons_man is None and not os.path.isdir(live):
        # consolidated data lost entirely — last resort: the ids'
        # per-batch dirs may survive as retention copies
        want_dirs = want_dirs + want_cons
        want_cons = []
    batch_mans = {
        b: read_file_manifest(os.path.join(root, f"batch_id={b}"))
        for b in want_dirs
    }
    schemas = []
    all_schemed = True
    if want_cons:
        s = manifest_schema(cons_man)
        all_schemed = s is not None
        if s is not None:
            schemas.append(s)
    for b, man in batch_mans.items():
        if man is None:
            if os.path.isdir(os.path.join(root, f"batch_id={b}")):
                all_schemed = False  # legacy dir contributes unknown shape
            continue  # missing batch: contributes nothing
        s = manifest_schema(man)
        if s is not None:
            schemas.append(s)
        else:
            all_schemed = False
    merged = merge_schemas(schemas) if (all_schemed and schemas) else None

    def _reader():
        r = spark.read
        return r.schema(merged) if merged is not None else r

    parts: list[DataFrame] = []
    if want_cons:
        if cons_man is not None:
            rels = prune_files_by_id_set(cons_man, "batch_id", want_cons)
            rels = prune_manifest_files(cons_man, predicates, files=rels)
            src = [os.path.join(live, rel) for rel in rels]
            # rels pruned to [] = the manifest PROVES no wanted rows
            # here — contributes nothing, and that emptiness is exact
        else:
            # corrupt/unreadable consolidated manifest: degrade to the
            # directory listing (read_file_manifest's documented
            # fallback contract) rather than failing every table read;
            # correct whenever no generation flip is racing
            src = [live]
        if src:
            df = _reader().option("basePath", live).parquet(*src)
            # ALWAYS filter to the requested ids: in the crash window
            # between a consolidation's manifest flip and its
            # _TABLE.json update the generation can cover MORE ids than
            # the pointer records, and an unfiltered scan would return
            # those rows on top of their still-present per-batch dirs
            df = df.filter(F.col("batch_id").isin(want_cons))
            parts.append(apply_delete_filters(df, cons_man))
    dir_paths = []
    for b in want_dirs:
        man = batch_mans[b]
        d = os.path.join(root, f"batch_id={b}")
        if man is not None:
            pths = [os.path.join(d, rel)
                    for rel in prune_manifest_files(man, predicates)]
            if man.get("delete_filters") and pths:
                # deferred-delete tombstones are per-source: this dir
                # scans separately so ONLY its rows pass its filters
                parts.append(apply_delete_filters(
                    _reader().option("basePath", root).parquet(*pths),
                    man,
                ))
            else:
                dir_paths += pths
        elif os.path.isdir(d):
            dir_paths.append(d)
    if dir_paths:
        parts.append(_reader().option("basePath", root).parquet(*dir_paths))
    if not parts:
        if merged is not None:
            # every wanted source was manifest-resolved and pruning
            # proved none holds a wanted row: an EMPTY result with the
            # exact table schema, planned without touching storage
            from pyspark.sql.types import StructType  # noqa: PLC0415

            have = {f.name for f in merged.fields}
            full = StructType(list(merged.fields))
            for name, typ in _PARTITION_FIELDS:
                if name not in have:
                    full.add(name, typ)
            return spark.createDataFrame([], full)
        # nothing resolved for the requested ids (e.g. consolidated data
        # AND the retention copies are both gone) — return the root scan
        # FILTERED to those ids: empty when the data is truly lost,
        # never other batches' rows smuggled into the snapshot.  A root
        # with no data at all (pure watermark-record log: skip-existing
        # mode committed ids without ever writing a routed dir) is a
        # provably-empty result, planned without touching storage.
        from logfowd2_spark.streaming.commit import data_files  # noqa: PLC0415

        if not os.path.isdir(root) or not data_files(root):
            from pyspark.sql.types import StructType  # noqa: PLC0415

            empty = StructType()
            for fname, ftype in _PARTITION_FIELDS:
                empty.add(fname, ftype)
            return spark.createDataFrame([], empty)
        return (
            spark.read.option("basePath", root).parquet(root)
            .filter(F.col("batch_id").isin(ids))
        )
    out = parts[0]
    for p in parts[1:]:
        # consolidated files carry batch_id as a data column while
        # per-batch scans recover it from the path — same names, so
        # unionByName aligns the two shapes
        out = out.unionByName(p)
    return out


def apply_delete_filters(df: DataFrame, man: dict | None) -> DataFrame:
    """Apply a manifest's ``delete_filters`` tombstones (deferred
    row-level deletes, ``delete_where(mode="defer")``) to a scan of
    that source: rows matching ANY stored entry (each a conjunctive
    predicate list) are dropped — the merge-on-read half of the delete
    model.  No-op without tombstones."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    for entry in (man or {}).get("delete_filters") or []:
        expr = predicate_expr([tuple(p) for p in entry])
        if expr is not None:
            # a NULL predicate keeps the row (SQL DELETE semantics)
            df = df.filter(~expr.eqNullSafe(F.lit(True)))
    return df


def predicate_expr(predicates):
    """``[(col, op, value), ...]`` (op one of ``== >= > <= <``, AND
    semantics — the same predicate shape the manifest pruning takes) as
    a Spark ``Column``, so scan and metadata layers evaluate ONE
    definition of the predicate."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    expr = None
    for col, op, val in predicates:
        c = F.col(col)
        term = {
            "==": c == F.lit(val),
            ">=": c >= F.lit(val),
            ">": c > F.lit(val),
            "<=": c <= F.lit(val),
            "<": c < F.lit(val),
        }[op]
        expr = term if expr is None else (expr & term)
    return expr


_PY_OPS = {
    "==": lambda a, b: a == b,
    ">=": lambda a, b: a >= b,
    ">": lambda a, b: a > b,
    "<=": lambda a, b: a <= b,
    "<": lambda a, b: a < b,
}


def _rel_of(uri: str, live: str) -> str:
    """Manifest-relative path of an ``input_file_name()`` URI under
    ``live`` (Spark reports ``file:`` URIs with %-escaped specials)."""
    from urllib.parse import unquote, urlparse  # noqa: PLC0415

    p = urlparse(uri).path if "://" in uri or uri.startswith("file:") \
        else uri
    return os.path.relpath(unquote(p), os.path.abspath(live))


def delete_where(spark: SparkSession, cfg: PipelineConfig,
                 predicates, mode: str = "cow") -> dict:
    """Row-level delete over the routed table — Iceberg's
    ``DELETE FROM ... WHERE`` on the plain layout, in either mode.  The
    retraction path a training-data pipeline needs at 100 TB (opt-out
    sources, PII findings): rows matching ALL of ``predicates`` are
    removed by rewriting ONLY the files that provably hold matches,
    under each source's atomic manifest flip.

    ``mode="cow"`` (default) rewrites immediately — copy-on-write.
    ``mode="defer"`` is merge-on-read: the predicate is recorded as a
    ``delete_filters`` tombstone entry in each candidate source's
    manifest — METADATA-ONLY, no Spark job, O(dirs) regardless of table
    size — and every reader (``read_routed``/``scan_routed``/as-of/
    export) applies the stored tombstones at scan time.  The physical
    rewrite happens at the next compaction of the source, or explicitly
    via ``materialize_deletes`` — Iceberg's delete-file model with the
    rewrite deferred to table maintenance, which is how a 100 TB delete
    stays an O(metadata) operation on the ingest path.  Deferred
    predicate values must be JSON-encodable (str/int/float); manifest
    row/byte stats intentionally keep counting tombstoned rows until
    materialization (same property as Iceberg MOR).

    Per source (every live per-batch dir + the ``_consolidated``
    generation; retention copies a consolidation superseded are
    skipped — readers already exclude them and expiry reaps them):

    1. candidate files from the manifest's commit-time column bounds /
       membership / partition-path values (``prune_manifest_files``) —
       untouched files are never listed, read, or rewritten;
    2. ONE Spark pass over the candidates finds the files that
       actually hold matching rows (``input_file_name`` group) and the
       exact match count — bounds are advisory, so a candidate with no
       matches stays untouched too;
    3. the hit files' surviving rows (predicate not TRUE — NULL keeps
       the row, matching SQL DELETE) are rewritten into the
       committer's stage, row-verified (staged == hit − matched), and
       published via ``manifest_swap(keep_prev_files, drop_files)``:
       unaffected files stay listed as-is, the hit files retire under
       ``cfg.vacuum_retention_s`` (an in-flight reader holding the
       pre-delete manifest keeps a complete generation; past the
       window the rows are PHYSICALLY gone — the right-to-be-forgotten
       contract) or are vacuumed immediately when the window is 0.

    ``batch_id`` predicates are evaluated against per-batch dir names
    driver-side (every row in a dir shares the id) and Spark-side on
    the consolidated generation, where batch_id is a data column.

    Returns ``{"deleted_rows", "files_rewritten", "dirs": {...}}``
    (cow) or ``{"deferred": True, "dirs": {...}}`` (defer).
    Crash-safe: the flip (or the atomic manifest put, in defer mode) is
    the committed point; an interrupted swap replays via
    ``recover_compactions`` like any compaction."""
    import json as _json  # noqa: PLC0415

    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        CONSOLIDATED_DIR, CommitConflict, commit_metadata_snapshot,
        get_committer, prune_manifest_files, read_file_manifest,
        read_table_manifest,
    )

    if mode not in ("cow", "defer"):
        raise ValueError("mode must be 'cow' or 'defer'")
    predicates = list(predicates or [])
    if not predicates:
        raise ValueError("delete_where requires at least one predicate")
    for col, op, val in predicates:
        if op not in _PY_OPS:
            raise ValueError(f"unsupported op {op!r}")
        if col == "batch_id" and not isinstance(val, str):
            raise ValueError("batch_id predicates must be strings")
    if mode == "defer":
        try:
            _json.dumps([list(p) for p in predicates])
        except TypeError:
            raise ValueError("defer mode requires JSON-encodable "
                             "predicate values (str/int/float)")

    committer = get_committer(cfg.commit_protocol)
    recover_compactions(cfg)
    root = os.path.join(cfg.output_path, "routed")
    if not os.path.isdir(root):
        return {"deleted_rows": 0, "files_rewritten": 0, "dirs": {}}
    tman = read_table_manifest(root)
    cons_ids = set(tman["consolidated_ids"]) if tman else set()

    targets: list[tuple[str, list]] = []  # (live_dir, row-level preds)
    for name in sorted(os.listdir(root)):
        if not name.startswith("batch_id="):
            continue
        bid = name.split("=", 1)[1]
        if bid in cons_ids:
            continue  # retention copy — readers resolve the id elsewhere
        if all(_PY_OPS[op](bid, val) for col, op, val in predicates
               if col == "batch_id"):
            targets.append((
                os.path.join(root, name),
                [p for p in predicates if p[0] != "batch_id"],
            ))
    cons = os.path.join(root, CONSOLIDATED_DIR)
    if os.path.isdir(cons):
        targets.append((cons, predicates))  # batch_id is a data column

    if mode == "defer":
        dirs_d: dict[str, dict] = {}
        for live, preds in targets:
            man = _ensure_manifest(spark, cfg, committer, live)
            if man is None:
                continue
            entry = [list(p) for p in preds]
            # optimistic-concurrency retry: the tombstone is a
            # metadata-only snapshot, so losing a race costs one
            # manifest re-read and re-append of the entry
            for attempt in range(5):
                if not prune_manifest_files(man, preds):
                    man = None  # metadata proves no file can hold a match
                    break
                filters = list(man.get("delete_filters") or [])
                if entry in filters:  # idempotent re-runs
                    break
                filters.append(entry)
                try:
                    # the tombstone is a SNAPSHOT (generation+1,
                    # operation "overwrite"), not an in-place edit:
                    # still two small JSON puts — O(1) in table size —
                    # but time travel to the prior generation shows the
                    # rows, the changelog attributes the delete, and
                    # incremental append readers correctly refuse to
                    # scan across it
                    commit_metadata_snapshot(
                        committer, live, man, {"delete_filters": filters},
                        operation="overwrite",
                        lineage_extra={"tombstones_added": [entry]})
                    break
                except CommitConflict:
                    if attempt == 4:
                        raise
                    man = read_file_manifest(live)
                    if man is None:
                        break
            if man is None:
                continue
            dirs_d[os.path.basename(live)] = {
                "tombstoned": True,
                "filters": len(read_file_manifest(live)
                               .get("delete_filters") or []),
            }
        return {"deferred": True, "dirs": dirs_d}

    total_deleted, total_rewritten = 0, 0
    dirs: dict[str, dict] = {}
    for live, preds in targets:
        res = _cow_delete_in_dir(spark, cfg, committer, live, [preds])
        if res is None:
            continue
        total_deleted += res["matched"]
        total_rewritten += res["files_rewritten"]
        dirs[os.path.basename(live)] = res
    return {"deleted_rows": total_deleted,
            "files_rewritten": total_rewritten, "dirs": dirs}


def _ensure_manifest(spark, cfg: PipelineConfig, committer, live: str):
    """The dir's manifest, ADOPTING manifest-less legacy dirs into the
    manifest layer first (their files listed as generation 0 with
    footer stats) — or None for an empty dir."""
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        collect_file_stats, data_files, read_file_manifest,
        write_file_manifest,
    )

    man = read_file_manifest(live)
    if man is not None:
        return man
    files0 = data_files(live)
    if not files0:
        return None
    stats0 = collect_file_stats(live, files0,
                                detail_cols=cfg.stats_detail_cols,
                                spark=spark)
    write_file_manifest(committer, live, files0, 0, stats=stats0)
    return read_file_manifest(live)


def _rewrite_manifest_extra(committer, live: str, man: dict,
                            updates: dict) -> None:
    """Atomically republish a manifest with its extra metadata updated
    (same generation/files/stats/retired — a metadata-only commit, like
    ``vacuum_expired``'s rewrite).  An ``updates`` value of None drops
    the key."""
    from logfowd2_spark.streaming.commit import write_file_manifest  # noqa: PLC0415

    known = {"generation", "files", "stats", "retired"}
    extra = {k: v for k, v in man.items() if k not in known}
    for k, v in updates.items():
        if v is None:
            extra.pop(k, None)
        else:
            extra[k] = v
    write_file_manifest(committer, live, man["files"], man["generation"],
                        stats=man.get("stats"), retired=man.get("retired"),
                        extra=extra)


def materialize_deletes(spark: SparkSession, cfg: PipelineConfig,
                        dirs: list[str] | None = None) -> dict:
    """Apply every pending ``delete_filters`` tombstone physically —
    the deferred half of ``delete_where(mode="defer")`` (Iceberg's
    rewrite-data-files over a table with delete files).  One COW pass
    per tombstoned source removes rows matching ANY stored entry and
    clears the tombstones under the same manifest flip, so there is no
    window where rows are double-deleted or resurrected.  Compactions
    call this on their sources first: a consolidation must never fold
    tombstoned rows into a generation whose tombstones it then drops.
    Returns {dir_name: per-dir result}."""
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        CONSOLIDATED_DIR, get_committer, read_file_manifest,
    )

    committer = get_committer(cfg.commit_protocol)
    root = os.path.join(cfg.output_path, "routed")
    if dirs is None:
        recover_compactions(cfg)
        if not os.path.isdir(root):
            return {}
        dirs = [os.path.join(root, n) for n in sorted(os.listdir(root))
                if n.startswith("batch_id=")]
        cons = os.path.join(root, CONSOLIDATED_DIR)
        if os.path.isdir(cons):
            dirs.append(cons)
    out: dict[str, dict] = {}
    for live in dirs:
        man = read_file_manifest(live)
        filters = (man or {}).get("delete_filters")
        if not filters:
            continue
        entries = [[tuple(p) for p in e] for e in filters]
        res = _cow_delete_in_dir(spark, cfg, committer, live, entries,
                                 clear_filters=True)
        if res is None:
            # tombstones matched nothing (already-compacted rows, or
            # advisory bounds): still clear them so scans stop paying
            _rewrite_manifest_extra(committer, live, man,
                                    {"delete_filters": None})
            res = {"matched": 0, "files_rewritten": 0, "files_kept": 0}
        out[os.path.basename(live)] = res
    return out


def _cow_delete_in_dir(spark, cfg: PipelineConfig, committer, live: str,
                       entries, clear_filters: bool = False) -> dict | None:
    """One source dir's copy-on-write delete: remove rows matching ANY
    of ``entries`` (each a conjunctive ``[(col, op, value), ...]`` list;
    an empty entry matches the whole dir).  Candidate files come from
    the manifest metadata per entry; one Spark pass finds the files
    actually holding matches; only those are rewritten and published by
    the manifest flip (``keep_prev_files`` + ``drop_files``).  Adopts
    manifest-less legacy dirs into the manifest layer first.  With
    ``clear_filters`` the flipped manifest drops ``delete_filters`` —
    the materialization path of deferred deletes.  Returns the per-dir
    result dict, or None when nothing matched."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from logfowd2_spark.ioutil import footer_num_rows  # noqa: PLC0415
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        collect_file_stats, data_files, manifest_schema, manifest_swap,
        prune_manifest_files, stage_path,
    )

    man = _ensure_manifest(spark, cfg, committer, live)
    if man is None:
        return None
    cand: list[str] = []
    seen: set[str] = set()
    for entry in entries:
        for f in prune_manifest_files(man, entry):
            if f not in seen:
                seen.add(f)
                cand.append(f)
    if not cand:
        return None
    sch = manifest_schema(man)
    rd = spark.read.schema(sch) if sch is not None else spark.read
    expr = None
    for entry in entries:
        e = predicate_expr(entry)
        # an empty entry (e.g. a batch_id-only predicate the dir already
        # passed) matches the whole dir
        e = F.lit(True) if e is None else e
        expr = e if expr is None else (expr | e)
    df = rd.option("basePath", live).parquet(
        *[os.path.join(live, f) for f in cand])
    per_file = (
        df.filter(expr)
        .groupBy(F.input_file_name().alias("f")).count().collect()
    )
    if not per_file:
        return None  # bounds were an advisory superset — nothing matches
    n_matched = sum(r["count"] for r in per_file)
    hit = sorted(_rel_of(r["f"], live) for r in per_file)
    stats = man.get("stats") or {}
    rows_hit = sum(
        int(stats[f]["rows"]) if f in stats
        else footer_num_rows(os.path.join(live, f))
        for f in hit
    )

    stage = stage_path(live)
    shutil.rmtree(stage, ignore_errors=True)
    keep = (
        rd.option("basePath", live)
        .parquet(*[os.path.join(live, f) for f in hit])
        # NULL predicate keeps the row (SQL DELETE semantics)
        .filter(~expr.eqNullSafe(F.lit(True)))
    )
    (
        keep.write.mode("overwrite")
        .partitionBy("sink_id", "log_date")
        .parquet(stage)
    )
    new_files = data_files(stage)
    new_stats = collect_file_stats(stage, new_files,
                                   detail_cols=cfg.stats_detail_cols,
                                   spark=spark)
    rows_staged = sum(s["rows"] for s in new_stats.values())
    if rows_staged != rows_hit - n_matched:  # never flip a lossy COW
        shutil.rmtree(stage, ignore_errors=True)
        raise RuntimeError(
            f"delete rewrite mismatch in {live}: kept {rows_staged}, "
            f"expected {rows_hit} - {n_matched}"
        )
    # committed_at/operation/added stay OUT of the carried extra: the
    # flip is a new snapshot and manifest_swap stamps its own commit
    # time and lineage (inheriting the previous generation's "append"
    # would let an incremental reader scan straight across this delete)
    known = {"generation", "files", "stats", "retired", "committed_at",
             "superseded_at", "operation", "added", "tombstones_added",
             "commit_token", "superseded_by", "commit_intent"}
    extra = {k: v for k, v in man.items() if k not in known}
    extra["deleted_rows"] = man.get("deleted_rows", 0) + n_matched
    if clear_filters:
        extra.pop("delete_filters", None)
    manifest_swap(committer, live, stage, stats=new_stats,
                  keep_prev_files=True, drop_files=hit,
                  retain_previous=cfg.vacuum_retention_s > 0,
                  vacuum=cfg.vacuum_retention_s <= 0,
                  extra=extra,
                  expected_generation=man["generation"])
    return {
        "matched": n_matched, "files_rewritten": len(hit),
        "files_kept": rows_staged,
    }


#: driver-side cap on the distinct merge keys collected for manifest
#: pruning and anti-join broadcasting; a MERGE source is a correction /
#: late-arrival set, orders of magnitude smaller than the table
MERGE_MAX_KEYS = 200_000


def merge_into(spark: SparkSession, cfg: PipelineConfig,
               updates: DataFrame, key_col: str = "doc_id") -> dict:
    """MERGE INTO the routed table — Iceberg/Delta ``MERGE`` in
    copy-on-write mode on the plain layout: for each row of
    ``updates``, WHEN MATCHED on ``key_col`` update every shared
    non-key column in place, WHEN NOT MATCHED insert the row.  The
    upsert path a continuously-corrected corpus needs (late metadata,
    relabeled documents), built from the table format's own protocols:

    - **Updates** reuse the COW delete machinery's shape per source
      (every live per-batch dir + the consolidated generation):
      candidate files come from the manifests' ``key_col``
      bounds/membership (``prune_files_by_id_set`` — the IN-predicate
      prune), ONE broadcast-join pass finds the files actually holding
      matched keys, and only those are rewritten (each row patched via
      a left join: matched rows take the update's columns, others pass
      through; row count verified unchanged) under the atomic manifest
      flip with retention (``keep_prev_files`` + ``drop_files``).
    - **Inserts** (keys matching nowhere) append to the
      ``_consolidated`` generation as a synthetic ``merge-NNNNN``
      batch: staged files + ``manifest_swap(keep_prev_files)`` carrying
      the cumulative ``consolidates`` list, then the atomic
      ``_TABLE.json`` pointer — exactly ``compact_table``'s two-phase
      commit, so a crash between the phases is healed by the same
      ``_recover_table_pointer`` logic without row duplication.

    ``updates`` must be unique per key and carry ``key_col``,
    ``sink_id`` and ``log_date`` (the partition columns of inserted
    rows); other table columns are optional — present ones update /
    insert, absent ones keep the table value (updates) or null
    (inserts).  ``batch_id`` is never updated (it is lineage).  The
    whole MERGE is idempotent: re-running it finds the inserted keys
    matched and rewrites them to the same values.

    Returns ``{"updated_rows", "inserted_rows", "files_rewritten",
    "insert_batch_id", "dirs": {...}}``."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from logfowd2_spark.ioutil import footer_num_rows  # noqa: PLC0415
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        CONSOLIDATED_DIR, collect_file_stats, data_files, get_committer,
        manifest_schema, manifest_swap, merge_schemas,
        prune_files_by_id_set, read_file_manifest, read_table_manifest,
        stage_path, write_table_manifest,
    )

    ucols = set(updates.columns)
    required = {key_col, "sink_id", "log_date"}
    if not required <= ucols:
        raise ValueError(f"updates must carry {sorted(required)}")
    committer = get_committer(cfg.commit_protocol)
    recover_compactions(cfg)
    # pending tombstones materialize first: a tombstoned row must not
    # count as MATCHED (it is logically deleted)
    materialize_deletes(spark, cfg)
    root = os.path.join(cfg.output_path, "routed")
    os.makedirs(root, exist_ok=True)
    live = os.path.join(root, CONSOLIDATED_DIR)
    tman = read_table_manifest(root) or {
        "version": 1, "consolidated_ids": [], "pending": [],
    }
    tman = _recover_table_pointer(cfg, committer, root, tman,
                                  read_file_manifest(live))

    # the MERGE source: driver-bounded, broadcast everywhere below
    keys = [r[0] for r in
            updates.select(key_col).limit(MERGE_MAX_KEYS + 1).collect()]
    if len(keys) > MERGE_MAX_KEYS:
        raise ValueError(f"updates exceed MERGE_MAX_KEYS={MERGE_MAX_KEYS}")
    if len(set(keys)) != len(keys):
        raise ValueError("updates must be unique per key")
    u = updates.select([F.col(c).alias(f"__u_{c}") for c in
                        updates.columns])
    ukey = f"__u_{key_col}"

    cons_ids = set(tman["consolidated_ids"])
    targets = [
        os.path.join(root, n) for n in sorted(os.listdir(root))
        if n.startswith("batch_id=")
        and n.split("=", 1)[1] not in cons_ids  # retention copies
    ]
    if os.path.isdir(live):
        targets.append(live)

    updated_rows, files_rewritten = 0, 0
    matched_keys: set = set()
    dirs: dict[str, dict] = {}
    for tgt in targets:
        man = _ensure_manifest(spark, cfg, committer, tgt)
        if man is None:
            continue
        cand = prune_files_by_id_set(man, key_col, keys)
        if not cand:
            continue
        sch = manifest_schema(man)
        rd = spark.read.schema(sch) if sch is not None else spark.read
        df = rd.option("basePath", tgt).parquet(
            *[os.path.join(tgt, f) for f in cand])
        pairs = (
            # stamp the file BEFORE the join: with file-backed updates
            # input_file_name() after a two-source join is ambiguous
            df.withColumn("__f", F.input_file_name())
            .join(F.broadcast(u), F.col(key_col) == F.col(ukey))
            .groupBy(F.col("__f").alias("f"),
                     F.col(ukey).alias("k")).count().collect()
        )
        if not pairs:
            continue
        n_matched = sum(r["count"] for r in pairs)
        hit = sorted({_rel_of(r["f"], tgt) for r in pairs})
        matched_keys.update(r["k"] for r in pairs)
        stats = man.get("stats") or {}
        rows_hit = sum(
            int(stats[f]["rows"]) if f in stats
            else footer_num_rows(os.path.join(tgt, f))
            for f in hit
        )
        tdtypes = dict(df.dtypes)
        patch = [
            (F.when(F.col(ukey).isNotNull(),
                    F.col(f"__u_{c}").cast(tdtypes[c]))
             .otherwise(F.col(c)).alias(c))
            if (c in ucols and c not in (key_col, "batch_id"))
            else F.col(c)
            for c in df.columns
        ]
        stage = stage_path(tgt)
        shutil.rmtree(stage, ignore_errors=True)
        (
            rd.option("basePath", tgt)
            .parquet(*[os.path.join(tgt, f) for f in hit])
            .join(F.broadcast(u), F.col(key_col) == F.col(ukey), "left")
            .select(*patch)
            .write.mode("overwrite")
            .partitionBy("sink_id", "log_date")
            .parquet(stage)
        )
        new_files = data_files(stage)
        new_stats = collect_file_stats(stage, new_files,
                                       detail_cols=cfg.stats_detail_cols,
                                       spark=spark)
        rows_staged = sum(s["rows"] for s in new_stats.values())
        if rows_staged != rows_hit:  # an UPDATE never changes row count
            shutil.rmtree(stage, ignore_errors=True)
            raise RuntimeError(
                f"merge rewrite mismatch in {tgt}: {rows_hit} -> "
                f"{rows_staged}"
            )
        known = {"generation", "files", "stats", "retired",
                 "committed_at", "superseded_at", "operation", "added",
                 "tombstones_added", "commit_token", "superseded_by",
                 "commit_intent"}  # flip stamps its own
        extra = {k: v for k, v in man.items() if k not in known}
        manifest_swap(committer, tgt, stage, stats=new_stats,
                      keep_prev_files=True, drop_files=hit,
                      retain_previous=cfg.vacuum_retention_s > 0,
                      vacuum=cfg.vacuum_retention_s <= 0,
                      extra=extra,
                      expected_generation=man["generation"])
        updated_rows += n_matched
        files_rewritten += len(hit)
        dirs[os.path.basename(tgt)] = {
            "matched": n_matched, "files_rewritten": len(hit),
        }

    # ---- WHEN NOT MATCHED: insert as a synthetic consolidated batch
    if matched_keys:
        mk = spark.createDataFrame([(k,) for k in sorted(matched_keys)],
                                   updates.select(key_col).schema)
        ins = updates.join(F.broadcast(mk), key_col, "left_anti")
    else:
        ins = updates
    n_ins = ins.count()
    merge_id = None
    if n_ins:
        seq = [int(b.split("-")[1]) for b in tman["consolidated_ids"]
               if b.startswith("merge-") and b.split("-")[1].isdigit()]
        merge_id = f"merge-{(max(seq) + 1 if seq else 0):05d}"
        cons_man = read_file_manifest(live)
        ref = manifest_schema(cons_man)
        if ref is None:
            # derive the table's data schema (incl. batch_id, the
            # consolidated generation's data column) from the table read
            from logfowd2_spark.streaming.pipeline import read_routed  # noqa: PLC0415

            ref = read_routed(spark, cfg).drop("sink_id", "log_date") \
                .schema if targets else None
        proj = []
        names = set()
        if ref is not None:
            for fld in ref.fields:
                names.add(fld.name)
                if fld.name == "batch_id":
                    proj.append(F.lit(merge_id).alias("batch_id"))
                elif fld.name in ucols:
                    proj.append(F.col(fld.name)
                                .cast(fld.dataType).alias(fld.name))
                else:
                    proj.append(F.lit(None)
                                .cast(fld.dataType).alias(fld.name))
        else:  # first rows of an empty table: the updates ARE the shape
            for c in updates.columns:
                if c not in ("sink_id", "log_date", "batch_id"):
                    names.add(c)
                    proj.append(F.col(c))
        if "batch_id" not in names:
            proj.append(F.lit(merge_id).alias("batch_id"))
        proj += [F.col("sink_id"), F.col("log_date")]
        stage = stage_path(live)
        shutil.rmtree(stage, ignore_errors=True)
        (
            ins.select(*proj)
            .write.mode("overwrite")
            .partitionBy("sink_id", "log_date")
            .parquet(stage)
        )
        new_files = data_files(stage)
        new_stats = collect_file_stats(stage, new_files,
                                       detail_cols=cfg.stats_detail_cols,
                                       spark=spark)
        rows_staged = sum(s["rows"] for s in new_stats.values())
        if rows_staged != n_ins:
            shutil.rmtree(stage, ignore_errors=True)
            raise RuntimeError(
                f"merge insert mismatch: {n_ins} -> {rows_staged}")
        ins_schema = spark.read.parquet(
            os.path.join(stage, new_files[0])).schema if new_files else None
        prev_s = manifest_schema(cons_man)
        extra = {"consolidates":
                 tman["consolidated_ids"] + [merge_id]}
        if cons_man and cons_man.get("consolidated_gens"):
            # absorption lineage is cumulative — dropping it here would
            # break consolidation_coverage (and with it the CDC
            # followers' reaped-dir proof) after any merge-with-inserts
            extra["consolidated_gens"] = cons_man["consolidated_gens"]
        if cons_man and cons_man.get("deleted_rows"):
            extra["deleted_rows"] = cons_man["deleted_rows"]
        if ins_schema is not None:
            extra["schema"] = (merge_schemas([prev_s, ins_schema])
                               if prev_s is not None else
                               ins_schema).jsonValue()
        manifest_swap(committer, live, stage, stats=new_stats,
                      keep_prev_files=True, extra=extra,
                      expected_generation=(cons_man["generation"]
                                           if cons_man else None))
        write_table_manifest(committer, root, {
            **tman,  # unknown table-level keys (dropped_columns) ride
            "version": 1,
            "consolidated_ids": tman["consolidated_ids"] + [merge_id],
            "pending": tman.get("pending", []),
        })
        # the insert batch joins the checkpoint BATCH LOG too: every
        # batch-axis consumer (committed_batch_ids → read_routed_between,
        # consumer-group followers, as-of reads) must see merged-in rows
        # — _TABLE.json alone makes them reachable by full scans but
        # invisible to the log.  Idempotent re-merges find the keys
        # matched, so a duplicate record cannot occur for the same id.
        from logfowd2_spark.streaming.checkpoint import (  # noqa: PLC0415
            BatchRecord, load_manifest, manifest_lock, save_manifest,
        )

        manifest_path = os.path.join(cfg.checkpoint_path, "manifest.json")
        # locked read-modify-write: a streaming trigger registering its
        # own batch between our load and save would otherwise be erased
        with manifest_lock(manifest_path):
            log = load_manifest(manifest_path)
            if not log.committed(merge_id):
                log.record(BatchRecord(
                    batch_id=merge_id, input_files=[], rows_in=n_ins,
                    rows_parsed=n_ins, parse_failures=0, sink_counts={},
                    partition_metrics=[]))
                save_manifest(log, manifest_path)
    return {"updated_rows": updated_rows, "inserted_rows": n_ins,
            "files_rewritten": files_rewritten,
            "insert_batch_id": merge_id, "dirs": dirs}


def read_routed_as_of(spark: SparkSession, cfg: PipelineConfig,
                      batch_id: str, predicates=None) -> DataFrame:
    """The routed table as of (and including) ``batch_id`` — only
    batches committed up to that point are scanned (partition pruning by
    construction: later data is never listed, let alone read), each
    resolved through the manifest layers (``table_scan``), so an
    in-place compaction racing this reader is invisible (old-or-new
    generation, never a mix) and a batch id already consolidated
    cross-batch still answers exactly.

    Heals interrupted compactions first: after a mid-compaction crash
    the batch's live dir may not be fully published yet — without
    recovery the batch would be silently absent from the snapshot."""
    recover_compactions(cfg)
    ids = committed_batch_ids(cfg)
    if batch_id not in ids:
        raise ValueError(f"batch {batch_id!r} is not committed")
    return table_scan(spark, cfg, ids[: ids.index(batch_id) + 1],
                      predicates=predicates)


from logfowd2_spark.ioutil import tree_num_files as _tree_num_files  # noqa: E402
from logfowd2_spark.ioutil import tree_num_rows as _tree_num_rows  # noqa: E402


def recover_compactions(cfg: PipelineConfig) -> list[str]:
    """Heal interrupted compaction commits under the routed root via the
    configured commit protocol (streaming/commit.py): restores originals
    from ``_old_`` safety dirs (rename protocol) or replays commit-ready
    stages (put protocol), then reconciles the checkpoint BATCH LOG
    against the table pointer: a ``merge-*`` id committed to
    ``_TABLE.json`` whose batch-log registration was lost to a crash
    (merge_into flips the table first, registers second) is backfilled
    — without this, merged-in rows are visible to full scans but
    permanently invisible to every log-axis consumer (followers,
    read_routed_between, as-of), and the idempotent re-merge cannot
    repair it because it finds the keys already matched.  Returns the
    batch dirs healed."""
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        get_committer, read_table_manifest,
    )

    root = os.path.join(cfg.output_path, "routed")
    healed = get_committer(cfg.commit_protocol).recover(root)
    tman = read_table_manifest(root)
    merge_ids = [b for b in (tman or {}).get("consolidated_ids", [])
                 if str(b).startswith("merge-")]
    if merge_ids:
        from logfowd2_spark.streaming.checkpoint import (  # noqa: PLC0415
            BatchRecord, load_manifest, manifest_lock, save_manifest,
        )

        manifest_path = os.path.join(cfg.checkpoint_path, "manifest.json")
        with manifest_lock(manifest_path):
            log = load_manifest(manifest_path)
            missing = [b for b in merge_ids if not log.committed(b)]
            if missing:
                # the true commit position is lost with the crash; the
                # end of the log is the only consistent backfill point
                # (the rows become consumable NOW, exactly once)
                for b in missing:
                    log.record(BatchRecord(
                        batch_id=b, input_files=[], rows_in=0,
                        rows_parsed=0, parse_failures=0, sink_counts={},
                        partition_metrics=[]))
                save_manifest(log, manifest_path)
                healed = healed + [f"batch_log:{b}" for b in missing]
    return healed


def drop_column(cfg: PipelineConfig, column: str) -> dict:
    """LOGICAL drop-column schema evolution — the sibling of the
    add-column half (``merge_schemas``): the name is recorded in
    ``_TABLE.json``'s ``dropped_columns`` and every table-surface scan
    (``table_scan`` → ``read_routed``/``scan_routed``/as-of/between/
    followers) projects it out, uniformly across old and future
    batches, without touching a single data file — Iceberg's
    ``ALTER TABLE DROP COLUMN`` as pure metadata.  Reversible
    (``undrop_column``: the values were never destroyed — physical
    removal happens as compactions naturally rewrite files under the
    surfaced schema's successor, or by an explicit rewrite).
    Generation-axis readers (snapshot/tag/changelog) keep showing the
    column: history is what was committed.  Partition and lineage
    columns are refused."""
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        get_committer, read_table_manifest, write_table_manifest,
    )

    protected = {name for name, _ in _PARTITION_FIELDS} | {"doc_id"}
    if column in protected:
        raise ValueError(
            f"column {column!r} is a partition/lineage column and "
            f"cannot be dropped")
    root = os.path.join(cfg.output_path, "routed")
    os.makedirs(root, exist_ok=True)
    tman = read_table_manifest(root) or {
        "version": 1, "consolidated_ids": [], "pending": [],
    }
    # a surfaced (renamed) name resolves to its physical column
    renames = tman.get("renamed_columns", {})
    physical = next((p for p, s in renames.items() if s == column),
                    column)
    dropped = sorted(set(tman.get("dropped_columns", [])) | {physical})
    write_table_manifest(get_committer(cfg.commit_protocol), root,
                         {**tman, "dropped_columns": dropped})
    return {"column": column, "dropped_columns": dropped}


def _surfaced_columns(cfg: PipelineConfig) -> set:
    """Best-effort set of the table's surfaced column names, from
    metadata alone (member manifest schemas + partition fields, with
    table-level drops/renames applied) — used to refuse rename
    collisions without a scan."""
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        CONSOLIDATED_DIR, manifest_schema, read_file_manifest,
        read_table_manifest,
    )

    root = os.path.join(cfg.output_path, "routed")
    names: set = {n for n, _ in _PARTITION_FIELDS}
    if not os.path.isdir(root):
        return names
    dirs = [n for n in sorted(os.listdir(root))
            if n.startswith("batch_id=")] + [CONSOLIDATED_DIR]
    for d in dirs:
        man = read_file_manifest(os.path.join(root, d))
        s = manifest_schema(man) if man else None
        if s is not None:
            names |= {f.name for f in s.fields}
    tman = read_table_manifest(root) or {}
    names -= set(tman.get("dropped_columns", []))
    renames = tman.get("renamed_columns", {})
    names = {renames.get(n, n) for n in names}
    return names


def rename_column(cfg: PipelineConfig, column: str,
                  new_name: str) -> dict:
    """LOGICAL rename-column evolution (metadata-only, reversible by
    renaming back): ``_TABLE.json`` maps the physical name to the
    surfaced one and every table-surface scan applies it after the
    drop projection — writers keep writing the physical name, readers
    see the new one, no data file changes.  ``column`` is the CURRENT
    surfaced name.  Collisions with existing surfaced columns and
    partition/lineage names are refused.  Generation-axis readers
    (snapshots, tags, changelogs) keep committed history's names."""
    import re  # noqa: PLC0415

    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        get_committer, read_table_manifest, write_table_manifest,
    )

    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]{0,63}", new_name or ""):
        raise ValueError(f"invalid column name {new_name!r}")
    protected = {name for name, _ in _PARTITION_FIELDS} | {"doc_id"}
    if column in protected or new_name in protected:
        raise ValueError(
            "partition/lineage columns cannot be renamed (or shadowed)")
    if new_name != column and new_name in _surfaced_columns(cfg):
        raise ValueError(
            f"column {new_name!r} already exists at the table surface")
    root = os.path.join(cfg.output_path, "routed")
    os.makedirs(root, exist_ok=True)
    tman = read_table_manifest(root) or {
        "version": 1, "consolidated_ids": [], "pending": [],
    }
    renames = dict(tman.get("renamed_columns", {}))
    # resolve the surfaced name back to its physical column
    physical = next((p for p, s in renames.items() if s == column),
                    column)
    if new_name == physical:
        renames.pop(physical, None)  # renamed back: drop the mapping
    else:
        renames[physical] = new_name
    write_table_manifest(get_committer(cfg.commit_protocol), root,
                         {**tman, "renamed_columns": renames})
    return {"column": column, "new_name": new_name,
            "renamed_columns": renames}


def undrop_column(cfg: PipelineConfig, column: str) -> dict:
    """Reverse a logical ``drop_column`` (metadata-only; the values
    were never destroyed)."""
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        get_committer, read_table_manifest, write_table_manifest,
    )

    root = os.path.join(cfg.output_path, "routed")
    tman = read_table_manifest(root)
    dropped = set((tman or {}).get("dropped_columns", []))
    existed = column in dropped
    if existed:
        dropped.discard(column)
        write_table_manifest(
            get_committer(cfg.commit_protocol), root,
            {**tman, "dropped_columns": sorted(dropped)})
    return {"column": column, "existed": existed,
            "dropped_columns": sorted(dropped)}


TAGS_DIR = "_TAGS"


def _tags_root(cfg: PipelineConfig) -> str:
    return os.path.join(cfg.output_path, "routed", TAGS_DIR)


def _tag_path(cfg: PipelineConfig, name: str) -> str:
    from logfowd2_spark.streaming.commit import validate_ref_name  # noqa: PLC0415

    validate_ref_name(name, "tag")
    return os.path.join(_tags_root(cfg), f"{name}.json")


def create_tag(cfg: PipelineConfig, name: str) -> dict:
    """Tag the table's CURRENT state under an immutable name — a
    consistent cross-dir snapshot (every live member dir's generation,
    captured together) the way Iceberg tags name one snapshot.  Tagged
    generations are PINNED: ``vacuum_expired_table`` keeps their
    retired files and snapshot-log entries, and consolidation-
    superseded member dirs are never reaped, so ``read_tagged`` stays
    exact for the tag's whole lifetime regardless of later deletes,
    merges, compactions, or retention sweeps.  One atomic exclusive
    put; re-creating an existing name raises (drop first — tags never
    move, Iceberg's immutability rule).

    Requires deferred expiry (``vacuum_retention_s > 0``): with
    immediate vacuum a rewrite deletes the superseded files before any
    pin can apply — same contract as Iceberg, where tags pin snapshots
    against ``expire_snapshots``, not against physical overwrites.

    Consistency scope: the capture reads each member dir's current
    manifest in one metadata pass; a batch committing concurrently
    simply lands after the tag (a consistent prefix), while a
    concurrent REWRITE (delete/compact racing the capture) is the same
    single-maintenance-writer assumption every other table-service op
    makes — the OCC layer serializes the flips themselves."""
    import json as _json  # noqa: PLC0415
    import time as _time  # noqa: PLC0415

    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        CONSOLIDATED_DIR, _put_file_exclusive, read_file_manifest,
        read_table_manifest,
    )

    path = _tag_path(cfg, name)
    if cfg.vacuum_retention_s <= 0:
        # with immediate vacuum the next rewrite physically deletes the
        # superseded files before any pin can apply — refusing here
        # beats a tag that silently stops answering
        raise ValueError(
            "tags require deferred expiry: set vacuum_retention_s > 0")
    recover_compactions(cfg)
    root = os.path.join(cfg.output_path, "routed")
    tman = read_table_manifest(root)
    cons_ids = set(tman["consolidated_ids"]) if tman else set()
    ids = committed_batch_ids(cfg)
    dirs: dict[str, int] = {}
    for b in ids:
        if b in cons_ids:
            continue  # lives in the consolidated generation
        d = os.path.join(root, f"batch_id={b}")
        man = read_file_manifest(d)
        if man is None:
            if not os.path.isdir(d):
                # dir-less watermark record (skip-existing mode): zero
                # rows committed, nothing to pin
                continue
            raise ValueError(
                f"batch {b!r} has no manifest — legacy dirs cannot be "
                f"generation-pinned")
        dirs[f"batch_id={b}"] = man["generation"]
    cons_live = os.path.join(root, CONSOLIDATED_DIR)
    man_c = read_file_manifest(cons_live)
    if man_c is not None:
        dirs[CONSOLIDATED_DIR] = man_c["generation"]
    doc = {"name": name, "created_at": _time.time(),
           "batch_log": ids, "dirs": dirs}
    os.makedirs(_tags_root(cfg), exist_ok=True)
    if not _put_file_exclusive(path, _json.dumps(doc).encode()):
        raise ValueError(f"tag {name!r} already exists (drop it first)")
    return doc


def list_tags(cfg: PipelineConfig) -> dict[str, dict]:
    """All tags, by name — metadata-only."""
    import json as _json  # noqa: PLC0415

    out: dict[str, dict] = {}
    troot = _tags_root(cfg)
    if not os.path.isdir(troot):
        return out
    for fn in sorted(os.listdir(troot)):
        # dot-prefixed names are _put_file_exclusive claim temps (crash
        # debris), not tags — same skip rule as every other listing
        if fn.endswith(".json") and not fn.startswith("."):
            try:
                with open(os.path.join(troot, fn)) as fh:
                    out[fn[:-5]] = _json.load(fh)
            except (OSError, ValueError):
                continue
    return out


def drop_tag(cfg: PipelineConfig, name: str) -> bool:
    """Remove the tag; its pinned generations become ordinary retired
    state the next expiry sweep may reap.  Returns whether it existed."""
    try:
        os.remove(_tag_path(cfg, name))
        return True
    except FileNotFoundError:
        return False


def _pinned_by_tags(cfg: PipelineConfig) -> dict[str, set]:
    """dir name -> set of tag-pinned generations, across all tags.
    STRICT: an unreadable/corrupt tag file raises instead of being
    skipped — a sweep running with partial pins would destroy the
    unlucky tag's only copy (``list_tags``'s silent skip is fine for
    the informational listing, never for the reaper)."""
    import json as _json  # noqa: PLC0415

    pinned: dict[str, set] = {}
    troot = _tags_root(cfg)
    if not os.path.isdir(troot):
        return pinned
    for fn in sorted(os.listdir(troot)):
        if not fn.endswith(".json") or fn.startswith("."):
            continue
        try:
            with open(os.path.join(troot, fn)) as fh:
                tag = _json.load(fh)
        except (OSError, ValueError) as exc:
            raise RuntimeError(
                f"tag file {fn!r} is unreadable ({exc}); refusing to "
                f"sweep with partial pins") from exc
        for d, g in (tag.get("dirs") or {}).items():
            pinned.setdefault(d, set()).add(int(g))
    return pinned


def read_tagged(spark: SparkSession, cfg: PipelineConfig,
                name: str) -> DataFrame:
    """Read the table exactly as it was at ``create_tag(name)``: each
    member dir at its pinned generation, with that snapshot's own
    schema and tombstones (``read_batch_snapshot``), unioned by name.
    Loud failure if a pinned snapshot became unreadable (only possible
    if the tag was dropped and re-created around an expiry sweep)."""
    import json as _json  # noqa: PLC0415

    path = _tag_path(cfg, name)
    try:
        with open(path) as fh:
            tag = _json.load(fh)
    except FileNotFoundError:
        raise LookupError(f"no tag {name!r}") from None
    from pyspark.sql import functions as F  # noqa: PLC0415

    parts = []
    for d, g in sorted((tag.get("dirs") or {}).items()):
        df = read_batch_snapshot(spark, cfg, d, generation=g)
        if d.startswith("batch_id=") and "batch_id" not in df.columns:
            # per-dir reads recover only the partitions BELOW the dir
            df = df.withColumn("batch_id", F.lit(d.split("=", 1)[1]))
        parts.append(df)
    if not parts:
        # a tag of an empty table: provably-empty result planned
        # without touching storage (the root may not even exist)
        from pyspark.sql.types import StructType  # noqa: PLC0415

        empty = StructType()
        for fname, ftype in _PARTITION_FIELDS:
            empty.add(fname, ftype)
        return spark.createDataFrame([], empty)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def vacuum_expired_table(cfg: PipelineConfig,
                         now: float | None = None) -> dict[str, list[str]]:
    """Snapshot-expiry maintenance over the whole routed table: run
    ``vacuum_expired`` (commit.py) on every batch dir, reaping retired
    generations older than ``cfg.vacuum_retention_s``, then reap
    per-batch dirs a table consolidation superseded past the same
    window.  Metadata-only — manifest reads plus deletes of expired
    files; no Spark job.  Returns {batch_dir_name: removed_files} for
    the dirs that changed."""
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        CONSOLIDATED_DIR, get_committer, vacuum_expired,
    )

    committer = get_committer(cfg.commit_protocol)
    root = os.path.join(cfg.output_path, "routed")
    out: dict[str, list[str]] = {}
    if not os.path.isdir(root):
        return out
    pinned = _pinned_by_tags(cfg)  # tag-pinned generations survive
    for name in sorted(os.listdir(root)):
        if not name.startswith("batch_id="):
            continue
        removed = vacuum_expired(committer, os.path.join(root, name),
                                 cfg.vacuum_retention_s, now=now,
                                 pinned=pinned.get(name, frozenset()))
        if removed:
            out[name] = removed
    # the consolidated generation itself also retires old generations
    cons = os.path.join(root, CONSOLIDATED_DIR)
    if os.path.isdir(cons):
        removed = vacuum_expired(committer, cons, cfg.vacuum_retention_s,
                                 now=now,
                                 pinned=pinned.get(CONSOLIDATED_DIR,
                                                   frozenset()))
        if removed:
            out[CONSOLIDATED_DIR] = removed
    # one pin computation serves the whole sweep: re-reading the tags
    # mid-sweep could disagree with the first read
    reaped = _reap_pending_dirs(cfg, now=now, pinned_dirs=set(pinned))
    if reaped:
        out["pending_batch_dirs"] = reaped
    return out


# ---------------------------------------------------------------------------
# Snapshot log, time travel by generation/timestamp, rollback
# ---------------------------------------------------------------------------
#
# ``read_routed_as_of`` answers the BATCH axis of time travel (the table
# as of a committed ingest batch).  These answer the GENERATION axis: a
# single dir's history across in-place rewrites — compactions, deletes,
# merges — each of which flipped its ``_FILES.json`` and archived the
# superseded manifest into ``_history/`` (commit.manifest_swap).  This
# is Iceberg's snapshot list / ``rollback_to_snapshot`` on the plain
# layout; all three are metadata-only except the snapshot read itself.


def _resolve_table_dir(cfg: PipelineConfig, name: str) -> str:
    from logfowd2_spark.streaming.commit import CONSOLIDATED_DIR  # noqa: PLC0415

    root = os.path.join(cfg.output_path, "routed")
    if name == CONSOLIDATED_DIR or name.startswith("batch_id="):
        return os.path.join(root, name)
    return os.path.join(root, f"batch_id={name}")


def snapshot_log_table(cfg: PipelineConfig) -> dict[str, list[dict]]:
    """The whole routed table's snapshot logs: one entry per manifest-
    bearing dir (per-batch dirs + the consolidated generation), each a
    commit-ordered list of {generation, committed_at, superseded_at,
    n_files, rows, is_current}.  Metadata-only — small JSON reads, no
    listings, no Spark job."""
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        CONSOLIDATED_DIR, snapshot_log,
    )

    root = os.path.join(cfg.output_path, "routed")
    out: dict[str, list[dict]] = {}
    if not os.path.isdir(root):
        return out
    names = [n for n in sorted(os.listdir(root))
             if n.startswith("batch_id=")]
    if os.path.isdir(os.path.join(root, CONSOLIDATED_DIR)):
        names.append(CONSOLIDATED_DIR)
    for name in names:
        log = snapshot_log(os.path.join(root, name))
        if log:
            out[name] = log
    return out


def read_batch_snapshot(spark: SparkSession, cfg: PipelineConfig,
                        name: str, generation: int | None = None,
                        as_of: float | None = None) -> DataFrame:
    """Read ONE dir of the routed table pinned to a historical
    snapshot — by ``generation``, or the latest committed at/before the
    ``as_of`` timestamp.  The snapshot's file list is verified readable
    first (expired past the retention window → loud FileNotFoundError,
    never a partial read), the scan is planned over exactly those files
    under the snapshot's own manifest schema, and the snapshot's OWN
    deferred-delete tombstones apply — a later delete does not leak
    backward in time."""
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        manifest_schema, read_file_manifest, read_file_manifest_at,
        snapshot_files,
    )

    d = _resolve_table_dir(cfg, name)
    if generation is None and as_of is None:
        man = read_file_manifest(d)  # no selector = current snapshot
        if man is None:
            raise LookupError(f"no manifest under {d!r}")
    else:
        man = read_file_manifest_at(d, generation=generation, as_of=as_of)
    rels = snapshot_files(d, generation=man["generation"])
    sch = manifest_schema(man)
    rd = spark.read.schema(sch) if sch is not None else spark.read
    df = rd.option("basePath", d).parquet(
        *[os.path.join(d, rel) for rel in rels])
    return apply_delete_filters(df, man)


def read_appended_between(spark: SparkSession, cfg: PipelineConfig,
                          name: str, from_generation: int,
                          to_generation: int | None = None) -> DataFrame:
    """Incremental (CDC-style) read of ONE dir: exactly the rows
    appended over ``(from_generation, to_generation]`` — Iceberg's
    incremental append scan.  ``replace`` snapshots (compactions) in
    the range are skipped (content-preserving by the row-count verify);
    ``overwrite``/``rollback``/legacy snapshots raise (commit.
    incremental_files — appends scanned across a delete would
    resurrect retracted rows).  The scan is planned over only the
    appended files under the merged manifest schemas, with the
    TO-snapshot's delete tombstones applied (as-of semantics)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        incremental_files, manifest_schema, merge_schemas,
        read_file_manifest, read_file_manifest_at,
    )

    d = _resolve_table_dir(cfg, name)
    entries = incremental_files(d, from_generation, to_generation)
    if to_generation is None:  # default = current snapshot (its
        man_to = read_file_manifest(d)  # tombstones included)
    else:
        man_to = read_file_manifest_at(d, generation=to_generation)
    if not entries:
        # provably nothing appended in the range: empty result, planned
        # without touching storage when the schema is known
        sch = manifest_schema(man_to)
        if sch is not None:
            return spark.createDataFrame([], sch)
        return (spark.read.option("basePath", d).parquet(d)
                .filter(F.lit(False)))
    mans = [read_file_manifest_at(d, generation=e["generation"])
            for e in entries]
    schemas = [manifest_schema(m) for m in mans]
    merged = (merge_schemas([s for s in schemas if s is not None])
              if all(s is not None for s in schemas) and schemas else None)
    rd = spark.read.schema(merged) if merged is not None else spark.read
    paths = [os.path.join(d, f) for e in entries for f in e["files"]]
    return apply_delete_filters(
        rd.option("basePath", d).parquet(*paths), man_to)


def read_changes_between(spark: SparkSession, cfg: PipelineConfig,
                         name: str, from_generation: int,
                         to_generation: int | None = None,
                         elide_consolidations: bool = False,
                         steps: list | None = None) -> DataFrame:
    """CDC changelog read of ONE dir: the exact row-level changes
    committed over ``(from_generation, to_generation]`` — Iceberg's
    ``create_changelog_view`` on the plain layout, and the general
    sibling of ``read_appended_between`` for ranges that contain
    deletes.  Returns the data columns plus ``_change_type``
    (``'insert'`` / ``'delete'``; an update is a delete+insert pair,
    standard CDC) and ``_change_generation`` (which snapshot committed
    the change — order by it to replay).

    Exactness comes from diffing each snapshot's LOGICAL content
    restricted to what its flip physically touched, each side under its
    own snapshot's tombstones (``commit.changelog_entries``):

    - appends contribute their added files' visible rows as inserts;
    - rewrites (COW delete, MERGE) diff dropped-vs-added files with
      ``exceptAll`` (multiset-exact, so duplicate rows and rewritten-
      but-unchanged rows cancel);
    - tombstone snapshots contribute the kept-file rows newly hidden by
      the added filter entries (files pruned by manifest bounds and
      membership first);
    - compactions and tombstone materializations are elided entirely —
      and the per-side filters make the generic diff yield exactly zero
      rows for them anyway, since a materialization's dropped rows were
      already invisible.

    Cost scales with CHURN, never table size: a 100 TB table whose flip
    rewrote 2 files diffs 2 files (the ``exceptAll`` shuffle covers
    only changed-file rows).  Invariant (test_changelog):
    ``snapshot(from) ⊎ inserts ∖ deletes == snapshot(to)`` as
    multisets.

    ``elide_consolidations`` additionally diffs straight across table-
    consolidation appends (compact_table moving batch-dir rows into the
    consolidated generation — row-count-verified, content-preserving at
    TABLE level): the table-scoped CDC view follower.poll_changes
    consumes."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        changelog_entries, manifest_schema, merge_schemas,
        prune_manifest_files,
    )

    d = _resolve_table_dir(cfg, name)
    if steps is None:  # callers that already computed the metadata
        steps = changelog_entries(  # slice (follower) pass it through
            d, from_generation, to_generation,
            elide_consolidations=elide_consolidations)
    schemas = [manifest_schema(m) for st in steps
               for m in (st["man_prev"], st["man"])]
    merged = (merge_schemas(schemas)
              if schemas and all(s is not None for s in schemas) else None)

    def _read(files):
        rd = spark.read.schema(merged) if merged is not None else spark.read
        return rd.option("basePath", d).parquet(
            *[os.path.join(d, f) for f in files])

    def _vis(df, entries):
        # the side's own snapshot tombstones applied
        return apply_delete_filters(df, {"delete_filters": entries})

    def _match_any(df, entries):
        expr = None
        for entry in entries:
            e = predicate_expr([tuple(p) for p in entry])
            if e is None:
                continue
            e = e.eqNullSafe(F.lit(True))
            expr = e if expr is None else (expr | e)
        return df.filter(expr) if expr is not None else df.filter(F.lit(False))

    def _kept_candidates(st, entries):
        cand = sorted({f for e in entries
                       for f in prune_manifest_files(
                           st["man"], [tuple(p) for p in e],
                           files=st["kept"])})
        missing = [f for f in cand
                   if not os.path.exists(os.path.join(d, f))]
        if missing:
            raise FileNotFoundError(
                f"changelog read of {d!r} generation "
                f"{st['generation']}: {len(missing)} kept files expired "
                f"(first: {missing[0]!r})")
        return cand

    parts: list[DataFrame] = []

    def _tag(df, kind, gen):
        parts.append(df.select(
            "*", F.lit(kind).alias("_change_type"),
            F.lit(gen).cast("int").alias("_change_generation")))

    for st in steps:
        g = st["generation"]
        vis_dropped = (_vis(_read(st["dropped"]), st["filters_prev"])
                       if st["dropped"] else None)
        vis_added = (_vis(_read(st["added"]), st["filters_new"])
                     if st["added"] else None)
        if vis_dropped is not None and vis_added is not None:
            _tag(vis_dropped.exceptAll(vis_added), "delete", g)
            _tag(vis_added.exceptAll(vis_dropped), "insert", g)
        elif vis_dropped is not None:
            _tag(vis_dropped, "delete", g)
        elif vis_added is not None:
            _tag(vis_added, "insert", g)
        # kept files: rows newly hidden by added tombstone entries are
        # deletes; rows re-exposed by removed entries are inserts (the
        # materialization path clears entries only after physically
        # removing their matches, so this side is provably empty there
        # — but the formula stays exact if a future writer differs)
        if st["filters_added"] and st["kept"]:
            cand = _kept_candidates(st, st["filters_added"])
            if cand:
                _tag(_match_any(_vis(_read(cand), st["filters_prev"]),
                                st["filters_added"]), "delete", g)
        if st["filters_removed"] and st["kept"]:
            cand = _kept_candidates(st, st["filters_removed"])
            if cand:
                _tag(_match_any(_vis(_read(cand), st["filters_new"]),
                                st["filters_removed"]), "insert", g)

    if not parts:
        base = (spark.createDataFrame([], merged) if merged is not None
                else spark.read.option("basePath", d).parquet(d)
                .filter(F.lit(False)))
        return base.select(
            "*", F.lit(None).cast("string").alias("_change_type"),
            F.lit(None).cast("int").alias("_change_generation"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_routed_between(spark: SparkSession, cfg: PipelineConfig,
                        from_batch: str, to_batch: str | None = None,
                        predicates=None) -> DataFrame:
    """Incremental read of the WHOLE routed table on the batch axis:
    the rows of every batch committed AFTER ``from_batch`` up to and
    including ``to_batch`` (default: the latest commit) — the feed a
    downstream consumer tails instead of re-scanning 100 TB.  Batch
    commits are append-only at the table level, so this is always
    sound; each batch resolves through the manifest layers
    (``table_scan``), so consolidation/compaction racing the read is
    invisible and already-consolidated ids still answer exactly."""
    recover_compactions(cfg)
    ids = committed_batch_ids(cfg)
    if from_batch not in ids:
        raise ValueError(f"batch {from_batch!r} is not committed")
    lo = ids.index(from_batch) + 1
    if to_batch is None:
        hi = len(ids)
    else:
        if to_batch not in ids:
            raise ValueError(f"batch {to_batch!r} is not committed")
        hi = ids.index(to_batch) + 1
    if hi < lo:
        raise ValueError(
            f"{to_batch!r} was committed before {from_batch!r}")
    return table_scan(spark, cfg, ids[lo:hi], predicates=predicates)


def rollback_batch(cfg: PipelineConfig, name: str,
                   generation: int) -> dict:
    """Roll one dir back to ``generation`` (undo a compaction, delete,
    or merge on that dir) by publishing the old file list as a NEW
    generation — history only moves forward (commit.
    rollback_to_generation).  The superseded current files retire under
    the retention window.  Requires the target snapshot to still be
    readable.  Returns {dir, rolled_back_to, generation_now, n_files}."""
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        get_committer, rollback_to_generation,
    )

    d = _resolve_table_dir(cfg, name)
    committer = get_committer(cfg.commit_protocol)
    man = rollback_to_generation(committer, d, generation)
    return {"dir": os.path.basename(d), "rolled_back_to": generation,
            "generation_now": man["generation"],
            "n_files": len(man["files"])}


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

    from logfowd2_spark.streaming.commit import read_table_manifest  # noqa: PLC0415

    root = os.path.join(cfg.output_path, "routed")
    batch_dir = os.path.join(root, f"batch_id={batch_id}")
    tman = read_table_manifest(root)
    if tman is not None and batch_id in tman["consolidated_ids"]:
        # the batch lives in the consolidated generation now — scan it
        # through the table layer (IN-filter on the batch_id column) and
        # count from the checkpoint manifest's committed sink counts
        df = table_scan(spark, cfg, [batch_id])
        rec = load_manifest(
            os.path.join(cfg.checkpoint_path, "manifest.json")
        ).batches.get(batch_id)
        # rec is always present for a consolidated id (consolidation
        # takes ids FROM the checkpoint manifest); df.count() is the
        # defensive fallback for a hand-edited checkpoint — and the
        # EXACT path once a COW delete touched the generation (the
        # checkpoint's commit-time sink counts predate the deletes)
        from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
            CONSOLIDATED_DIR, read_file_manifest,
        )

        deleted = (read_file_manifest(os.path.join(root, CONSOLIDATED_DIR))
                   or {}).get("deleted_rows", 0)
        n_rows = (sum(rec.sink_counts.values())
                  if rec and not deleted else df.count())
    else:
        from logfowd2_spark.streaming.commit import read_file_manifest  # noqa: PLC0415

        paths = resolve_batch_paths(root, batch_id) or [batch_dir]
        df = spark.read.option("basePath", batch_dir).parquet(*paths)
        man_b = read_file_manifest(batch_dir)
        if (man_b or {}).get("delete_filters"):
            # deferred tombstones: apply at scan and recount exactly
            # (manifest stats still count tombstoned rows by design)
            df = apply_delete_filters(df, man_b)
            n_rows = df.count()
        else:
            n_rows = None
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
    # manifest-bearing dir answers from its commit-time stats, a
    # consolidated batch from its checkpoint-manifest sink counts
    if n_rows is not None:
        return n_rows
    from logfowd2_spark.streaming.commit import manifest_rows  # noqa: PLC0415

    if paths == [batch_dir]:
        return _tree_num_rows(batch_dir)
    n = manifest_rows(batch_dir)
    if n is not None:
        return n
    import pyarrow.parquet as pq  # noqa: PLC0415

    return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)


_Z_STR_BASE = 65536  # codepoints clamped + packed base-2^16, 4 chars


def _z_prefix_num(s: str) -> float:
    """Python mirror of the Spark string→number packing below, for
    deriving domains from manifest string bounds."""
    v = 0.0
    for i, ch in enumerate(s[:4]):
        v += min(ord(ch), _Z_STR_BASE - 1) * float(_Z_STR_BASE ** (3 - i))
    return v


def _znum_expr(col: str, dtype: str):
    """An order-preserving numeric (double) projection of a column, for
    Z-value bucketing.  Strings pack their first 4 codepoints base-2¹⁶
    (prefix order ≈ string order — Z-locality is advisory, pruning
    correctness never depends on it); temporal types become epoch
    numbers; anything else falls back to a hash (locality lost for that
    column only, still a valid total order to bucket on)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    c = F.col(col)
    if dtype == "string":
        e = None
        for i in range(4):
            term = (
                F.least(
                    F.coalesce(F.ascii(F.substring(c, i + 1, 1)), F.lit(0)),
                    F.lit(_Z_STR_BASE - 1),
                ).cast("double")
                * F.lit(float(_Z_STR_BASE ** (3 - i)))
            )
            e = term if e is None else e + term
        return e
    if dtype == "date":
        return F.datediff(c, F.to_date(F.lit("1970-01-01"))).cast("double")
    if dtype.startswith("timestamp"):
        return c.cast("double")  # epoch seconds
    if dtype in ("tinyint", "smallint", "int", "bigint", "float",
                 "double") or dtype.startswith("decimal"):
        return c.cast("double")
    if dtype == "boolean":
        return c.cast("int").cast("double")
    return F.xxhash64(c).cast("double")


def _z_bound_num(bound, tag: str | None) -> float | None:
    """A manifest column bound (``_encode_bound`` domain + type tag) in
    the ``_znum_expr`` numeric domain — None when not convertible."""
    import datetime  # noqa: PLC0415

    if bound is None or tag is None:
        return None
    if tag in ("i", "f"):
        return float(bound)
    if tag == "s":
        return _z_prefix_num(str(bound))
    if tag == "d":
        return float(
            (datetime.date.fromisoformat(bound)
             - datetime.date(1970, 1, 1)).days)
    if tag == "t":
        dt = datetime.datetime.strptime(bound, "%Y-%m-%dT%H:%M:%S.%f")
        return dt.replace(tzinfo=datetime.timezone.utc).timestamp()
    return None


def _z_domains_from_manifests(mans, cols) -> dict[str, tuple] | None:
    """Per-column (min, max) in the Z numeric domain, aggregated from
    the source manifests' commit-time file bounds — the rewrite's
    scaling constants WITHOUT an extra pass over the data.  None when
    any referenced file lacks usable bounds for any column (caller
    falls back to one agg job)."""
    out: dict[str, tuple] = {}
    for col in cols:
        lo = hi = None
        for man in mans:
            if man is None:
                return None
            stats = man.get("stats") or {}
            for f in man.get("files", []):
                b = ((stats.get(f) or {}).get("cols") or {}).get(col)
                if b is None:
                    return None
                tag = b[2] if len(b) > 2 else None
                bl, bh = _z_bound_num(b[0], tag), _z_bound_num(b[1], tag)
                if bl is None or bh is None:
                    return None
                lo = bl if lo is None else min(lo, bl)
                hi = bh if hi is None else max(hi, bh)
        if lo is None:
            return None
        out[col] = (lo, hi)
    return out


def zorder_column(df, cols, mans=None, bits: int | None = None):
    """The Z-value (bit-interleaved multi-column locality key) of
    ``cols`` as one ``bigint`` Column — Iceberg/Delta Z-ORDER, derived
    from the VALUES (scaled into 2^bits buckets per column against
    domains from the source manifests, or one agg job when manifests
    can't answer), never from ranks: no per-column global sorts, one
    codegen projection.  Range-partitioning + sorting the rewrite on it
    gives every output file a narrow hypercube of the joint domain, so
    commit-time manifest bounds/membership prune lookups on ANY
    clustered column."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    cols = list(cols)
    if bits is None:
        bits = max(1, min(16, 63 // max(1, len(cols))))
    nb = 1 << bits
    dtypes = dict(df.dtypes)
    nums = {c: _znum_expr(c, dtypes[c]) for c in cols}
    domains = _z_domains_from_manifests(mans or [], cols)
    if domains is None:
        row = df.agg(*[F.min(nums[c]).alias(f"mn_{i}") for i, c in
                       enumerate(cols)],
                     *[F.max(nums[c]).alias(f"mx_{i}") for i, c in
                       enumerate(cols)]).collect()[0]
        domains = {c: (row[f"mn_{i}"], row[f"mx_{i}"])
                   for i, c in enumerate(cols)}
    buckets = []
    for c in cols:
        mn, mx = domains[c]
        if mn is None or mx is None or not mx > mn:
            buckets.append(F.lit(0).cast("long"))
            continue
        scaled = F.floor((nums[c] - F.lit(float(mn)))
                         / F.lit(float(mx - mn)) * F.lit(float(nb)))
        # greatest/least skip SQL nulls → a null value lands in bucket 0
        buckets.append(
            F.least(F.lit(nb - 1),
                    F.greatest(F.lit(0), scaled)).cast("long"))
    z = None
    for b in range(bits):
        for i, bk in enumerate(buckets):
            bit = F.shiftleft(
                F.shiftrightunsigned(bk, b).bitwiseAND(F.lit(1)),
                b * len(buckets) + i,
            )
            z = bit if z is None else z.bitwiseOR(bit)
    return z


def _rewrite_layout(df, cfg: PipelineConfig, rows: int,
                    target_records_per_file: int, mans=None):
    """The compaction rewrite's physical layout.

    Default: AQE hash-REBALANCE on sink_id (runtime split-sizing +
    hot-sink salting) — arrival order within each sink is preserved,
    which keeps the natural ts clustering of log data.

    With ``cfg.compact_cluster_cols``: a RANGE partition + in-partition
    sort on (sink_id, log_date, *cluster_cols) — Iceberg's sort-order
    rewrite.  Range partitioning gives each shuffle partition (hence
    each written file, under partitionBy) a DISJOINT slice of the
    cluster columns' domain, so the manifest bounds/membership recorded
    at the flip turn a point lookup on a scattered key (pod_name == X)
    into ~one file per partition.  The partition count is sized from
    the verified source row count so files land near
    ``target_records_per_file`` even where AQE can't see (range
    shuffles aren't AQE-coalesced when a sort rides on them)."""
    if not cfg.compact_cluster_cols:
        return df.hint("rebalance", "sink_id")
    import math  # noqa: PLC0415

    n = max(df.sparkSession.sparkContext.defaultParallelism,
            math.ceil(rows / max(1, target_records_per_file)))
    if (cfg.compact_cluster_mode == "zorder"
            and len(cfg.compact_cluster_cols) >= 2):
        z = zorder_column(df, cfg.compact_cluster_cols, mans=mans)
        keys = ["sink_id", "log_date", "__zorder"]
        return (
            df.withColumn("__zorder", z)
            .repartitionByRange(n, *keys)
            .sortWithinPartitions(*keys)
            .drop("__zorder")  # projection on top keeps the sort order
        )
    keys = ["sink_id", "log_date", *cfg.compact_cluster_cols]
    return df.repartitionByRange(n, *keys).sortWithinPartitions(*keys)


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
        collect_file_stats, data_files, get_committer, manifest_schema,
        manifest_swap, read_file_manifest, stage_path,
    )

    import pyarrow.parquet as pq  # noqa: PLC0415

    committer = get_committer(cfg.commit_protocol)
    recover_compactions(cfg)
    root = os.path.join(cfg.output_path, "routed")
    batch_dir = os.path.join(root, f"batch_id={batch_id}")
    if not os.path.isdir(batch_dir):
        raise ValueError(f"no such batch dir: {batch_dir}")
    # deferred-delete tombstones materialize BEFORE the rewrite — a
    # compaction must never fold tombstoned rows into a generation
    # whose tombstones it then drops
    materialize_deletes(spark, cfg, dirs=[batch_dir])
    tmp = stage_path(batch_dir)
    shutil.rmtree(tmp, ignore_errors=True)

    # read AND count through the manifest resolution: a directory walk
    # would pick up unreferenced files (a deliberately deferred vacuum)
    # and the rewrite would silently COMMIT the doubled rows — both
    # sides of the row-count guard would agree on the wrong number.
    # tree_num_rows/files are manifest-resolving, so a manifest-bearing
    # batch dir answers from commit-time stats with zero footer opens.
    # The manifest-carried schema (when present) pins the read so the
    # rewrite round-trips the batch's exact column set, and rides the
    # swap into the new generation's manifest.
    paths = resolve_batch_paths(root, batch_id) or [batch_dir]
    files_before = _tree_num_files(batch_dir)
    src_man = read_file_manifest(batch_dir)
    sch = manifest_schema(src_man)
    rd = spark.read.schema(sch) if sch is not None else spark.read
    df = rd.option("basePath", batch_dir).parquet(*paths)
    if paths == [batch_dir]:
        rows_before = _tree_num_rows(batch_dir)
    else:
        rows_before = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    (
        _rewrite_layout(df, cfg, rows_before, target_records_per_file,
                        mans=[src_man])
        .write.mode("overwrite")
        .partitionBy("sink_id", "log_date")
        .option("maxRecordsPerFile", str(target_records_per_file))
        .parquet(tmp)
    )
    # ONE footer pass over the fresh generation serves both the verify
    # guard and the swapped-in manifest's stats
    new_files = data_files(tmp)
    new_stats = collect_file_stats(tmp, new_files,
                                   detail_cols=cfg.stats_detail_cols,
                                   spark=spark)
    rows_after = sum(s["rows"] for s in new_stats.values())
    if rows_before != rows_after:  # never swap a lossy rewrite
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {rows_before} -> {rows_after}"
        )
    # vacuum_retention_s > 0 defers the old generation's removal to the
    # vacuum_expired maintenance pass (snapshot expiry), so a reader
    # that resolved the pre-swap manifest survives flip AND vacuum
    data_schema = df.drop("sink_id", "log_date").schema
    manifest_swap(committer, batch_dir, tmp, stats=new_stats,
                  vacuum=cfg.vacuum_retention_s <= 0,
                  retain_previous=cfg.vacuum_retention_s > 0,
                  extra={"schema": data_schema.jsonValue()},
                  expected_generation=(src_man["generation"]
                                       if src_man else None))
    return {
        "files_before": files_before,
        "files_after": _tree_num_files(batch_dir),
        "rows": rows_after,
    }


def _recover_table_pointer(cfg: PipelineConfig, committer, root: str,
                           tman: dict, man_c: dict | None) -> dict:
    """PHASE-2 RECOVERY of the table-level commit: the consolidated
    manifest records which ids its current generation covers
    (``consolidates``, written atomically with the flip).  A crash
    between the flip and the ``_TABLE.json`` put leaves ids
    consolidated on disk but unrecorded — re-staging them would LIST
    THEIR ROWS TWICE (``keep_prev_files`` re-lists the crashed
    generation's files alongside the retry's).  Finish phase 2 for
    them instead: record the ids in the table pointer and move on.
    Returns the (possibly updated) table manifest."""
    import time as _time  # noqa: PLC0415

    from logfowd2_spark.streaming.commit import write_table_manifest  # noqa: PLC0415

    recorded = set(tman["consolidated_ids"])
    covered = (man_c or {}).get("consolidates", [])
    orphans = [b for b in covered if b not in recorded]
    if orphans:
        now = _time.time()
        tman = {
            **tman,  # unknown table-level keys (dropped_columns) ride
            "version": 1,
            "consolidated_ids": tman["consolidated_ids"] + orphans,
            "pending": tman.get("pending", [])
            + [{"batch_id": b, "superseded_at": now} for b in orphans],
        }
        write_table_manifest(committer, root, tman)
        _reap_pending_dirs(cfg)
    return tman


def _reap_pending_dirs(cfg: PipelineConfig, now: float | None = None,
                       pinned_dirs: set | None = None) -> list[str]:
    """Remove per-batch dirs superseded by a table consolidation once
    their retention window has passed (``pending`` entries in
    ``_TABLE.json``).  The dirs are retention copies readers already
    exclude, so removal is pure space reclamation — idempotent and
    crash-safe (a stale pending entry just retries here)."""
    import time as _time

    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        get_committer, read_table_manifest, write_table_manifest,
    )

    root = os.path.join(cfg.output_path, "routed")
    tman = read_table_manifest(root)
    if tman is None or not tman.get("pending"):
        return []
    now = _time.time() if now is None else now
    # a tag naming a superseded per-batch dir pins the DIR: it is the
    # tag's only copy of that member's data
    tagged_dirs = (set(_pinned_by_tags(cfg))
                   if pinned_dirs is None else pinned_dirs)
    remaining, removed = [], []
    for ent in tman["pending"]:
        if f"batch_id={ent['batch_id']}" in tagged_dirs:
            remaining.append(ent)
            continue
        if now - ent["superseded_at"] >= cfg.vacuum_retention_s:
            shutil.rmtree(os.path.join(root, f"batch_id={ent['batch_id']}"),
                          ignore_errors=True)
            removed.append(ent["batch_id"])
        else:
            remaining.append(ent)
    if removed:
        write_table_manifest(
            get_committer(cfg.commit_protocol), root,
            {**tman, "pending": remaining},
        )
    return removed


def compact_table(spark: SparkSession, cfg: PipelineConfig,
                  target_records_per_file: int = 1_000_000,
                  upto_batch_id: str | None = None) -> dict:
    """CROSS-BATCH compaction: bin-pack the not-yet-consolidated batch
    dirs into the table's ``_consolidated`` generation under a single
    manifest flip.  ``compact_batch`` fixes small files WITHIN one
    batch; at 10⁵ committed micro-batches the small-file pressure is
    across batch dirs — 10⁵ directory listings and manifest reads per
    table scan — and this pass collapses them into target-sized files
    partitioned by (sink_id, log_date) with ``batch_id`` preserved as a
    DATA column, so ``read_routed_as_of`` on any pre-consolidation
    batch id stays exact (an ``IN`` filter pruned by parquet row-group
    statistics — the lakehouse snapshot-filter shape, vs. Iceberg
    carrying the same mapping in manifest partition summaries).

    Commit sequence, each step atomic or replayable:

    1. stage the consolidated rewrite (``_stage__consolidated``);
    2. ``manifest_swap`` with ``keep_prev_files``: earlier consolidated
       generations' files stay listed; crash → ``recover()`` replays;
    3. put ``_TABLE.json`` recording the newly consolidated ids — THE
       table-level commit point readers switch on;
    4. superseded per-batch dirs become ``pending`` retention copies,
       reaped by ``_reap_pending_dirs`` after ``vacuum_retention_s``
       (immediately when 0).  A crash between 3 and 4 leaves only
       excluded copies.

    Row safety: the rewrite is footer-verified against the per-batch
    manifests' commit-time stats before the flip.  Returns
    {consolidated_ids, rows, files_before, files_after}."""
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        CONSOLIDATED_DIR, collect_file_stats, data_files, get_committer,
        manifest_swap, read_table_manifest, stage_path,
        write_table_manifest,
    )

    import time as _time

    committer = get_committer(cfg.commit_protocol)
    recover_compactions(cfg)
    # deferred-delete tombstones materialize BEFORE the consolidation:
    # the rewrite folds sources into the consolidated generation and a
    # per-source tombstone cannot survive that move (it would wrongly
    # apply to every other source's rows)
    materialize_deletes(spark, cfg)
    root = os.path.join(cfg.output_path, "routed")
    live = os.path.join(root, CONSOLIDATED_DIR)
    tman = read_table_manifest(root) or {
        "version": 1, "consolidated_ids": [], "pending": [],
    }

    from logfowd2_spark.streaming.commit import read_file_manifest  # noqa: PLC0415

    man_c = read_file_manifest(live)
    tman = _recover_table_pointer(cfg, committer, root, tman, man_c)

    ids = committed_batch_ids(cfg)
    if upto_batch_id is not None:
        if upto_batch_id not in ids:
            raise ValueError(f"batch {upto_batch_id!r} is not committed")
        ids = ids[: ids.index(upto_batch_id) + 1]
    cons_set = set(tman["consolidated_ids"])
    # dir-less ids (skip-existing watermark records — zero rows, no
    # routed dir ever written) have nothing to consolidate; including
    # them would stage a zero-path rewrite (AnalysisException) and
    # permanently inflate the auto-compact pending count
    new_ids = [b for b in ids if b not in cons_set
               and os.path.isdir(os.path.join(root, f"batch_id={b}"))]
    if not new_ids:
        return {"consolidated_ids": [], "rows": 0,
                "files_before": 0, "files_after": 0}

    stage = stage_path(live)
    shutil.rmtree(stage, ignore_errors=True)
    src_paths = [p for b in new_ids for p in resolve_batch_paths(root, b)]
    files_before = len(src_paths)
    # rows_before from the per-batch manifests' commit-time stats —
    # zero footer opens on the source side
    rows_before = sum(
        _tree_num_rows(os.path.join(root, f"batch_id={b}")) for b in new_ids
    )
    # SCHEMA-SAFE consolidation: read under the by-name merge of the
    # source batches' manifest schemas, so a column added by a newer
    # writer survives the rewrite (a plain multi-path read takes ONE
    # file's footer schema and would silently drop evolved columns).
    # Legacy (schema-less) sources fall back to distributed footer
    # merging — slower but equally loss-proof.
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        manifest_schema, merge_schemas,
    )

    src_mans = [
        read_file_manifest(os.path.join(root, f"batch_id={b}"))
        for b in new_ids
    ]
    src_schemas = [manifest_schema(m) for m in src_mans]
    src_deleted = sum((m or {}).get("deleted_rows", 0) for m in src_mans)
    if all(s is not None for s in src_schemas):
        rd = spark.read.schema(merge_schemas(src_schemas))
    else:
        rd = spark.read.option("mergeSchema", "true")
    df = rd.option("basePath", root).parquet(*src_paths)
    # the flipped manifest's schema must also cover the PREVIOUS
    # consolidated generation's files (keep_prev_files re-lists them):
    # merge it in up front — a type conflict aborts loudly BEFORE the
    # rewrite runs, never after a half-committed flip
    new_data_schema = df.drop("sink_id", "log_date").schema
    prev_s = manifest_schema(man_c)
    if man_c is None:
        rec_schema = new_data_schema
    elif prev_s is not None:
        rec_schema = merge_schemas([prev_s, new_data_schema])
    else:
        rec_schema = None  # legacy consolidated gen: stay schema-less
    (
        _rewrite_layout(df, cfg, rows_before, target_records_per_file,
                        mans=src_mans)
        .write.mode("overwrite")
        .partitionBy("sink_id", "log_date")
        .option("maxRecordsPerFile", str(target_records_per_file))
        .parquet(stage)
    )
    new_files = data_files(stage)
    new_stats = collect_file_stats(stage, new_files,
                                   detail_cols=cfg.stats_detail_cols,
                                   spark=spark)
    rows_after = sum(s["rows"] for s in new_stats.values())
    if rows_before != rows_after:  # never flip a lossy rewrite
        shutil.rmtree(stage, ignore_errors=True)
        raise RuntimeError(
            f"table compaction row mismatch: {rows_before} -> {rows_after}"
        )
    # the flip carries the CUMULATIVE covered-id list ("consolidates"),
    # making it the phase-1 commit record the recovery block above
    # resolves a crashed phase 2 from
    extra = {"consolidates": tman["consolidated_ids"] + new_ids,
             # absorption lineage: each source dir's final generation at
             # consolidation time (cumulative, like ``consolidates``) —
             # lets a lagging CDC reader prove a reaped source dir had
             # no changes it hadn't consumed (commit.
             # consolidation_coverage)
             "consolidated_gens": {
                 **((man_c or {}).get("consolidated_gens") or {}),
                 **{b: (m["generation"] if m else None)
                    for b, m in zip(new_ids, src_mans)},
             }}
    if rec_schema is not None:
        extra["schema"] = rec_schema.jsonValue()
    prev_deleted = (man_c or {}).get("deleted_rows", 0)
    if prev_deleted or src_deleted:
        # COW deletes touched the previous generation (files re-listed
        # here) and/or the source batch dirs (rows already physically
        # absent from this rewrite) — the marker (export_ndjson_bulk's
        # signal that checkpoint sink counts are stale) must survive
        extra["deleted_rows"] = prev_deleted + src_deleted
    manifest_swap(committer, live, stage, stats=new_stats,
                  keep_prev_files=True, extra=extra,
                  expected_generation=(man_c["generation"]
                                       if man_c else None))
    now = _time.time()
    write_table_manifest(committer, root, {
        **tman,  # unknown table-level keys (dropped_columns) ride
        "version": 1,
        "consolidated_ids": tman["consolidated_ids"] + new_ids,
        "pending": tman.get("pending", [])
        + [{"batch_id": b, "superseded_at": now} for b in new_ids],
    })
    _reap_pending_dirs(cfg)  # immediate when vacuum_retention_s == 0
    return {
        "consolidated_ids": new_ids,
        "rows": rows_after,
        "files_before": files_before,
        "files_after": len(new_files),
    }
