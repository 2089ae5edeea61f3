"""Consumer-group followers over the routed table — the downstream
half of the tailing story.

``read_routed_between`` (maintenance.py) gives the incremental FEED:
the batches committed after a watermark.  This module adds what a
production consumer actually needs on top of it, shaped like a Kafka
consumer group over a single-partition log whose offsets are the
committed batch ids (append-only, commit-ordered — pipeline.py's
checkpoint manifest):

- **Durable group offsets** — one small JSON per group under
  ``<output>/_consumers/<group>/``, written with the table's own
  atomic committer (temp+replace+fsync), never a broker.
- **poll / commit at-least-once** — ``poll`` plans a scan over exactly
  the unconsumed batches (through ``table_scan``, so consolidation,
  schema evolution, and tombstones all resolve) and returns a cursor;
  nothing advances until ``commit_cursor``.  A crash between the two
  re-delivers — classic at-least-once, and the delivered unit is a
  whole committed batch, so downstream dedup is by ``batch_id``.
- **Exactly-once table-to-table delivery** — ``deliver_exactly_once``
  stores the group cursor INSIDE the destination table's ``_FILES.json``
  manifest and advances it in the SAME ``manifest_swap`` that publishes
  the delivered rows: offset and output commit in one atomic pointer
  flip (the transactional-sink pattern — Kafka's "store offsets in the
  sink" / Delta's ``txn`` action).  A crash before the flip leaves
  nothing visible and the next run re-polls the same range; a crash
  after it is already committed and the replayed swap is idempotent
  (commit.py's marker replay + commit-token claims).

Reference parity: the reference pipeline terminates in its ES sink
(pool.rs — the bulk writer is the only consumer).  Here the committed
table IS the handoff point, and followers are how N independent
downstream jobs (index builder, dedup store, training-data packer)
each tail it once, exactly once, at their own pace.

Scale: a poll is metadata-first — one checkpoint-manifest read, one
cursor read, then a scan planned over only the new batches' manifest
file lists (no listings of consumed data).  At 100 TB / 10⁵ committed
batches the per-poll cost is the new data only, which is the whole
point of tailing.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from logfowd2_spark.config import PipelineConfig

CURSOR_FILE = "_CURSOR.json"
CONSUMERS_DIR = "_consumers"
#: manifest key carrying a delivery cursor inside a destination table's
#: ``_FILES.json`` (deliver_exactly_once) — the Delta ``txn`` analogue
MANIFEST_CURSOR_KEY = "consumer_cursor"


class CursorDiverged(RuntimeError):
    """The stored cursor no longer aligns with the table's committed
    batch log (checkpoint manifest rewritten / table recreated under
    the same path).  Consuming past this silently would re-deliver or
    skip arbitrary data — the caller must decide (reset_cursor)."""


def _group_dir(cfg: PipelineConfig, group: str) -> str:
    from logfowd2_spark.streaming.commit import validate_ref_name  # noqa: PLC0415

    validate_ref_name(group, "consumer group")
    return os.path.join(cfg.output_path, CONSUMERS_DIR, group)


def load_cursor(cfg: PipelineConfig, group: str) -> dict | None:
    """The group's durably committed cursor, or None for a new group."""
    path = os.path.join(_group_dir(cfg, group), CURSOR_FILE)
    try:
        with open(path) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def reset_cursor(cfg: PipelineConfig, group: str) -> None:
    """Drop the group's cursor — the next poll starts from the log's
    beginning (Kafka ``--reset-offsets --to-earliest``)."""
    path = os.path.join(_group_dir(cfg, group), CURSOR_FILE)
    try:
        os.remove(path)
    except FileNotFoundError:
        pass


def _check_alignment(ids: list[str], cursor: dict | None) -> int:
    """Validate the cursor against the live batch log; return the index
    of the first unconsumed batch.  The log is append-only, so a valid
    cursor's (position, last_batch) must still name the same prefix."""
    if cursor is None:
        return 0
    pos = int(cursor["position"])
    last = cursor.get("last_batch")
    if pos == 0:
        return 0
    if pos > len(ids) or ids[pos - 1] != last:
        raise CursorDiverged(
            f"cursor at position {pos} expects batch {last!r} but the "
            f"committed log has "
            f"{ids[pos - 1] if pos <= len(ids) else '<nothing>'!r} there "
            f"— the table history diverged from this group's cursor")
    return pos


@dataclass
class Delivery:
    """One poll's result: ``df`` plans exactly the unconsumed batches
    (None when there is nothing new — no job is ever planned for an
    empty poll), and ``cursor`` is what ``commit_cursor`` persists
    AFTER the caller has durably processed ``df``."""

    df: DataFrame | None
    batch_ids: list[str] = field(default_factory=list)
    cursor: dict = field(default_factory=dict)


def poll(spark: SparkSession, cfg: PipelineConfig, group: str,
         max_batches: int | None = None, predicates=None,
         cursor: dict | None = None) -> Delivery:
    """Plan the group's next delivery: every batch committed after the
    cursor (capped at ``max_batches``), scanned through the table's
    metadata layers (consolidation, manifest schemas, tombstones,
    data-skipping ``predicates`` — maintenance.table_scan).  Does NOT
    advance anything; pair with ``commit_cursor`` after processing.

    ``cursor`` overrides the durable one (deliver_exactly_once passes
    the destination-manifest cursor here)."""
    from logfowd2_spark.streaming.maintenance import (  # noqa: PLC0415
        committed_batch_ids, recover_compactions, table_scan,
    )

    recover_compactions(cfg)
    ids = committed_batch_ids(cfg)
    if cursor is None:
        cursor = load_cursor(cfg, group)
    elif cursor.get("group") not in (None, group):
        raise ValueError(
            f"cursor belongs to group {cursor.get('group')!r}, "
            f"polled as {group!r}")
    if cursor is not None and cursor.get("mode") == "changes":
        raise ValueError(
            f"group {group!r} is a CDC group (poll_changes) — an "
            f"appends-mode poll would drop its retraction state")
    start = _check_alignment(ids, cursor)
    new_ids = ids[start:]
    if max_batches is not None:
        new_ids = new_ids[:max_batches]
    pos = start + len(new_ids)
    nxt = {
        "version": 1,
        "group": group,
        "position": pos,
        "last_batch": ids[pos - 1] if pos else None,
        "committed_at": time.time(),
    }
    df = table_scan(spark, cfg, new_ids, predicates=predicates) \
        if new_ids else None
    return Delivery(df=df, batch_ids=new_ids, cursor=nxt)


def poll_changes(spark: SparkSession, cfg: PipelineConfig, group: str,
                 max_batches: int | None = None,
                 cursor: dict | None = None) -> Delivery:
    """CDC-mode poll: the group's next delivery INCLUDING retractions —
    data columns plus ``_change_type`` ('insert'/'delete'),
    ``_change_generation``, and ``_change_source`` (which table dir
    committed the change).  The appends-mode ``poll`` never re-visits a
    delivered batch, so a downstream copy silently diverges when a
    delete/merge later rewrites one; this poll tails those too —
    Iceberg's changelog scan turned into a consumable group feed.

    Semantics (replay contract): apply deliveries in poll order; within
    one poll, inserts precede changes, and a source's changes apply in
    ``_change_generation`` order.  Then at every commit point
    ``inserts ∖ deletes == the table's visible content restricted to
    the consumed batches`` as multisets (pinned by test_follower_cdc).

    How each table event surfaces:

    - a NEW batch delivers its currently-visible rows as inserts
      (``_change_generation`` 0) and its dir's generation is tracked;
    - a tracked dir's generation advancing delivers that dir's exact
      changelog slice (``read_changes_between`` — COW deletes, deferred
      tombstones, merges; compactions elided);
    - a table CONSOLIDATION delivers nothing: the absorbing flip is
      row-count-verified content-preserving, the absorbed dir's
      tracking moves to the consolidated generation's changelog
      (``elide_consolidations`` diffs straight across the absorption),
      and later deletes on consolidated data still surface — filtered
      by ``batch_id`` to rows this group actually consumed, so a
      retraction of a batch it has NOT yet inserted is never delivered
      (that batch's eventual insert already excludes the rows);
    - a tracked dir REAPED past retention is proven harmless via the
      absorption lineage (``consolidation_coverage``: the flip recorded
      the dir's final generation) — unconsumed changes lost to expiry
      raise ``CursorDiverged`` instead of silently skipping, Iceberg's
      changelog-past-expiry contract.

    Scale: metadata-first like ``poll`` — the changelog slices read
    only files their flips touched, so cost is new data + churn."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        CONSOLIDATED_DIR, changelog_entries, consolidation_coverage,
        read_file_manifest, read_table_manifest,
    )
    from logfowd2_spark.streaming.maintenance import (  # noqa: PLC0415
        apply_table_surface, committed_batch_ids, read_changes_between,
        recover_compactions, table_scan,
    )

    recover_compactions(cfg)
    ids = committed_batch_ids(cfg)
    if cursor is None:
        cursor = load_cursor(cfg, group)
    elif cursor.get("group") not in (None, group):
        raise ValueError(
            f"cursor belongs to group {cursor.get('group')!r}, "
            f"polled as {group!r}")
    if cursor is not None and cursor.get("mode") != "changes" \
            and int(cursor.get("position") or 0) > 0:
        raise ValueError(
            f"group {group!r} is an appends-mode group — re-polling it "
            f"as CDC would re-deliver everything; use a new group")
    start = _check_alignment(ids, cursor)
    consumed = ids[:start]
    root = os.path.join(cfg.output_path, "routed")
    tman = read_table_manifest(root)
    cons_ids = set(tman["consolidated_ids"]) if tman else set()
    cons_live = os.path.join(root, CONSOLIDATED_DIR)
    dirs: dict[str, int] = dict((cursor or {}).get("dirs") or {})
    parts: list[DataFrame] = []
    _coverage: list[dict | None] = [None]  # lazy, one metadata walk

    def coverage() -> dict:
        if _coverage[0] is None:
            _coverage[0] = consolidation_coverage(cons_live)
        return _coverage[0]

    def _tagged(df: DataFrame, source: str, batch: str | None) -> DataFrame:
        if batch is not None and "batch_id" not in df.columns:
            # per-dir reads recover only the partitions BELOW the dir
            df = df.withColumn("batch_id", F.lit(batch))
        # the table-surface drop/rename projection is applied to the
        # changelog parts too: inserts come from table_scan (surfaced
        # names) and a physical-name changelog unioned against them
        # would null-pad, so a CDC group's deletes would no longer
        # cancel its inserts on evolved tables (the `_change_*` columns
        # are untouched — they are not legal rename/drop targets)
        return apply_table_surface(df, cfg) \
            .withColumn("_change_source", F.lit(source))

    # -- 1. tracked per-batch dirs: their own changelog up to their
    #       final generation; absorbed dirs hand tracking over
    for name, g in sorted(dirs.items()):
        b = name.split("=", 1)[1]
        man = read_file_manifest(os.path.join(root, name))
        if man is None:
            if os.path.isdir(os.path.join(root, name)):
                # legacy (manifest-less) dir, still unadopted: nothing
                # can have flipped — keep tracking at the adoption
                # baseline (_ensure_manifest publishes generation 0)
                continue
            cov = coverage().get(b)
            if b in cons_ids and cov is not None and \
                    cov.get("source_generation") == g:
                del dirs[name]  # fully consumed before absorption
                continue
            lineage = ("is unrecorded"
                       if cov is None or cov.get("source_generation") is None
                       else f"ends at generation {cov['source_generation']}")
            raise CursorDiverged(
                f"dir {name!r} is gone and its absorption lineage "
                f"{lineage} while group {group!r} consumed through {g} "
                f"— its changes diverged or expired past retention")
        if man["generation"] > g:
            steps = changelog_entries(os.path.join(root, name), g,
                                      man["generation"])
            # the metadata check keeps pure-compaction generation
            # advances from planning (and, in a delivery sink,
            # flipping) an empty frame; the computed slice is passed
            # through so the read never recomputes it
            if steps:
                parts.append(_tagged(
                    read_changes_between(spark, cfg, name, g,
                                         man["generation"], steps=steps),
                    name, b))
        if b in cons_ids:
            del dirs[name]  # future changes surface via _consolidated
        else:
            dirs[name] = man["generation"]

    # -- 2. the consolidated generation's changelog, provenance-
    #       filtered to batches this group already inserted
    man_c = read_file_manifest(cons_live)
    cons_gen = (cursor or {}).get("cons_gen")
    if man_c is not None:
        if cons_gen is None:
            # first sighting: start at the earliest flip that absorbed
            # a CONSUMED batch (earlier deletes on unconsumed batches
            # are already reflected in their eventual inserts).  An
            # INEXACT sighting — snapshot expiry pruned the log below
            # the true absorbing flip — would make this baseline skip
            # the deletes in between: raise instead of silently
            # diverging (the documented expiry contract).
            covs = [coverage()[b] for b in consumed if b in coverage()]
            stale = [c for c in covs if not c.get("exact")]
            if stale:
                raise CursorDiverged(
                    f"group {group!r} first sees the consolidated "
                    f"changelog after snapshot expiry pruned the "
                    f"absorption lineage of its consumed batches — "
                    f"intervening changes expired past retention")
            cons_gen = (min(c["flip_generation"] for c in covs)
                        if covs else man_c["generation"])
        if man_c["generation"] > cons_gen and consumed:
            steps = changelog_entries(cons_live, cons_gen,
                                      man_c["generation"],
                                      elide_consolidations=True)
            if steps:
                df = read_changes_between(
                    spark, cfg, CONSOLIDATED_DIR, cons_gen,
                    man_c["generation"], elide_consolidations=True,
                    steps=steps)
                parts.append(_tagged(
                    df.filter(F.col("batch_id").isin(list(consumed))),
                    CONSOLIDATED_DIR, None))
        cons_gen = man_c["generation"]

    # -- 3. inserts: new batches' currently-visible content
    new_ids = ids[start:]
    if max_batches is not None:
        new_ids = new_ids[:max_batches]
    if new_ids:
        ins = table_scan(spark, cfg, new_ids).select(
            "*", F.lit("insert").alias("_change_type"),
            F.lit(0).cast("int").alias("_change_generation"))
        parts.append(ins.withColumn(
            "_change_source",
            F.concat(F.lit("batch_id="), F.col("batch_id"))))
        for b in new_ids:
            if b in cons_ids:
                continue  # rides the consolidated changelog (step 2)
            d = os.path.join(root, f"batch_id={b}")
            man_b = read_file_manifest(d)
            if man_b is not None:
                dirs[f"batch_id={b}"] = man_b["generation"]
            elif os.path.isdir(d):
                # legacy dir: adoption publishes generation 0 with the
                # same content this insert delivered
                dirs[f"batch_id={b}"] = 0
            # else: a dir-less watermark record (skip-existing mode,
            # zero rows) — nothing to track, nothing can ever change

    pos = start + len(new_ids)
    nxt = {
        "version": 2,
        "mode": "changes",
        "group": group,
        "position": pos,
        "last_batch": ids[pos - 1] if pos else None,
        "dirs": dirs,
        "cons_gen": cons_gen,
        "committed_at": time.time(),
    }
    df = None
    for p in parts:
        df = p if df is None else df.unionByName(
            p, allowMissingColumns=True)
    return Delivery(df=df, batch_ids=new_ids, cursor=nxt)


def commit_cursor(cfg: PipelineConfig, group: str, cursor: dict) -> None:
    """Durably advance the group's cursor — atomic temp+replace+fsync
    via the table's committer.  Optimistic concurrency: refuses to
    REGRESS (a stale worker committing behind a cursor another worker
    already advanced raises CommitConflict; equal-position recommits
    are idempotent).  Like Kafka, a group is meant to have ONE active
    consumer per partition — this check catches the violation at the
    durable boundary rather than guaranteeing lock-step mutual
    exclusion between concurrent pollers."""
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        CommitConflict, get_committer,
    )

    if cursor.get("group") not in (None, group):
        raise ValueError(
            f"cursor belongs to group {cursor.get('group')!r}, "
            f"committed as {group!r}")
    have = load_cursor(cfg, group)
    if have is not None and int(have["position"]) > int(cursor["position"]):
        raise CommitConflict(
            f"group {group!r} is already at position {have['position']} "
            f"(last {have.get('last_batch')!r}); refusing to regress to "
            f"{cursor['position']}")
    if have is not None and have.get("mode") != cursor.get("mode") \
            and int(have.get("position") or 0) > 0:
        # a zero-position cursor consumed nothing, so either mode may
        # take the group over (mirrors poll_changes' entry guard);
        # past that, crossing modes would corrupt the position's
        # meaning
        raise CommitConflict(
            f"group {group!r} is a "
            f"{'CDC' if have.get('mode') == 'changes' else 'appends'}-mode "
            f"group; refusing a cursor of the other mode")
    if have is not None and cursor.get("mode") == "changes" \
            and int(have["position"]) == int(cursor["position"]):
        # equal-position CDC commits must not regress the retraction
        # sub-state either: a stale worker's cursor with an older
        # cons_gen or older per-dir generations would re-deliver
        # already-applied changes (negative multiplicities downstream)
        hc, cc = have.get("cons_gen") or -1, cursor.get("cons_gen") or -1
        hd = have.get("dirs") or {}
        cd = cursor.get("dirs") or {}
        if cc < hc:
            raise CommitConflict(
                f"group {group!r} consolidated-changelog position would "
                f"regress {hc} -> {cc}")
        stale = [n for n, g in hd.items()
                 if (n in cd and cd[n] < g) or (n not in cd and cc <= hc)]
        if stale:
            raise CommitConflict(
                f"group {group!r} per-dir changelog positions would "
                f"regress: {sorted(stale)}")
    committer = get_committer(cfg.commit_protocol)
    gdir = _group_dir(cfg, group)
    os.makedirs(gdir, exist_ok=True)
    committer.put_file(
        os.path.join(gdir, CURSOR_FILE),
        json.dumps({**cursor, "group": group}).encode())


def group_lag(cfg: PipelineConfig, group: str) -> dict:
    """The group's consumer lag — Kafka's one ops metric that matters,
    metadata-only (checkpoint manifest + the unconsumed dirs' carried
    file stats; zero footer opens on manifest-bearing dirs, no Spark
    job).  Returns {"group", "position", "log_end", "batches_behind",
    "rows_behind", "unsized_batches"} — ``rows_behind`` sums the
    unconsumed per-batch dirs' manifest row counts; ids only resolvable
    through the consolidated generation are counted in
    ``unsized_batches`` instead of guessed."""
    from logfowd2_spark.ioutil import tree_num_rows  # noqa: PLC0415
    from logfowd2_spark.streaming.maintenance import (  # noqa: PLC0415
        committed_batch_ids,
    )

    ids = committed_batch_ids(cfg)
    cursor = load_cursor(cfg, group)
    start = _check_alignment(ids, cursor)
    behind = ids[start:]
    rows, unsized = 0, []
    root = os.path.join(cfg.output_path, "routed")
    for b in behind:
        d = os.path.join(root, f"batch_id={b}")
        if os.path.isdir(d):
            rows += tree_num_rows(d)
        else:
            unsized.append(b)
    return {"group": group, "position": start, "log_end": len(ids),
            "batches_behind": len(behind), "rows_behind": rows,
            "unsized_batches": unsized}


def deliver_exactly_once(spark: SparkSession, cfg: PipelineConfig,
                         group: str, dest: str, transform=None,
                         max_batches: int | None = None,
                         mode: str = "appends") -> dict:
    """Tail the routed table into the parquet table at ``dest`` with
    EXACTLY-ONCE delivery: the group cursor lives inside ``dest``'s own
    ``_FILES.json`` and advances in the same atomic manifest flip that
    publishes the delivered files — offset and output are one commit
    (the transactional-sink pattern; Delta's ``txn`` action, Kafka's
    store-offsets-in-the-sink).

    Crash anywhere: before the flip nothing is visible and the next
    call re-polls the identical range; after it, the commit already
    carries the advanced cursor, and a half-finished flip is replayed
    idempotently by ``recover`` on entry (commit.py marker protocol).

    ``transform`` (df -> df) runs inside the delivery, so a downstream
    projection/filter/repartition ships in the same transaction.
    Returns {"batch_ids", "rows", "generation"} (rows from the
    committed manifest's file stats — no recount).

    ``mode="changes"`` delivers the CDC feed instead (``poll_changes``:
    inserts AND retractions as ``_change_type`` rows) — the destination
    becomes an exactly-once CHANGELOG table downstream jobs replay,
    with the same one-flip offset+output transaction.  A destination is
    permanently one mode (recorded in its cursor)."""
    from logfowd2_spark.streaming.commit import (  # noqa: PLC0415
        CommitConflict, get_committer, manifest_swap, read_file_manifest,
        stage_path,
    )

    _group_dir(cfg, group)  # validate the name BEFORE any work: an
    # invalid group must fail fast, never after the delivery flip
    # (the post-commit observability write-through must only ever see
    # CommitConflict)
    committer = get_committer(cfg.commit_protocol)
    os.makedirs(dest, exist_ok=True)
    # replay a crashed delivery's pending flip BEFORE reading the
    # cursor, so a post-marker crash is finished (and its cursor
    # advance observed) rather than re-delivered
    committer.recover(os.path.dirname(os.path.abspath(dest)))
    man = read_file_manifest(dest)
    cur = (man or {}).get(MANIFEST_CURSOR_KEY)
    if cur is not None and cur.get("group") != group:
        raise ValueError(
            f"{dest!r} is the sink of group {cur.get('group')!r}, "
            f"not {group!r}")
    if mode not in ("appends", "changes"):
        raise ValueError(f"mode must be 'appends' or 'changes', not "
                         f"{mode!r}")
    if cur is None:
        # a FRESH destination must start from the log's beginning — an
        # explicit zero cursor, never the consumers-dir one (falling
        # back there would silently skip every batch a poll/commit
        # consumer already advanced past, leaving the mirror
        # permanently missing data).  Reusing such a group is refused.
        if load_cursor(cfg, group) is not None:
            raise ValueError(
                f"group {group!r} already has a durable poll/commit "
                f"cursor; deliver into a fresh group (or resume the "
                f"existing destination)")
        cur = {"version": 1, "group": group,
               "position": 0, "last_batch": None}
        if mode == "changes":
            cur.update(version=2, mode="changes", dirs={}, cons_gen=None)
    elif (cur.get("mode") == "changes") != (mode == "changes"):
        raise ValueError(
            f"{dest!r} is a {cur.get('mode') or 'appends'}-mode sink; "
            f"polled as {mode!r}")
    if mode == "changes":
        got = poll_changes(spark, cfg, group, max_batches=max_batches,
                           cursor=cur)
    else:
        got = poll(spark, cfg, group, max_batches=max_batches, cursor=cur)
    # changes mode can deliver retractions with zero new batches, so
    # emptiness is "no planned frame", not "no new batch ids"
    if got.df is None:
        if man is not None:
            try:  # keep the lag gauge honest after a crash-replayed
                commit_cursor(cfg, group, got.cursor)  # flip advanced
            except CommitConflict:  # the dest cursor
                pass
        return {"batch_ids": [], "rows": 0,
                "generation": (man or {}).get("generation")}
    df = got.df if transform is None else transform(got.df)
    stage = stage_path(dest)
    import shutil  # noqa: PLC0415

    shutil.rmtree(stage, ignore_errors=True)
    df.write.mode("overwrite").parquet(stage)
    manifest_swap(
        committer, dest, stage,
        keep_prev_files=True,  # delivery appends; prior files stay live
        extra={"operation": "append",
               MANIFEST_CURSOR_KEY: {**got.cursor, "group": group}},
    )
    man = read_file_manifest(dest)
    stats = man.get("stats") or {}
    rows = sum(int(stats[f].get("rows", 0))
               for f in man.get("added", []) if f in stats)
    # observability write-through: mirror the committed cursor into the
    # consumers dir so `--consumer-lag GROUP` reads the truth.  The
    # destination manifest stays the source of record (a crash between
    # the flip and this mirror only leaves the gauge one delivery
    # stale, corrected by the next call).
    try:
        commit_cursor(cfg, group, got.cursor)
    except CommitConflict:
        pass  # a legacy/poll cursor is ahead — the gauge keeps it
    return {"batch_ids": got.batch_ids, "rows": rows,
            "generation": man["generation"]}
