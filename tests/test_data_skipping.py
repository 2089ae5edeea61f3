"""Manifest-carried column statistics (data skipping) and schema
evolution on the plain-parquet table format.

Data skipping: ``collect_file_stats`` records per-file ``[min, max]``
column bounds in the commit-time ``_FILES.json`` manifests;
``scan_routed`` prunes files from those bounds on the DRIVER — zero
footer opens, zero listings of irrelevant files — then applies the
exact predicate Spark-side.  At a 100 TB table this is Iceberg's
manifest-level scan planning rebuilt on the plain layout: the pruning
decision reads a few KB of JSON the commit already paid for.

Schema evolution: each manifest records its physical data-file schema;
table reads run under the by-name MERGE of the scanned manifests'
schemas, so a column added by a newer writer surfaces as nulls on
pre-evolution batches (no ``mergeSchema`` footer walk), and compaction
rewrites read under the same merge so evolved columns survive.
"""

import datetime
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from logfowd2_spark import ioutil, synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.commit import (
    _bound_excludes,
    _encode_bound,
    collect_file_stats,
    data_files,
    get_committer,
    manifest_schema,
    merge_schemas,
    prune_files_by_id_set,
    prune_manifest_files,
    read_file_manifest,
    write_file_manifest,
)
from logfowd2_spark.streaming.maintenance import (
    committed_batch_ids,
    compact_batch,
    compact_table,
    read_routed_as_of,
)
from logfowd2_spark.streaming.pipeline import (
    read_routed,
    run_pipeline,
    scan_routed,
)

TS_FMT = "%Y-%m-%dT%H:%M:%S.%f"


# ---------------------------------------------------------------------------
# unit: bound encoding / exclusion algebra (no Spark)
# ---------------------------------------------------------------------------

def test_encode_bound_order_preserving():
    # timestamps: fixed-width ISO → lexicographic == chronological
    a = datetime.datetime(2024, 1, 2, 3, 4, 5, 6)
    b = datetime.datetime(2024, 1, 2, 3, 4, 5, 7)
    assert _encode_bound(a) < _encode_bound(b)
    # tz-aware normalizes to UTC before encoding
    aware = a.replace(tzinfo=datetime.timezone(datetime.timedelta(hours=2)))
    assert _encode_bound(aware) == _encode_bound(
        a - datetime.timedelta(hours=2))
    assert _encode_bound(datetime.date(2024, 1, 2)) == "2024-01-02"
    assert _encode_bound(7) == 7 and _encode_bound(7.5) == 7.5
    assert _encode_bound("abc") == "abc"
    # unprunable types: None means "no usable bound", never a wrong one
    assert _encode_bound("x" * 65) is None
    assert _encode_bound(True) is None
    assert _encode_bound(b"bytes") is None


def test_bound_excludes_edges():
    # [10, 20] bounds against every op, inclusive/exclusive edges
    assert _bound_excludes(10, 20, "==", 9)
    assert not _bound_excludes(10, 20, "==", 10)
    assert _bound_excludes(10, 20, "==", 21)
    assert _bound_excludes(10, 20, ">=", 21)
    assert not _bound_excludes(10, 20, ">=", 20)
    assert _bound_excludes(10, 20, ">", 20)
    assert not _bound_excludes(10, 20, ">", 19)
    assert _bound_excludes(10, 20, "<=", 9)
    assert not _bound_excludes(10, 20, "<=", 10)
    assert _bound_excludes(10, 20, "<", 10)
    assert not _bound_excludes(10, 20, "<", 11)
    # incomparable domains NEVER exclude (pruning must be provable)
    assert not _bound_excludes(10, 20, "==", "10")
    assert not _bound_excludes("a", "b", ">=", 5)


def test_prune_manifest_files_synthetic():
    man = {
        "files": ["a.parquet", "b.parquet", "c.parquet"],
        "stats": {
            "a.parquet": {"rows": 1, "bytes": 1,
                          "cols": {"n": [0, 9], "s": ["a", "f"]}},
            "b.parquet": {"rows": 1, "bytes": 1,
                          "cols": {"n": [10, 19], "s": ["g", "p"]}},
            # c has no bounds for n — must always be kept
            "c.parquet": {"rows": 1, "bytes": 1, "cols": {"s": ["q", "z"]}},
        },
    }
    assert prune_manifest_files(man, [("n", ">=", 10)]) == \
        ["b.parquet", "c.parquet"]
    assert prune_manifest_files(man, [("n", "<", 5), ("s", "<=", "c")]) == \
        ["a.parquet"]
    # unknown column: no pruning at all
    assert prune_manifest_files(man, [("zz", "==", 1)]) == man["files"]
    assert prune_manifest_files(man, None) == man["files"]
    with pytest.raises(ValueError, match="unsupported prune op"):
        prune_manifest_files(man, [("n", "!=", 1)])
    # IN-set shape (consolidated batch_id pruning)
    man2 = {
        "files": ["x.parquet", "y.parquet"],
        "stats": {
            "x.parquet": {"rows": 1, "bytes": 1,
                          "cols": {"batch_id": ["b0", "b1"]}},
            "y.parquet": {"rows": 1, "bytes": 1,
                          "cols": {"batch_id": ["b2", "b2"]}},
        },
    }
    assert prune_files_by_id_set(man2, "batch_id", ["b0"]) == ["x.parquet"]
    assert prune_files_by_id_set(man2, "batch_id", ["b2"]) == ["y.parquet"]
    assert prune_files_by_id_set(man2, "batch_id", ["b1", "b2"]) == \
        man2["files"]


def test_bound_excludes_nan_never_prunes():
    # Spark orders NaN above every value; parquet min/max ignore NaN
    # rows — bounds say NOTHING about NaN presence, so no exclusion
    nan = float("nan")
    assert not _bound_excludes(1.0, 5.0, ">", nan)
    assert not _bound_excludes(nan, 5.0, "<", 0.0)
    assert not _bound_excludes(1.0, nan, ">", 10.0)
    assert not _bound_excludes(nan, nan, "==", 3.0)


def test_prune_by_path_partition_values():
    from logfowd2_spark.streaming.commit import (
        _partition_bound, _path_partition_values,
    )

    rel = "sink_id=app-a/log_date=2026-01-05/part-0.parquet"
    assert _path_partition_values(rel) == {
        "sink_id": "app-a", "log_date": "2026-01-05"}
    # escaped values and the Hive null sentinel are never trusted
    assert _path_partition_values(
        "sink_id=a%3Ab/f.parquet") == {}
    assert _path_partition_values(
        "log_date=__HIVE_DEFAULT_PARTITION__/f.parquet") == {}
    # the file's own basename never contributes (only dir segments)
    assert _path_partition_values("k=v.parquet") == {}

    # domain alignment: predicate value's type is the authority
    assert _partition_bound("7", 5) == 7
    assert _partition_bound("7.5", 1.0) == 7.5
    assert _partition_bound("x", 5) is None
    assert _partition_bound("2026-01-05", datetime.date(2026, 1, 5)) == \
        "2026-01-05"
    # date partition vs datetime predicate: Spark casts the date to
    # MIDNIGHT — the aligned bound is that exact instant
    assert _partition_bound(
        "2026-01-05", datetime.datetime(2026, 1, 5)) == \
        "2026-01-05T00:00:00.000000"
    assert _partition_bound("notadate", datetime.date(2026, 1, 5)) is None
    assert _partition_bound("s", True) is None

    man = {
        "files": [
            "sink_id=app-a/log_date=2026-01-01/p0.parquet",
            "sink_id=app-b/log_date=2026-01-02/p0.parquet",
            "sink_id=app-b/log_date=2026-01-03/p0.parquet",
        ],
        "stats": {},  # partition columns live only in the paths
    }
    assert prune_manifest_files(man, [("sink_id", "==", "app-b")]) == \
        man["files"][1:]
    assert prune_manifest_files(
        man, [("log_date", ">=", datetime.date(2026, 1, 2))]) == \
        man["files"][1:]
    assert prune_manifest_files(
        man, [("log_date", "<", datetime.date(2026, 1, 2)),
              ("sink_id", "==", "app-a")]) == man["files"][:1]
    # datetime predicate against the date partition: midnight-exact —
    # ``<= midnight of day 2`` keeps day 2 (cast equality), drops day 3
    assert prune_manifest_files(
        man, [("log_date", "<=", datetime.datetime(2026, 1, 2))]) == \
        man["files"][:2]
    # data-file stats (when present) take precedence over path values
    man["stats"] = {man["files"][0]: {
        "rows": 1, "bytes": 1, "cols": {"sink_id": ["app-a", "app-z"]}}}
    assert prune_manifest_files(man, [("sink_id", "==", "app-x")]) == \
        man["files"][:1]


def test_align_domains_date_timestamp_cross():
    """Spark compares a DATE column to a TIMESTAMP value by casting the
    date to its midnight instant — bounds must align the same way, or a
    midnight-equality predicate falsely excludes the file that holds
    exactly that day."""
    from logfowd2_spark.streaming.commit import _align_domains

    # date bounds vs timestamp predicate: suffix bounds to midnight
    lo, hi, v = _align_domains(
        "2026-01-01", "2026-01-02", "d",
        _encode_bound(datetime.datetime(2026, 1, 2)), "t")
    assert not _bound_excludes(lo, hi, "==", v)
    assert not _bound_excludes(lo, hi, "<=", _align_domains(
        "2026-01-01", "2026-01-01", "d",
        _encode_bound(datetime.datetime(2026, 1, 1)), "t")[2])
    # timestamp bounds vs date predicate: date literal → its midnight
    lo, hi, v = _align_domains(
        "2026-01-01T12:00:00.000000", "2026-01-01T13:00:00.000000", "t",
        _encode_bound(datetime.date(2026, 1, 1)), "d")
    assert v == "2026-01-01T00:00:00.000000"
    # legacy (untagged) bounds: date/timestamp predicates never compare
    assert _align_domains("2026-01-01", "2026-01-02", None,
                          "2026-01-05T00:00:00.000000", "t") is None
    assert _align_domains(1, 5, None, 3, "i") == (1, 5, 3)
    assert _align_domains("a", "b", None, "c", "s") == ("a", "b", "c")
    # numeric/string cross stays incomparable in both schemes
    assert _align_domains(1, 5, "i", "3", "s") is None
    assert _align_domains("a", "b", "s", 3, "i") is None


def test_membership_entry_tiers():
    from logfowd2_spark.streaming.commit import (
        BLOOM_MAX_DISTINCT, MEMB_SET_CAP, _membership_entry,
    )

    # tiny distinct set → exact values, sorted, encoded
    ent = _membership_entry(["b", "a"], "s")
    assert ent == {"t": "s", "set": ["a", "b"]}
    # moderate cardinality → bloom (b64 bits, k hashes)
    vals = [f"p{i}" for i in range(MEMB_SET_CAP + 1)]
    ent = _membership_entry(vals, "s")
    assert ent["t"] == "s" and "b64" in ent and ent["k"] >= 1
    # beyond the cap → no entry (absent = never pruned, never wrong)
    big = [f"v{i}" for i in range(BLOOM_MAX_DISTINCT + 1)]
    assert _membership_entry(big, "s") is None
    # float domains are never membership-pruned
    assert _membership_entry([1.5, 2.5], "f") is None
    assert _membership_entry([], "s") is None
    # over-long strings overflow the set tier into the bloom tier
    longs = ["x" * 100, "y" * 100]
    ent = _membership_entry(longs, "s")
    assert ent is not None and "b64" in ent


def test_membership_excludes_semantics():
    from logfowd2_spark.streaming.commit import (
        _membership_entry, _membership_excludes,
    )

    sset = _membership_entry(["INFO", "WARN"], "s")
    # a value set serves EVERY op
    assert _membership_excludes(sset, "==", "ERROR")
    assert not _membership_excludes(sset, "==", "INFO")
    assert _membership_excludes(sset, ">", "WARN")
    assert not _membership_excludes(sset, ">=", "WARN")
    assert _membership_excludes(sset, "<", "INFO")
    # type-mismatched probes never prune
    assert not _membership_excludes(sset, "==", 5)

    vals = [f"pod-{i}" for i in range(500)]
    bloom = _membership_entry(vals, "s")
    assert "b64" in bloom
    # NO false negatives: every built value probes as maybe-present
    for v in vals:
        assert not _membership_excludes(bloom, "==", v)
    # absent keys overwhelmingly excluded (fpp ~1% at 10 bits/key)
    misses = sum(_membership_excludes(bloom, "==", f"nope-{i}")
                 for i in range(500))
    assert misses >= 450
    # blooms serve equality only, and only on an exact domain match
    assert not _membership_excludes(bloom, ">", "pod-999")
    assert not _membership_excludes(bloom, "==", 7)

    iset = _membership_entry([3, 5], "i")
    assert _membership_excludes(iset, "==", 4)
    assert not _membership_excludes(iset, "==", 5.0)  # i/f numerics align
    assert _membership_excludes(iset, ">", 5)
    assert not _membership_excludes(iset, "==", "3")


def test_collect_file_stats_distributed_equals_driver(spark, tmp_path,
                                                      monkeypatch):
    """Above DISTRIBUTED_STATS_MIN_FILES the commit-time stats pass runs
    on the executors; its output is bit-identical to the driver's
    threaded loop (same dict, same encoded bounds, same membership
    entries).  The threshold is monkeypatched down: the shipped default
    is in the thousands (round 6 — the RDD job's fixed overhead was
    measured at ~4 s vs 0.5 s for the driver loop at 135 files), and the
    equality property is file-count-independent."""
    import pyarrow as pa

    from logfowd2_spark.streaming import commit as commit_mod

    monkeypatch.setattr(commit_mod, "DISTRIBUTED_STATS_MIN_FILES", 16)
    files = []
    for i in range(16):
        t = pa.table({
            "pod": [f"p{i}-{j % 5}" for j in range(20)],
            "n": list(range(i, i + 20)),
        })
        rel = f"part-{i:03d}.parquet"
        pq.write_table(t, str(tmp_path / rel))
        files.append(rel)
    # driver path (spark=None) — threaded pool
    driver = collect_file_stats(str(tmp_path), files, detail_cols=("pod",))
    # single-file path (serial)
    one = collect_file_stats(str(tmp_path), files[:1], detail_cols=("pod",))
    assert one == {files[0]: driver[files[0]]}
    dist = commit_mod.collect_file_stats(str(tmp_path), files,
                                         detail_cols=("pod",), spark=spark)
    assert dist == driver
    assert list(dist) == files  # caller's file order preserved
    # below the threshold the spark= kwarg stays on the driver path
    small = commit_mod.collect_file_stats(str(tmp_path), files[:2],
                                          detail_cols=("pod",), spark=spark)
    assert small == {r: driver[r] for r in files[:2]}


def test_collect_file_stats_membership(tmp_path):
    import pyarrow as pa

    t = pa.table({
        "pod": [f"p{i % 60}" for i in range(300)],
        "ns": [f"ns-{i % 4}" for i in range(300)],
        "score": [float(i) for i in range(300)],
    })
    pq.write_table(t, str(tmp_path / "a.parquet"))
    stats = collect_file_stats(str(tmp_path), ["a.parquet"],
                               detail_cols=("pod", "ns", "score", "zz"))
    memb = stats["a.parquet"]["memb"]
    assert "b64" in memb["pod"] and memb["ns"]["set"] == [
        "ns-0", "ns-1", "ns-2", "ns-3"]
    assert "score" not in memb  # float: skipped
    assert "zz" not in memb     # absent column: skipped
    man = {"files": ["a.parquet"], "stats": stats}
    assert prune_manifest_files(man, [("pod", "==", "p7")]) == ["a.parquet"]
    assert prune_manifest_files(man, [("pod", "==", "absent")]) == []
    assert prune_manifest_files(man, [("ns", ">=", "ns-5")]) == []
    # the same membership serves the IN-set shape
    assert prune_files_by_id_set(man, "pod", ["absent", "alsono"]) == []
    assert prune_files_by_id_set(man, "pod", ["absent", "p3"]) == \
        ["a.parquet"]


def test_merge_schemas_add_column_and_conflict():
    s1 = StructType([StructField("a", StringType(), False),
                     StructField("b", LongType())])
    s2 = StructType([StructField("a", StringType()),
                     StructField("c", IntegerType())])
    m = merge_schemas([s1, s2])
    assert [f.name for f in m.fields] == ["a", "b", "c"]
    assert all(f.nullable for f in m.fields)  # added cols are null in old files
    s3 = StructType([StructField("b", StringType())])
    with pytest.raises(ValueError, match="schema evolution conflict"):
        merge_schemas([s1, s3])


# ---------------------------------------------------------------------------
# e2e: pruned scans over a real pipeline output
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def piped(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dskip")
    paths = synth.write_dataset(str(d / "in"), n_rows=900, seed=31, n_files=3)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        bulk_size=40,  # several files per batch → bounds that differ
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    return d, paths, cfg


def _routed_ts_bounds(cfg):
    """{(batch_dir_name, rel_file): (lo, hi)} from the manifests alone."""
    root = os.path.join(cfg.output_path, "routed")
    out = {}
    for name in sorted(os.listdir(root)):
        if not name.startswith("batch_id="):
            continue
        man = read_file_manifest(os.path.join(root, name))
        for rel in man["files"]:
            b = man["stats"][rel]["cols"].get("ts")
            if b:
                out[(name, rel)] = tuple(b[:2])
    return out


def test_manifest_column_bounds_match_footers(piped):
    """The recorded bounds agree with an independent pyarrow walk, and
    always-null / boolean / nested columns carry no bounds."""
    _, _, cfg = piped
    root = os.path.join(cfg.output_path, "routed")
    checked = 0
    for name in sorted(os.listdir(root)):
        if not name.startswith("batch_id="):
            continue
        man = read_file_manifest(os.path.join(root, name))
        for rel in man["files"]:
            cols = man["stats"][rel]["cols"]
            md = pq.ParquetFile(
                os.path.join(root, name, rel)).metadata
            lo = hi = None
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    if c.path_in_schema != "n_tok":
                        continue
                    st = c.statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
            assert cols["n_tok"] == [lo, hi, "i"]
            assert "ts" in cols and cols["ts"][2] == "t"
            assert "level" in cols and cols["level"][2] == "s"
            # raw_line is all-null on routed rows; parse_ok is boolean
            assert "raw_line" not in cols
            assert "parse_ok" not in cols
            checked += 1
    assert checked >= 3


def test_scan_routed_prunes_files_zero_footer_opens(spark, piped):
    """A ts predicate prunes provably-excluded files from the manifests
    alone (no footer opens), reads only the surviving files, and
    returns exactly the rows the unpruned filter returns."""
    _, _, cfg = piped
    bounds = _routed_ts_bounds(cfg)
    assert bounds, "no ts bounds recorded"
    # cutoff at the smallest per-file max: that file is provably empty
    # for ts > cutoff, so at least one file MUST be pruned
    cutoff_enc = min(hi for (_lo, hi) in bounds.values())
    cutoff = datetime.datetime.strptime(cutoff_enc, TS_FMT)
    excluded = {k for k, (_lo, hi) in bounds.items() if hi <= cutoff_enc}
    assert excluded

    ioutil.reset_footer_opens()
    df = scan_routed(spark, cfg, [("ts", ">", cutoff)])
    read_files = set(df.inputFiles())
    assert ioutil.FOOTER_OPENS == 0, "pruning opened parquet footers"
    for (name, rel) in excluded:  # full batch-relative path: part-file
        # basenames repeat across partition dirs of one write task
        assert not any(p.endswith(f"{name}/{rel}") for p in read_files)

    expect = (read_routed(spark, cfg).filter(F.col("ts") > F.lit(cutoff))
              .orderBy("doc_id").collect())
    got = df.orderBy("doc_id").collect()
    assert len(got) == len(expect) > 0
    assert got == expect


def test_pruned_to_empty_plans_without_storage(spark, piped):
    """A predicate beyond every file's bounds yields an empty result
    with the full table schema, planned from manifests alone — zero
    files listed or read."""
    _, _, cfg = piped
    hi_all = max(hi for (_lo, hi) in _routed_ts_bounds(cfg).values())
    beyond = (datetime.datetime.strptime(hi_all, TS_FMT)
              + datetime.timedelta(days=1))
    ioutil.reset_footer_opens()
    df = scan_routed(spark, cfg, [("ts", ">=", beyond)])
    assert df.inputFiles() == []
    assert df.count() == 0
    assert ioutil.FOOTER_OPENS == 0
    assert set(df.columns) == set(read_routed(spark, cfg).columns)


def test_scan_routed_prunes_by_partition_path(spark, piped):
    """Predicates on partition columns (present only as ``col=value``
    path segments, never in the data files) prune from the manifests'
    file paths alone: a sink_id equality scan lists ONLY that sink's
    files, with zero footer opens, and matches the unpruned filter."""
    _, _, cfg = piped
    sinks = sorted(
        r["sink_id"] for r in read_routed(spark, cfg)
        .select("sink_id").distinct().collect())
    assert len(sinks) >= 2, "need multiple sinks to observe pruning"
    target = sinks[0]

    ioutil.reset_footer_opens()
    df = scan_routed(spark, cfg, [("sink_id", "==", target)])
    read_files = df.inputFiles()
    assert ioutil.FOOTER_OPENS == 0
    assert read_files and all(
        f"/sink_id={target}/" in p for p in read_files)

    expect = (read_routed(spark, cfg)
              .filter(F.col("sink_id") == target)
              .orderBy("doc_id").collect())
    got = df.orderBy("doc_id").collect()
    assert len(got) == len(expect) > 0 and got == expect


def test_scan_routed_prunes_by_pod_membership(spark, piped):
    """The commit records membership metadata for
    ``stats_detail_cols`` (default: pod_name bloom, namespace set); a
    pod point-lookup then prunes from the manifests alone — min/max
    bounds can't serve it (every file's [min, max] spans most pod
    names) — with zero footer opens and exact results."""
    _, _, cfg = piped
    root = os.path.join(cfg.output_path, "routed")
    total_files, memb_files = 0, 0
    for name in sorted(os.listdir(root)):
        if not name.startswith("batch_id="):
            continue
        man = read_file_manifest(os.path.join(root, name))
        for rel in man["files"]:
            total_files += 1
            memb = man["stats"][rel].get("memb") or {}
            if "pod_name" in memb and "namespace" in memb:
                memb_files += 1
    assert total_files >= 3 and memb_files == total_files

    target = (read_routed(spark, cfg).select("pod_name").first())[0]
    ioutil.reset_footer_opens()
    df = scan_routed(spark, cfg, [("pod_name", "==", target)])
    assert ioutil.FOOTER_OPENS == 0
    kept = len(df.inputFiles())
    assert 0 < kept < total_files, (
        f"membership pruned nothing: {kept}/{total_files}")

    expect = (read_routed(spark, cfg)
              .filter(F.col("pod_name") == target)
              .orderBy("doc_id").collect())
    got = df.orderBy("doc_id").collect()
    assert len(got) == len(expect) > 0 and got == expect
    # a pod that never existed prunes to the empty plan
    assert scan_routed(
        spark, cfg, [("pod_name", "==", "no-such-pod")]).inputFiles() == []


def test_compaction_preserves_membership(spark, piped):
    """A batch compaction's fresh generation re-records membership for
    the configured detail columns (threaded through compact_batch)."""
    _, _, cfg = piped
    root = os.path.join(cfg.output_path, "routed")
    bid = committed_batch_ids(cfg)[0]
    compact_batch(spark, cfg, bid, target_records_per_file=10_000)
    man = read_file_manifest(os.path.join(root, f"batch_id={bid}"))
    assert man["generation"] >= 1
    for rel in man["files"]:
        memb = man["stats"][rel].get("memb") or {}
        assert "pod_name" in memb and "namespace" in memb


def test_clustered_compaction_tightens_pruning(spark, tmp_path_factory):
    """``compact_cluster_cols`` turns consolidation into a sort-order
    rewrite: the generation's files carry DISJOINT pod_name ranges, so
    a pod point-lookup prunes to a strict subset of the generation from
    the manifest bounds alone — and still returns exactly the rows the
    unclustered table held."""
    d = tmp_path_factory.mktemp("dskip-clus")
    paths = synth.write_dataset(str(d / "in"), n_rows=900, seed=43,
                                n_files=3)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        bulk_size=40,
        compact_cluster_cols=("pod_name",),
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    routed_rows = read_routed(spark, cfg).count()  # parse-fails go to DLQ
    target = (read_routed(spark, cfg).select("pod_name").first())[0]
    expect = (read_routed(spark, cfg)
              .filter(F.col("pod_name") == target)
              .orderBy("doc_id").collect())

    res = compact_table(spark, cfg, target_records_per_file=120)
    assert res["rows"] == routed_rows > 0
    root = os.path.join(cfg.output_path, "routed")
    man = read_file_manifest(os.path.join(root, "_consolidated"))
    total = len(man["files"])
    assert total >= 4, f"rewrite produced only {total} files"

    # the sort happened: some two files have disjoint pod_name ranges
    bounds = [tuple(man["stats"][f]["cols"]["pod_name"][:2])
              for f in man["files"]]
    assert any(a[1] < b[0] or b[1] < a[0]
               for i, a in enumerate(bounds) for b in bounds[i + 1:]), \
        f"no disjoint pod ranges across files: {bounds}"

    ioutil.reset_footer_opens()
    df = scan_routed(spark, cfg, [("pod_name", "==", target)])
    assert ioutil.FOOTER_OPENS == 0
    kept = len(df.inputFiles())
    assert 0 < kept < total, f"clustering pruned nothing: {kept}/{total}"
    assert df.orderBy("doc_id").collect() == expect


def test_as_of_prunes_consolidated_generation_by_batch_id(
        spark, tmp_path_factory):
    """After an incremental consolidation, an as-of read on an early
    batch id prunes the later generation's appended files from the
    consolidated manifest's batch_id bounds — driver-side, before Spark
    lists anything."""
    d = tmp_path_factory.mktemp("dskip-cons")
    paths = synth.write_dataset(str(d / "in"), n_rows=600, seed=37,
                                n_files=3)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        bulk_size=50,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    ids = committed_batch_ids(cfg)
    assert len(ids) == 3
    expect = read_routed_as_of(spark, cfg, ids[1]).orderBy("doc_id").collect()

    # consolidate ids[0..1] first, then ids[2] as an appended generation
    compact_table(spark, cfg, upto_batch_id=ids[1])
    root = os.path.join(cfg.output_path, "routed")
    live = os.path.join(root, "_consolidated")
    gen1_files = set(read_file_manifest(live)["files"])
    compact_table(spark, cfg)
    man = read_file_manifest(live)
    gen2_only = set(man["files"]) - gen1_files
    assert gen2_only, "second consolidation appended no files"

    df = read_routed_as_of(spark, cfg, ids[1])
    read_files = set(df.inputFiles())
    for rel in gen2_only:  # later generation's files never listed
        assert not any(p.endswith(f"_consolidated/{rel}")
                       for p in read_files)
    assert df.orderBy("doc_id").collect() == expect


# ---------------------------------------------------------------------------
# e2e: schema evolution (add-column) across batches
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def evolved(spark, tmp_path_factory):
    """A table with two pipeline batches plus one batch written by a
    'newer writer version' that adds a ``region_tag`` column."""
    d = tmp_path_factory.mktemp("dskip-evo")
    paths = synth.write_dataset(str(d / "in"), n_rows=400, seed=41,
                                n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        bulk_size=60,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    ids = committed_batch_ids(cfg)

    # the evolved batch: same rows as batch 0, plus the new column —
    # written exactly the way a newer pipeline version would commit it
    # (partitioned files + manifest with stats AND the evolved schema)
    root = os.path.join(cfg.output_path, "routed")
    ev_id = ids[-1] + "-evolved"
    ev_dir = os.path.join(root, f"batch_id={ev_id}")
    ev = (read_routed_as_of(spark, cfg, ids[0]).drop("batch_id")
          .withColumn("region_tag", F.lit("eu-west")))
    (ev.write.mode("overwrite").partitionBy("sink_id", "log_date")
       .parquet(ev_dir))
    files = data_files(ev_dir)
    committer = get_committer(cfg.commit_protocol)
    write_file_manifest(
        committer, ev_dir, files, generation=0,
        stats=collect_file_stats(ev_dir, files),
        extra={"schema":
               ev.drop("sink_id", "log_date").schema.jsonValue()},
    )
    # register it as committed so compact_table picks it up
    from logfowd2_spark.streaming.checkpoint import (
        BatchRecord, load_manifest, save_manifest,
    )
    mpath = os.path.join(cfg.checkpoint_path, "manifest.json")
    man = load_manifest(mpath)
    n = ev.count()
    man.batches[ev_id] = BatchRecord(
        batch_id=ev_id, input_files=[], rows_in=n, rows_parsed=n,
        parse_failures=0, sink_counts={"evolved": n})
    save_manifest(man, mpath)
    return cfg, ids, ev_id, int(n)


def test_read_routed_merges_added_column(spark, evolved):
    cfg, ids, ev_id, n_ev = evolved
    ioutil.reset_footer_opens()
    df = read_routed(spark, cfg)
    assert "region_tag" in df.columns
    assert ioutil.FOOTER_OPENS == 0  # merged from manifests, not footers
    per = {r["batch_id"]: (r["n"], r["tagged"]) for r in
           df.groupBy("batch_id").agg(
               F.count("*").alias("n"),
               F.count("region_tag").alias("tagged")).collect()}
    assert per[ev_id] == (n_ev, n_ev)  # evolved rows carry the value
    for b in ids:  # pre-evolution batches read as null
        assert per[b][1] == 0 and per[b][0] > 0


def test_compaction_preserves_evolved_column(spark, evolved):
    """compact_batch on the evolved dir and compact_table across the
    mixed-schema batches both keep the added column and its values —
    the rewrite reads under the merged manifest schema, so nothing a
    plain first-footer read would drop is lost."""
    cfg, ids, ev_id, n_ev = evolved
    before = (read_routed(spark, cfg)
              .orderBy("doc_id", "batch_id")
              .select("doc_id", "batch_id", "region_tag").collect())

    res = compact_batch(spark, cfg, ev_id, target_records_per_file=10_000)
    assert res["rows"] == n_ev
    root = os.path.join(cfg.output_path, "routed")
    man = read_file_manifest(os.path.join(root, f"batch_id={ev_id}"))
    sch = manifest_schema(man)
    assert "region_tag" in [f.name for f in sch.fields]

    res = compact_table(spark, cfg, target_records_per_file=10_000)
    assert set(res["consolidated_ids"]) == set(ids) | {ev_id}
    cons_sch = manifest_schema(
        read_file_manifest(os.path.join(root, "_consolidated")))
    names = [f.name for f in cons_sch.fields]
    assert "region_tag" in names and "batch_id" in names

    after = (read_routed(spark, cfg)
             .orderBy("doc_id", "batch_id")
             .select("doc_id", "batch_id", "region_tag").collect())
    assert after == before
