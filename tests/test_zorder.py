"""Z-order clustered compaction (``compact_cluster_mode='zorder'``):
bit-interleaved multi-column locality, derived from values scaled
against manifest-carried domains (never ranks — no per-column global
sorts).  Covers: exact interleave arithmetic, Python/Spark agreement of
the string→number packing, and the end-to-end payoff — after a zorder
rewrite a point lookup on EITHER clustered column prunes to fewer files
than the lexicographic sort gives the trailing column, with row-level
results identical."""

import os

import pytest
from pyspark.sql import functions as F

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.maintenance import (
    _z_prefix_num,
    _znum_expr,
    compact_table,
    zorder_column,
)
from logfowd2_spark.streaming.pipeline import (
    read_routed,
    run_pipeline,
    scan_routed,
)


def test_interleave_is_exact(spark):
    """Known corner values → known Z-values: with two columns over a
    [0, 100] domain and 16-bit buckets, (min,min)=0, (max,max)=2³²−1,
    and each single-max corner owns exactly the alternating bit mask."""
    df = spark.createDataFrame(
        [(0, 0), (100, 0), (0, 100), (100, 100)], "a int, b int")
    out = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn(
            "z", zorder_column(df, ["a", "b"])).collect()
    }
    assert out[(0, 0)] == 0
    assert out[(100, 100)] == 2**32 - 1
    assert out[(100, 0)] == 0x55555555  # a holds the even bit positions
    assert out[(0, 100)] == 0xAAAAAAAA


def test_string_packing_matches_python_mirror(spark):
    """The driver-side mirror (used to turn manifest string bounds into
    scaling domains) must agree with the Spark expression bit-for-bit."""
    vals = ["", "a", "pod-17", "ns-hot", "zzzz-tail-ignored", "éx"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r["s"]: r["n"] for r in
           df.withColumn("n", _znum_expr("s", "string")).collect()}
    for v in vals:
        assert got[v] == _z_prefix_num(v), v


def test_zorder_orders_blocks_on_both_columns(spark):
    """Sorting by Z-value must give contiguous runs narrow ranges in
    BOTH dimensions: split the sorted order into quarters and check
    every quarter spans well under the full domain of each column
    (lexicographic order would make the trailing column span ~full
    domain in every quarter)."""
    rows = [(i, j) for i in range(32) for j in range(32)]
    df = spark.createDataFrame(rows, "a int, b int")
    pdf = (df.withColumn("z", zorder_column(df, ["a", "b"]))
           .orderBy("z").toPandas())
    q = len(pdf) // 4  # uniform grid → each quarter is one quadrant
    for k in range(4):
        part = pdf.iloc[k * q:(k + 1) * q]
        assert part["a"].max() - part["a"].min() <= 16
        assert part["b"].max() - part["b"].min() <= 16


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    """The same pipeline output compacted twice: lexicographic sort on
    (pod_name, namespace) vs zorder on the same columns."""
    out = {}
    for mode in ("sort", "zorder"):
        d = tmp_path_factory.mktemp(f"zord-{mode}")
        paths = synth.write_dataset(str(d / "in"), n_rows=4000, seed=43,
                                    n_files=2)
        cfg = PipelineConfig(
            input_path=paths["sequences"],
            output_path=str(d / "out"),
            checkpoint_path=str(d / "ckpt"),
            bulk_size=200,
            compact_cluster_cols=("pod_name", "namespace"),
            compact_cluster_mode=mode,
        )
        run_pipeline(spark, cfg, paths["pods"], paths["routes"])
        before = (read_routed(spark, cfg).orderBy("doc_id")
                  .drop("batch_id").toPandas())
        res = compact_table(spark, cfg, target_records_per_file=150)
        out[mode] = (cfg, before, res)
    return out


def _norm(pdf):
    pdf = pdf.copy()
    pdf["ts"] = pdf["ts"].astype(str)
    pdf["log_date"] = pdf["log_date"].astype(str)
    return (pdf.sort_values("doc_id")
            .reindex(sorted(pdf.columns), axis=1).reset_index(drop=True))


def test_zorder_rewrite_preserves_rows(spark, tables):
    cfg, before, res = tables["zorder"]
    assert res["rows"] == len(before)
    after = (read_routed(spark, cfg).orderBy("doc_id")
             .drop("batch_id").toPandas())
    assert _norm(after).equals(_norm(before))


def test_zorder_prunes_both_columns(spark, tables):
    """The payoff: the sort layout prunes its LEADING column well but
    leaves the trailing column scattered; zorder prunes BOTH.  File
    counts (``inputFiles`` after manifest pruning) are the
    scale-invariant signal."""
    counts = {}
    for mode, (cfg, before, _res) in tables.items():
        pod = before["pod_name"].value_counts().index[1]
        ns = "ns-hot"
        n_total = len(set(read_routed(spark, cfg).inputFiles()))
        pod_scan = scan_routed(spark, cfg, [("pod_name", "==", pod)])
        ns_scan = scan_routed(spark, cfg, [("namespace", "==", ns)])
        counts[mode] = {
            "total": n_total,
            "pod": len(set(pod_scan.inputFiles())),
            "ns": len(set(ns_scan.inputFiles())),
            "pod_rows": pod_scan.count(),
            "ns_rows": ns_scan.count(),
        }
        # exactness is never traded for pruning
        exp = before
        assert counts[mode]["pod_rows"] == (exp["pod_name"] == pod).sum()
        assert counts[mode]["ns_rows"] == (exp["namespace"] == ns).sum()
    s, z = counts["sort"], counts["zorder"]
    # both layouts handle the leading column
    assert s["pod"] < s["total"]
    assert z["pod"] < z["total"]
    # only zorder localizes the trailing column: strictly fewer files
    # than the sort layout leaves it scattered across
    assert z["ns"] < s["ns"], counts
