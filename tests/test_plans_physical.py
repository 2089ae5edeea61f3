"""Physical-plan hygiene tests: the properties that make the pipeline
scale must be visible in the plan, not just intended (SURVEY.md §4.3).

- the enrichment join must be a BroadcastHashJoin (the 100 TB side never
  shuffles);
- projection/filter must push into the parquet scan (column pruning +
  PushedFilters);
- the parse stage must stay inside WholeStageCodegen (no Python in the
  hot path with the default JVM codec).
"""

import pytest
from pyspark.sql import functions as F

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.pipeline import load_routes, transform_batch


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("plans")
    paths = synth.write_dataset(str(d / "in"), n_rows=500, seed=3, n_files=2)
    cfg = PipelineConfig(max_line_size=256)
    cfg.routes = load_routes(spark, paths["routes"])
    df = spark.read.parquet(paths["sequences"])
    pods = spark.read.parquet(paths["pods"])
    return df, pods, cfg


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def explain_str(df, mode: str) -> str:
    jvm = df.sparkSession._jvm
    em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(em)


def test_enrich_is_broadcast_join(env):
    df, pods, cfg = env
    routed, _ = transform_batch(df, pods, cfg)
    plan = plan_of(routed)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_parse_stays_in_codegen_jvm_codec(env):
    """The opt-in jvm codec keeps the whole hot path Python-free."""
    import dataclasses

    df, pods, cfg = env
    cfg = dataclasses.replace(cfg, codec="jvm")
    routed, _ = transform_batch(df, pods, cfg)
    routed.collect()  # finalize the adaptive plan
    cg = explain_str(routed, "codegen")
    # the parse/enrich/route pipeline compiles into codegen subtrees
    assert "WholeStageCodegen subtrees" in cg
    assert "Found 0 WholeStageCodegen" not in cg
    plan = plan_of(routed)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "FlatMapGroupsInPandas"):
        assert marker not in plan, f"Python node {marker} in jvm-codec hot path"


def test_default_codec_single_arrow_node(env):
    """The arrow codec pays exactly ONE Python boundary — the decode
    kernel; everything after it (parse/enrich/route) stays JVM-side in
    codegen, and no row-at-a-time Python node exists anywhere.  (The
    shipped default is codec='auto', which resolves to this path
    whenever the host has arrow's per-slot core headroom.)"""
    import dataclasses

    df, pods, cfg = env
    assert cfg.codec == "auto"  # the shipped default
    cfg = dataclasses.replace(cfg, codec="arrow")
    routed, _ = transform_batch(df, pods, cfg)
    routed.collect()
    # AQE prints '== Final Plan ==' then '== Initial Plan =='; count in
    # the final section only
    plan = plan_of(routed).split("== Initial Plan ==")[0]
    assert plan.count("MapInArrow") == 1
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan, f"row-Python node {marker} in hot path"
    cg = explain_str(routed, "codegen")
    assert "WholeStageCodegen subtrees" in cg
    # the token array must not survive past the decode: no plan node
    # downstream of MapInArrow references it (it died at the boundary)
    after = plan.split("MapInArrow")[0]  # physical plans print sink-first
    assert "tokens" not in after


def test_column_pruning_reaches_scan(spark, env):
    df, pods, cfg = env
    narrow = df.select("doc_id", "n_tok").filter(F.col("n_tok") > 100)
    plan = plan_of(narrow)
    # ReadSchema lists only the projected columns; the filter is pushed
    assert "tokens" not in plan.split("ReadSchema")[-1]
    assert "PushedFilters: [" in plan and "GreaterThan(n_tok,100)" in plan


def test_route_is_case_not_join(env):
    df, pods, cfg = env
    routed, _ = transform_batch(df, pods, cfg)
    plan = plan_of(routed)
    # exactly one join (the pod dim); routing adds none
    assert plan.count("Join") == plan.count("BroadcastHashJoin")


def test_cosine_dups_has_no_allpairs_join(spark):
    """embedding_cosine_dups must confine candidates to IVF buckets: no
    CartesianProduct / BroadcastNestedLoopJoin anywhere (the round-1
    version was an O(n²) theta-join), and since round 4 NO pair join at
    all — the within-bucket similarity block is one
    FlatMapGroupsInPandas (per-bucket BLAS), so the only wide exchange
    is the bucket groupBy."""
    from logfowd2_spark.plans.trainingdata import embedding_cosine_dups

    q = embedding_cosine_dups(spark, "/root/testdata/sf0.001")
    plan = plan_of(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan  # candidates never leave their bucket


def test_lsh_candidates_are_equi_join(spark):
    """LSH candidate generation is an equi-join on band_key."""
    from logfowd2_spark.plans.trainingdata import lsh_candidate_pairs

    q = lsh_candidate_pairs(spark, "/root/testdata/sf0.001")
    plan = plan_of(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_reads_durable_signature_table(spark):
    """The MinHash signature table is a WRITTEN parquet intermediate
    (survives executor loss; localCheckpoint would not): downstream LSH
    queries must show a parquet scan of the signatures path, and the
    expensive signature build must not appear in their plans."""
    from logfowd2_spark.plans.trainingdata import (
        lsh_band_groups, minhash_signatures,
    )

    minhash_signatures(spark, "/root/testdata/sf0.001")  # triggers the write
    plan = plan_of(lsh_band_groups(spark, "/root/testdata/sf0.001"))
    # the leaf is a parquet scan of the written (doc_id, sg) table
    # (paths truncate in the plan string, so match the scan schema)
    assert "Parquet" in plan
    assert "ReadSchema: struct<doc_id:bigint,sg:array<bigint>>" in plan
    # the k×|shingles| hash build is absent: no re-hash per query
    assert "sequence(0, 127" not in plan


def test_simhash_has_no_global_sort(spark):
    from logfowd2_spark.plans.trainingdata import simhash_fingerprint

    q = simhash_fingerprint(spark, "/root/testdata/sf0.001")
    plan = plan_of(q)
    assert "Sort [doc_id" not in plan  # no output total sort


def test_fanout_write_is_rebalanced(env):
    """The fan-out write input must carry the AQE REBALANCE(sink_id)
    node — runtime salting of hot sinks / coalescing of cold ones."""
    from logfowd2_spark.operators.route import repartition_for_write

    df, pods, cfg = env
    routed, _ = transform_batch(df, pods, cfg)
    plan = repartition_for_write(routed, cfg)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "RebalancePartitions" in plan or "rebalance" in plan.lower()


def test_pii_redact_is_shuffle_free_and_pruned(spark):
    """PII redaction must run at scan speed: a pure projection with no
    Exchange anywhere, column-pruned to (doc_id, text)."""
    from logfowd2_spark.plans.trainingdata import pii_redact

    plan = plan_of(pii_redact(spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan                       # no shuffle at all
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_batch_size_hist_has_no_global_window(spark):
    """A2 histogram windows are partitioned by (sink, day) / sink — a
    global ORDER BY window would funnel the table through one task."""
    from logfowd2_spark.plans.catalog import pipe_batch_size_hist

    plan = plan_of(pipe_batch_size_hist(spark, "/root/testdata/sf0.001"))
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(sink_id" in plan
