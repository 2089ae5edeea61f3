"""Round-6 optimization profiler: per-query noop timing + explain dumps.

Usage:
  python tools/profile_r06.py [query ...]        # default: all headline
  PROFILE_EXPLAIN_DIR=plans/r06 PROFILE_SUFFIX=_before python tools/profile_r06.py

Runs the same session config as bench.py (frozen) and, for each query,
dumps .explain("formatted") to $PROFILE_EXPLAIN_DIR/<name>$PROFILE_SUFFIX.txt
and times REPEATS noop executions (first run pays any shared
materialization, reported separately).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "flagship_pipeline",
    "flagship_pipeline_arrow",
    "q1_pricing_summary",
    "q3_topk_revenue",
    "pipe_route_by_source_level",
    "window_top3_per_group",
    "dedup_exact_fingerprint",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "lsh_verified_dups",
    "lsh_dup_clusters",
    "lsh_incremental_dups",
    "embedding_cosine_dups",
    "simhash_fingerprint",
    "pipe_sanitize_utf8",
    "pipe_batch_size_hist",
    "pii_redact",
    "tfidf_top_terms",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "asof_join_last_purchase",
    "window_sessionize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("PROFILE_REPEATS", "2"))
    explain_dir = os.environ.get("PROFILE_EXPLAIN_DIR", "")
    suffix = os.environ.get("PROFILE_SUFFIX", "")

    from logfowd2_spark.plans import catalog
    from logfowd2_spark.session import build_session

    os.environ.setdefault("SPARK_GRAFT_ADVISORY_BYTES", str(8 * 1024 * 1024))
    spark = build_session(
        app_name="logfowd2_profile_r06", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    qs = catalog.queries()
    names = sys.argv[1:] or HEADLINE

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        times = []
        for r in range(repeats):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(explain_dir, f"{name}{suffix}.txt"),
                      "w") as fh:
                fh.write(plan)
        out[name] = {"first": times[0], "rest": times[1:]}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"total_first": round(sum(v["first"] for v in out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
