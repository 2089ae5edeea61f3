"""Enrich stage: broadcast hash join against the pod-metadata dimension.

The reference "enriches" by capturing k8s metadata from the file path at
tracker creation (src/watcher.rs:595-638) — a per-file lookup.  The
north-star generalization is a proper dimension join: the parsed
``pod_id`` joins a pods table carrying node/workload/labels attributes.

Scale notes: the dimension is bounded by cluster pod count (≤ a few
hundred MB even on huge clusters) so it is explicitly ``F.broadcast``-ed —
no shuffle of the 100 TB fact side, ever.  Misses keep the row (left
join) with "unknown" defaults, mirroring the reference's missing-group
defaulting (watcher.rs:602-626).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: attributes contributed by the dimension
DIM_ATTRS = ["node", "workload_kind", "labels_json"]


def enrich_stage(df: DataFrame, pods: DataFrame) -> DataFrame:
    """Left broadcast join on pod_id; dim miss ⇒ 'unknown' + flag."""
    dim = pods.select(
        F.col("pod_id").alias("_dim_pod_id"),
        *[F.col(a).alias(f"_dim_{a}") for a in DIM_ATTRS],
    )
    out = df.join(
        F.broadcast(dim), df["pod_id"] == dim["_dim_pod_id"], "left"
    )
    # one batched projection (withColumns) instead of a withColumn chain:
    # every withColumn call re-analyzes the whole plan driver-side, which
    # is per-batch overhead in the micro-batch loop
    out = out.withColumns(
        {"dim_hit": F.col("_dim_pod_id").isNotNull(),
         **{a: F.coalesce(F.col(f"_dim_{a}"), F.lit("unknown"))
            for a in DIM_ATTRS}}
    )
    return out.drop("_dim_pod_id", *[f"_dim_{a}" for a in DIM_ATTRS])
