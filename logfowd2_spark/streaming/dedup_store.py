"""Incremental dedup store — the production flow the LSH machinery
exists for, wired into the pipeline driver.

`plans/trainingdata.py` proves the algorithm as a catalog query
(``lsh_incremental_dups``, DuckDB-oracled); this module runs it
CONTINUOUSLY: after every committed batch the driver (``run_pipeline``
with ``dedup_store_enabled``) appends the batch's MinHash signatures and
LSH band index to a durable store under ``<output>/dedup/`` and emits
``dup_pairs/batch_id=...`` for incoming-vs-corpus hits — so each batch
is deduped against ALL history without ever re-hashing the corpus.

Scale shape (the 100 TB contract):

- the corpus side is a parquet SCAN of the stored band index and
  signature tables — no shingle build, no md5, no re-hash; only the
  incoming batch (1/Nth of history) is hashed, once;
- candidates come from a band-key EQUI-join (incoming bands × stored
  band index) — linear in incoming size × bucket occupancy, never
  all-pairs;
- the verify is MinHash similarity estimation over the k=128 stored
  signatures (matching-component fraction, the standard estimator with
  E[est] = Jaccard and σ ≤ 1/√k ≈ 0.088) — exact-shingle verification
  would require storing shingles (≈ the corpus itself), defeating the
  store.  The catalog query keeps the exact-verify variant oracle-green
  for the algorithmic guarantee.

The hash family is IDENTICAL to the catalog's (Broder k-permutation,
trainingdata.py), so signatures written by either path interoperate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.plans.trainingdata import (
    _BANDS_EXPR,
    _SIG_SPARK,
    LSH_BANDS,
    MINHASH_K,
)

#: token-trigram shingles: the pipeline's documents are token sequences,
#: so the shingle unit is 3 consecutive token ids — no decode needed,
#: pure whole-stage-codegen projection off the raw input
_TOKEN_SHINGLES = (
    "explode(transform(sequence(1, greatest(size(tokens) - 2, 1)), "
    "i -> array_join(slice(tokens, i, 3), ' '))) AS shingle"
)


def batch_signatures(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, sg array<bigint>) MinHash signatures for an incoming
    batch of (doc_id, tokens) rows — same k=128 Broder family as the
    catalog (one md5 per shingle, k linear universal hashes)."""
    docs.selectExpr("doc_id", _TOKEN_SHINGLES) \
        .createOrReplaceTempView("dedup_sh")
    return spark.sql(
        f"WITH sh AS (SELECT doc_id, shingle FROM dedup_sh), "
        f"{_SIG_SPARK.strip()} SELECT doc_id, sg FROM sig"
    )


def exploded_bands(sig: DataFrame) -> DataFrame:
    """(doc_id, band_key) LSH index rows from a signature table."""
    return sig.selectExpr("doc_id", _BANDS_EXPR).selectExpr(
        "doc_id", "explode(bands) AS band_key"
    )


def _est_jaccard(a: str, b: str):
    """MinHash similarity estimate: fraction of agreeing components."""
    return (
        F.aggregate(
            F.zip_with(a, b, lambda x, y: F.when(x == y, 1).otherwise(0)),
            F.lit(0), lambda acc, x: acc + x,
        ).cast("double") / F.lit(float(MINHASH_K))
    )


def store_paths(cfg: PipelineConfig) -> dict[str, str]:
    root = os.path.join(cfg.output_path, "dedup")
    return {
        "signatures": os.path.join(root, "signatures"),
        "bands": os.path.join(root, "bands"),
        "dup_pairs": os.path.join(root, "dup_pairs"),
    }


def incoming_dup_pairs(spark: SparkSession, cfg: PipelineConfig,
                       new_sig: DataFrame,
                       exclude_batch: str | None = None) -> DataFrame:
    """Duplicate pairs for an incoming batch: its rows vs the STORED
    corpus (``incoming_vs_corpus``) and within itself
    (``incoming_vs_incoming``).  The corpus side is a scan of the stored
    band index + signature tables only; ``exclude_batch`` drops the
    current batch's own (just-written) store partition from the corpus
    side — partition pruning, and without it every incoming doc would
    self-join its stored twin."""
    paths = store_paths(cfg)
    inc_bands = exploded_bands(new_sig)

    cand_inc = (
        inc_bands.alias("a")
        .join(inc_bands.alias("b"), "band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"),
                F.col("b.doc_id").alias("b_id"))
        .distinct()
        .withColumn("pair_type", F.lit("incoming_vs_incoming"))
    )
    pairs = cand_inc
    sig_b = new_sig.select("doc_id", "sg")
    # "the store has corpus batches" must mean actual DATA, not just a
    # directory husk: after this batch's own rmtree (idempotent retry)
    # the bands root can exist empty, and spark.read on an empty dir
    # throws schema-inference errors.  glob.escape guards output paths
    # containing [ ] ? * (an unescaped class silently matches nothing
    # and would disable the corpus side forever); iglob+next stops at
    # the FIRST match instead of materializing the store's whole file
    # listing every batch.
    import glob as _glob  # noqa: PLC0415

    has_store = next(_glob.iglob(
        os.path.join(_glob.escape(paths["bands"]), "**", "*.parquet"),
        recursive=True), None) is not None
    if has_store:
        stored_bands = spark.read.parquet(paths["bands"])
        stored_sig = spark.read.parquet(paths["signatures"])
        if exclude_batch is not None:
            keep = F.col("batch_id") != exclude_batch
            stored_bands = stored_bands.where(keep)
            stored_sig = stored_sig.where(keep)
        cand_corpus = (
            inc_bands.alias("n")
            .join(stored_bands.alias("o"), "band_key")
            .where(F.col("n.doc_id") != F.col("o.doc_id"))
            .select(F.col("n.doc_id").alias("a_id"),
                    F.col("o.doc_id").alias("b_id"))
            .distinct()
            .withColumn("pair_type", F.lit("incoming_vs_corpus"))
        )
        pairs = cand_inc.unionByName(cand_corpus)
        # Only signatures that can actually JOIN a pair matter: restrict
        # the store to the candidate b_ids FIRST (semi-join — bounded by
        # candidate count), and only then pick one signature per doc_id
        # for re-presented documents.  A latest-per-doc window over the
        # full store would shuffle+sort the entire corpus every batch.
        cand_b = pairs.select(F.col("b_id").alias("doc_id")).distinct()
        stored_hit = stored_sig.join(cand_b, "doc_id", "leftsemi")
        from pyspark.sql import Window as W  # noqa: PLC0415

        # latest batch wins; order by (length, value) so zero-pad
        # overflow at 10^5 batches ('batch-100000' vs 'batch-99999')
        # still ranks numerically-later ids first
        w = W.partitionBy("doc_id").orderBy(
            F.length("batch_id").desc(), F.col("batch_id").desc())
        stored_hit = (
            stored_hit.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).select("doc_id", "sg")
        )
        # incoming wins over any stored twin of the same doc_id (the
        # store's copy of an id being re-processed is stale)
        sig_b = sig_b.unionByName(
            stored_hit.join(sig_b.select("doc_id"), "doc_id",
                            "left_anti")
        )

    a = new_sig.select(F.col("doc_id").alias("a_id"),
                       F.col("sg").alias("a_sg"))
    b = sig_b.select(F.col("doc_id").alias("b_id"),
                     F.col("sg").alias("b_sg"))
    return (
        pairs.join(a, "a_id").join(b, "b_id")
        .withColumn("est_jaccard",
                    F.round(_est_jaccard("a_sg", "b_sg"), 4))
        .where(F.col("est_jaccard") >= cfg.dedup_est_threshold)
        .select("a_id", "b_id", "pair_type", "est_jaccard")
    )


def update_dedup_store(spark: SparkSession, cfg: PipelineConfig,
                       batch_tag: str, docs: DataFrame) -> dict:
    """One maintenance step: flag the incoming batch's duplicates
    against the store, then append its signatures + band index.  Each
    output lands under ``batch_id=<tag>`` (idempotent retry: a rerun
    overwrites its own dirs; the store is only consulted for EARLIER
    batches because this batch's dirs are replaced wholesale).
    Returns {"dup_pairs": n, "docs_indexed": n}."""
    paths = store_paths(cfg)
    sig_dir = os.path.join(paths["signatures"], f"batch_id={batch_tag}")
    bands_dir = os.path.join(paths["bands"], f"batch_id={batch_tag}")
    pairs_dir = os.path.join(paths["dup_pairs"], f"batch_id={batch_tag}")
    import shutil  # noqa: PLC0415

    for d in (sig_dir, bands_dir, pairs_dir):
        shutil.rmtree(d, ignore_errors=True)

    new_sig = batch_signatures(spark, docs)
    # the signature build feeds three consumers (pairs verify twice via
    # a/b, band index) — write it first, then read back the durable
    # table (same pattern as the catalog's materialized intermediates:
    # survives executor loss, no lambda re-evaluation per consumer)
    new_sig.write.mode("overwrite").parquet(sig_dir)
    new_sig = spark.read.parquet(sig_dir)

    pairs_obs, idx_obs = Observation(), Observation()
    dup = incoming_dup_pairs(spark, cfg, new_sig, exclude_batch=batch_tag) \
        .observe(pairs_obs, F.count(F.lit(1)).alias("n"))
    dup.write.mode("overwrite").parquet(pairs_dir)
    # observe() forbids DISTINCT aggregates; every doc emits exactly
    # LSH_BANDS band rows, so the doc count is rows / 32
    bands = exploded_bands(new_sig) \
        .observe(idx_obs, F.count(F.lit(1)).alias("n"))
    bands.write.mode("overwrite").parquet(bands_dir)

    from logfowd2_spark.streaming.dlq import observation_values  # noqa: PLC0415

    return {
        "dup_pairs": int(observation_values(pairs_obs).get("n") or 0),
        "docs_indexed":
            int(observation_values(idx_obs).get("n") or 0) // LSH_BANDS,
    }
