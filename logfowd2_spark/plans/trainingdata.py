"""Training-data pipeline operators over documents/embeddings:
deduplication (exact, n-gram Jaccard, MinHash+LSH), similarity search
(brute-force cosine top-k), and text analysis (fingerprint, token count,
quality scoring, language-ID heuristic).

These have no reference analogue (logfowd2 forwards logs); they are the
operations a 100 TB training-data pipeline needs on the same engine.
Scale notes inline per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logfowd2_spark.plans.catalog import _sql, register

STOPWORDS = "('the','a','of','and','to','in')"


# --- exact dedup -------------------------------------------------------------

_DEDUP = {
    "spark": """
    SELECT md5(concat_ws(' ', slice(split(text, ' '), 1, 3))) AS fp,
           count(*) AS n_docs,
           min(doc_id) AS canonical_id,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
    "duck": """
    SELECT md5(array_to_string(string_split(text, ' ')[1:3], ' ')) AS fp,
           count(*) AS n_docs,
           min(doc_id) AS canonical_id,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
}


@register("dedup_exact_fingerprint", _DEDUP["duck"])
def dedup_exact_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content fingerprint (hash-groupBy).  At 100 TB this
    is a single shuffle on a 16-byte key with map-side partial
    aggregation — the canonical-id choice (min doc_id) is deterministic."""
    return _sql(spark, sf_dir, _DEDUP["spark"], ["documents"])


# --- document fingerprinting ---------------------------------------------------

_FP = """
SELECT doc_id,
       md5(lower(text)) AS content_fp,
       md5(source || '|' || lang) AS route_fp
FROM documents
"""


@register("doc_fingerprint", _FP)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document content fingerprint — narrow projection, no shuffle."""
    return _sql(
        spark, sf_dir,
        """
        SELECT doc_id,
               md5(lower(text)) AS content_fp,
               md5(concat(source, '|', lang)) AS route_fp
        FROM documents
        """,
        ["documents"],
    )


# --- token counting --------------------------------------------------------------

_TOKCNT_PAT = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "token_count",
    f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '{_TOKCNT_PAT}')) AS re_tokens
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts; pure codegen projection."""
    return _sql(
        spark, sf_dir,
        f"""
        SELECT doc_id,
               size(split(text, ' ')) AS ws_tokens,
               size(regexp_extract_all(text, '{_TOKCNT_PAT}', 0)) AS re_tokens
        FROM documents
        """,
        ["documents"],
    )


# --- quality scoring ---------------------------------------------------------------

_QUALITY = {
    "spark": f"""
    WITH t AS (SELECT doc_id, n_chars, split(text, ' ') AS w FROM documents)
    SELECT doc_id, n_chars, size(w) AS n_words,
           round(CAST(size(filter(w, x -> x IN {STOPWORDS})) AS DOUBLE) / size(w), 4) AS stop_ratio,
           CASE WHEN size(w) >= 40 THEN 'long'
                WHEN size(w) >= 15 THEN 'ok'
                ELSE 'short' END AS quality_bucket
    FROM t
    """,
    "duck": f"""
    WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id, n_chars, len(w) AS n_words,
           round(CAST(len(list_filter(w, x -> x IN {STOPWORDS})) AS DOUBLE) / len(w), 4) AS stop_ratio,
           CASE WHEN len(w) >= 40 THEN 'long'
                WHEN len(w) >= 15 THEN 'ok'
                ELSE 'short' END AS quality_bucket
    FROM t
    """,
}


@register("quality_score", _QUALITY["duck"])
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/stopword-ratio quality features + bucket per document."""
    return _sql(spark, sf_dir, _QUALITY["spark"], ["documents"])


# --- language-ID heuristic -----------------------------------------------------------

_LANGID = {
    "spark": """
    WITH t AS (SELECT doc_id, lang, split(text, ' ') AS w FROM documents),
    s AS (SELECT doc_id, lang,
                 size(filter(w, x -> x IN ('the','a','key','row'))) AS s_en,
                 size(filter(w, x -> x IN ('data','sort','filter','part'))) AS s_x,
                 size(w) AS n FROM t)
    SELECT doc_id, lang,
           CASE WHEN s_en >= s_x THEN 'en-like' ELSE 'other' END AS predicted_class,
           round(CAST(s_en AS DOUBLE) / n, 4) AS en_score
    FROM s
    """,
    "duck": """
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
    s AS (SELECT doc_id, lang,
                 len(list_filter(w, x -> x IN ('the','a','key','row'))) AS s_en,
                 len(list_filter(w, x -> x IN ('data','sort','filter','part'))) AS s_x,
                 len(w) AS n FROM t)
    SELECT doc_id, lang,
           CASE WHEN s_en >= s_x THEN 'en-like' ELSE 'other' END AS predicted_class,
           round(CAST(s_en AS DOUBLE) / n, 4) AS en_score
    FROM s
    """,
}


@register("lang_id_heuristic", _LANGID["duck"])
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word-profile language scoring (n-gram-heuristic shape:
    per-profile hit rates + argmax with deterministic tiebreak)."""
    return _sql(spark, sf_dir, _LANGID["spark"], ["documents"])


# --- n-gram Jaccard near-dup ------------------------------------------------------------

_SHINGLES = {
    "spark": """
    SELECT doc_id,
           explode(array_distinct(transform(
             sequence(0, size(w) - 3),
             i -> concat_ws(' ', element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))
           ))) AS shingle
    FROM (SELECT doc_id, split(text, ' ') AS w FROM documents)
    WHERE size(w) >= 3
    """,
    "duck": """
    SELECT doc_id,
           unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                 for i in range(1, len(w) - 1)])) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    WHERE len(w) >= 3
    """,
}

_JACCARD_TMPL = """
WITH sh AS ({shingles}),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS intersect_n
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT a_id, b_id, intersect_n,
       round(CAST(intersect_n AS DOUBLE) / (ca.n + cb.n - intersect_n), 4) AS jaccard
FROM pairs
JOIN cnt ca ON ca.doc_id = a_id
JOIN cnt cb ON cb.doc_id = b_id
WHERE CAST(intersect_n AS DOUBLE) / (ca.n + cb.n - intersect_n) >= 0.2
"""


@register("ngram_jaccard_pairs", _JACCARD_TMPL.format(shingles=_SHINGLES["duck"]))
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard near-dup pairs.  Scale path: the shingle
    self-join is the classic inverted-index join — shuffle keyed on
    shingle, hot shingles are the skew risk (AQE skew-join handles it;
    a stopword-shingle filter would cap it further)."""
    return _sql(spark, sf_dir, _JACCARD_TMPL.format(shingles=_SHINGLES["spark"]),
                ["documents"])


# --- MinHash + LSH ------------------------------------------------------------------------

_MINHASH_TMPL = """
WITH sh AS ({shingles}),
sig AS (
  SELECT doc_id,
         min(md5('0|' || shingle)) AS h0,
         min(md5('1|' || shingle)) AS h1,
         min(md5('2|' || shingle)) AS h2,
         min(md5('3|' || shingle)) AS h3
  FROM sh GROUP BY doc_id)
SELECT doc_id, h0, h1, h2, h3,
       md5(h0 || h1) AS band_a, md5(h2 || h3) AS band_b
FROM sig
"""

_LSH_GROUPS_TMPL = """
WITH sig AS ({minhash})
SELECT band_a AS band_key, count(*) AS n_docs,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM sig GROUP BY band_a HAVING count(*) > 1
"""


def _minhash_sql(dialect: str) -> str:
    # `||` string concat parses identically in Spark SQL and DuckDB
    return _MINHASH_TMPL.format(shingles=_SHINGLES[dialect])


@register("minhash_signatures", _minhash_sql("duck"))
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=4 md5-keyed permutation mins) + 2 LSH bands
    per document.  Engine-portable because the hash family is md5-on-
    string with lexicographic min.  At scale: one groupBy(doc_id) over
    the exploded shingles; signature width trades recall vs cost."""
    return _sql(spark, sf_dir, _minhash_sql("spark"), ["documents"])


@register(
    "lsh_band_groups",
    _LSH_GROUPS_TMPL.format(minhash=_minhash_sql("duck")),
)
def lsh_band_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate buckets: documents sharing a band hash.  The band
    groupBy is the bucket-join that replaces the quadratic pair scan."""
    return _sql(spark, sf_dir,
                _LSH_GROUPS_TMPL.format(minhash=_minhash_sql("spark")),
                ["documents"])


# --- similarity search (brute-force cosine top-k baseline) -----------------------------------

_ANN_DUCK = """
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
      FROM embeddings WHERE vec_id >= 10),
s AS (SELECT qid, cid,
             round(list_dot_product(qe, ce) /
                   (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))), 4) AS score
      FROM q, c),
r AS (SELECT qid, cid, score,
             row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rnk
      FROM s)
SELECT qid, cid, score, rnk FROM r WHERE rnk <= 5
"""


@register("ann_cosine_topk", _ANN_DUCK)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: queries broadcast against the corpus,
    per-query ranking window.  This is the exact baseline; the scale path
    is LSH/IVF bucketing to cut the candidate set (the broadcast of the
    query side already avoids shuffling the corpus)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select(
        F.col("vec_id"), as_double.alias("e")
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(
            F.zip_with("e", "e", lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x,
        )),
    )
    q = base.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("norm").alias("qn")
    )
    c = base.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce"), F.col("norm").alias("cn")
    )
    joined = c.crossJoin(F.broadcast(q))
    dot = F.aggregate(
        F.zip_with("qe", "ce", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = joined.select(
        "qid", "cid", F.round(dot / (F.col("qn") * F.col("cn")), 4).alias("score")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("qid", "cid", "score", "rnk")
    )


# --- IVF-bucketed ANN (the scale path) ---------------------------------------

_IVF_DUCK = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cents AS (  -- deterministic 'centroids': the first 8 vectors
  SELECT vec_id AS cent_id, e AS ce FROM base WHERE vec_id < 8),
assign AS (  -- assign every vector to its nearest centroid bucket
  SELECT vec_id, e,
         (SELECT c.cent_id FROM cents c
          ORDER BY list_dot_product(b.e, c.ce) /
                   (sqrt(list_dot_product(b.e, b.e)) * sqrt(list_dot_product(c.ce, c.ce))) DESC,
                   c.cent_id
          LIMIT 1) AS bucket
  FROM base b),
q AS (SELECT vec_id AS qid, e AS qe, bucket FROM assign WHERE vec_id >= 8 AND vec_id < 18),
c AS (SELECT vec_id AS cid, e AS ce, bucket FROM assign WHERE vec_id >= 18),
s AS (SELECT qid, cid,
             round(list_dot_product(qe, ce) /
                   (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))), 4) AS score
      FROM q JOIN c USING (bucket)),
r AS (SELECT qid, cid, score,
             row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rnk
      FROM s)
SELECT qid, cid, score, rnk FROM r WHERE rnk <= 3
"""


@register("ann_ivf_topk", _IVF_DUCK)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style bucketed ANN: vectors are assigned to their nearest
    'centroid' (deterministic: the first 8 vectors), and queries only
    score candidates sharing their bucket — the candidate set shrinks by
    ~k× vs brute force.  At 100 TB this is the difference between a
    full cross join and a bucket-equi-join: the join key (bucket) makes
    the shuffle linear in data size, and real centroids would come from
    a sampled k-means fit broadcast to executors."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", as_double.alias("e")).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.zip_with("e", "e", lambda a, b: a * b),
                           F.lit(0.0), lambda acc, x: acc + x)),
    )
    cents = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("e").alias("ce"),
        F.col("norm").alias("cn"),
    )
    scored_cent = base.crossJoin(F.broadcast(cents)).select(
        "vec_id", "e", "norm", "cent_id",
        (
            F.aggregate(F.zip_with("e", "ce", lambda a, b: a * b),
                        F.lit(0.0), lambda acc, x: acc + x)
            / (F.col("norm") * F.col("cn"))
        ).alias("sim"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cent_id"))
    assign = (
        scored_cent.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "e", "norm", F.col("cent_id").alias("bucket"))
    )
    q = assign.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 18)).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"),
        F.col("norm").alias("qn"), "bucket",
    )
    c = assign.filter(F.col("vec_id") >= 18).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce"),
        F.col("norm").alias("cn"), "bucket",
    )
    joined = q.join(c, "bucket")
    dot = F.aggregate(F.zip_with("qe", "ce", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    scored = joined.select(
        "qid", "cid", F.round(dot / (F.col("qn") * F.col("cn")), 4).alias("score")
    )
    w2 = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= 3)
        .select("qid", "cid", "score", "rnk")
    )


# --- embedding-cosine near-dup pairs ------------------------------------------

_COS_DUP = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE vec_id < 200),
s AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             round(list_dot_product(a.e, b.e) /
                   (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 4) AS cos_sim
      FROM base a JOIN base b ON a.vec_id < b.vec_id)
SELECT a_id, b_id, cos_sim FROM s WHERE cos_sim >= 0.3
"""


@register("embedding_cosine_dups", _COS_DUP)
def embedding_cosine_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold (the
    exact-verification half of near-dup detection; the IVF/LSH bucket
    join above is what bounds the pair space at scale)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.filter(F.col("vec_id") < 200).select(
        "vec_id", as_double.alias("e")
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.zip_with("e", "e", lambda a, b: a * b),
                           F.lit(0.0), lambda acc, x: acc + x)),
    )
    a = base.select(F.col("vec_id").alias("a_id"), F.col("e").alias("ae"),
                    F.col("norm").alias("an"))
    b = base.select(F.col("vec_id").alias("b_id"), F.col("e").alias("be"),
                    F.col("norm").alias("bn"))
    joined = a.join(b, F.col("a_id") < F.col("b_id"))
    dot = F.aggregate(F.zip_with("ae", "be", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (
        joined.select("a_id", "b_id",
                      F.round(dot / (F.col("an") * F.col("bn")), 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.3)
    )


# --- SimHash (Spark-only; rows-only driver check) ------------------------------


@register("simhash_fingerprint")  # no SQL oracle: bit ops not portable
def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash over word features: per word, xxhash64 gives the
    bit pattern; each bit contributes +1/-1; the sign vector is the
    fingerprint.  Pure JVM (explode + bit ops + groupBy).  Near-dups
    differ in few bits — at scale, band the fingerprint bytes and
    bucket-join like LSH.  (No DuckDB oracle: 64-bit hash functions are
    engine-specific; the driver records a rows-only check.)"""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    hashed = words.select("doc_id", F.xxhash64("w").alias("h"))
    bits = hashed.select(
        "doc_id",
        *[
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                   F.lit(1)).otherwise(F.lit(-1)).alias(f"b{i}")
            for i in range(16)  # 16 bits is enough to demonstrate; real: 64
        ],
    )
    summed = bits.groupBy("doc_id").agg(
        *[F.sum(f"b{i}").alias(f"s{i}") for i in range(16)]
    )
    fp = summed.select(
        "doc_id",
        sum(
            (F.when(F.col(f"s{i}") > 0, F.lit(1)).otherwise(F.lit(0))
             * F.lit(2 ** i))
            for i in range(16)
        ).cast("bigint").alias("simhash16"),
    )
    return fp.orderBy("doc_id")


_EMB_STATS = """
SELECT label, count(*) AS n,
       CAST(SUM(CAST(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))) AS DECIMAL(18,6)))
            * 1000000 AS BIGINT) AS norm_total_micros
FROM embeddings GROUP BY label
"""


@register("embedding_label_stats", _EMB_STATS)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding norms: vector math per row (codegen), decimal-
    exact accumulation across rows."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(as_double, as_double, lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x,
        )
    )
    return (
        emb.select("label", norm.cast("decimal(18,6)").alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            (F.sum("nrm") * 1000000).cast("bigint").alias("norm_total_micros"),
        )
    )
