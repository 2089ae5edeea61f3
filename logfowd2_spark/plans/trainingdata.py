"""Training-data pipeline operators over documents/embeddings:
deduplication (exact, n-gram Jaccard, MinHash+LSH), similarity search
(brute-force cosine top-k), and text analysis (fingerprint, token count,
quality scoring, language-ID heuristic).

These have no reference analogue (logfowd2 forwards logs); they are the
operations a 100 TB training-data pipeline needs on the same engine.
Scale notes inline per operator.
"""

from __future__ import annotations

import os

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

# Rabin-Karp polynomial rolling hash (base 31, mod 1e9+7): the
# shift-resistant fingerprint family used for content-defined chunking
# — fold (acc*B + c) mod P over the code points; identical arithmetic
# in Spark's aggregate() and DuckDB's list_reduce(), so it is
# oracle-checked bit-for-bit.  BIGINT-safe: acc < P < 2^30, c < 2^21,
# acc*31 + c < 2^35.
_ROLL_SPARK = (
    "aggregate(transform(sequence(1, length(text)), "
    "i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)), "
    "CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % 1000000007)"
)
_ROLL_DUCK = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, length(text) + 1), "
    "i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT))), "
    "(acc, c) -> (acc * 31 + c) % 1000000007)"
)

_FP = f"""
SELECT doc_id,
       md5(lower(text)) AS content_fp,
       md5(source || '|' || lang) AS route_fp,
       {_ROLL_DUCK} AS rolling_fp
FROM documents
"""


@register("doc_fingerprint", _FP)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document content fingerprints — narrow projection, no
    shuffle: exact md5 (dedup key), route key, and the Rabin-Karp
    rolling hash (the shift-resistant family behind content-defined
    chunking; the lambda fold is CodegenFallback but runs once per doc,
    not in any hot path)."""
    return _sql(
        spark, sf_dir,
        f"""
        SELECT doc_id,
               md5(lower(text)) AS content_fp,
               md5(concat(source, '|', lang)) AS route_fp,
               {_ROLL_SPARK} AS rolling_fp
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


# --- TF-IDF top terms --------------------------------------------------------------

_TFIDF_DUCK = """
WITH words AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
tf AS (SELECT source, w, count(*) AS tf FROM words GROUP BY 1, 2),
dfx AS (SELECT w, count(DISTINCT source) AS df FROM words GROUP BY 1),
ns AS (SELECT count(DISTINCT source) AS n FROM documents),
scored AS (
  SELECT tf.source, tf.w AS term, tf.tf, dfx.df,
         tf.tf * ln(CAST(n AS DOUBLE) / dfx.df) AS score
  FROM tf JOIN dfx ON tf.w = dfx.w CROSS JOIN ns),
r AS (SELECT source, term, tf, df, round(score, 4) AS score,
             row_number() OVER (PARTITION BY source
                                ORDER BY round(score, 4) DESC, term) AS rnk
      FROM scored)
SELECT source, term, tf, df, score, rnk FROM r WHERE rnk <= 5
"""

# Engine-side formulation (round 6): the oracle's ``words`` CTE is
# referenced twice (tf and dfx) and Spark INLINES it, so the explode ran
# twice and the per-term document frequency re-aggregated the raw word
# stream.  Here dfx is derived FROM tf — count(*) of tf's (source, w)
# groups ≡ count(DISTINCT source) per w, exactly — so the explode
# appears once per reference and the two identical tf subtrees share
# one computation via exchange reuse.  Identical output.
_TFIDF_SPARK = """
WITH tf AS (
  SELECT source, w, count(*) AS tf
  FROM (SELECT source, explode(split(text, ' ')) AS w FROM documents)
  GROUP BY 1, 2),
dfx AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
ns AS (SELECT count(DISTINCT source) AS n FROM documents),
scored AS (
  SELECT tf.source, tf.w AS term, tf.tf, dfx.df,
         tf.tf * ln(CAST(n AS DOUBLE) / dfx.df) AS score
  FROM tf JOIN dfx ON tf.w = dfx.w CROSS JOIN ns),
r AS (SELECT source, term, tf, df, round(score, 4) AS score,
             row_number() OVER (PARTITION BY source
                                ORDER BY round(score, 4) DESC, term) AS rnk
      FROM scored)
SELECT source, term, tf, df, score, rnk FROM r WHERE rnk <= 5
"""


@register("tfidf_top_terms", _TFIDF_DUCK)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive vocabulary: tf·idf = tf × ln(N/df) with
    stopword-like terms self-suppressing (df = N ⇒ idf = 0 — no
    stopword list needed), top-5 per source with a deterministic term
    tiebreak.  Plan shape at scale: two map-side-combined shuffles (the
    per-(source,term) tf and the per-term df), a broadcast of the 1-row
    corpus constant, and a WindowGroupLimit top-k per source — no global
    sort, no driver collect."""
    return _sql(spark, sf_dir, _TFIDF_SPARK, ["documents"])


# --- PII redaction -----------------------------------------------------------------

# patterns are backslash-free ([.] and [0-9] instead of \. and \d) so the
# IDENTICAL text is valid in Spark SQL (java.util.regex, backslashes need
# doubling in literals) and DuckDB (RE2) — no dialect split to drift
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
_PII_IPV4 = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
_PII_PHONE = "[+][0-9]{1,2}-[0-9]{3}-[0-9]{4}"

# deterministic PII seeding (documents are synthetic clean words): 2 of 3
# docs get an email + ip + phone appended; every 3rd passes through
# untouched, gating the no-op path too
_PII_LINE_SPARK = (
    "CASE WHEN doc_id % 3 = 0 THEN text ELSE concat(text,"
    " ' email=user', CAST(doc_id AS STRING), '@example.com"
    " ip=10.', CAST(doc_id % 200 AS STRING), '.0.', CAST(doc_id % 250 AS STRING),"
    " ' phone=+1-555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) END"
)
_PII_LINE_DUCK = (
    "CASE WHEN doc_id % 3 = 0 THEN text ELSE text ||"
    " ' email=user' || CAST(doc_id AS VARCHAR) || '@example.com"
    " ip=10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR) ||"
    " ' phone=+1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END"
)

_PII_ORACLE = f"""
WITH s AS (SELECT doc_id, {_PII_LINE_DUCK} AS line FROM documents)
SELECT doc_id,
       md5(regexp_replace(regexp_replace(regexp_replace(line,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g'),
           '{_PII_IPV4}', '<IP>', 'g')) AS redacted_fp,
       len(regexp_extract_all(line, '{_PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(line, '{_PII_IPV4}')) AS n_ips,
       len(regexp_extract_all(line, '{_PII_PHONE}')) AS n_phones
FROM s
"""


@register("pii_redact", _PII_ORACLE)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: email/IPv4/phone patterns
    redacted to typed placeholders, with per-class match counts (the
    audit trail a redaction pass must emit).  Pure codegen projection —
    three regexp_replace + three regexp_extract_all per row, no shuffle;
    at 100 TB this runs at scan speed and column-prunes to (doc_id,
    text).  Phone redaction runs BEFORE IPv4 so the 555-prefix digits
    can't be half-claimed by the ip pattern (order pinned in both
    dialects)."""
    return _sql(
        spark, sf_dir,
        f"""
        WITH s AS (SELECT doc_id, {_PII_LINE_SPARK} AS line FROM documents)
        SELECT doc_id,
               md5(regexp_replace(regexp_replace(regexp_replace(line,
                   '{_PII_EMAIL}', '<EMAIL>'),
                   '{_PII_PHONE}', '<PHONE>'),
                   '{_PII_IPV4}', '<IP>')) AS redacted_fp,
               size(regexp_extract_all(line, '{_PII_EMAIL}', 0)) AS n_emails,
               size(regexp_extract_all(line, '{_PII_IPV4}', 0)) AS n_ips,
               size(regexp_extract_all(line, '{_PII_PHONE}', 0)) AS n_phones
        FROM s
        """,
        ["documents"],
    )


# --- quality scoring ---------------------------------------------------------------

_QUALITY = {
    "spark": f"""
    WITH t AS (SELECT doc_id, n_chars, lang, split(text, ' ') AS w FROM documents),
    s AS (SELECT doc_id, n_chars, lang, w,
                 size(filter(w, x -> x IN ('the','a','key','row'))) AS s_en,
                 size(filter(w, x -> x IN ('data','sort','filter','part'))) AS s_x
          FROM t)
    SELECT doc_id, n_chars, size(w) AS n_words,
           round(CAST(size(filter(w, x -> x IN {STOPWORDS})) AS DOUBLE) / size(w), 4) AS stop_ratio,
           CASE WHEN size(w) >= 40 THEN 'long'
                WHEN size(w) >= 15 THEN 'ok'
                ELSE 'short' END AS quality_bucket,
           lang,
           CASE WHEN s_en >= s_x THEN 'en-like' ELSE 'other' END AS predicted_class,
           round(CAST(s_en AS DOUBLE) / size(w), 4) AS en_score
    FROM s
    """,
    "duck": f"""
    WITH t AS (SELECT doc_id, n_chars, lang, string_split(text, ' ') AS w FROM documents),
    s AS (SELECT doc_id, n_chars, lang, w,
                 len(list_filter(w, x -> x IN ('the','a','key','row'))) AS s_en,
                 len(list_filter(w, x -> x IN ('data','sort','filter','part'))) AS s_x
          FROM t)
    SELECT doc_id, n_chars, len(w) AS n_words,
           round(CAST(len(list_filter(w, x -> x IN {STOPWORDS})) AS DOUBLE) / len(w), 4) AS stop_ratio,
           CASE WHEN len(w) >= 40 THEN 'long'
                WHEN len(w) >= 15 THEN 'ok'
                ELSE 'short' END AS quality_bucket,
           lang,
           CASE WHEN s_en >= s_x THEN 'en-like' ELSE 'other' END AS predicted_class,
           round(CAST(s_en AS DOUBLE) / len(w), 4) AS en_score
    FROM s
    """,
}


@register("quality_score", _QUALITY["duck"])
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text analysis in one split: length/stopword-ratio
    quality features + bucket, AND the marker-word-profile language-ID
    (n-gram-heuristic shape: per-profile hit rates + argmax with
    deterministic tiebreak) — merged in round 4 so both operators share
    one tokenization and one catalog slot."""
    return _sql(spark, sf_dir, _QUALITY["spark"], ["documents"])


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

# Shingle doc-frequency cap: trigrams appearing in more than DF_CAP
# documents are boilerplate, not dedup evidence — and each contributes
# O(df²) candidate pairs to the inverted-index self-join, which AQE's
# skew-join can split across tasks but cannot shrink.  The cap bounds
# the per-shingle quadratic at any scale; at the test SFs (max df = 7
# at sf0.01) it provably changes nothing.
SHINGLE_DF_CAP = 100

_CAPPED_SHINGLES_TMPL = """
sh0 AS ({shingles}),
hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > {cap}),
sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0
       LEFT JOIN hot ON hot.shingle = sh0.shingle
       WHERE hot.shingle IS NULL)
"""


def _capped_shingles(dialect: str) -> str:
    return _CAPPED_SHINGLES_TMPL.format(shingles=_SHINGLES[dialect],
                                        cap=SHINGLE_DF_CAP)


# Engine-side single-pass form of the capped shingle table (round 6).
# The CTE form above is what the DuckDB oracles state; Spark INLINES a
# CTE referenced twice, so the hot/anti-join formulation ran the
# trigram Generate (an interpreted higher-order function) TWICE plus a
# groupBy+broadcast-anti-join (plan audit: two Generate nodes, three
# Exchanges).  A window count over shingle computes the identical
# DF-cap predicate in ONE pass: one Generate, one Exchange(shingle),
# one sort — measured 1.19 s → 0.83 s steady / 2.9 s → 1.45 s cold at
# sf0.1, identical 260,388-row output.
_CAPPED_SHINGLES_ENGINE = f"""
sh0 AS ({_SHINGLES["spark"]})
SELECT doc_id, shingle FROM (
  SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
  FROM sh0)
WHERE df <= {SHINGLE_DF_CAP}
"""


_JACCARD_BODY = """
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


@register("ngram_jaccard_pairs",
          "WITH " + _capped_shingles("duck") + "," + _JACCARD_BODY)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard near-dup pairs over the DF-capped shingle
    universe.  Scale path: inverted-index self-join keyed on shingle;
    the DF cap bounds the quadratic candidate blowup of hot shingles
    (AQE skew-join splits tasks, it doesn't shrink candidate counts).
    Reads the MATERIALIZED shingle table — one shingle build serves
    this, the MinHash build, and every LSH verify in the session."""
    _materialized_shingles(spark, sf_dir).createOrReplaceTempView("sh")
    return spark.sql("WITH " + _JACCARD_BODY.lstrip())


# --- MinHash + LSH (production shape: k=128 hashes, 32 bands × 4 rows) ------
#
# The full pipeline (signatures → bands → candidate pairs → exact
# verify) is oracle-checked end to end; the hash family is identical
# arithmetic in Spark and DuckDB.  At scale this is: one exploded
# groupBy to build signatures, one explode(bands) + self-equi-join on
# band_key for candidates (linear shuffle, no all-pairs), and an exact
# Jaccard verify restricted to candidates.  With r=4, b=32 the catch
# probability at jaccard j is 1-(1-j^4)^32: ≥0.874 at j=0.5, ≥0.9998
# at j=0.7.

MINHASH_K = 128
LSH_BANDS = 32
LSH_ROWS = 4
LSH_VERIFY_THRESHOLD = 0.5

# Signature build shape: explode (doc, shingle) × 128 seeds and min-agg,
# NOT a nested array lambda — higher-order functions are CodegenFallback
# (interpreted per element, measured ~19 µs/hash); the exploded form
# stays inside whole-stage codegen with map-side partial min().
#
# The hash family is the textbook k-permutation construction (Broder):
# ONE strong base hash per shingle, split into two 28-bit halves
# (h1, h2), and the k family members are the linear universal hashes
# (h1 + i*h2) mod 2^31-1 (Mersenne prime).  This replaces k md5 calls
# per (doc, shingle) — the round-3 hot loop, |shingles|×128 md5s — with
# ONE md5 plus k multiply-adds, and shrinks the WRITTEN signature table
# from 128×36 B of hex strings to 128×8 B of bigints (the round-3
# durability upgrade made this intermediate a real disk write, so its
# size is the minhash build's write+read cost).  28-bit halves keep
# i*h2 < 2^35 — no BIGINT overflow in either engine.
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1

_SIG_SPARK = f"""
hs AS (
  SELECT doc_id,
         CAST(conv(substr(md5(shingle), 1, 7), 16, 10) AS BIGINT) AS h1,
         CAST(conv(substr(md5(shingle), 9, 7), 16, 10) AS BIGINT) AS h2
  FROM sh),
seeded AS (
  SELECT doc_id, i, min((h1 + i * h2) % {MINHASH_PRIME}) AS h
  FROM hs CROSS JOIN (SELECT explode(sequence(0, {MINHASH_K - 1})) AS i)
  GROUP BY doc_id, i),
sig AS (SELECT doc_id,
  transform(array_sort(collect_list(struct(i, h))), x -> x.h) AS sg
  FROM seeded GROUP BY doc_id)
"""

#: band hashes from an ALREADY-MATERIALIZED sg column (cheap slices;
#: longs render as decimal strings — identical in both engines)
_BANDS_EXPR = (
    f"transform(sequence(0, {LSH_BANDS - 1}), b -> "
    f"md5(concat(CAST(b AS STRING), ':', "
    f"concat_ws('', transform(slice(sg, b * {LSH_ROWS} + 1, {LSH_ROWS}), "
    f"x -> CAST(x AS STRING)))))) AS bands"
)

_SIG_DUCK = f"""
hs AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 7)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(shingle), 9, 7)) AS BIGINT) AS h2
  FROM sh),
seeded AS (
  SELECT doc_id, i, min((h1 + i * h2) % {MINHASH_PRIME}) AS h
  FROM hs CROSS JOIN range(0, {MINHASH_K}) t(i)
  GROUP BY doc_id, i),
sig AS (SELECT doc_id, list(h ORDER BY i) AS sg FROM seeded GROUP BY doc_id),
banded AS (SELECT doc_id,
  list_transform(range(0, {LSH_BANDS}), b ->
    md5(CAST(b AS VARCHAR) || ':' ||
        array_to_string(list_transform(
          sg[b * {LSH_ROWS} + 1 : b * {LSH_ROWS} + {LSH_ROWS}],
          x -> CAST(x AS VARCHAR)), ''))) AS bands
  FROM sig)
"""


def _sig_ctes(dialect: str) -> str:
    sig = _SIG_SPARK if dialect == "spark" else _SIG_DUCK
    return _capped_shingles(dialect) + ", " + sig


#: memoized materializations, keyed by (applicationId, sf_dir) —
#: applicationId is unique per SparkContext, unlike id(spark) whose
#: address can be recycled onto a dead session.  The values are
#: DataFrames READING BACK a written parquet intermediate (not
#: localCheckpoint): written data survives executor loss on a real
#: cluster (localCheckpoint blocks are executor-local and unreplicated —
#: losing one executor mid-job would make the cached shingle/signature
#: data unrecoverable), and a parquet scan is immune to the
#: view-replacement cache invalidation that silently uncaches persist().
_SHINGLE_CACHE: dict[tuple[str, str], DataFrame] = {}
_SIG_CACHE: dict[tuple[str, str], DataFrame] = {}

#: scratch root for written intermediates; per-applicationId subdirs so
#: concurrent sessions never collide and a fresh session never reuses a
#: stale table.  On a cluster this would live under the job's output
#: prefix on the DFS/object store — same durability argument.
_SCRATCH_ROOT = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/logfowd2_scratch")


def _cache_key(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    app = spark.sparkContext.applicationId
    # entries from other (dead) sessions can never be reused — drop them,
    # and garbage-collect those sessions' on-disk scratch subtrees too
    # (without this every new session leaks its predecessor's written
    # shingle/signature tables until the disk fills)
    for cache in (_SHINGLE_CACHE, _SIG_CACHE, _PAIRS_CACHE):
        for k in [k for k in cache if k[0] != app]:
            del cache[k]
    if os.path.isdir(_SCRATCH_ROOT):
        import shutil as _shutil  # noqa: PLC0415
        import time as _time  # noqa: PLC0415

        def newest_mtime(root: str) -> float:
            # activity lives in nested table dirs (app/slug/name/part-*),
            # so staleness must consider the whole subtree, not the
            # top-level dir (whose mtime only changes on child creation)
            newest = 0.0
            try:
                newest = os.path.getmtime(root)
                for r, _dirs, files in os.walk(root):
                    for fn in files:
                        newest = max(newest,
                                     os.path.getmtime(os.path.join(r, fn)))
            except OSError:
                pass
            return newest

        # heartbeat: parquet READS don't bump any mtime, so a long-lived
        # session touches a marker on every cache access — its subtree
        # never looks idle while the session keeps using it
        mine = os.path.join(_SCRATCH_ROOT, app)
        if os.path.isdir(mine):
            with open(os.path.join(mine, "_HEARTBEAT"), "w"):
                pass
        for name in os.listdir(_SCRATCH_ROOT):
            full = os.path.join(_SCRATCH_ROOT, name)
            # age guard: only reap another session's subtree when nothing
            # under it (data or heartbeat) changed for a DAY.  The
            # heartbeat advances only when that session calls into this
            # cache, so the threshold must dominate any plausible
            # idle-but-alive gap (round-3's 1 h did not: a session idle
            # that long would lose its written intermediates out from
            # under cached DataFrames).  Residual assumption, documented:
            # a session idle >24 h that then reuses a cached DataFrame
            # can still lose the scan — concurrent long-idle sessions
            # should set SPARK_GRAFT_SCRATCH to disjoint roots.
            if name != app and _time.time() - newest_mtime(full) > 86400:
                _shutil.rmtree(full, ignore_errors=True)
    return (app, sf_dir)


def _write_intermediate(df: DataFrame, spark: SparkSession,
                        key: tuple[str, str], name: str) -> DataFrame:
    """Write ``df`` as a first-class parquet intermediate and return a
    DataFrame that SCANS the written table (lineage = one file scan).

    No read-back repartition: the upstream plans write one file per
    shuffle partition, so the scan already splits across the open-cost
    buckets, the heavy downstream stages re-parallelize at their own
    shuffles, and an A/B measurement showed an extra Exchange here is a
    straight ~1 s/query loss at sf0.1."""
    import re as _re

    app, sf_dir = key
    slug = _re.sub(r"[^A-Za-z0-9._-]+", "_", os.path.abspath(sf_dir))
    path = os.path.join(_SCRATCH_ROOT, app, slug.strip("_"), name)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _materialized_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DF-capped (doc_id, shingle) table, computed once per
    session×sf (the comprehension that builds trigrams is an interpreted
    higher-order function — don't re-run it per downstream query) and
    written as a parquet intermediate (durability: see _write_intermediate)."""
    key = _cache_key(spark, sf_dir)
    if key not in _SHINGLE_CACHE:
        # small-SF inputs are a single parquet file = ONE scan partition;
        # without this repartition the whole shingle+hash chain runs on
        # one core (at 100 TB the scan is naturally thousands of splits
        # and this shuffle of the tiny doc table is noise)
        par = spark.sparkContext.defaultParallelism
        spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .repartition(par).createOrReplaceTempView("documents")
        sh = spark.sql(f"WITH {_CAPPED_SHINGLES_ENGINE}")
        _SHINGLE_CACHE[key] = _write_intermediate(sh, spark, key, "shingles")
    return _SHINGLE_CACHE[key]


def _materialized_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k=128 signature table, WRITTEN once per session×sf and read
    back — a first-class intermediate, not a cache.

    Two reasons, both load-bearing at scale:

    - Catalyst has no common-subexpression elimination across
      higher-order-function lambdas, so every downstream reference to the
      ``sg`` array would re-evaluate all k×|shingles| md5s — a band
      self-join re-hashed the corpus ~64× (measured: 594 s at sf0.1 vs
      ~10 s materialized).
    - At 100 TB the signature table (docs × ~4 KB, ~10⁻³ of the corpus)
      is the standard LSH design: write it once to the DFS, and every
      dedup pass (bands, candidates, verify — and every FUTURE incremental
      dedup run) scans it instead of re-hashing the corpus.  A written
      table also survives executor loss mid-job, which the previous
      localCheckpoint (executor-local, unreplicated, lineage-severed)
      could not."""
    key = _cache_key(spark, sf_dir)
    if key not in _SIG_CACHE:
        sh = _materialized_shingles(spark, sf_dir)
        sh.createOrReplaceTempView("sh_materialized")
        # Round 6: the k-fold runs in the Arrow reduceat kernel (below)
        # instead of the SQL explode×128 fold (_SIG_SPARK, kept as the
        # oracle's statement of the arithmetic): the md5 halves stay
        # JVM codegen, ONE shuffle co-locates each doc's (h1, h2) rows,
        # and numpy computes all 128 minima natively — the same shape
        # dedup_store.batch_signatures ships for the pipeline.  A/B at
        # sf0.1 (260k shingles), same window: SQL fold 11.7-13.0 s vs
        # kernel 1.9-6.0 s, outputs bit-identical (asserted over every
        # doc's full signature; integer arithmetic, no float path).
        hs = spark.sql(
            "SELECT doc_id, "
            " CAST(conv(substr(md5(shingle), 1, 7), 16, 10) AS BIGINT) AS h1, "
            " CAST(conv(substr(md5(shingle), 9, 7), 16, 10) AS BIGINT) AS h2 "
            "FROM sh_materialized"
        )
        par = spark.sparkContext.defaultParallelism
        hs = hs.repartition(par, "doc_id").sortWithinPartitions("doc_id")
        sig = hs.mapInPandas(_make_sig_fold(MINHASH_K, MINHASH_PRIME),
                             "doc_id bigint, sg array<bigint>")
        _SIG_CACHE[key] = _write_intermediate(sig, spark, key, "signatures")
    return _SIG_CACHE[key]


def _make_sig_fold(k: int, prime: int):
    """mapInPandas kernel factory: per-doc elementwise minima of the k
    linear hashes (h1 + i*h2) mod prime over SORTED (doc_id, h1, h2)
    rows.  Identical integers to the SQL fold in ``_SIG_SPARK`` (h1,
    h2 < 2^28, i < 128 ⇒ products < 2^35, exact in int64).  Documents
    spanning Arrow batches are merged by carrying the open doc across
    the iterator (batches arrive in partition sort order).  Returned as
    a closure over plain ints so it pickles by value with no
    module-global references (same pattern as dedup_store's kernel)."""

    def fold(batches):
        import numpy as np  # noqa: PLC0415 - executor side
        import pandas as pd  # noqa: PLC0415

        I = np.arange(k, dtype=np.int64)  # noqa: E741

        def frame(ids, mins):
            return pd.DataFrame({"doc_id": ids,
                                 "sg": [m.tolist() for m in mins]})

        pend_id, pend_min = None, None
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy()
            h1 = pdf["h1"].to_numpy(dtype=np.int64)
            h2 = pdf["h2"].to_numpy(dtype=np.int64)
            M = (h1[:, None] + I[None, :] * h2[:, None]) % prime
            starts = np.concatenate(
                [[0], np.nonzero(ids[1:] != ids[:-1])[0] + 1])
            mins = np.minimum.reduceat(M, starts, axis=0)
            gids = ids[starts]
            if pend_id is not None:
                if gids[0] == pend_id:  # doc continues across batches
                    mins[0] = np.minimum(mins[0], pend_min)
                else:
                    yield frame([pend_id], [pend_min])
            pend_id, pend_min = gids[-1], mins[-1].copy()
            if len(gids) > 1:
                yield frame(gids[:-1], mins[:-1])
        if pend_id is not None:
            yield frame([pend_id], [pend_min])

    return fold


def _exploded_bands(sig: DataFrame) -> DataFrame:
    """(doc_id, band_key) from a materialized signature table — the
    band md5s are cheap slices over the cached array."""
    return sig.selectExpr("doc_id", _BANDS_EXPR).selectExpr(
        "doc_id", "explode(bands) AS band_key"
    )


_MINHASH_OUT_SPARK = f"""
SELECT doc_id,
       md5(concat_ws('', transform(sg, x -> CAST(x AS STRING)))) AS sig_fp,
       element_at(sg, 1) AS h_first,
       element_at(sg, {MINHASH_K}) AS h_last,
       size(sg) AS k
FROM sig
"""

_MINHASH_OUT_DUCK = f"""
SELECT doc_id,
       md5(array_to_string(list_transform(sg, x -> CAST(x AS VARCHAR)), ''))
         AS sig_fp,
       sg[1] AS h_first,
       sg[{MINHASH_K}] AS h_last,
       len(sg) AS k
FROM sig
"""


@register("minhash_signatures",
          f"WITH {_sig_ctes('duck')} {_MINHASH_OUT_DUCK}")
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=128 MinHash signatures per document (Broder k-permutation
    family: one md5 per shingle, k linear universal hashes mod 2^31-1).
    Output is the signature fingerprint + first/last hash (the 128-wide
    array itself is engine-checked via its fingerprint).  Computed off
    the materialized signature table so the four output projections
    don't each re-run the hash family."""
    sig = _materialized_sig(spark, sf_dir)
    return sig.selectExpr(
        "doc_id",
        "md5(concat_ws('', transform(sg, x -> CAST(x AS STRING)))) AS sig_fp",
        "element_at(sg, 1) AS h_first",
        f"element_at(sg, {MINHASH_K}) AS h_last",
        "size(sg) AS k",
    )


_BANDS_EXPLODE_DUCK = "SELECT doc_id, unnest(bands) AS band_key FROM banded"

_LSH_GROUPS_OUT = """
SELECT band_key, count(*) AS n_docs,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM eb GROUP BY band_key HAVING count(*) > 1
"""


@register(
    "lsh_band_groups",
    f"WITH {_sig_ctes('duck')}, eb AS ({_BANDS_EXPLODE_DUCK}) {_LSH_GROUPS_OUT}",
)
def lsh_band_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate buckets: documents sharing any of the 32 band
    hashes.  The band groupBy is the bucket-join that replaces the
    quadratic pair scan."""
    eb = _exploded_bands(_materialized_sig(spark, sf_dir))
    eb.createOrReplaceTempView("eb")
    return spark.sql(_LSH_GROUPS_OUT)


_CAND_OUT = """
SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared_bands
FROM eb a JOIN eb b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


@register(
    "lsh_candidate_pairs",
    f"WITH {_sig_ctes('duck')}, eb AS ({_BANDS_EXPLODE_DUCK}) {_CAND_OUT}",
)
def lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: equi-join of exploded band hashes (linear in
    data + candidates, never all-pairs), deduped with a groupBy that
    also reports how many bands agreed."""
    eb = _exploded_bands(_materialized_sig(spark, sf_dir))
    eb.createOrReplaceTempView("eb")
    return spark.sql(_CAND_OUT)


_VERIFY_OUT = f"""
WITH cp AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       FROM eb a JOIN eb b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT cp.a_id, cp.b_id, count(*) AS i_n
  FROM cp
  JOIN sh sa ON sa.doc_id = cp.a_id
  JOIN sh sb ON sb.doc_id = cp.b_id AND sb.shingle = sa.shingle
  GROUP BY cp.a_id, cp.b_id)
SELECT a_id, b_id,
       round(CAST(i_n AS DOUBLE) / (ca.n + cb.n - i_n), 4) AS jaccard
FROM inter
JOIN cnt ca ON ca.doc_id = a_id
JOIN cnt cb ON cb.doc_id = b_id
WHERE CAST(i_n AS DOUBLE) / (ca.n + cb.n - i_n) >= {LSH_VERIFY_THRESHOLD}
"""

# The ORACLE for the verified dups is the BRUTE-FORCE Jaccard scan at the
# same threshold — i.e. the gate proves LSH(candidates)+verify returns
# exactly the ground-truth answer (recall loss would fail the hash check).
_VERIFY_ORACLE = f"""
WITH {_capped_shingles('duck')},
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i_n
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT a_id, b_id,
       round(CAST(i_n AS DOUBLE) / (ca.n + cb.n - i_n), 4) AS jaccard
FROM pairs
JOIN cnt ca ON ca.doc_id = a_id
JOIN cnt cb ON cb.doc_id = b_id
WHERE CAST(i_n AS DOUBLE) / (ca.n + cb.n - i_n) >= {LSH_VERIFY_THRESHOLD}
"""


#: memoized verified-pair table (same pattern/caches as signatures)
_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _materialized_verified_pairs(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The LSH-candidates → exact-Jaccard-verified duplicate pairs,
    WRITTEN once per session×sf: both `lsh_verified_dups` and the
    cluster builder consume this table, and in a production dedup the
    verified-pair set is exactly the durable artifact every downstream
    step (clustering, canonical-pick, removal list) re-reads.

    Round-6 measurement note: a guide-§3.2 variant that materialized
    the distinct candidate set and pre-filtered ``sh`` to candidate
    docs with a broadcast semi-join before the intersection joins was
    A/B'd and REJECTED at bench scale — the extra intermediate write
    plus the thrice-inlined filter subtree cost more than the join
    savings (same window: 1.6 s this shape, 2.1 s candidate-write +
    filtered, 3.0 s persisted-DataFrame variant).  At a corpus where
    the full-``sh`` shuffles dominate, the production route is the
    incremental dedup store (streaming/dedup_store.py), which never
    joins raw shingles at all."""
    key = _cache_key(spark, sf_dir)
    if key not in _PAIRS_CACHE:
        _materialized_shingles(spark, sf_dir).createOrReplaceTempView("sh")
        eb = _exploded_bands(_materialized_sig(spark, sf_dir))
        eb.createOrReplaceTempView("eb")
        _PAIRS_CACHE[key] = _write_intermediate(
            spark.sql(_VERIFY_OUT), spark, key, "verified_pairs"
        )
    return _PAIRS_CACHE[key]


@register("lsh_verified_dups", _VERIFY_ORACLE)
def lsh_verified_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed near-dup pipeline: LSH candidates → exact Jaccard
    verify ≥ 0.5.  Oracle = the brute-force all-pairs answer, so the
    gate proves the bucketed path loses no recall on this corpus (with
    r=4, b=32 the miss probability at j=0.9 is (1-0.9⁴)³² ≈ 1.5e-15).
    Candidates come from the materialized signature table; the verified
    pairs are themselves a written intermediate shared with the cluster
    builder (one verify join per session, not one per consumer)."""
    return _materialized_verified_pairs(spark, sf_dir)


# --- INCREMENTAL dedup: a new batch against the stored signature table -----

_INCR_OUT = f"""
WITH newb AS (SELECT doc_id, band_key FROM eb WHERE doc_id % 5 = 0),
cp AS (SELECT DISTINCT least(n.doc_id, o.doc_id) AS a_id,
              greatest(n.doc_id, o.doc_id) AS b_id
       FROM newb n JOIN eb o
         ON n.band_key = o.band_key AND n.doc_id <> o.doc_id),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT cp.a_id, cp.b_id, count(*) AS i_n
  FROM cp
  JOIN sh sa ON sa.doc_id = cp.a_id
  JOIN sh sb ON sb.doc_id = cp.b_id AND sb.shingle = sa.shingle
  GROUP BY cp.a_id, cp.b_id)
SELECT a_id, b_id,
       round(CAST(i_n AS DOUBLE) / (ca.n + cb.n - i_n), 4) AS jaccard,
       CASE WHEN a_id % 5 = 0 AND b_id % 5 = 0 THEN 'incoming_vs_incoming'
            ELSE 'incoming_vs_corpus' END AS pair_type
FROM inter
JOIN cnt ca ON ca.doc_id = a_id
JOIN cnt cb ON cb.doc_id = b_id
WHERE CAST(i_n AS DOUBLE) / (ca.n + cb.n - i_n) >= {LSH_VERIFY_THRESHOLD}
"""

_INCR_ORACLE = f"""
WITH {{shingles}},
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i_n
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT a_id, b_id,
       round(CAST(i_n AS DOUBLE) / (ca.n + cb.n - i_n), 4) AS jaccard,
       CASE WHEN a_id % 5 = 0 AND b_id % 5 = 0 THEN 'incoming_vs_incoming'
            ELSE 'incoming_vs_corpus' END AS pair_type
FROM pairs
JOIN cnt ca ON ca.doc_id = a_id
JOIN cnt cb ON cb.doc_id = b_id
WHERE CAST(i_n AS DOUBLE) / (ca.n + cb.n - i_n) >= {LSH_VERIFY_THRESHOLD}
  AND NOT (a_id % 5 <> 0 AND b_id % 5 <> 0)
"""


@register("lsh_incremental_dups",
          _INCR_ORACLE.format(shingles=_capped_shingles("duck")))
def lsh_incremental_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the production flow the stored signature
    table exists for: an incoming batch (doc_id % 5 = 0, ~20% of docs)
    is checked against the existing corpus WITHOUT re-deduping the
    corpus.  Candidates = incoming band keys equi-joined into the full
    band table (linear in incoming size × bucket occupancy; the corpus
    side is a scan of the written signature intermediate, never a
    re-hash), then exact-Jaccard verified; corpus×corpus pairs are
    excluded by construction (they were settled by the previous full
    run).  Pairs are typed incoming_vs_corpus / incoming_vs_incoming —
    the former dedups against history, the latter within the batch.
    Oracle: brute-force Jaccard over all pairs with at least one
    incoming side — proves the incremental path finds exactly what a
    full recompute restricted to the new docs would."""
    _materialized_shingles(spark, sf_dir).createOrReplaceTempView("sh")
    eb = _exploded_bands(_materialized_sig(spark, sf_dir))
    eb.createOrReplaceTempView("eb")
    return spark.sql(_INCR_OUT)


# --- near-dup CLUSTERS: connected components over the verified pairs -------

_CLUSTER_ORACLE = f"""
WITH RECURSIVE {{shingles}},
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
ip AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i_n
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
vp AS (
  SELECT a_id, b_id FROM ip
  JOIN cnt ca ON ca.doc_id = a_id
  JOIN cnt cb ON cb.doc_id = b_id
  WHERE CAST(i_n AS DOUBLE) / (ca.n + cb.n - i_n) >= {LSH_VERIFY_THRESHOLD}),
edges AS (SELECT a_id AS s, b_id AS d FROM vp
          UNION ALL SELECT b_id, a_id FROM vp),
reach(src, dst) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM edges) t
  UNION
  SELECT r.src, e.d FROM reach r JOIN edges e ON e.s = r.dst
),
lab AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src)
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM lab
"""


@register("lsh_dup_clusters",
          _CLUSTER_ORACLE.format(shingles=_capped_shingles("duck")))
def lsh_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the LSH-verified
    pair graph, so one canonical representative per duplicate group
    survives dedup (pairs alone can't say which of {a,b},{b,c} to keep —
    the component {a,b,c} can).  Engine: iterative min-label propagation
    — label(x) ← min(label(x), min over neighbors' labels) to fixpoint —
    each round one equi-join + map-side-combined groupBy, O(component
    diameter) rounds (dup clusters are shallow: diameter ≤ 2-3 in
    practice, and the round count is data-independent of corpus size).
    At 100 TB each round's label table is docs-sized (tiny vs corpus)
    and would be persisted per iteration; the convergence check is one
    count per round.  Oracle: DuckDB recursive-CTE reachability with
    min-reachable-id as the canonical label — an INDEPENDENT algorithm
    (transitive closure) that must produce identical components."""
    from pyspark.sql import Window  # noqa: PLC0415

    # edges come from the WRITTEN verified-pair table (shared with
    # lsh_verified_dups — the verify join runs once per session);
    # persist the edge set and each round's labels: every round runs a
    # count() action, and without caching round k would re-execute all
    # k-1 prior label joins from scratch (O(rounds^2) work and
    # unbounded lineage growth)
    pairs = _materialized_verified_pairs(spark, sf_dir).select("a_id", "b_id")
    edges = pairs.unionByName(
        pairs.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
    ).persist()
    labels = (
        edges.select(F.col("a_id").alias("doc_id")).distinct()
        .withColumn("label", F.col("doc_id"))
        .persist()
    )
    converged = False
    try:
        # Convergence check (round 6): labels are NON-INCREASING under
        # min-propagation, so the label multiset is unchanged iff its
        # sum is unchanged — one decimal-exact aggregate per round
        # replaces the previous new-vs-old equi-join + count (half the
        # per-round jobs on a table that is docs-sized anyway).
        # DECIMAL(38,0) keeps the sum exact far beyond bigint range
        # (10^18 docs × 10^18-sized ids ≈ 10^36 < 10^38).
        prev_sum = None
        for _ in range(25):
            cand = edges.join(labels, edges.a_id == labels.doc_id).select(
                F.col("b_id").alias("doc_id"), F.col("label")
            )
            new_labels = (
                labels.unionByName(cand)
                .groupBy("doc_id").agg(F.min("label").alias("label"))
                .persist()
            )
            cur_sum = new_labels.agg(
                F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]
            labels.unpersist()
            labels = new_labels
            if cur_sum == prev_sum:
                converged = True
                break
            prev_sum = cur_sum
        if not converged:
            # min-label propagation advances one hop per round: a
            # component with diameter > the round cap would get a
            # silently-wrong partitioning — fail loudly instead
            raise RuntimeError(
                "lsh_dup_clusters: label propagation did not converge in "
                "25 rounds (a duplicate component has diameter > 25); "
                "raise the round cap for chain-shaped near-dup corpora"
            )
        # write the converged labels as a scratch intermediate (same
        # durability pattern as the signature table) so NOTHING stays
        # pinned in storage memory after the call — repeated invocations
        # in a long session (bench + oracle sweep) must not accumulate
        # cached label tables — and the returned DF's lineage is one
        # parquet scan instead of 25 stacked joins
        final = _write_intermediate(
            labels, spark, _cache_key(spark, sf_dir), "dup_labels"
        )
    finally:
        edges.unpersist()
        labels.unpersist()
    w = Window.partitionBy("cluster_id")
    return (
        final.select("doc_id", F.col("label").alias("cluster_id"))
        .withColumn("cluster_size", F.count("*").over(w))
    )


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

# Near-dup ground truth is PLANTED deterministically (the raw synthetic
# embeddings are near-random: max off-diagonal cosine ≈ 0.51 at sf0.01):
# every vec_id % 10 == 0 vector gets a scaled copy (id + 100000,
# e * 1.001) — cosine exactly 1.0 — so the operator has real dup
# structure to find and a crisp threshold (0.9) with a wide margin.
_COS_DUP_ORACLE = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
aug AS (
  SELECT vec_id, e FROM base
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, list_transform(e, x -> x * 1.001) AS e
  FROM base WHERE vec_id % 10 = 0),
s AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             round(list_dot_product(a.e, b.e) /
                   (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 4) AS cos_sim
      FROM aug a JOIN aug b ON a.vec_id < b.vec_id)
SELECT a_id, b_id, cos_sim FROM s WHERE cos_sim >= 0.9
"""

IVF_CENTROIDS = 16
IVF_PROBES = 2


def fit_ivf_centroids(base: DataFrame, k: int = IVF_CENTROIDS,
                      iters: int = 4,
                      sample_cap: int = 4096) -> list[list[float]]:
    """FITTED IVF codebook: spherical k-means (Lloyd) on a
    deterministic hash-gate sample — the real-corpus upgrade of the
    first-k-vectors codebook (``ann_ivf_topk`` keeps that closed-form
    rule deliberately: its DuckDB oracle expresses the same assignment
    in SQL, which a fitted codebook cannot).

    Reproducibility is by construction, not by seed: the sample is the
    md5-gated ~25% of vec_ids (the same gate family as
    ``stratified_sample`` — row-exact across engines, partitionings and
    reruns), capped at ``sample_cap`` in vec_id order; init is the first
    k sampled vectors; numpy's argmax/mean are deterministic.  The
    driver collect is BOUNDED (sample_cap × dim doubles ≈ 2 MB at
    dim=64) regardless of corpus size — at 100 TB the fit still touches
    only the gated sample, and the k×dim codebook broadcasts as literal
    expressions exactly like before.  Assignment by max cosine on
    L2-normalized vectors = spherical k-means; empty clusters keep
    their previous centroid (deterministic, no re-seeding)."""
    import numpy as np  # noqa: PLC0415

    sample = (
        base.where(F.expr(
            "conv(substr(md5(CAST(vec_id AS STRING)), 1, 4), 16, 10) % 4 = 0"
        ))
        .orderBy("vec_id").limit(sample_cap).collect()
    )
    if not sample:  # tiny corpus where the gate kept nothing: ungated
        sample = base.orderBy("vec_id").limit(k).collect()
    if not sample:  # empty corpus — callers handle the empty codebook
        return []
    X = np.stack([np.asarray(r["e"], dtype=np.float64) for r in sample])
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0  # zero vectors stay zero, never NaN
    Xn = X / norms
    if len(Xn) < k:  # degenerate tiny corpus: wrap the sample
        Xn = np.tile(Xn, (int(np.ceil(k / len(Xn))), 1))
    C = Xn[:k].copy()
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(k):
            members = Xn[assign == j]
            if len(members):
                m = members.mean(axis=0)
                n = float(np.linalg.norm(m))
                if n > 0.0:
                    C[j] = m / n
    return [c.tolist() for c in C]


@register("embedding_cosine_dups", _COS_DUP_ORACLE)
def embedding_cosine_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ≥ 0.9, computed the 100 TB
    way: IVF bucketing (multi-probe top-2 centroids) generates
    candidates via a bucket EQUI-join, and only candidates get the exact
    cosine verify — no all-pairs theta-join anywhere (the round-1
    version was O(n²) and self-limited to 200 vectors).

    The 16-centroid codebook is FITTED by sampled spherical k-means
    (``fit_ivf_centroids``: deterministic hash-gate sample, bounded
    driver collect, Lloyd iterations in numpy) and folded into literal
    expressions — the Spark analogue of fitting on a sample and
    broadcasting the codebook — so centroid assignment is a pure
    projection, not a join.  The ORACLE is the brute-force all-pairs
    scan, so the correctness gate proves the fitted codebook loses no
    recall on this corpus (scaled copies share their base's probe
    buckets by construction).

    The verify stage is PER-BUCKET BLOCKWISE BLAS (round-4 rework,
    measured 6.2 s → 0.9 s steady-state at sf0.1): each IVF bucket's
    vectors arrive as one Arrow batch in ``applyInPandas`` and the
    whole within-bucket similarity block is a single numpy matmul —
    the O(bucket²·dim) flops run in native code instead of as ~37M
    materialized join rows or interpreted lambda evaluations.  Three
    JVM-side shapes were measured and rejected at sf0.1: the
    aggregate/zip_with lambda dot (CodegenFallback, 3.7 s for the
    verify alone), a dim-unrolled element_at sum (falls out of
    whole-stage codegen at 64 terms, 8.7 s), and a
    posexplode+groupBy-sum dot (codegen but materializes the 37M-row
    join, 5.3 s).  A pair-wise Arrow UDF also lost (the per-pair array
    transfer is ~600 MB; per-bucket batches are ~2 MB total).  This is
    the standard production IVF shape: candidates never leave the
    bucket, no pair join exists at all, and per-bucket work is bounded
    by the codebook size.

    Float caveat, stated: numpy's pairwise-summed dot can differ from
    the oracle's sequential sum in the last ulp; the gate's planted
    dups sit at cosine exactly 1.0 with a 0.4 margin to the next
    candidate, so round(·, 4) is stable on this corpus.

    test_plans_physical pins the plan: no CartesianProduct, no
    BroadcastNestedLoopJoin."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", as_double.alias("e"))

    # codebook: FITTED by sampled spherical k-means (fit_ivf_centroids
    # — deterministic hash-gate sample, bounded driver collect), then
    # closed over by the assignment kernel (≈ broadcast).  The brute-
    # force oracle is codebook-independent, so the gate proves the
    # fitted codebook loses no recall: a planted copy (e·1.001) has the
    # same cosine to every centroid as its base (up to fp noise far
    # below any centroid margin), hence the same probe buckets.
    #
    # Codebook size scales with the corpus (round 6): within-bucket
    # verification is O(bucket²·dim) BLAS, and a FIXED k means bucket
    # size — hence per-bucket cost×memory — grows linearly (a 10×
    # corpus measured 50 s vs 1.2 s: pure bucket quadratics).  k =
    # √n keeps expected bucket size ≈ probes·√n, the classical IVF
    # sizing; k is floored at the historical 16 (so the driver's
    # correctness SFs, whose corpora are small, run the identical
    # codebook as before) and capped by the k-means sample size.
    # Output invariance does not depend on k: candidates only ever
    # SHRINK the verified set vs brute force, the oracle is the brute
    # force, and planted copies co-bucket with their base under any
    # codebook (same cosine profile ⇒ same probe order).
    n_aug = base.count()
    n_aug += n_aug // 10  # planted copies (vec_id % 10 == 0)
    k_eff = max(IVF_CENTROIDS, int(n_aug ** 0.5) + 1)
    cents = fit_ivf_centroids(base, k=min(k_eff, 4096))
    if not cents:  # empty corpus: no pairs, stable schema
        return spark.createDataFrame(
            [], "a_id long, b_id long, cos_sim double")

    n_probes = IVF_PROBES

    # Round 6: planted-copy construction + multi-probe centroid
    # assignment moved into ONE mapInPandas numpy kernel.  The previous
    # form evaluated 16 aggregate/zip_with cosine lambdas per row —
    # CodegenFallback HOFs interpreted per element, ~16×64 lambda evals
    # per vector — plus an interpreted e·1.001 transform for the
    # planted rows; here the whole batch is one (n×64)·(64×16) BLAS
    # matmul and a stable argsort (ties by centroid index — exactly the
    # struct array_sort's (neg_sim, c) order).  Measured 1.9 s →
    # ~0.9 s steady at sf0.1; pair recall unchanged (oracle gate).
    def assign(batches):
        import numpy as np  # noqa: PLC0415 - executor side
        import pandas as pd  # noqa: PLC0415

        C = np.asarray(cents, dtype=np.float64)
        cn = np.sqrt(np.einsum("ij,ij->i", C, C))
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            E = np.stack(pdf["e"].to_numpy()).astype(np.float64)
            pm = ids % 10 == 0
            if pm.any():  # planted near-dup ground truth (see oracle)
                ids = np.concatenate([ids, ids[pm] + 100000])
                E = np.vstack([E, E[pm] * 1.001])
            nrm = np.sqrt(np.einsum("ij,ij->i", E, E))
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (E @ C.T) / (nrm[:, None] * cn[None, :])
            order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probes]
            out_ids = np.repeat(ids, n_probes)
            out_e = [e for e in E.tolist() for _ in range(n_probes)]
            yield pd.DataFrame({
                "vec_id": out_ids,
                "e": out_e,
                "bucket": order.reshape(-1).astype(np.int32),
            })

    assigned = base.mapInPandas(assign, "vec_id long, e array<double>, bucket int")

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                                 "b_id": pd.Series(dtype="int64"),
                                 "cos_sim": pd.Series(dtype="float64")})
        ids = pdf["vec_id"].to_numpy()
        E = np.stack(pdf["e"].to_numpy())
        nrm = np.sqrt(np.einsum("ij,ij->i", E, E))
        S = (E @ E.T) / np.outer(nrm, nrm)
        iu, ju = np.triu_indices(len(ids), k=1)
        sims = np.round(S[iu, ju], 4)
        keep = sims >= 0.9
        ai, bi = ids[iu[keep]], ids[ju[keep]]
        return pd.DataFrame({
            "a_id": np.minimum(ai, bi),
            "b_id": np.maximum(ai, bi),
            "cos_sim": sims[keep],
        })

    return (
        assigned.groupBy("bucket")
        .applyInPandas(bucket_pairs, "a_id long, b_id long, cos_sim double")
        .dropDuplicates(["a_id", "b_id"])  # multi-probe overlap
    )


# --- SimHash (64-bit, portable md5-nibble bit family, full oracle) -----------

# Bit i (0..63) of a word's hash = bit (3 - i%4) of hex nibble i/4 of
# md5(word).  md5 hex is identical across engines, so the whole SimHash
# (bit contributions → per-bit sign sums → fingerprint halves) is
# oracle-checked.  The fingerprint is emitted as two BIGINT halves
# (hi = bits 0..31, lo = bits 32..63) to stay inside signed-64 range.
_SIMHASH_BODY = """
bits AS (
  SELECT w.doc_id, i.i,
         CASE WHEN CAST(floor(
                (instr('0123456789abcdef',
                       substr(md5(w.word), CAST(floor(i.i / 4) AS INT) + 1, 1)) - 1)
                / pow(2, 3 - (i.i % 4))) AS INT) % 2 = 1
              THEN 1 ELSE -1 END AS v
  FROM w CROSS JOIN i),
s AS (SELECT doc_id, i, CASE WHEN SUM(v) > 0 THEN 1 ELSE 0 END AS sbit
      FROM bits GROUP BY doc_id, i)
SELECT doc_id,
       CAST(SUM(CASE WHEN i < 32
                     THEN sbit * CAST(pow(2, 31 - i) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS simhash_hi,
       CAST(SUM(CASE WHEN i >= 32
                     THEN sbit * CAST(pow(2, 63 - i) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS simhash_lo
FROM s GROUP BY doc_id
"""

_SIMHASH = {
    "spark": f"""
    WITH w AS (SELECT doc_id, explode(split(text, ' ')) AS word FROM documents),
    i AS (SELECT explode(sequence(0, 63)) AS i),
    {_SIMHASH_BODY}
    """,
    "duck": f"""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
    i AS (SELECT unnest(range(0, 64)) AS i),
    {_SIMHASH_BODY}
    """,
}


# Engine-side formulation (round-6 shape): hash each DISTINCT word once
# (the word-bit table is vocabulary-sized — broadcast at any corpus
# scale) into 64 ±1 COLUMNS (v0..v63) instead of 64 ROWS per word, then
# broadcast-join the exploded occurrences against it and fold the whole
# fingerprint in ONE map-side-combined groupBy(doc_id) with 64 SUMs.
# Summing ±1 per occurrence ≡ the oracle's per-occurrence form; the
# sign/weight arithmetic is unchanged.  The previous row-oriented form
# (64× blowup through a (doc_id, i) hash aggregate, plus a separate
# (doc_id, word) count shuffle) had 4 Exchanges and pushed 64×|words|
# rows through partial aggregation; this one has 2 (distinct vocab,
# final doc fold) — measured 1.55 s → 0.89 s steady at sf0.1.  The
# BROADCAST(wb) hint is load-bearing: the planner's size estimate for
# the 65-column vocab projection exceeds the exploded occurrences
# estimate and it otherwise builds the 2M-row ex side as the hash
# relation (measured 2.5 s steady that way).


def _simhash_engine_sql() -> str:
    def bit(i: int) -> str:
        return (
            "CASE WHEN CAST(floor((instr('0123456789abcdef', "
            f"substr(m, {i // 4 + 1}, 1)) - 1) / pow(2, {3 - (i % 4)})) "
            "AS INT) % 2 = 1 THEN 1 ELSE -1 END"
        )

    vcols = ",\n         ".join(f"{bit(i)} AS v{i}" for i in range(64))
    sums = ",\n        ".join(f"SUM(v{i}) AS s{i}" for i in range(64))
    hi = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN CAST(pow(2, {31 - i}) AS BIGINT) "
        "ELSE 0 END)"
        for i in range(32)
    )
    lo = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN CAST(pow(2, {63 - i}) AS BIGINT) "
        "ELSE 0 END)"
        for i in range(32, 64)
    )
    return f"""
WITH ex AS (SELECT doc_id, explode(split(text, ' ')) AS word
            FROM documents),
wb AS (
  SELECT word,
         {vcols}
  FROM (SELECT word, md5(word) AS m
        FROM (SELECT DISTINCT word FROM ex))),
s AS (SELECT /*+ BROADCAST(wb) */ doc_id,
        {sums}
      FROM ex JOIN wb USING (word) GROUP BY doc_id)
SELECT doc_id,
       CAST({hi} AS BIGINT) AS simhash_hi,
       CAST({lo} AS BIGINT) AS simhash_lo
FROM s
"""


_SIMHASH_ENGINE = _simhash_engine_sql()


@register("simhash_fingerprint", _SIMHASH["duck"])
def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash over word features: each word's md5-derived bit
    pattern contributes ±1 per bit position, weighted by occurrence
    count; the per-document sign vector is the fingerprint (hi/lo
    BIGINT halves).  Pure JVM, no global sort; the word→bits table is
    computed once over the DISTINCT vocabulary and joined (broadcast at
    real scale) against per-doc word counts.  Near-dups differ in few
    bits — at scale, band the fingerprint bytes and bucket-join exactly
    like MinHash-LSH above."""
    return _sql(spark, sf_dir, _SIMHASH_ENGINE, ["documents"])


# --- composed corpus-curation pipeline ---------------------------------------

_CURATION = {
    # filter (length/lang quality gates) → exact-dedup (md5, keep min
    # doc_id) → per-(source, lang) corpus stats.  One hash shuffle for
    # the dedup, one for the final rollup — both map-side-combined.
    "spark": """
    WITH f AS (
      SELECT doc_id, text, lang, source,
             size(split(text, ' ')) AS n_tok
      FROM documents
      WHERE size(split(text, ' ')) >= 8 AND n_chars <= 4000
        AND lang IN ('en', 'de', 'fr', 'es')),
    d AS (
      SELECT md5(lower(text)) AS fp,
             min(doc_id) AS keep_id,
             min_by(struct(lang, source, n_tok), doc_id) AS r
      FROM f GROUP BY 1)
    SELECT r.source AS source, r.lang AS lang,
           count(*) AS kept_docs,
           CAST(SUM(r.n_tok) AS BIGINT) AS kept_tokens
    FROM d GROUP BY 1, 2
    """,
    "duck": """
    WITH f AS (
      SELECT doc_id, text, lang, source,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
      WHERE len(string_split(text, ' ')) >= 8 AND n_chars <= 4000
        AND lang IN ('en', 'de', 'fr', 'es')),
    d AS (
      SELECT md5(lower(text)) AS fp,
             min(doc_id) AS keep_id,
             min_by(struct_pack(lang := lang, source := source, n_tok := n_tok),
                    doc_id) AS r
      FROM f GROUP BY 1)
    SELECT r.source AS source, r.lang AS lang,
           count(*) AS kept_docs,
           CAST(SUM(r.n_tok) AS BIGINT) AS kept_tokens
    FROM d GROUP BY 1, 2
    """,
}


@register("corpus_curation", _CURATION["duck"])
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline every training-data run needs:
    quality/lang filter → exact dedup (canonical = min doc_id, its
    attributes carried via min_by) → per-(source, lang) kept-corpus
    stats.  Filters push to the scan; both aggregations get map-side
    partial combine."""
    return _sql(spark, sf_dir, _CURATION["spark"], ["documents"])


# --- deterministic stratified sampling ---------------------------------------

_SAMPLE = {
    # hash-gate sampling: md5 of the doc id is uniform; keeping rows
    # whose first two hex chars < '29' gives a fixed ~16% sample that is
    # identical on ANY engine and ANY partitioning (no RNG, no
    # sample()-operator nondeterminism) — the only reproducible way to
    # sample at 100 TB.
    "spark": """
    SELECT doc_id, source, lang
    FROM documents
    WHERE substring(md5(CAST(doc_id AS STRING)), 1, 2) < '29'
    """,
    "duck": """
    SELECT doc_id, source, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '29'
    """,
}


@register("stratified_sample", _SAMPLE["duck"])
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-gate sample (~16%): reproducible row-exact
    across engines, partitionings, and reruns — unlike rand()/SAMPLE."""
    return _sql(spark, sf_dir, _SAMPLE["spark"], ["documents"])


# --- token-budget sequence packing --------------------------------------------

_PACKING = {
    # offset-based packing: per-source running token offsets assign each
    # doc to pack floor(offset / budget).  The window partitions by
    # source, so no global sort — each partition's window is independent
    # (the scale-safe shape; a best-fit packer would be a per-partition
    # applyInPandas instead).
    "spark": """
    WITH t AS (SELECT doc_id, source, size(split(text, ' ')) AS n_tok
               FROM documents),
    c AS (SELECT doc_id, source, n_tok,
                 SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tok AS off
          FROM t)
    SELECT source, CAST(floor(off / 2048.0) AS BIGINT) AS pack_id,
           count(*) AS docs_in_pack,
           CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
    FROM c GROUP BY 1, 2
    """,
    "duck": """
    WITH t AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
               FROM documents),
    c AS (SELECT doc_id, source, n_tok,
                 SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tok AS off
          FROM t)
    SELECT source, CAST(floor(off / 2048.0) AS BIGINT) AS pack_id,
           count(*) AS docs_in_pack,
           CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
    FROM c GROUP BY 1, 2
    """,
}


@register("token_budget_packing", _PACKING["duck"])
def token_budget_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for a 2048-token context budget: per-source
    running offsets bin documents into packs (offset-based greedy — the
    deterministic, shuffle-light variant)."""
    return _sql(spark, sf_dir, _PACKING["spark"], ["documents"])


# --- multimodal binary columns, oracle-gated --------------------------------

# The fake container format (operators/multimodal.py: MAGIC + w + h +
# seed-byte plane) is arithmetically transparent, so the whole binary
# round-trip — build payload bytes in one mapInPandas stage, decode +
# feature-extract them in another — can be checked against a closed-form
# SQL oracle: n_bytes = 12 + w*h, mean_px = seed (constant plane).
_MM_ORACLE = """
SELECT 'm-' || CAST(doc_id AS VARCHAR) AS media_id,
       (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
       CAST(4 + doc_id % 13 AS INT) AS width,
       CAST(4 + doc_id % 7 AS INT) AS height,
       CAST(12 + (4 + doc_id % 13) * (4 + doc_id % 7) AS INT) AS n_bytes,
       CAST((doc_id * 31 + (4 + doc_id % 13) + (4 + doc_id % 7)) % 256
            AS DOUBLE) AS mean_px,
       TRUE AS ok
FROM documents
"""


@register("multimodal_media_stats", _MM_ORACLE)
def multimodal_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column (multimodal) plumbing, oracle-gated end to end: a
    mapInPandas stage BUILDS an opaque binary payload per document (the
    deterministic fake container — real image/audio codecs are absent
    from this environment, multimodal.py documents the stub), Arrow
    ships the binary column to a second mapInPandas stage that decodes
    the container and extracts features (dims, byte size, mean pixel).
    The DuckDB oracle recomputes every feature arithmetically, so the
    gate proves the binary Arrow transfer + decode plumbing is lossless.
    At 100 TB the binary column dominates scan bytes — the build
    projects only doc_id, and partitioning is bytes-based
    (maxPartitionBytes), not row-based."""
    import pandas as pd  # noqa: PLC0415

    from logfowd2_spark.operators.multimodal import (  # noqa: PLC0415
        MEDIA_SCHEMA, extract_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def gen(batches):
        import struct as _struct  # noqa: PLC0415 - executor side

        kinds = ["image", "audio", "video"]
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            w = (4 + ids % 13).astype("int32")
            h = (4 + ids % 7).astype("int32")
            payloads = [
                b"IMG0" + _struct.pack("<II", int(wi), int(hi))
                + bytes([int((i * 31 + wi + hi) % 256)]) * int(wi * hi)
                for i, wi, hi in zip(ids, w, h)
            ]
            yield pd.DataFrame(
                {
                    "media_id": "m-" + ids.astype(str),
                    "kind": [kinds[int(i) % 3] for i in ids],
                    "payload": payloads,
                    "width": w,
                    "height": h,
                }
            )

    media = docs.mapInPandas(gen, MEDIA_SCHEMA)
    feats = extract_features(media, fake=True)
    return feats.select("media_id", "kind", "width", "height",
                        "n_bytes", "mean_px", "ok")


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
