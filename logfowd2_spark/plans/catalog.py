"""Query catalog: every operator exposed as (Spark query, DuckDB oracle).

Each entry is one operator/pipeline-semantics demonstration from
SURVEY.md §2 (or a training-data-pipeline extension), implemented twice:

- a PySpark callable ``(spark, sf_dir) -> DataFrame`` (the engine), and
- an equivalent ANSI-SQL string for DuckDB (the oracle), over the same
  parquet tables.

Conventions for oracle parity:
- every computed column is aliased identically on both sides;
- money/double aggregates go through per-term ``CAST(... AS
  DECIMAL(18,2))`` before SUM so the result is associativity-exact;
- timestamps are emitted as formatted strings;
- top-k orderings always carry a unique-key tiebreak.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logfowd2_spark.config import DEFAULT_ROUTES
from logfowd2_spark.functions.kernels import K8S_PATH_RE

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SparkQuery = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, SparkQuery] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn
    return deco


def queries() -> dict[str, SparkQuery]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


#: Deprecation map for the round-4 catalog consolidation (57 → 50
#: entries): each removed public query name → the registered query that
#: absorbed its semantics.  The aliases are deliberately NOT registered
#: (the catalog stays at 50 so every entry keeps fresh oracle evidence
#: each round); consumers keyed on an old name resolve it through
#: ``resolve_query`` / ``resolve_oracle`` instead of hitting a KeyError.
#: Note the absorbing query's OUTPUT SCHEMA differs from the removed
#: one's (it is the merged query), so this is an explicit migration
#: pointer, not a drop-in: e.g. ``join_semi_anti_customers`` tags each
#: row 'semi'/'anti' where the old pair returned two separate tables.
QUERY_ALIASES: dict[str, str] = {
    "join_semi_customers": "join_semi_anti_customers",
    "join_anti_customers": "join_semi_anti_customers",
    "set_intersect_custkeys": "set_ops_custkeys",
    "set_except_custkeys": "set_ops_custkeys",
    "lang_id_heuristic": "quality_score",
    "pipe_ndjson_bulk": "pipe_doc_projection",
}


def resolve_query(name: str) -> SparkQuery:
    """The registered query for ``name``, following ``QUERY_ALIASES``
    for names removed in a catalog consolidation."""
    return _QUERIES[QUERY_ALIASES.get(name, name)]


def resolve_oracle(name: str) -> str:
    return _ORACLES[QUERY_ALIASES.get(name, name)]


def _sql(spark: SparkSession, sf_dir: str, query: str,
         tables: list[str]) -> DataFrame:
    """Register the needed parquet tables as temp views and run Spark SQL."""
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql(query)


def _stream_input_files(dfs, prefix: str) -> tuple[str, str]:
    """Write each DataFrame as ONE parquet file into a fresh stream
    input dir with ascending mtimes — FileStreamSource orders files by
    modification time, so with ``maxFilesPerTrigger=1`` each DataFrame
    becomes its own micro-batch, in list order (the watermark genuinely
    advances across batches).  Files are written Spark-side, so column
    types are exactly what the writing plan declares (a pandas
    round-trip here once widened int to int64 by host — round-3's one
    red gate).  Returns (root, input_dir)."""
    import os
    import shutil
    import tempfile
    from glob import glob

    root = tempfile.mkdtemp(prefix=prefix)
    in_dir = f"{root}/in"
    os.makedirs(in_dir)
    for i, df in enumerate(dfs):
        tmp = f"{root}/tmp{i}"
        df.coalesce(1).write.parquet(tmp)
        src = glob(f"{tmp}/part-*.parquet")[0]
        dst = f"{in_dir}/{i:02d}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))
    return root, in_dir


def _tercile_stream_input(df, order_cols: list[str],
                          prefix: str) -> tuple[str, str]:
    """Three time-ordered tercile files of ``df`` as a stream input dir
    (gate-scale input: the single-partition ntile window is fine here;
    production streams arrive pre-split).  Split POSITIONS don't matter
    — only time order across files does."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    tiled = df.withColumn(
        "tercile", F.ntile(3).over(Window.orderBy(*order_cols))
    ).persist()
    parts = [
        tiled.filter(F.col("tercile") == i + 1).drop("tercile")
        for i in range(3)
    ]
    try:
        return _stream_input_files(parts, prefix)
    finally:
        tiled.unpersist()


def _await_stream(q, timeout: int = 600) -> None:
    """Fail LOUDLY if a streaming gate's availableNow query does not
    drain in time: reading the memory sink of a still-running query
    would report silently incomplete results (an oracle value mismatch
    masquerading as an operator bug) while the query keeps writing
    behind the caller's back."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise RuntimeError(
            f"streaming gate query {q.name!r} did not finish within "
            f"{timeout}s — result would be incomplete"
        )


# ---------------------------------------------------------------------------
# shared route CASE chain (kept in sync between Spark SQL and DuckDB SQL)
# ---------------------------------------------------------------------------

def routes_case_sql(source: str, level: str) -> str:
    """The (source, level) → sink_id routing map as a CASE expression —
    the reference's index routing (pool.rs:856-865) generalized; identical
    text works in Spark SQL and DuckDB."""
    parts = ["CASE"]
    for src, lvl, sink in DEFAULT_ROUTES:
        conds = []
        if src != "*":
            conds.append(f"{source} = '{src}'")
        if lvl != "*":
            conds.append(f"{level} = '{lvl}'")
        cond = " AND ".join(conds) if conds else "TRUE"
        parts.append(f"WHEN {cond} THEN '{sink}'")
    parts.append("ELSE 'logs-default' END")
    return " ".join(parts)


# ===========================================================================
# §A  Pipeline-semantics queries (SURVEY.md §2 operators)
# ===========================================================================

# --- P1: k8s path metadata extraction (watcher.rs:31, 595-638) -------------
_PATH_EXPR_SPARK = (
    "concat('/var/log/pods/ns-', CAST(user_id % 12 AS STRING), '_pod-', "
    "CAST(user_id AS STRING), '_pid-', CAST(event_id AS STRING), '/main/0.log')"
)
_PATH_EXPR_DUCK = (
    "('/var/log/pods/ns-' || CAST(user_id % 12 AS VARCHAR) || '_pod-' || "
    "CAST(user_id AS VARCHAR) || '_pid-' || CAST(event_id AS VARCHAR) || '/main/0.log')"
)


@register(
    "pipe_parse_extract",
    f"""
    WITH p AS (
      SELECT event_id, {_PATH_EXPR_DUCK} AS path,
             CASE WHEN user_id % 10 <> 0 THEN {_PATH_EXPR_DUCK}
                  ELSE 'corrupt-path' END AS dirty_path
      FROM events)
    SELECT event_id,
           regexp_extract(path, '{K8S_PATH_RE}', 1) AS namespace,
           regexp_extract(path, '{K8S_PATH_RE}', 2) AS pod_name,
           regexp_extract(path, '{K8S_PATH_RE}', 3) AS pod_id,
           regexp_extract(path, '{K8S_PATH_RE}', 4) AS container_name,
           CASE WHEN regexp_extract(dirty_path, '{K8S_PATH_RE}', 1) = ''
                THEN 'unknown'
                ELSE regexp_extract(dirty_path, '{K8S_PATH_RE}', 1)
           END AS namespace_defaulted
    FROM p
    """,
)
def pipe_parse_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference P1: regex named-group extraction from a pod log path,
    INCLUDING the miss ⇒ 'unknown' defaulting branch
    (watcher.rs:602-626) exercised on a 10%-corrupted path column
    (one query, both the hit and miss paths of the same operator)."""
    return _sql(
        spark, sf_dir,
        f"""
        WITH p AS (
          SELECT event_id, {_PATH_EXPR_SPARK} AS path,
                 CASE WHEN user_id % 10 <> 0 THEN {_PATH_EXPR_SPARK}
                      ELSE 'corrupt-path' END AS dirty_path
          FROM events)
        SELECT event_id,
               regexp_extract(path, '{K8S_PATH_RE}', 1) AS namespace,
               regexp_extract(path, '{K8S_PATH_RE}', 2) AS pod_name,
               regexp_extract(path, '{K8S_PATH_RE}', 3) AS pod_id,
               regexp_extract(path, '{K8S_PATH_RE}', 4) AS container_name,
               CASE WHEN regexp_extract(dirty_path, '{K8S_PATH_RE}', 1) = ''
                    THEN 'unknown'
                    ELSE regexp_extract(dirty_path, '{K8S_PATH_RE}', 1)
               END AS namespace_defaulted
        FROM p
        """,
        ["events"],
    )


@register(
    "pipe_truncate",
    r"""
    WITH s AS (
      SELECT doc_id, text, replace(text, 'a', 'á') AS line FROM documents
    ), h AS (
      SELECT doc_id, text, line, hex(encode(line)) AS b,
             octet_length(encode(line)) AS nb
      FROM s
    ), c AS (
      SELECT doc_id, text, line, b, nb,
             CASE WHEN NOT (substr(b, 239, 2) BETWEEN '80' AND 'BF') THEN 0
                  WHEN NOT (substr(b, 237, 2) BETWEEN '80' AND 'BF') THEN 1
                  WHEN NOT (substr(b, 235, 2) BETWEEN '80' AND 'BF') THEN 2
                  ELSE 3 END AS t
      FROM h
    ), k AS (
      SELECT doc_id, text, line, b, nb, t,
             CASE WHEN substr(b, 2*(120 - t) - 1, 2) < '80' THEN 1
                  WHEN substr(b, 2*(120 - t) - 1, 2) BETWEEN 'C0' AND 'DF' THEN 2
                  WHEN substr(b, 2*(120 - t) - 1, 2) BETWEEN 'E0' AND 'EF' THEN 3
                  WHEN substr(b, 2*(120 - t) - 1, 2) >= 'F0' THEN 4
                  ELSE 1 END AS seq_len
      FROM c
    ), f AS (
      SELECT doc_id, text,
             CASE WHEN nb <= 120 THEN line
                  ELSE decode(unhex(substr(b, 1,
                         2 * (CASE WHEN seq_len = t + 1 THEN 120
                                   ELSE 120 - t - 1 END))))
                       || '... [TRUNCATED]' END AS line
      FROM k
    )
    SELECT doc_id, line, octet_length(encode(line)) AS byte_len,
           md5(regexp_replace(text, '[^\x20-\x7E\t]', '?', 'g')) AS sanitized_fp,
           length(text) - length(regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g')) AS ctl_chars
    FROM f
    """,
)
def pipe_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference S5 + S6, the per-line string kernels in one projection:
    oversized-line truncation byte-exact at a UTF-8 boundary
    (file.rs:553-634 boundary-backoff; the 'a'→'á' replace seeds
    multi-byte codepoints through the ASCII corpus so the 120-byte cut
    point lands mid-codepoint on real rows — the oracle re-derives the
    backoff independently in DuckDB's hex/blob domain), plus
    corrupt-content sanitization over the raw text
    (file.rs:660-721: non-printables → '?', control-char census)."""
    from logfowd2_spark.functions.kernels import truncate_line  # noqa: PLC0415

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    line = truncate_line(F.expr("replace(text, 'a', 'á')"), 120)
    # two-stage select: the truncation expression is chatty (hex-tail
    # probe) and Spark does no CSE across a projection, so materialize
    # `line` once before deriving byte_len from it
    return df.select("doc_id", "text", line.alias("line")).select(
        "doc_id",
        "line",
        F.octet_length("line").alias("byte_len"),
        F.md5(F.regexp_replace("text", r"[^\x20-\x7E\t]", "?"))
        .alias("sanitized_fp"),
        (
            F.length("text")
            - F.length(F.regexp_replace(
                "text", "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))
        ).alias("ctl_chars"),
    )


# --- R1/A1: routing + per-sink aggregation ---------------------------------

_LEVEL_FROM_EVENT = (
    "CASE WHEN event_type = 'error' THEN 'ERROR' "
    "WHEN event_type = 'purchase' THEN 'INFO' "
    "WHEN event_type = 'signup' THEN 'INFO' "
    "WHEN event_type = 'view' THEN 'DEBUG' "
    "ELSE 'WARN' END"
)
_SOURCE_FROM_EVENT = (
    "CASE WHEN user_id % 5 = 0 THEN 'app' WHEN user_id % 5 = 1 THEN 'ingress' "
    "WHEN user_id % 5 = 2 THEN 'sidecar' WHEN user_id % 5 = 3 THEN 'batch' "
    "ELSE 'system' END"
)


def _route_counts_sql() -> str:
    case = routes_case_sql("src", "lvl")
    return f"""
    WITH tagged AS (
      SELECT {_SOURCE_FROM_EVENT} AS src, {_LEVEL_FROM_EVENT} AS lvl,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events)
    SELECT {case} AS sink_id,
           count(*) AS event_count,
           CAST(SUM(v) * 100 AS BIGINT) AS value_total_cents
    FROM tagged
    GROUP BY 1
    """


@register("pipe_route_by_source_level", _route_counts_sql())
def pipe_route_by_source_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 generalized: (source, level) → sink_id with wildcard precedence,
    plus A1 per-sink counters."""
    return _sql(spark, sf_dir, _route_counts_sql(), ["events"])


@register(
    "pipe_sink_stats",
    """
    SELECT source || '-' || lang AS sink_id,
           count(*) AS event_count,
           CAST(SUM(n_chars) AS BIGINT) AS byte_total,
           count(DISTINCT doc_id) AS distinct_docs,
           CAST(SUM(CASE WHEN length(trim(text)) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS nonempty_docs
    FROM documents GROUP BY 1
    """,
)
def pipe_sink_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A3: per-sink event counts / byte totals / distinct docs
    (collector.rs:60-128 promoted to data), plus the F2 empty-line
    filter predicate (file.rs:201-203) surfaced as a per-sink
    nonempty census (whitespace-empty incl. tab ⇒ dropped)."""
    return _sql(
        spark, sf_dir,
        """
        SELECT concat(source, '-', lang) AS sink_id,
               count(*) AS event_count,
               SUM(n_chars) AS byte_total,
               count(DISTINCT doc_id) AS distinct_docs,
               SUM(CASE WHEN length(trim(text)) > 0 THEN 1 ELSE 0 END)
                 AS nonempty_docs
        FROM documents GROUP BY 1
        """,
        ["documents"],
    )


@register(
    "pipe_batch_chunks",
    """
    WITH numbered AS (
      SELECT event_id, CAST(ts AS DATE) AS d,
             row_number() OVER (PARTITION BY CAST(ts AS DATE) ORDER BY event_id) AS rn
      FROM events)
    SELECT CAST(d AS VARCHAR) AS batch_day,
           'logs-' || strftime(d, '%Y.%m.%d') AS sink_index,
           CAST(floor((rn - 1) / 300.0) AS BIGINT) AS batch_id,
           count(*) AS batch_size,
           min(event_id) AS first_event, max(event_id) AS last_event
    FROM numbered GROUP BY 1, 2, 3
    """,
)
def pipe_batch_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: count-trigger batching (bulk_size=300, sender.rs:58-67) as a
    window over the stream order, with each batch carrying the
    reference's literal daily index name (R1, {index}-{YYYY.MM.dd},
    pool.rs:856-865) as its destination.  Partitioned by day so the
    window never funnels the whole table through one task (a global
    ORDER BY window is a scale anti-pattern; per-day FIFO matches the
    reference's per-flush-window ordering contract)."""
    return _sql(
        spark, sf_dir,
        """
        WITH numbered AS (
          SELECT event_id, CAST(ts AS DATE) AS d,
                 row_number() OVER (PARTITION BY CAST(ts AS DATE) ORDER BY event_id) AS rn
          FROM events)
        SELECT CAST(d AS STRING) AS batch_day,
               concat('logs-', date_format(d, 'yyyy.MM.dd')) AS sink_index,
               CAST(floor((rn - 1) / 300.0) AS BIGINT) AS batch_id,
               count(*) AS batch_size,
               min(event_id) AS first_event, max(event_id) AS last_event
        FROM numbered GROUP BY 1, 2, 3
        """,
        ["events"],
    )


def _batch_hist_sql() -> str:
    """A2: per-sink batch-size distribution (collector.rs:72-77 buckets
    batch sizes 1..5000; here the routed stream is chunked per (sink,
    day) at bulk_size=300 and the size distribution is aggregated per
    sink).  Percentiles are rank-exact (value at ceil(n*p), i.e.
    percentile_disc) — deterministic integers, no interpolation, so the
    Spark and DuckDB answers are bit-identical.  Dialect-shared text;
    windows are partitioned by (sink, day) so nothing funnels through a
    single task at scale."""
    case = routes_case_sql("src", "lvl")
    return f"""
    WITH tagged AS (
      SELECT {_SOURCE_FROM_EVENT} AS src, {_LEVEL_FROM_EVENT} AS lvl,
             event_id, CAST(ts AS DATE) AS d
      FROM events),
    routed AS (
      SELECT {case} AS sink_id, d, event_id FROM tagged),
    numbered AS (
      SELECT sink_id, d,
             row_number() OVER (PARTITION BY sink_id, d ORDER BY event_id) AS rn
      FROM routed),
    batches AS (
      SELECT sink_id, d, CAST(floor((rn - 1) / 300.0) AS BIGINT) AS batch_no,
             count(*) AS sz
      FROM numbered GROUP BY 1, 2, 3),
    ranked AS (
      SELECT sink_id, sz,
             row_number() OVER (PARTITION BY sink_id ORDER BY sz, d, batch_no) AS r,
             count(*) OVER (PARTITION BY sink_id) AS n_b
      FROM batches)
    SELECT sink_id,
           max(n_b) AS n_batches,
           min(sz) AS min_batch,
           max(sz) AS max_batch,
           max(CASE WHEN r = CAST(ceil(n_b * 0.50) AS BIGINT) THEN sz END) AS p50_batch,
           max(CASE WHEN r = CAST(ceil(n_b * 0.95) AS BIGINT) THEN sz END) AS p95_batch,
           CAST(sum(CASE WHEN sz <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS bucket_le_100,
           CAST(sum(CASE WHEN sz > 100 AND sz <= 200 THEN 1 ELSE 0 END) AS BIGINT) AS bucket_le_200,
           CAST(sum(CASE WHEN sz > 200 THEN 1 ELSE 0 END) AS BIGINT) AS bucket_gt_200
    FROM ranked GROUP BY sink_id
    """


@register("pipe_batch_size_hist", _batch_hist_sql())
def pipe_batch_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: batch-size histogram parity — the reference's
    ``batch_size_buckets`` gauge (collector.rs:72-77) as per-sink
    count/min/max/p50/p95 plus bucket counts over the chunked stream."""
    return _sql(spark, sf_dir, _batch_hist_sql(), ["events"])


_CONSERVATION_CLASS = """
CASE WHEN k IS NULL THEN 'missing_field'
     WHEN k >= 90 THEN 'out_of_range'
     ELSE 'ok' END
"""


@register(
    "pipe_conservation",
    f"""
    WITH parsed AS (
      SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events)
    SELECT (k IS NOT NULL AND k < 90) AS is_valid,
           {_CONSERVATION_CLASS} AS failure_class,
           count(*) AS n
    FROM parsed GROUP BY 1, 2
    """,
)
def pipe_conservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLQ split invariant + typed failure classes: every row lands in
    exactly one (valid, class) cell — the reference's error taxonomy
    (error.rs:28-62, classified pool.rs:165-313) as a partition of the
    input, so per-class counts sum back to the total."""
    return _sql(
        spark, sf_dir,
        f"""
        WITH parsed AS (
          SELECT CAST(get_json_object(props, '$.k') AS INT) AS k FROM events)
        SELECT (k IS NOT NULL AND k < 90) AS is_valid,
               {_CONSERVATION_CLASS} AS failure_class,
               count(*) AS n
        FROM parsed GROUP BY 1, 2
        """,
        ["events"],
    )


# --- P3/P4/P6: ES doc projection, deterministic _id, ISO-8601 --------------

_DOC_PROJ = {
    "spark": """
    SELECT event_id,
           md5(concat('evt-', CAST(event_id AS STRING))) AS doc_uid,
           props AS message,
           date_format(ts, "yyyy-MM-dd'T'HH:mm:ss") AS at_timestamp,
           event_type AS container_name,
           concat('{"index":{"_id":"', md5(CAST(event_id AS STRING)), '"}}') AS action_line,
           concat('{"message":', props, ',"level":"', upper(event_type), '"}') AS doc_line
    FROM events
    """,
    "duck": """
    SELECT event_id,
           md5('evt-' || CAST(event_id AS VARCHAR)) AS doc_uid,
           props AS message,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS at_timestamp,
           event_type AS container_name,
           '{"index":{"_id":"' || md5(CAST(event_id AS VARCHAR)) || '"}}' AS action_line,
           '{"message":' || props || ',"level":"' || upper(event_type) || '"}' AS doc_line
    FROM events
    """,
}


@register("pipe_doc_projection", _DOC_PROJ["duck"])
def pipe_doc_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3-P6, the ES document-construction chain in one projection:
    P3 (Event → FieldsBody with the timestamp→@timestamp rename,
    requests.rs:32-61; emitted here as ``at_timestamp``), P4 (synthetic
    per-doc id — deterministic hash instead of the reference's UUIDv4
    at requests.rs:18-30, for testability), P6 (ISO-8601 serialization,
    requests.rs:35-37), and P5 (NDJSON bulk-body assembly — action +
    document line per event, make_body pool.rs:821-849)."""
    return _sql(spark, sf_dir, _DOC_PROJ["spark"], ["events"])


# --- the flagship: full parse→route→aggregate over token-encoded lines -----

_LINE_SPARK = """
  SELECT doc_id, source,
         concat(
           date_format(timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id), "yyyy-MM-dd'T'HH:mm:ss"), 'Z ',
           CASE WHEN doc_id % 20 = 0 THEN 'FATAL'
                WHEN doc_id % 20 IN (1,2) THEN 'ERROR'
                WHEN doc_id % 20 IN (3,4,5) THEN 'WARN'
                WHEN doc_id % 20 IN (6,7,8) THEN 'DEBUG'
                ELSE 'INFO' END, ' ',
           '/var/log/pods/ns-', CAST(doc_id % 12 AS STRING),
           '_pod-', CAST(doc_id % 200 AS STRING),
           '_pid-', CAST(doc_id % 500 AS STRING),
           '/main/0.log ', substring(text, 1, 80)) AS line,
         element_at(array('app','ingress','sidecar','batch','system'),
                    CAST(doc_id % 5 AS INT) + 1) AS src
  FROM documents
"""

_LINE_DUCK = """
  SELECT doc_id, source,
         strftime(TIMESTAMP '2024-03-01 00:00:00' + doc_id * INTERVAL 1 SECOND, '%Y-%m-%dT%H:%M:%S') || 'Z ' ||
         (CASE WHEN doc_id % 20 = 0 THEN 'FATAL'
               WHEN doc_id % 20 IN (1,2) THEN 'ERROR'
               WHEN doc_id % 20 IN (3,4,5) THEN 'WARN'
               WHEN doc_id % 20 IN (6,7,8) THEN 'DEBUG'
               ELSE 'INFO' END) || ' ' ||
         '/var/log/pods/ns-' || CAST(doc_id % 12 AS VARCHAR) ||
         '_pod-' || CAST(doc_id % 200 AS VARCHAR) ||
         '_pid-' || CAST(doc_id % 500 AS VARCHAR) ||
         '/main/0.log ' || substr(text, 1, 80) AS line,
         (['app','ingress','sidecar','batch','system'])[CAST(doc_id % 5 AS INT) + 1] AS src
  FROM documents
"""


def _flagship_oracle() -> str:
    case = routes_case_sql("src", "lvl")
    return f"""
    WITH lines AS ({_LINE_DUCK}),
    parsed AS (
      SELECT doc_id, src,
             regexp_extract(line, ' (DEBUG|INFO|WARN|ERROR|FATAL) ', 1) AS lvl,
             strlen(line) AS n_tok, strlen(line) AS byte_len
      FROM lines)
    SELECT {case} AS sink_id,
           count(*) AS event_count,
           CAST(SUM(n_tok) AS BIGINT) AS token_total,
           CAST(SUM(byte_len) AS BIGINT) AS byte_total
    FROM parsed GROUP BY 1
    """


@register("flagship_pipeline", _flagship_oracle())
def flagship_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The headline end-to-end slice: build log lines, ENCODE them to the
    token format (real Arrow codec), decode back, grok the level, route by
    (source, level), aggregate per sink.  The DuckDB oracle computes the
    same result directly on the text (the codec round-trip is the identity
    on the data, which is exactly the invariant being checked)."""
    from logfowd2_spark.codec import decode_tokens_sql, encode_line_sql
    from logfowd2_spark.operators.route import route_expr

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    lines = spark.sql(_LINE_SPARK)
    # the pure-JVM codec (the pipeline default): the whole encode→decode→
    # grok→route→aggregate plan stays inside whole-stage codegen
    toks = lines.select(
        "doc_id", "src", encode_line_sql(F.col("line")).alias("tokens")
    )
    decoded = toks.withColumn("line", decode_tokens_sql(F.col("tokens"))).withColumn(
        "n_tok", F.size("tokens")
    )
    parsed = decoded.select(
        "doc_id",
        "src",
        F.regexp_extract("line", r" (DEBUG|INFO|WARN|ERROR|FATAL) ", 1).alias("lvl"),
        F.col("n_tok"),
        F.octet_length("line").alias("byte_len"),
    )
    routed = parsed.withColumn(
        "sink_id", route_expr(DEFAULT_ROUTES, F.col("src"), F.col("lvl"))
    )
    return routed.groupBy("sink_id").agg(
        F.count("*").alias("event_count"),
        F.sum("n_tok").alias("token_total"),
        F.sum("byte_len").alias("byte_total"),
    )


# --- S6 full semantics: byte-level sanitize incl. the lossy-UTF-8 branch ---

# 'p' guard: never-empty ASCII prefix (empty-string encode is degenerate)
_SAN_PREFIX_SPARK = (
    "concat('p', substring(regexp_replace(lower(text), '[^a-z ]', ''), 1, 16))"
)
_SAN_PREFIX_DUCK = (
    "'p' || substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'), 1, 16)"
)

_SANITIZE_UTF8_ORACLE = f"""
WITH p AS (SELECT doc_id, {_SAN_PREFIX_DUCK} AS prefix FROM documents)
SELECT doc_id,
       CASE CAST(doc_id % 4 AS INT)
         WHEN 0 THEN prefix
         WHEN 1 THEN prefix || 'éü'
         WHEN 2 THEN prefix || chr(65533) || 'tail'
         ELSE prefix || '??x' END AS sanitized_line,
       strlen(CASE CAST(doc_id % 4 AS INT)
         WHEN 0 THEN prefix
         WHEN 1 THEN prefix || 'éü'
         WHEN 2 THEN prefix || chr(65533) || 'tail'
         ELSE prefix || '??x' END) AS byte_len
FROM p
"""


@register("pipe_sanitize_utf8", _SANITIZE_UTF8_ORACLE)
def pipe_sanitize_utf8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference S6 FULL semantics at the byte level (file.rs:660-721):
    per doc_id%4 a token payload is built with (0) clean ASCII, (1)
    valid multi-byte UTF-8, (2) an invalid 0xFF byte — the lossy branch:
    from_utf8_lossy puts U+FFFD, and (3) NUL+control corruption — the
    '?'-replacement branch.  The engine side runs the real byte-level
    sanitize fused into the Arrow decode (codec.sanitize_decode_bytes);
    the oracle states the reference-mandated expected text per class."""
    from logfowd2_spark.codec import TOKEN_OFFSET, encode_line_sql, with_decoded_line

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prefix = F.expr(_SAN_PREFIX_SPARK)

    def toks(byts: list[int]):
        return F.array(*[F.lit(b + TOKEN_OFFSET) for b in byts]).cast("array<int>")

    ascii_toks = encode_line_sql(prefix)
    inject = (
        F.when(F.col("doc_id") % 4 == 0, F.expr("CAST(array() AS ARRAY<INT>)"))
        .when(F.col("doc_id") % 4 == 1, toks([0xC3, 0xA9, 0xC3, 0xBC]))
        .when(F.col("doc_id") % 4 == 2,
              toks([0xFF] + [ord(c) for c in "tail"]))
        .otherwise(toks([0x00, 0x01, ord("x")]))
    )
    built = docs.select(
        "doc_id", F.concat(ascii_toks, inject).alias("tokens")
    )
    decoded = with_decoded_line(built, "tokens", "sanitized_line", sanitize=True)
    return decoded.select(
        "doc_id", "sanitized_line",
        F.octet_length("sanitized_line").alias("byte_len"),
    )


# --- flagship variant over the UTF-8 Arrow codec ----------------------------

_LINE_UTF8_SPARK = _LINE_SPARK.replace(
    "substring(text, 1, 80)",
    "concat(substring(text, 1, 80), CASE WHEN doc_id % 3 = 0 THEN ' δüñ' ELSE ' ok' END)",
)
_LINE_UTF8_DUCK = _LINE_DUCK.replace(
    "substr(text, 1, 80)",
    "substr(text, 1, 80) || (CASE WHEN doc_id % 3 = 0 THEN ' δüñ' ELSE ' ok' END)",
)


def _flagship_utf8_oracle() -> str:
    case = routes_case_sql("src", "lvl")
    return f"""
    WITH lines AS ({_LINE_UTF8_DUCK}),
    parsed AS (
      SELECT doc_id, src,
             regexp_extract(line, ' (DEBUG|INFO|WARN|ERROR|FATAL) ', 1) AS lvl,
             strlen(line) AS n_tok, strlen(line) AS byte_len
      FROM lines)
    SELECT {case} AS sink_id,
           count(*) AS event_count,
           CAST(SUM(n_tok) AS BIGINT) AS token_total,
           CAST(SUM(byte_len) AS BIGINT) AS byte_total
    FROM parsed GROUP BY 1
    """


@register("flagship_pipeline_arrow", _flagship_utf8_oracle())
def flagship_pipeline_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship slice through the ARROW codec on non-ASCII payloads:
    lines carry multi-byte UTF-8, are encoded with the real byte-level
    Arrow encode UDF, decoded+sanitized via mapInArrow, then grokked,
    routed and aggregated.  n_tok == byte count (byte-level codec), so
    the DuckDB oracle uses strlen (bytes) on the raw text — the codec
    round-trip being the identity on valid UTF-8 is the invariant."""
    from logfowd2_spark.codec import encode_line, with_decoded_line
    from logfowd2_spark.operators.route import route_expr

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    lines = spark.sql(_LINE_UTF8_SPARK)
    toks = lines.select(
        "doc_id", "src", encode_line(F.col("line")).alias("tokens")
    )
    decoded = with_decoded_line(toks, "tokens", "line", sanitize=True)
    parsed = decoded.select(
        "doc_id",
        "src",
        F.regexp_extract("line", r" (DEBUG|INFO|WARN|ERROR|FATAL) ", 1).alias("lvl"),
        F.size("tokens").alias("n_tok"),
        F.octet_length("line").alias("byte_len"),
    )
    routed = parsed.withColumn(
        "sink_id", route_expr(DEFAULT_ROUTES, F.col("src"), F.col("lvl"))
    )
    return routed.groupBy("sink_id").agg(
        F.count("*").alias("event_count"),
        F.sum("n_tok").alias("token_total"),
        F.sum("byte_len").alias("byte_total"),
    )


# --- event-time tumbling windows (B2's event-time upgrade, batch-checkable) --

_TUMBLING = {
    "spark": """
    SELECT date_format(window(ts, '1 minute').start, 'yyyy-MM-dd HH:mm:ss')
             AS window_start,
           event_type,
           count(*) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events GROUP BY window(ts, '1 minute'), event_type
    """,
    "duck": """
    SELECT strftime(time_bucket(INTERVAL 1 MINUTE, ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           count(*) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events GROUP BY time_bucket(INTERVAL 1 MINUTE, ts), event_type
    """,
}


@register("window_tumbling_counts", _TUMBLING["duck"])
def window_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregation (the batch semantics of the
    streaming windowed_level_counts path — B2 upgraded from the
    reference's processing-time flush to event time): Spark's window()
    vs DuckDB's time_bucket must land every event in the same bucket."""
    return _sql(spark, sf_dir, _TUMBLING["spark"], ["events"])


# --- streaming ≡ batch: the availableNow stream, oracle-gated ---------------


@register("streaming_sink_stats", _flagship_oracle())
def streaming_sink_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL Structured Streaming pipeline (readStream →
    foreachBatch(execute_unified_batch) → availableNow drain) over a
    token table derived from ``documents``, then aggregates the per-
    micro-batch sink_stats outputs.  The oracle is the BATCH answer
    computed directly by DuckDB — the gate proves stream ≡ batch on a
    fixed input (the reference's continuity contract, watcher.rs:235-453:
    the forwarder must deliver the same events whether it tails them live
    or reads them at startup).  Input is split into 8 files with
    maxFilesPerTrigger=4, so ≥2 micro-batches genuinely execute."""
    import tempfile

    from logfowd2_spark.codec import encode_line_sql
    from logfowd2_spark.config import PipelineConfig
    from logfowd2_spark.streaming.stream import streaming_pipeline

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    lines = spark.sql(_LINE_SPARK)
    seq = lines.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        encode_line_sql(F.col("line")).alias("tokens"),
        F.col("src").alias("source"),
    ).withColumn("n_tok", F.size("tokens"))

    root = tempfile.mkdtemp(prefix="logfowd2-streamq-")
    in_dir = f"{root}/in"
    seq.select("doc_id", "tokens", "n_tok", "source").repartition(8) \
        .write.parquet(in_dir)

    cfg = PipelineConfig(
        input_path=in_dir,
        output_path=f"{root}/out",
        checkpoint_path=f"{root}/ckpt",
    )
    pods = spark.createDataFrame(
        [("pid-none", "node-0", "deployment", "{}")],
        "pod_id string, node string, workload_kind string, labels_json string",
    )
    q = streaming_pipeline(spark, cfg, pods, available_now=True)
    _await_stream(q)

    stats = spark.read.parquet(f"{cfg.output_path}/sink_stats")
    return stats.groupBy("sink_id").agg(
        F.sum("event_count").cast("bigint").alias("event_count"),
        F.sum("token_total").cast("bigint").alias("token_total"),
        F.sum("byte_total").cast("bigint").alias("byte_total"),
    )


# --- transient sink failure → DLQ → redrive recovery, oracle-gated ----------


@register("pipe_transient_redrive", _flagship_oracle())
def pipe_transient_redrive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end transient failure class (reference pool.rs:165-313 +
    retry loop pool.rs:358-470): the REAL batch pipeline runs with a
    fault-injected sink ('logs-ingress' rejects every delivery attempt
    0), so all its parse-clean rows are quarantined with reason
    'sink_unavailable' / class 'transient'; one redrive pass then
    re-presents them at attempt 1, the sink has 'recovered', and they
    flow through enrich+route into a redrive batch dir.  The gate
    aggregates ALL routed output (original + redrive batches) per sink —
    the oracle is the no-fault flagship answer, so the check proves the
    transient detour is lossless and duplicate-free: quarantine + retry
    delivered exactly the rows a healthy sink would have."""
    import tempfile

    from logfowd2_spark.codec import encode_line_sql
    from logfowd2_spark.config import PipelineConfig
    from logfowd2_spark.streaming.dlq import redrive_pass
    from logfowd2_spark.streaming.pipeline import (
        execute_unified_batch,
        read_routed,
    )

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    lines = spark.sql(_LINE_SPARK)
    seq = lines.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        encode_line_sql(F.col("line")).alias("tokens"),
        F.col("src").alias("source"),
    ).withColumn("n_tok", F.size("tokens"))

    root = tempfile.mkdtemp(prefix="logfowd2-transq-")
    cfg = PipelineConfig(
        input_path=root,  # unused: the batch DF is passed directly
        output_path=f"{root}/out",
        checkpoint_path=f"{root}/ckpt",
        codec="jvm",
        sink_fault_sink="logs-ingress",
        sink_fault_until_retry=1,
    )
    pods = spark.createDataFrame(
        [("pid-none", "node-0", "deployment", "{}")],
        "pod_id string, node string, workload_kind string, labels_json string",
    )
    execute_unified_batch(
        seq.select("doc_id", "tokens", "n_tok", "source"), pods, cfg,
        "batch-00000",
    )
    redrive_pass(spark, cfg, pods, 0)
    routed = read_routed(spark, cfg)
    return routed.groupBy("sink_id").agg(
        F.count("*").alias("event_count"),
        F.sum("n_tok").cast("bigint").alias("token_total"),
        F.sum("byte_len").cast("bigint").alias("byte_total"),
    )


# --- streaming late data: watermarked windows, oracle-gated -----------------

_LATE_WIN_ORACLE = """
WITH ontime AS (
  SELECT event_type, ts FROM events WHERE event_id % 10 <> 0
), m AS (
  SELECT max(ts) AS mx FROM ontime
)
SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type, count(*) AS n
FROM ontime, m
WHERE time_bucket(INTERVAL 1 DAY, ts) + INTERVAL 1 DAY <= mx - INTERVAL 2 DAY
GROUP BY 1, 2
"""


@register("streaming_windowed_counts", _LATE_WIN_ORACLE)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data semantics of the watermarked tumbling window, gated
    against a CLOSED-FORM batch answer.  The stream reads three files in
    a forced order (mtime + name, maxFilesPerTrigger=1): two on-time
    files (90% of events), then a 'straggler' file whose rows are the
    same events shifted 60 days into the past.  Spark's late-row filter
    uses the watermark with a ONE-BATCH propagation lag (the filter
    watermark of batch N is the eviction watermark of batch N−1, i.e.
    event-time stats through batch N−2 — verified empirically: a
    straggler file in batch 1 is admitted and emitted, in batch 2 it is
    dropped with numRowsDroppedByWatermark counting it), hence the
    middle buffer file: by batch 2 the filter watermark is
    max(on-time ts) − 2 days and every straggler row is DROPPED, while
    append mode emits exactly the windows whose end ≤ final watermark.
    The oracle re-states that contract in SQL: on-time rows only,
    windows with end ≤ max(ts) − 2 days.  The delta vs the all-data
    batch answer (late rows + the still-open last windows) is the
    documented late-drop loss (reference B2's flush semantics upgraded
    to event time, sender.rs:40-55)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    on_time = ev.filter("event_id % 10 > 1").select("event_id", "event_type", "ts")
    buffer_b = ev.filter("event_id % 10 = 1").select("event_id", "event_type", "ts")
    late = ev.filter("event_id % 10 = 0").select(
        "event_id", "event_type",
        (F.col("ts") - F.expr("INTERVAL 60 DAYS")).alias("ts"),
    )
    root, in_dir = _stream_input_files([on_time, buffer_b, late],
                                       "logfowd2-latewin-")

    stream = (
        spark.readStream.schema("event_id bigint, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    agg = (
        stream.withWatermark("ts", "2 days")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_win_gate")
        .outputMode("append")
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.sql("SELECT window_start, event_type, n FROM late_win_gate")


# --- streaming sessionization: custom state + EVENT-TIME timeouts ----------

_STREAM_SESS_ORACLE = """
WITH e AS (SELECT CAST(user_id % 40 AS INT) AS k, ts FROM events),
m AS (SELECT max(ts) AS mx FROM e),
g AS (SELECT k, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 7200
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY k ORDER BY ts)),
s AS (SELECT k, ts,
             SUM(brk) OVER (PARTITION BY k ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM g),
sess AS (SELECT k, sid, min(ts) AS t0, max(ts) AS t1, count(*) AS n
         FROM s GROUP BY 1, 2),
sess2 AS (SELECT *, max(sid) OVER (PARTITION BY k) AS max_sid FROM sess)
SELECT k,
       strftime(t0, '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(t1, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       CAST(n AS INT) AS n_events
FROM sess2, m
WHERE sid < max_sid OR epoch(t1) + 7200 < epoch(mx) - 3600
"""


@register("streaming_sessionize", _STREAM_SESS_ORACLE)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate for ``streaming.stream.sessionize`` (custom stateful op with
    EVENT-TIME timeouts; see its docstring for semantics).  The oracle
    states the contract in closed form: every batch session EXCEPT each
    key's last one, which emits iff last_ts + gap < max_ts − delay.
    Input is three Spark-side-written time-ordered tercile files
    (``_tercile_stream_input``: maxFilesPerTrigger=1 ⇒ the watermark
    genuinely advances across micro-batches; the result is
    split-invariant), and no full-table collect touches the driver."""
    from logfowd2_spark.streaming.stream import sessionize  # noqa: PLC0415

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("user_id") % 40).cast("int").alias("k"), "ts"
    )
    root, in_dir = _tercile_stream_input(ev, ["ts", "k"], "logfowd2-sessq-")

    stream = (
        spark.readStream.schema("k int, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    out = sessionize(stream, key="k", ts="ts", gap_s=7200, delay="1 hour",
                     key_ddl="k int")
    q = (
        out.writeStream.format("memory")
        .queryName("stream_sess_gate")
        .outputMode("append")
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.sql(
        "SELECT k, session_start, session_end, n_events FROM stream_sess_gate"
    )


# --- stream-stream interval join -------------------------------------------

_STREAM_IJOIN_ORACLE = """
SELECT p.event_id AS purchase_id, e.event_id AS error_id, p.user_id,
       CAST(floor(epoch(e.ts)) - floor(epoch(p.ts)) AS BIGINT) AS secs_after
FROM events p JOIN events e ON p.user_id = e.user_id
WHERE p.event_type = 'purchase' AND e.event_type = 'error'
  AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 6 HOUR
"""


@register("streaming_interval_join", _STREAM_IJOIN_ORACLE)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner interval join: every error within 6 hours
    AFTER a purchase by the same user, both sides unbounded streams.
    The join condition carries the equality key, the event-time range,
    and watermarks on BOTH sides — the complete recipe Spark needs to
    bound join state (purchase state is droppable once the watermark
    passes ts + 6 h).  The gate's watermark delay is deliberately
    larger than the corpus time-span so no row is ever late and the
    drained availableNow result equals the batch join EXACTLY (the
    oracle); in production the delay is the lateness SLA and bounds
    state, trading exactness for memory like every watermarked op.
    Input is three Spark-side-written time-ordered tercile files
    (``_tercile_stream_input``)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type").isin("purchase", "error")
    ).select(F.col("user_id").cast("long").alias("user_id"),
             F.col("event_id").cast("long").alias("event_id"),
             "event_type", "ts")
    root, in_dir = _tercile_stream_input(ev, ["ts", "event_id"],
                                         "logfowd2-sjoin-")

    ddl = "user_id long, event_id long, event_type string, ts timestamp"

    def side(kind: str, prefix: str):
        return (
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
            .filter(F.col("event_type") == kind)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "30 days")
        )

    p, e = side("purchase", "p"), side("error", "e")
    joined = p.join(
        e,
        F.expr(
            "p_user = e_user AND e_ts >= p_ts "
            "AND e_ts <= p_ts + INTERVAL 6 HOURS"
        ),
    ).select(
        F.col("p_id").alias("purchase_id"),
        F.col("e_id").alias("error_id"),
        F.col("p_user").alias("user_id"),
        (F.unix_timestamp("e_ts") - F.unix_timestamp("p_ts"))
        .alias("secs_after"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("stream_ijoin_gate")
        .outputMode("append")
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.sql(
        "SELECT purchase_id, error_id, user_id, secs_after "
        "FROM stream_ijoin_gate"
    )


# import sibling modules for their @register side effects (kept at the
# bottom so they can import register/_sql from this module).
# trainingdata FIRST: the driver's correctness gate checks queries in
# registration order with a bounded window, so the heaviest/newest
# operators must land early — the catalog is also kept ≤ 50 entries
# total so every query gets fresh oracle evidence each round.
from logfowd2_spark.plans import trainingdata  # noqa: E402,F401  isort: skip
from logfowd2_spark.plans import relational  # noqa: E402,F401  isort: skip
