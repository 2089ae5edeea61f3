"""End-to-end tests for the custom streaming gates.

- the sessionize and interval-join catalog entries run against their
  DuckDB oracles EXACTLY the way the driver's correctness harness does
  (rows + schema + values), so an environment-dependent drift (round 3:
  a pandas round-trip widened a gate input's ``k`` to INT64 while the
  stream read pinned int) fails here first;
- the promoted ``streaming.stream.sessionize`` operator's EVENT-TIME
  timeout genuinely EVICTS closed-session state (bounded state),
  observed via the query's progress ``stateOperators`` counters, and
  late-but-within-watermark events widen (never corrupt) the open
  session.
"""

import os
import shutil
from glob import glob

import duckdb
import pytest

from logfowd2_spark.plans import catalog
from logfowd2_spark.plans.compare import frames_match

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in catalog.TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def test_sessionize_gate_matches_oracle(spark, duck):
    sdf = catalog.queries()["streaming_sessionize"](spark, SF).toPandas()
    odf = duck.sql(catalog.oracle_sql()["streaming_sessionize"]).df()
    assert len(sdf) > 0
    ok, why = frames_match(sdf, odf)
    assert ok, f"streaming_sessionize: {why}"


def test_interval_join_gate_matches_oracle(spark, duck):
    """The stream-stream interval join gate equals the batch join
    answer exactly (rows + values) — run the same way the driver's
    correctness harness does."""
    sdf = catalog.queries()["streaming_interval_join"](spark, SF).toPandas()
    odf = duck.sql(catalog.oracle_sql()["streaming_interval_join"]).df()
    assert len(sdf) > 0
    ok, why = frames_match(sdf, odf)
    assert ok, f"streaming_interval_join: {why}"


def test_sessionize_out_of_order_merge(spark, tmp_path):
    """A late-but-within-watermark event from an earlier micro-batch
    merges into the open session by WIDENING its bounds: session_start
    moves back, session_end must NOT move backward (the round-4 review
    caught `last` being overwritten by the late timestamp, which made
    the next gap check split a live session)."""
    from logfowd2_spark.streaming.stream import sessionize

    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def write_file(idx, rows_sql):
        tmp = str(tmp_path / f"tmp{idx}")
        spark.sql(rows_sql).coalesce(1).write.parquet(tmp)
        dst = str(in_dir / f"{idx:02d}.parquet")
        shutil.copy(glob(f"{tmp}/part-*.parquet")[0], dst)
        os.utime(dst, (1_000_000_000 + idx * 100,) * 2)

    write_file(0, """
        SELECT CAST(1 AS INT) AS k, timestamp'2024-01-01 10:00:00' AS ts
        UNION ALL
        SELECT CAST(1 AS INT) AS k, timestamp'2024-01-01 10:05:00' AS ts
    """)
    # batch 2: a LATE event at 09:58 (admitted: watermark is
    # 10:05 - 30 min) plus a far-future key advancing the watermark
    # past k=1's gap deadline so its session closes by timeout
    write_file(1, """
        SELECT CAST(1 AS INT) AS k, timestamp'2024-01-01 09:58:00' AS ts
        UNION ALL
        SELECT CAST(99 AS INT) AS k, timestamp'2024-01-01 11:00:00' AS ts
    """)

    stream = (
        spark.readStream.schema("k int, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    out = sessionize(stream, key="k", ts="ts", gap_s=600,
                     delay="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_ooo_gate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "out-of-order stream didn't drain"
    rows = spark.sql(
        "SELECT k, session_start, session_end, n_events FROM sess_ooo_gate"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["k"] == 1 and r["n_events"] == 3
    assert r["session_start"] == "2024-01-01 09:58:00.000000"
    assert r["session_end"] == "2024-01-01 10:05:00.000000"  # not 09:58!


def _protobuf_available() -> bool:
    # transformWithState's driver-side schema worker imports
    # google.protobuf; absent/broken in some sandboxes (no pip allowed)
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:  # absent OR broken (C-extension mismatches raise
        return False   # non-ImportError) — either way: skip, don't error


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState needs google.protobuf (driver-side "
           "StreamingPythonRunner); not installed in this sandbox",
)
def test_sessionize_tws_matches_classic(spark, tmp_path):
    """The transformWithStateInPandas sessionizer (Spark 4's modern
    arbitrary-state API: typed ValueState + explicit event-time timers)
    produces EXACTLY the classic applyInPandasWithState sessionizer's
    output on the same multi-batch input — same sessions, same bounds,
    same timeout closures."""
    from pyspark.sql import functions as F

    from logfowd2_spark.plans.catalog import _await_stream, _tercile_stream_input
    from logfowd2_spark.streaming.stream import sessionize, sessionize_tws

    SF = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        (F.col("user_id") % 40).cast("int").alias("k"), "ts"
    )
    root, in_dir = _tercile_stream_input(ev, ["ts", "k"], "logfowd2-tws-")

    def run(op, name):
        stream = (
            spark.readStream.schema("k int, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        out = op(stream, key="k", ts="ts", gap_s=7200, delay="1 hour")
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", f"{root}/ckpt-{name}")
            .trigger(availableNow=True)
            .start()
        )
        _await_stream(q)  # stops the query loudly on timeout
        return sorted(
            tuple(r) for r in spark.sql(
                f"SELECT k, session_start, session_end, n_events FROM {name}"
            ).collect()
        )

    classic = run(sessionize, "tws_classic")
    # transformWithState requires the RocksDB state store; restore the
    # prior provider afterwards so the session-scoped fixture's other
    # streaming tests keep the backend they were written against
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prior = spark.conf.get(conf_key)
    except Exception:
        prior = None
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        modern = run(sessionize_tws, "tws_modern")
    finally:
        if prior is not None:
            spark.conf.set(conf_key, prior)
        else:
            spark.conf.unset(conf_key)
    assert len(classic) > 0
    assert modern == classic


def test_sessionize_event_time_eviction(spark, tmp_path):
    """Keys whose gap deadline the watermark passes are emitted by
    timeout AND their state rows removed; an open session's state
    survives.  5 early keys + 1 late key ⇒ 5 timeout emissions, final
    state holds exactly the 1 open session."""
    from pyspark.sql import functions as F

    from logfowd2_spark.streaming.stream import sessionize

    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def write_file(idx, rows_sql):
        tmp = str(tmp_path / f"tmp{idx}")
        spark.sql(rows_sql).coalesce(1).write.parquet(tmp)
        dst = str(in_dir / f"{idx:02d}.parquet")
        shutil.copy(glob(f"{tmp}/part-*.parquet")[0], dst)
        os.utime(dst, (1_000_000_000 + idx * 100,) * 2)

    # 5 keys, 2 events each at t0/t0+10s; then one late key 10 min on
    write_file(0, """
        SELECT CAST(id AS INT) AS k,
               timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts
        FROM range(5)
        UNION ALL
        SELECT CAST(id AS INT) AS k,
               timestamp'2024-01-01 00:00:10' + make_interval(0,0,0,0,0,0,id) AS ts
        FROM range(5)
    """)
    write_file(1, """
        SELECT CAST(99 AS INT) AS k, timestamp'2024-01-01 00:10:00' AS ts
    """)

    stream = (
        spark.readStream.schema("k int, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    out = sessionize(stream, key="k", ts="ts", gap_s=60, delay="1 second")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_evict_gate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "sessionize eviction stream didn't drain"

    rows = spark.sql(
        "SELECT k, n_events FROM sess_evict_gate ORDER BY k"
    ).collect()
    # the 5 early keys emitted by event-time timeout; key 99 still open
    assert [(r["k"], r["n_events"]) for r in rows] == [(i, 2) for i in range(5)]

    ops = [p["stateOperators"][0] for p in q.recentProgress
           if p.get("stateOperators")]
    assert ops, "no stateOperators progress recorded"
    peak = max(op["numRowsTotal"] for op in ops)
    final = ops[-1]["numRowsTotal"]
    removed = sum(op.get("numRowsRemoved", 0) for op in ops)
    assert peak >= 5          # all early sessions were live at once
    assert final == 1         # only key 99's open session survives
    assert removed >= 5       # timeout eviction actually removed state

    # split-invariance cross-check: same data through the BATCH
    # sessionizer analogue (every session except each key's last, which
    # emits iff deadline < watermark) — closed-form expectation
    got = spark.sql("SELECT k, session_start, session_end FROM sess_evict_gate")
    assert got.filter(F.col("session_start") > F.col("session_end")).count() == 0
