"""Line-kernel tests, mirroring the reference's unit-test vectors
(truncation file.rs:1504+, corruption file.rs:1719-1827, path regex
watcher.rs:1032-1119)."""

import pandas as pd
from pyspark.sql import functions as F

from logfowd2_spark.functions.kernels import (
    extract_k8s_meta,
    grok_line,
    sanitize_content,
    truncate_line,
)


def _one_col(spark, values, name="line"):
    return spark.createDataFrame([(v,) for v in values], [name])


def test_strip_line_endings(spark):
    # reference S4 semantics (file.rs:193-199): trailing \n and \r removed
    from logfowd2_spark.functions.kernels import strip_line_endings

    df = _one_col(spark, ["plain", "crlf\r\n", "cr\r", "lf\n", "mid\rdle"])
    out = [r["s"] for r in df.select(strip_line_endings(F.col("line")).alias("s")).collect()]
    assert out == ["plain", "crlf", "cr", "lf", "mid\rdle"]


def test_truncate_line(spark):
    df = _one_col(spark, ["short", "x" * 20])
    out = df.select(truncate_line(F.col("line"), 10).alias("t")).collect()
    assert out[0]["t"] == "short"
    assert out[1]["t"] == "x" * 10 + "... [TRUNCATED]"


def test_truncate_utf8_boundary(spark):
    """Byte-exact boundary cut (reference file.rs:595-617): the kept
    content is the longest codepoint prefix within the BYTE budget —
    never a split codepoint, never >budget bytes."""
    suffix = "... [TRUNCATED]"
    vectors = [
        # (input, budget, expected kept prefix)
        ("ééééé", 5, "éé"),          # 2-byte chars: 5-byte budget keeps 4
        ("ééééé", 4, "éé"),          # exact fit at the boundary
        ("aéééé", 4, "aé"),          # mixed: 1+2 bytes fit, 4th byte splits
        ("εεεε", 7, "εεε"),          # 2-byte greek: keeps 6 of the 7-budget
        ("日本語テスト", 8, "日本"),    # 3-byte chars: 8-byte budget keeps 6
        ("x日本語テスト", 8, "x日本"),  # lead offset by ASCII
        ("🎉🎉🎉", 6, "🎉"),          # 4-byte chars: keeps 4 of 6
        ("🎉🎉🎉", 7, "🎉"),
        ("🎉🎉🎉", 8, "🎉🎉"),
    ]
    for text, budget, kept in vectors:
        df = _one_col(spark, [text])
        out = df.select(
            truncate_line(F.col("line"), budget).alias("t"),
            F.octet_length(truncate_line(F.col("line"), budget)).alias("b"),
        ).collect()[0]
        assert out["t"] == kept + suffix, (text, budget)
        assert out["b"] <= budget + len(suffix.encode()), (text, budget)


def test_sanitize_nul_bytes(spark):
    df = _one_col(spark, ["ok line", "bad\x00line", "ctl\x01\x02\x03"])
    out = [r["s"] for r in df.select(sanitize_content(F.col("line")).alias("s")).collect()]
    assert out[0] == "ok line"
    assert out[1] == "bad?line"
    # 3 control chars in 6-char line > 10% ⇒ sanitized
    assert out[2] == "ctl???"


def test_sanitize_low_control_ratio_untouched(spark):
    line = ("a" * 100) + "\x01"  # 1/101 < 10%
    df = _one_col(spark, [line])
    out = df.select(sanitize_content(F.col("line")).alias("s")).collect()
    assert out[0]["s"] == line


K8S_VALID = "/var/log/pods/kube-system_coredns-abc12_9f8e7d6c/coredns/0.log"
K8S_INVALID = [
    "/var/log/pods/UPPER_pod_id/c/0.log",      # uppercase namespace
    "/var/log/pods/ns_pod_id/c/01.log",         # leading-zero file number
    "/var/log/other/ns_pod_id/c/0.log",         # wrong prefix
    "/var/log/pods/ns_pod/c/0.log",             # missing pod_id group
]


def test_k8s_meta_extraction_valid(spark):
    df = _one_col(spark, [K8S_VALID], "path")
    meta = extract_k8s_meta(F.col("path"))
    row = df.select(*[v.alias(k) for k, v in meta.items()]).collect()[0]
    assert row["namespace"] == "kube-system"
    assert row["pod_name"] == "coredns-abc12"
    assert row["pod_id"] == "9f8e7d6c"
    assert row["container_name"] == "coredns"


def test_k8s_meta_extraction_invalid_defaults_unknown(spark):
    # miss ⇒ "unknown" (reference watcher.rs:602-626)
    df = _one_col(spark, K8S_INVALID, "path")
    meta = extract_k8s_meta(F.col("path"))
    for row in df.select(*[v.alias(k) for k, v in meta.items()]).collect():
        assert row["namespace"] == "unknown"
        assert row["pod_id"] == "unknown"


def test_grok_full_line(spark):
    line = f"2024-03-01T00:00:05Z ERROR {K8S_VALID} connection closed by peer"
    df = _one_col(spark, [line])
    g = grok_line(F.col("line"))
    row = df.select(*[v.alias(k) for k, v in g.items()]).collect()[0]
    assert row["ts_raw"] == "2024-03-01T00:00:05Z"
    assert row["level"] == "ERROR"
    assert row["namespace"] == "kube-system"
    assert row["body"] == "connection closed by peer"


def test_grok_rejects_malformed(spark):
    bad = [
        "no structure at all",
        f"2024-03-01T00:00:05Z TRACE {K8S_VALID} bad level",
        f"2024-03-01 00:00:05 ERROR {K8S_VALID} bad ts sep",
    ]
    df = _one_col(spark, bad)
    g = grok_line(F.col("line"))
    for row in df.select(g["level"].alias("level")).collect():
        assert row["level"] == ""


def test_sanitize_exact_10pct_boundary(spark):
    # trigger is ctl*10 > len (strict): 1 ctl in 10 chars ⇒ NOT corrupted,
    # 2 in 10 ⇒ corrupted (mirrors file.rs ratio predicate)
    from logfowd2_spark.functions.kernels import sanitize_content

    at_boundary = "aaaaaaaaa\x01"        # 1/10 = 10% → clean
    over = "aaaaaaaa\x01\x01"            # 2/10 = 20% → sanitized
    df = _one_col(spark, [at_boundary, over])
    out = [r["s"] for r in df.select(sanitize_content(F.col("line")).alias("s")).collect()]
    assert out[0] == at_boundary
    assert out[1] == "aaaaaaaa??"


def test_truncate_exact_boundary(spark):
    # exactly max_line_size chars pass through untouched
    df = _one_col(spark, ["x" * 10, "x" * 11])
    out = [r["t"] for r in df.select(truncate_line(F.col("line"), 10).alias("t")).collect()]
    assert out[0] == "x" * 10
    assert out[1] == "x" * 10 + "... [TRUNCATED]"


def test_grok_level_is_anchored_word(spark):
    # 'INFOX' or lowercase must not match (mirrors watcher.rs level set)
    line_t = "2024-03-01T00:00:05Z {lvl} " + K8S_VALID + " body"
    df = _one_col(spark, [line_t.format(lvl="INFOX"), line_t.format(lvl="info")])
    g = grok_line(F.col("line"))
    for row in df.select(g["level"].alias("level")).collect():
        assert row["level"] == ""


def test_parse_fractional_seconds_timestamp(spark):
    """A grammar-valid ts with fractional seconds must parse (round-1
    bug: the fixed-pattern to_timestamp quarantined it as bad_timestamp
    while the ts regex and the oracle accepted it)."""
    from logfowd2_spark.config import PipelineConfig
    from logfowd2_spark.operators.parse import parse_lines

    lines = [
        ("d1", "app", "2024-03-01T00:00:00.123Z INFO "
         "/var/log/pods/ns-1_pod-1_pid-000001/main/0.log hello frac"),
        ("d2", "app", "2024-03-01T00:00:00Z INFO "
         "/var/log/pods/ns-1_pod-1_pid-000001/main/0.log hello plain"),
        ("d3", "app", "2024-03-01T99:99:99Z INFO "
         "/var/log/pods/ns-1_pod-1_pid-000001/main/0.log bad wallclock"),
    ]
    df = spark.createDataFrame(lines, "doc_id string, source string, line string")
    out = parse_lines(df, PipelineConfig()).select(
        "doc_id", "parse_ok", "failure_reason",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts_fmt"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id["d1"]["parse_ok"] and by_id["d1"]["ts_fmt"] == "2024-03-01 00:00:00.123"
    assert by_id["d2"]["parse_ok"] and by_id["d2"]["ts_fmt"] == "2024-03-01 00:00:00.000"
    # out-of-range wall clock: regex matches shape but the cast fails
    assert not by_id["d3"]["parse_ok"]
    assert by_id["d3"]["failure_reason"] == "bad_timestamp"


def test_truncate_threshold_is_bytes(spark):
    # 3 chars = 6 bytes: over a 5-BYTE budget even though len() is 3;
    # the cut is byte-exact too — 2 chars (4 bytes) fit, the 3rd splits
    df = _one_col(spark, ["ééé"])
    out = df.select(truncate_line(F.col("line"), 5).alias("t")).collect()
    assert out[0]["t"] == "éé... [TRUNCATED]"


def test_parse_handles_empty_and_short_lines(spark):
    """Empty / under-segmented lines must quarantine gracefully (under
    ANSI mode a plain element_at on the short split array would throw)."""
    from logfowd2_spark.config import PipelineConfig
    from logfowd2_spark.operators.parse import parse_lines

    rows = [
        ("e1", "app", ""),
        ("e2", "app", "   "),
        ("e2t", "app", "\t \t"),
        ("e3", "app", "2024-03-01T00:00:00Z INFO"),
        ("e4", "app", "justoneword"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, line string")
    out = {r["doc_id"]: r for r in parse_lines(df, PipelineConfig())
           .select("doc_id", "parse_ok", "failure_reason").collect()}
    assert not any(r["parse_ok"] for r in out.values())
    assert out["e1"]["failure_reason"] == "empty_line"
    assert out["e2"]["failure_reason"] == "empty_line"
    assert out["e2t"]["failure_reason"] == "empty_line"  # tab-only = empty
    assert out["e3"]["failure_reason"] == "missing_fields"
    assert out["e4"]["failure_reason"] == "missing_fields"


def test_parse_taxonomy_matches_oracle_on_random_lines(spark):
    """Differential test: 300 seeded random lines (valid grammar,
    mutated grammar, and raw noise) must get the same parse_ok AND the
    same failure_reason from the engine and from the independent
    oracle reimplementation (tests.oracle)."""
    import random

    from logfowd2_spark.config import PipelineConfig
    from logfowd2_spark.operators.parse import parse_lines
    from tests.oracle import LINE_RE  # noqa: F401 (grammar sanity)
    import tests.oracle as om

    rng = random.Random(1234)
    levels = ["DEBUG", "INFO", "WARN", "ERROR", "FATAL", "TRACE", "info"]
    noise_alphabet = "abc\tXYZ:/._-09\x01\x00é"

    def rand_line(i: int) -> str:
        kind = i % 6
        ts = f"2024-03-0{1 + i % 9}T0{i % 10}:0{i % 6}:1{i % 9}Z"
        path = f"/var/log/pods/ns-{i % 5}_pod-{i % 7}_pid-{i % 11}/main/0.log"
        lvl = levels[i % len(levels)]
        if kind == 0:
            return f"{ts} {lvl} {path} body {i}"
        if kind == 1:  # drop a random field
            parts = [ts, lvl, path, f"body {i}"]
            del parts[rng.randrange(4)]
            return " ".join(parts)
        if kind == 2:  # mangle the ts
            return f"{ts[:-1]} {lvl} {path} body"
        if kind == 3:  # mangle the path
            return f"{ts} {lvl} {path.replace('pods', 'POD')} body"
        if kind == 4:  # raw noise
            return "".join(rng.choice(noise_alphabet) for _ in range(rng.randrange(0, 40)))
        return f"{ts} {lvl} {path} " + "x" * rng.randrange(0, 300)

    lines = [(f"r{i:04d}", "app", rand_line(i)) for i in range(300)]
    cfg = PipelineConfig(max_line_size=128)
    got = {
        r["doc_id"]: (r["parse_ok"], r["failure_reason"])
        for r in parse_lines(
            spark.createDataFrame(lines, "doc_id string, source string, line string"),
            cfg,
        ).select("doc_id", "parse_ok", "failure_reason").collect()
    }

    # independent oracle: sanitize/truncate then match/classify
    import re

    def oracle_one(s: str):
        n_ctrl = len(om.CTRL.findall(s))
        if "\x00" in s or (len(s) > 0 and n_ctrl * 10 > len(s)):
            s = om.NONPRINT.sub("?", s)
        if len(s.encode("utf-8")) > 128:
            s = s[:128] + "... [TRUNCATED]"
        m = om.LINE_RE.match(s)
        if m:
            return (True, None)
        # reuse the taxonomy reimplementation embedded in oracle_transform
        if not s.strip():
            return (False, "empty_line")
        parts = s.split(" ", 3)
        if len(parts) < 4:
            return (False, "missing_fields")
        from datetime import datetime

        ts, lvl, path = parts[0], parts[1], parts[2]
        if not re.match(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?Z$", ts):
            return (False, "bad_timestamp")
        try:
            datetime.fromisoformat(ts.replace("Z", "+00:00"))
        except ValueError:
            return (False, "bad_timestamp")
        if lvl not in {"DEBUG", "INFO", "WARN", "ERROR", "FATAL"}:
            return (False, "bad_level")
        return (False, "bad_path")

    for doc_id, _src, line in lines:
        want = oracle_one(line)
        assert got[doc_id] == want, f"{doc_id}: {got[doc_id]} != {want} for {line!r}"


def test_truncate_property_random_unicode(spark):
    """Property test (hypothesis-generated vectors, one Spark job per
    batch): for arbitrary unicode lines and byte budgets, the kernel's
    output equals the shared Python byte-exact reference
    (tests/oracle.py:byte_exact_truncate — the boundary logic lives in
    ONE place), a truncated line's kept content never exceeds the budget
    in BYTES, and the kept content is always a codepoint prefix of the
    input (no mojibake, no reordering)."""
    from hypothesis import given, settings, strategies as st

    from tests.oracle import byte_exact_truncate

    suffix = "... [TRUNCATED]"

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(st.text(max_size=60), min_size=1, max_size=25),
        st.integers(min_value=4, max_value=40),
    )
    def check(lines, budget):
        df = spark.createDataFrame([(s,) for s in lines], "line string")
        rows = df.select(
            "line",
            truncate_line(F.col("line"), budget).alias("t"),
        ).collect()
        for r in rows:
            expect = byte_exact_truncate(r["line"], budget, suffix)
            assert r["t"] == expect, (r["line"], budget)
            if len(r["line"].encode()) > budget:     # truncated branch
                assert r["t"].endswith(suffix)
                kept = r["t"][:-len(suffix)]
                assert len(kept.encode("utf-8")) <= budget, (r["line"], budget)
            else:
                kept = r["t"]
                assert kept == r["line"]
            assert r["line"].startswith(kept), (r["line"], budget)

    check()
