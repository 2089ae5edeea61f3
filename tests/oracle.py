"""Independent pandas/re reimplementation of the pipeline semantics.

Deliberately does NOT share the Spark Column kernels — only the codec
module (the byte-level token codec is the data format itself).  Regexes
are applied with Python ``re``; routing/enrichment with plain dict
lookups; so agreement between Spark and this oracle is meaningful
(FIXTURES.md §4).
"""

from __future__ import annotations

import re

import pandas as pd

from logfowd2_spark.codec import decode_tokens_arrow

K8S = r"/var/log/pods/([a-z0-9-]+)_([a-z0-9-]+)_([a-z0-9-]+)/([a-z-0-9]+)/(0|[1-9][0-9]*)\.log"
LINE_RE = re.compile(
    r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?Z) "
    r"(DEBUG|INFO|WARN|ERROR|FATAL) " + K8S + r" (.*)$"
)
CTRL = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F]")
NONPRINT = re.compile(r"[^\x20-\x7E\t]")


def byte_exact_truncate(s: str, max_line_size: int,
                        suffix: str = "... [TRUNCATED]") -> str:
    """The single Python reference for the byte-budget, UTF-8-boundary
    truncation cut (reference file.rs:595-617) — shared by the pipeline
    oracle and the kernel property test so the boundary logic lives in
    exactly one place."""
    b = s.encode("utf-8")
    if len(b) <= max_line_size:
        return s
    t = 0
    while t < 3 and (b[max_line_size - 1 - t] & 0xC0) == 0x80:
        t += 1
    lead = b[max_line_size - 1 - t]
    exp = (1 if lead < 0x80 else 2 if lead < 0xE0 else
           3 if lead < 0xF0 else 4)
    keep = max_line_size if exp == t + 1 else max_line_size - t - 1
    return b[:keep].decode("utf-8") + suffix


def oracle_transform(
    seq: pd.DataFrame,
    pods: pd.DataFrame,
    routes: list[tuple[str, str, str]],
    max_line_size: int,
    suffix: str = "... [TRUNCATED]",
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Returns (routed, dlq, sink_stats) pandas frames."""
    lines = decode_tokens_arrow(pd.Series(list(seq["tokens"])))

    def sanitize(s: str) -> str:
        n_ctrl = len(CTRL.findall(s))
        if "\x00" in s or (len(s) > 0 and n_ctrl * 10 > len(s)):
            return NONPRINT.sub("?", s)
        return s

    def truncate(s: str) -> str:
        return byte_exact_truncate(s, max_line_size, suffix)

    lines = lines.map(lambda s: re.sub(r"[\r\n]+$", "", s))
    lines = lines.map(sanitize).map(truncate)

    pod_attrs = pods.set_index("pod_id")[["node", "workload_kind", "labels_json"]]

    TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?Z$")
    LEVELS = {"DEBUG", "INFO", "WARN", "ERROR", "FATAL"}
    K8S_FULL = re.compile("^" + K8S + "$")

    def fail_reason(line: str) -> str:
        """Independent reimplementation of the failure taxonomy."""
        from datetime import datetime

        if not line.strip():
            return "empty_line"
        parts = line.split(" ", 3)
        if len(parts) < 4:
            return "missing_fields"
        ts, level, path = parts[0], parts[1], parts[2]
        if not TS_RE.match(ts):
            return "bad_timestamp"
        try:
            datetime.fromisoformat(ts.replace("Z", "+00:00"))
        except ValueError:
            return "bad_timestamp"
        if level not in LEVELS:
            return "bad_level"
        if not K8S_FULL.match(path):
            return "bad_path"
        return "bad_path"  # parseable pieces but LINE_RE failed: path-ish

    routed_rows, dlq_rows = [], []
    for i in range(len(seq)):
        row = seq.iloc[i]
        line = lines.iloc[i]
        m = LINE_RE.match(line)
        if not m:
            dlq_rows.append(
                {
                    "doc_id": row["doc_id"],
                    "source": row["source"],
                    "raw_line": line,
                    "failure_reason": fail_reason(line),
                }
            )
            continue
        ts, level, ns, pod, pid, ctr, _num, body = m.groups()
        sink = None
        for src_r, lvl_r, sink_r in routes:
            if (src_r == "*" or src_r == row["source"]) and (
                lvl_r == "*" or lvl_r == level
            ):
                sink = sink_r
                break
        if pid in pod_attrs.index:
            attrs = pod_attrs.loc[pid]
            node, wk, labels, hit = attrs["node"], attrs["workload_kind"], attrs["labels_json"], True
        else:
            node, wk, labels, hit = "unknown", "unknown", "unknown", False
        routed_rows.append(
            {
                "doc_id": row["doc_id"],
                "source": row["source"],
                "n_tok": int(row["n_tok"]),
                "byte_len": len(line.encode("utf-8")),
                "ts": ts,
                "level": level,
                "namespace": ns,
                "pod_name": pod,
                "pod_id": pid,
                "container_name": ctr,
                "body": body,
                "node": node,
                "workload_kind": wk,
                "labels_json": labels,
                "dim_hit": hit,
                "sink_id": sink,
                "log_date": ts[:10],
            }
        )
    routed = pd.DataFrame(routed_rows)
    dlq = pd.DataFrame(dlq_rows)
    if len(routed):
        stats = (
            routed.groupby("sink_id")
            .agg(
                event_count=("doc_id", "count"),
                token_total=("n_tok", "sum"),
                byte_total=("byte_len", "sum"),
            )
            .reset_index()
        )
    else:
        stats = pd.DataFrame(columns=["sink_id", "event_count", "token_total", "byte_total"])
    return routed, dlq, stats
