"""Scalar line kernels — pure JVM (whole-stage-codegen) expressions.

Each kernel rebuilds one of the reference's per-line string operations as
a vectorized Spark Column expression; none of them drops into Python.

Reference parity:
- truncate_line   ≈ read_line_limited_static (src/domain/file.rs:553-634:
                    cut at max_line_size, append "... [TRUNCATED]").
- sanitize_content≈ sanitize_corrupted_content (src/domain/file.rs:660-721:
                    NUL bytes or >10% control chars ⇒ non-printables → '?').
- extract_k8s_meta≈ the K8s path regex with named groups
                    (src/watcher.rs:31, applied at watcher.rs:595-638),
                    missing group ⇒ "unknown" (watcher.rs:602-626).
- grok_line       — the north-star extension: also parse timestamp +
                    level out of the reconstructed line body (the
                    reference stamps wall-clock instead, event.rs:19-27).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference regex (src/watcher.rs:31), same character classes.
K8S_PATH_RE = (
    r"/var/log/pods/([a-z0-9-]+)_([a-z0-9-]+)_([a-z0-9-]+)/"
    r"([a-z-0-9]+)/(0|[1-9][0-9]*)\.log"
)

# Full synthetic line grammar (FIXTURES.md §1.1):
#   <iso8601-ts> <LEVEL> <k8s-path> <message-body>
LOG_LINE_RE = (
    r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?Z) "
    r"(DEBUG|INFO|WARN|ERROR|FATAL) "
    + K8S_PATH_RE
    + r" (.*)$"
)

CONTROL_CHAR_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"
NON_PRINTABLE_RE = r"[^\x20-\x7E\t]"
TRUNCATION_SUFFIX = "... [TRUNCATED]"


def strip_line_endings(line: Column) -> Column:
    """Strip trailing newline/CR, ≈ reference S4 (file.rs:193-199: lines
    are split on \\n then trailing \\n and \\r removed) — a token stream
    re-encoding raw file bytes may carry them.

    Guarded by a cheap suffix check: the regex (and its per-row string
    rebuild) only runs for lines that actually end in CR/LF — almost
    none do, so the common case is two endswith probes."""
    dirty = line.endswith("\n") | line.endswith("\r")
    return F.when(dirty, F.regexp_replace(line, r"[\r\n]+$", "")).otherwise(line)


def truncate_line(line: Column, max_line_size: int,
                  suffix: str = TRUNCATION_SUFFIX) -> Column:
    """Cut lines longer than ``max_line_size`` BYTES at a UTF-8 boundary
    and append the marker — byte-exact parity with the reference's
    boundary-backoff cut (file.rs:595-617): the kept content is the
    longest codepoint prefix with ``octet_length <= max_line_size``.

    Pure-JVM implementation: examine the 4-byte tail of the m-byte cut
    in the hex domain — a UTF-8 sequence is one lead byte plus 0-3
    continuation bytes (0x80..0xBF, hex first-nibble 8/9/A/B), so ONE
    anchored regexp over the 8-char tail hex yields the trailing
    continuation-run length, and the cut keeps the full slice iff that
    final sequence is complete (lead-byte class length == run + 1), else
    drops it.  The input is a valid-UTF-8 Spark string, so the
    boundary-valid byte slice casts back to string without validation
    concerns.  Expression size matters here: ``line`` is referenced
    exactly 3× (guard, tail, final slice) — filter pushdown substitutes
    project aliases transitively, so a chatty variant (an earlier
    3-probe cascade referenced ``line`` 6×) blows past janino's 64 KB
    method limit once parse_ok lands in a scan's DataFilters.  The whole
    expression sits behind the oversize CASE guard, so in-budget lines
    (the ~100% case) pay one octet_length scan.
    """
    if max_line_size < 4:
        raise ValueError("max_line_size must be >= 4 (one UTF-8 codepoint)")
    m = max_line_size
    # 4-byte tail of the would-be cut (bytes m-3..m), as 8 hex chars
    tail = F.hex(F.substring(line.cast("binary"), m - 3, 4))
    # trailing continuation-byte run length (0..3; valid UTF-8 never has
    # 4) — the regex consumes whole hex pairs anchored at the end, so
    # byte alignment is preserved
    t = (
        F.length(F.regexp_extract(tail, "((?:[89AB][0-9A-F]){0,3})$", 1)) / 2
    ).cast("int")
    # the lead byte of the final sequence = byte m-t, at tail offset 3-t
    lead = F.substring(tail, (F.lit(3) - t) * 2 + 1, 2)
    seq_len = (
        F.when(lead < "80", F.lit(1))        # ASCII
        .when((lead >= "C0") & (lead <= "DF"), F.lit(2))
        .when((lead >= "E0") & (lead <= "EF"), F.lit(3))
        .when(lead >= "F0", F.lit(4))
        .otherwise(F.lit(1))                 # defensive: invalid input
    )
    keep = F.when(seq_len == t + 1, F.lit(m)).otherwise(F.lit(m) - t - 1)
    exact = F.substring(line.cast("binary"), F.lit(1), keep).cast("string")
    return F.when(
        F.octet_length(line) > m, F.concat(exact, F.lit(suffix))
    ).otherwise(line)


def is_corrupted(line: Column) -> Column:
    """Corruption predicate: NUL bytes, or >10% control characters.

    Mirrors sanitize_corrupted_content's trigger conditions
    (file.rs:665-680).  The control-char COUNT (a regexp_replace that
    rebuilds the string) only runs for lines where a find-only rlike
    saw at least one control char — clean lines (the ~98% case) pay a
    single scan, no allocation."""
    has_ctl = line.rlike(CONTROL_CHAR_RE)
    ctl_count = F.when(
        has_ctl,
        F.length(line) - F.length(F.regexp_replace(line, CONTROL_CHAR_RE, "")),
    ).otherwise(F.lit(0))
    return line.contains("\x00") | (
        (F.length(line) > 0) & (ctl_count * 10 > F.length(line))
    )


def sanitize_content(line: Column) -> Column:
    """Replace every non-printable with '?' when the line is corrupted.

    ≈ create_sanitized_replacement (file.rs:695-721).  Clean lines pass
    through untouched (byte-identical).
    """
    return F.when(
        is_corrupted(line), F.regexp_replace(line, NON_PRINTABLE_RE, "?")
    ).otherwise(line)


def extract_k8s_meta(path: Column) -> dict[str, Column]:
    """Named-group extraction from the pod log path; miss ⇒ 'unknown'.

    Columns mirror Meta (reference src/domain/event.rs:11-17); the
    'unknown' default mirrors watcher.rs:602-626.
    """
    def grp(i: int) -> Column:
        g = F.regexp_extract(path, K8S_PATH_RE, i)
        return F.when(g == "", F.lit("unknown")).otherwise(g)

    return {
        "namespace": grp(1),
        "pod_name": grp(2),
        "pod_id": grp(3),
        "container_name": grp(4),
    }


def grok_line(line: Column) -> dict[str, Column]:
    """Parse (ts, level, k8s meta, body) from a reconstructed log line.

    Returns raw extracted columns; empty string means the group did not
    match.  ``ts``/``level`` are the north-star extension fields; the
    k8s groups are the reference's P1 operator applied to the embedded
    path instead of a filename.
    """
    def grp(i: int) -> Column:
        return F.regexp_extract(line, LOG_LINE_RE, i)

    return {
        "ts_raw": grp(1),
        "level": grp(2),
        "namespace": grp(3),
        "pod_name": grp(4),
        "pod_id": grp(5),
        "container_name": grp(6),
        "log_file_num": grp(7),
        "body": grp(8),
    }


def format_ts_iso8601(ts: Column) -> Column:
    """RFC3339/ISO-8601 serialization ≈ reference requests.rs:35-37."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
