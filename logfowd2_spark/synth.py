"""Deterministic synthetic data generator (FIXTURES.md §1-§3).

Generates the pipeline's input tables seeded and wall-clock-free, so the
Spark pipeline and the pandas test oracle agree bit-for-bit:

- ``sequences`` (doc_id, tokens: array<int32>, n_tok, source) — byte-level
  token encoding of synthetic kubelet-style log lines in the shape the
  reference's regexes consume (reference src/watcher.rs:31):
  ``<iso8601-ts> <LEVEL> /var/log/pods/<ns>_<pod>_<pid>/<ctr>/0.log <body>``
- ``pods`` — the k8s metadata enrichment dimension
  (≈ the metadata the reference extracts per path, watcher.rs:595-638).
- ``routes`` — the (source, level) → sink_id routing map (generalizing
  the reference's daily ES index routing, pool.rs:856-865).

Skew is injected on purpose: one namespace (``ns-hot``) owns ~40% of the
rows and one source dominates, so salting/AQE handling is exercised even
at test scale.  ~2% of rows carry corruption (NUL bytes, oversized body,
structural damage) to drive the sanitize/truncate kernels and the DLQ.
The reference stamps wall-clock time per event (src/domain/event.rs:23);
here every timestamp derives from the row index — determinism is the
whole point.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from logfowd2_spark.codec import TOKEN_OFFSET
from logfowd2_spark.config import DEFAULT_ROUTES

SOURCES = np.array(["app", "ingress", "sidecar", "batch", "system"])
SOURCE_WEIGHTS = np.array([0.45, 0.20, 0.15, 0.12, 0.08])
LEVELS = np.array(["DEBUG", "INFO", "WARN", "ERROR", "FATAL"])
LEVEL_WEIGHTS = np.array([0.25, 0.45, 0.15, 0.12, 0.03])
NAMESPACES = np.array(
    ["ns-hot"] + [f"ns-{i}" for i in range(1, 12)]
)
CONTAINERS = np.array(
    ["main", "sidecar-proxy", "init", "logger", "exporter", "agent"]
)
WORKLOADS = np.array(["deployment", "statefulset", "daemonset"])
VOCAB = np.array(
    (
        "request served handler latency cache miss hit retry timeout "
        "connection closed opened queue depth flush batch commit offset "
        "replica leader follower election snapshot compact merge scan "
        "token sequence parse route enrich aggregate shuffle partition"
    ).split()
)

#: bump when generation rules change — versions external data caches
GEN_VERSION = 2

BASE_TS = np.datetime64("2024-03-01T00:00:00")
HOT_NAMESPACE_FRAC = 0.40  # rows forced into ns-hot (skew)
DIM_MISS_FRAC = 0.03       # rows whose pod_id is absent from pods
CORRUPT_STRUCT_FRAC = 0.010  # structural damage → parse failure (DLQ)
CORRUPT_NUL_FRAC = 0.005     # NUL bytes in body → sanitized, still parses
CORRUPT_LONG_FRAC = 0.005    # oversized body → truncated, still parses
FRAC_TS_FRAC = 0.005         # fractional-seconds timestamp → valid, parses


def gen_pods(n_pods: int = 200, seed: int = 42) -> pd.DataFrame:
    """The enrichment dimension (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed)
    j = np.arange(n_pods)
    ns = NAMESPACES[rng.integers(0, len(NAMESPACES), n_pods)]
    # guarantee ns-hot owns a healthy share of pods
    ns[: n_pods // 5] = "ns-hot"
    return pd.DataFrame(
        {
            "pod_id": [f"pid-{x:06x}" for x in j],
            "pod_name": [f"pod-{x}" for x in j],
            "namespace": ns,
            "container_name": CONTAINERS[rng.integers(0, len(CONTAINERS), n_pods)],
            "node": [f"node-{x % 8}" for x in j],
            "workload_kind": WORKLOADS[rng.integers(0, len(WORKLOADS), n_pods)],
            "labels_json": [f'{{"team":"t{x % 7}","tier":"{x % 3}"}}' for x in j],
        }
    )


def gen_routes() -> pd.DataFrame:
    """The (source, level) → sink routing map (FIXTURES.md §3)."""
    return pd.DataFrame(DEFAULT_ROUTES, columns=["source", "level", "sink_id"])


def _weighted_pick(rng, options: np.ndarray, weights: np.ndarray, n: int) -> np.ndarray:
    return options[rng.choice(len(options), size=n, p=weights / weights.sum())]


def gen_lines(n_rows: int, pods: pd.DataFrame, seed: int = 42,
              oversize_len: int = 6000) -> pd.DataFrame:
    """Generate raw log lines + ground-truth columns (pre-encoding)."""
    rng = np.random.default_rng(seed + 1)
    i = np.arange(n_rows)

    ts = BASE_TS + i.astype("timedelta64[s]")
    ts_str = np.datetime_as_string(ts, unit="s")
    # object dtype so the fractional-ts injection below can lengthen rows
    ts_str = np.char.add(ts_str, "Z").astype(object)

    level = _weighted_pick(rng, LEVELS, LEVEL_WEIGHTS, n_rows)
    source = _weighted_pick(rng, SOURCES, SOURCE_WEIGHTS, n_rows)

    # pick pods, forcing hot-namespace skew
    hot_pods = pods.index[pods["namespace"] == "ns-hot"].to_numpy()
    pod_idx = rng.integers(0, len(pods), n_rows)
    hot_mask = rng.random(n_rows) < HOT_NAMESPACE_FRAC
    if len(hot_pods):
        pod_idx[hot_mask] = hot_pods[rng.integers(0, len(hot_pods), hot_mask.sum())]
    prow = pods.iloc[pod_idx].reset_index(drop=True)
    pod_id = prow["pod_id"].to_numpy().copy()
    # dim-miss rows: pod_id not present in the dimension
    miss_mask = rng.random(n_rows) < DIM_MISS_FRAC
    pod_id[miss_mask] = np.array([f"pid-x{k:05x}" for k in np.flatnonzero(miss_mask)])

    # message body: 3-12 vocab words, deterministic
    n_words = rng.integers(3, 13, n_rows)
    word_ids = rng.integers(0, len(VOCAB), (n_rows, 12))
    bodies = [" ".join(VOCAB[word_ids[r, : n_words[r]]]) for r in range(n_rows)]
    bodies = np.array(bodies, dtype=object)

    # corruption injection (disjoint classes, deterministic)
    u = rng.random(n_rows)
    struct_mask = u < CORRUPT_STRUCT_FRAC
    nul_mask = (u >= CORRUPT_STRUCT_FRAC) & (u < CORRUPT_STRUCT_FRAC + CORRUPT_NUL_FRAC)
    long_mask = (
        (u >= CORRUPT_STRUCT_FRAC + CORRUPT_NUL_FRAC)
        & (u < CORRUPT_STRUCT_FRAC + CORRUPT_NUL_FRAC + CORRUPT_LONG_FRAC)
    )
    _c3 = CORRUPT_STRUCT_FRAC + CORRUPT_NUL_FRAC + CORRUPT_LONG_FRAC
    frac_ts_mask = (u >= _c3) & (u < _c3 + FRAC_TS_FRAC)
    # grammar-valid variant: ISO-8601 with fractional seconds (the ts
    # regex accepts it; the engine must parse it, not quarantine it)
    for r in np.flatnonzero(frac_ts_mask):
        ts_str[r] = ts_str[r][:-1] + ".123Z"
    for r in np.flatnonzero(nul_mask):
        bodies[r] = bodies[r] + " \x00\x00corrupt\x00 tail"
    for r in np.flatnonzero(long_mask):
        bodies[r] = bodies[r] + " " + ("x" * oversize_len)

    path = (
        "/var/log/pods/"
        + prow["namespace"].astype(str)
        + "_"
        + prow["pod_name"].astype(str)
        + "_"
        + pd.Series(pod_id)
        + "/"
        + prow["container_name"].astype(str)
        + "/0.log"
    )
    ts_s = pd.Series(ts_str.astype(object))
    body_s = pd.Series(bodies).astype(str)
    lines = ts_s + " " + pd.Series(level) + " " + path + " " + body_s
    # structural damage: drop the level token entirely → regex cannot match
    damaged = ts_s + " " + path + " " + body_s
    lines = np.where(struct_mask, damaged, lines)

    return pd.DataFrame(
        {
            "doc_id": [f"doc-{x:012d}" for x in i],
            "line": lines,
            "source": source,
            # ground truth for the oracle:
            "_true_level": np.where(struct_mask, "", level),
            "_true_pod_id": pod_id,
            "_struct_corrupt": struct_mask,
            "_nul_corrupt": nul_mask,
            "_long_corrupt": long_mask,
        }
    )


def encode_frame(lines: pd.Series) -> tuple[list, np.ndarray]:
    """Encode a string Series to (token arrays, n_tok) via the byte codec."""
    from logfowd2_spark.codec import encode_lines_arrow

    toks = encode_lines_arrow(lines)
    n_tok = np.array([len(t) for t in toks], dtype=np.int32)
    return list(toks), n_tok


def gen_sequences(n_rows: int, pods: pd.DataFrame, seed: int = 42) -> pd.DataFrame:
    """Full sequences table (FIXTURES.md §1): doc_id, tokens, n_tok, source."""
    raw = gen_lines(n_rows, pods, seed)
    tokens, n_tok = encode_frame(raw["line"])
    return pd.DataFrame(
        {
            "doc_id": raw["doc_id"],
            "tokens": tokens,
            "n_tok": n_tok,
            "source": raw["source"],
        }
    )


SEQUENCES_ARROW_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)


def write_dataset(out_dir: str, n_rows: int = 2000, seed: int = 42,
                  n_files: int = 4) -> dict[str, str]:
    """Materialize sequences/pods/routes as parquet under ``out_dir``.

    ``sequences`` is split into ``n_files`` parquet files (the unit of
    scan parallelism, standing in for Iceberg bucket(16, doc_id) files).
    """
    os.makedirs(out_dir, exist_ok=True)
    pods = gen_pods(seed=seed)
    seq = gen_sequences(n_rows, pods, seed)

    seq_dir = os.path.join(out_dir, "sequences")
    os.makedirs(seq_dir, exist_ok=True)
    tbl = pa.Table.from_pandas(seq, schema=SEQUENCES_ARROW_SCHEMA, preserve_index=False)
    step = (n_rows + n_files - 1) // n_files
    for f in range(n_files):
        sl = tbl.slice(f * step, step)
        if sl.num_rows:
            pq.write_table(sl, os.path.join(seq_dir, f"part-{f:05d}.parquet"))

    pods_path = os.path.join(out_dir, "pods.parquet")
    pq.write_table(pa.Table.from_pandas(pods, preserve_index=False), pods_path)
    routes_path = os.path.join(out_dir, "routes.parquet")
    pq.write_table(pa.Table.from_pandas(gen_routes(), preserve_index=False), routes_path)
    return {"sequences": seq_dir, "pods": pods_path, "routes": routes_path}
