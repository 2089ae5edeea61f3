"""Driver-side filesystem/metadata helpers shared by the pipeline,
DLQ, and table-maintenance modules (parquet-footer reads, never Spark
jobs)."""

from __future__ import annotations

import os


def tree_num_rows(path: str) -> int:
    """Total rows across every parquet file under ``path`` (footers)."""
    import pyarrow.parquet as pq

    n = 0
    for r, _d, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet") and not fn.startswith("."):
                n += pq.ParquetFile(os.path.join(r, fn)).metadata.num_rows
    return n


def tree_num_files(path: str) -> int:
    return sum(
        1 for _r, _d, files in os.walk(path)
        for fn in files if fn.endswith(".parquet") and not fn.startswith(".")
    )
