"""Driver-side filesystem/metadata helpers shared by the pipeline,
DLQ, and table-maintenance modules.

Every row/size question is answered from the ``_FILES.json`` manifests
written at commit time (streaming/commit.py) whenever one is present —
parquet footers are opened ONLY for legacy manifest-less directories.
At a 100 TB batch (~10⁶ files) per-batch footer re-walks are minutes of
serial driver I/O; manifest reads are one small JSON per batch dir.
``FOOTER_OPENS`` counts the fallback opens so tests can PROVE the
manifest path never touches a footer.
"""

from __future__ import annotations

import os

#: number of parquet-footer opens taken by the fallback path since the
#: last ``reset_footer_opens`` — tests assert this stays 0 on
#: manifest-bearing layouts
FOOTER_OPENS = 0


def reset_footer_opens() -> None:
    global FOOTER_OPENS
    FOOTER_OPENS = 0


def footer_num_rows(path: str) -> int:
    """Row count of one parquet file from its footer (counted)."""
    global FOOTER_OPENS
    import pyarrow.parquet as pq

    FOOTER_OPENS += 1
    return pq.ParquetFile(path).metadata.num_rows


def _dir_manifest_rows(d: str) -> int | None:
    from logfowd2_spark.streaming.commit import manifest_rows

    return manifest_rows(d)


def tree_num_rows(path: str) -> int:
    """Total rows under ``path``.  A directory carrying a ``_FILES.json``
    manifest contributes its manifest-recorded row count (stats when
    present, else footer reads of exactly the referenced files) and its
    subtree is NOT walked further — the manifest is the logical content,
    and a raw walk would also count files a deferred vacuum has not yet
    reaped.  Manifest-less directories fall back to footer reads."""
    n = 0
    for r, dirs, files in os.walk(path):
        man = _dir_manifest_rows(r)
        if man is not None:
            n += man
            dirs[:] = []  # manifest covers the whole subtree
            continue
        for fn in files:
            if fn.endswith(".parquet") and not fn.startswith("."):
                n += footer_num_rows(os.path.join(r, fn))
    return n


def tree_num_files(path: str) -> int:
    """Data-file count under ``path`` — manifest-resolved like
    ``tree_num_rows`` (the file COUNT needs no footer either way; the
    manifest still wins because it names the logical generation)."""
    from logfowd2_spark.streaming.commit import read_file_manifest

    n = 0
    for r, dirs, files in os.walk(path):
        man = read_file_manifest(r)
        if man is not None:
            n += len(man["files"])
            dirs[:] = []
            continue
        n += sum(
            1 for fn in files
            if fn.endswith(".parquet") and not fn.startswith(".")
        )
    return n
