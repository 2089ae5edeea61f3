"""Order-insensitive DataFrame comparison used by the oracle checker and
the pytest contract tests (a local stand-in for the driver's
row-count + schema + value-hash gate)."""

from __future__ import annotations

import pandas as pd


def canon_val(v):
    import datetime
    import decimal

    import numpy as np

    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return format(v, "f")
    if isinstance(v, (float, np.floating)):
        return f"{float(v):.12g}"
    if isinstance(v, (datetime.datetime, pd.Timestamp)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_val(x) for x in v) + "]"
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        df[c] = df[c].map(canon_val)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def frames_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    ca, cb = canon(a), canon(b)
    if list(ca.columns) != list(cb.columns):
        return False, f"columns {list(ca.columns)} vs {list(cb.columns)}"
    if len(ca) != len(cb):
        return False, f"rows {len(ca)} vs {len(cb)}"
    if not ca.equals(cb):
        neq = (ca != cb).any(axis=1)
        return False, f"{int(neq.sum())}/{len(ca)} rows differ"
    return True, "ok"
