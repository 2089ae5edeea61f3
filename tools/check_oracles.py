"""Local stand-in for the driver's correctness gate: run every catalog
query on Spark AND its DuckDB oracle at sf0.01, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logfowd2_spark.plans import catalog  # noqa: E402
from logfowd2_spark.plans.compare import canon  # noqa: E402
from logfowd2_spark.session import build_session  # noqa: E402


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    spark = build_session(master="local[8]", shuffle_partitions=8,
                          extra_conf={"spark.driver.memory": "6g"})
    con = duckdb.connect()
    for t in catalog.TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    selected = names or list(qs)
    failures = 0
    for name in selected:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc(limit=3)
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc(limit=3)
            failures += 1
            continue
        cs, co = canon(sdf), canon(odf)
        if list(cs.columns) != list(co.columns):
            print(f"FAIL  {name}: columns {list(cs.columns)} vs {list(co.columns)}")
            failures += 1
            continue
        if len(cs) != len(co):
            print(f"FAIL  {name}: rows {len(cs)} vs {len(co)}")
            failures += 1
            continue
        if not cs.equals(co):
            neq = (cs != co).any(axis=1)
            print(f"FAIL  {name}: {int(neq.sum())}/{len(cs)} rows differ; first:")
            print(pd.concat([cs[neq].head(3), co[neq].head(3)], keys=["spark", "duck"]))
            failures += 1
            continue
        print(f"OK    {name}: {len(cs)} rows")
    print(f"\n{len(selected) - failures}/{len(selected)} queries match")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
