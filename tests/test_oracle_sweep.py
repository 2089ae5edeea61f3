"""Full-catalog oracle sweep as a local CI gate: every registered query
runs on Spark AND its DuckDB oracle at sf0.001, compared with the same
row-count + schema + order-insensitive value semantics as the driver's
correctness gate — so a regression is caught locally BEFORE the round
gate.  Marked ``oracle_sweep`` (deselected by default, see pytest.ini);
run with ``pytest -m oracle_sweep``."""

import os

import duckdb
import pytest

from logfowd2_spark.plans import catalog
from logfowd2_spark.plans.compare import frames_match

SF = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.oracle_sweep

ALL_QUERIES = sorted(catalog.queries())


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in catalog.TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def test_catalog_is_fully_registered():
    qs, os_ = catalog.queries(), catalog.oracle_sql()
    assert len(qs) == 50  # the driver checks exactly the first 50
    assert set(os_) <= set(qs)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    sdf = catalog.queries()[name](spark, SF).toPandas()
    if name not in catalog.oracle_sql():
        # non-SQL-expressible op: the driver records a rows-only check
        assert len(sdf) >= 0
        return
    odf = duck.sql(catalog.oracle_sql()[name]).df()
    ok, why = frames_match(sdf, odf)
    assert ok, f"{name}: {why}"
