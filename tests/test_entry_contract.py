"""Driver-contract tests for __spark_entry__ (smoke + sampled oracle
parity at sf0.001, the fast tier)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from logfowd2_spark.plans import catalog  # noqa: E402
from logfowd2_spark.plans.compare import frames_match  # noqa: E402

SF = "/root/testdata/sf0.001"

# fast representatives across the catalog families
SAMPLED = [
    "flagship_pipeline",
    "pipe_route_by_source_level",
    "q1_pricing_summary",
    "window_top3_per_group",
    "dedup_exact_fingerprint",
    "ann_cosine_topk",
]


def test_oracle_keys_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    # every query family should be oracle-checked unless non-SQL
    assert len(os_) >= 25


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sink_id" in df.columns and "event_count" in df.columns


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in catalog.TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.mark.parametrize("name", SAMPLED)
def test_sampled_query_matches_oracle(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF).toPandas()
    odf = duck.sql(entrymod.oracle_sql()[name]).df()
    ok, why = frames_match(sdf, odf)
    assert ok, f"{name}: {why}"


def test_query_aliases_resolve():
    """Names removed in the round-4 catalog consolidation keep a
    documented deprecation path: resolve_query follows QUERY_ALIASES to
    the absorbing registered query instead of raising KeyError."""
    for old, new in catalog.QUERY_ALIASES.items():
        assert old not in catalog.queries()          # stays unregistered
        assert new in catalog.queries()              # target is live
        assert catalog.resolve_query(old) is catalog.queries()[new]
        assert catalog.resolve_oracle(old) == catalog.oracle_sql()[new]
    # a registered name resolves to itself
    assert (catalog.resolve_query("flagship_pipeline")
            is catalog.queries()["flagship_pipeline"])
