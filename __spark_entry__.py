"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship parse→route→aggregate pipeline slice on
sf0.001; ``queries``/``oracle_sql`` expose the full operator catalog
(logfowd2_spark/plans/: pipeline semantics per SURVEY.md §2, relational
coverage per §2.9, and training-data ops) with DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: token-encode synthetic
    log lines from `documents`, decode via the Arrow codec, grok the
    level, route by (source, level), aggregate per sink."""
    from logfowd2_spark.plans.catalog import flagship_pipeline

    return flagship_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from logfowd2_spark.plans import catalog

    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    from logfowd2_spark.plans import catalog

    return catalog.oracle_sql()
