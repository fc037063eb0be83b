"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``columnar_database_project_spark``; this
module just re-exports the merged registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from columnar_database_project_spark.operators import all_queries  # noqa: E402
from columnar_database_project_spark.operators.relational import (  # noqa: E402
    q1_pricing_summary,
)

_QUERIES, _ORACLES = all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q1-shaped
    pricing summary (scan → pushed filter → groupBy/agg)."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    genuinely non-SQL-expressible ops → weaker rows-only check)."""
    return dict(_ORACLES)
