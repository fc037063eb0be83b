"""Multi-table catalog over a directory of Parquet files.

The reference engine is single-table by construction (one Parquet file
registered as one DuckDB view, reference query_enginev5.py:30-39,
:55-58) — joins beyond self-joins are unreachable. We generalize to a
real catalog of temp views, which also fixes the reference's blind
``sql.replace(table_name, ...)`` rewrite bug (query_enginev5.py:302):
Spark resolves table names through the catalog, never via string
substitution.
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow.parquet as _pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_ts_columns(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) (Spark reads
    them as raw long nanos under ``nanosAsLong`` — we convert back)."""
    try:
        schema = _pq.read_schema(path)
    except Exception:
        return []
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table from ``sf_dir`` (a file or a directory of parts).

    Nanosecond-precision parquet timestamps (unsupported by Spark) are
    read as long nanos and truncated to microsecond timestamps —
    integer DIV keeps full precision (a double division would lose
    bits past 2^53).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for c in _nanos_ts_columns(path):
        df = df.withColumn(c, F.expr(f"timestamp_micros(CAST(`{c}` DIV 1000 AS BIGINT))"))
    return df


def register_dir(
    spark: SparkSession,
    table_dir: str,
    tables: tuple[str, ...] | None = None,
) -> dict[str, DataFrame]:
    """Register every ``<name>.parquet`` under ``table_dir`` as a temp view.

    Returns name → DataFrame. Unknown extra files are ignored; with
    ``tables`` given, only those are registered.
    """
    out: dict[str, DataFrame] = {}
    wanted = set(tables) if tables else None
    for p in sorted(Path(table_dir).glob("*.parquet")):
        name = p.stem
        if wanted is not None and name not in wanted:
            continue
        df = load_table(spark, table_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
