"""A/B harness for q5_local_supplier_volume plan variants at sf2.5.

Best-of-3 warmed wall-clock per variant, parity-checked against the
current implementation. Usage: python tools/ab_q5.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from columnar_database_project_spark.catalog import load_table  # noqa: E402
from columnar_database_project_spark.operators.relational import (  # noqa: E402
    q5_local_supplier_volume,
)
from columnar_database_project_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO, ".bench_data", "sf2.5"
)


def _asia_nation(spark, sf_dir):
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")


def _orders_filtered(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )


def v1_semi_reduce(spark, sf_dir):
    """Dims-reduce-facts-first: ASIA filter pushed into customer and
    supplier BEFORE any fact join; all join sides pre-projected to key
    columns."""
    nat = _asia_nation(spark, sf_dir)
    supp_slim = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust_slim = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nat.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
    )
    orders_slim = (
        _orders_filtered(spark, sf_dir)
        .select("o_orderkey", "o_custkey")
        .join(cust_slim, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    return (
        li.join(orders_slim, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp_slim,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum("rev"), 4).alias("revenue"))
    )


def v2_supp_first(spark, sf_dir):
    """Like v1 but lineitem resolves the supplier nation first (supp
    side broadcastable), then the orders join carries the
    c_nationkey = s_nationkey condition."""
    nat = _asia_nation(spark, sf_dir)
    supp_slim = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust_slim = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nat.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
    )
    orders_slim = (
        _orders_filtered(spark, sf_dir)
        .select("o_orderkey", "o_custkey")
        .join(cust_slim, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    return (
        li.join(supp_slim, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders_slim,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum("rev"), 4).alias("revenue"))
    )


def v3_preagg(spark, sf_dir):
    """v1 plus a (l_suppkey, c_nationkey) partial rollup before the
    supplier join — the fact side entering the last join carries at
    most |supplier|×|ASIA nations| rows."""
    nat = _asia_nation(spark, sf_dir)
    supp_slim = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust_slim = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nat.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
    )
    orders_slim = (
        _orders_filtered(spark, sf_dir)
        .select("o_orderkey", "o_custkey")
        .join(cust_slim, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    rolled = (
        li.join(orders_slim, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_suppkey", "c_nationkey")
        .agg(F.sum("rev").alias("rev"))
    )
    return (
        rolled.join(
            supp_slim,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum("rev"), 4).alias("revenue"))
    )


def main() -> None:
    spark = get_spark("ab_q5")
    variants = {
        "current": q5_local_supplier_volume,
        "v1_semi_reduce": v1_semi_reduce,
        "v2_supp_first": v2_supp_first,
        "v3_preagg": v3_preagg,
    }
    ref = None
    for name, fn in variants.items():
        rows = {
            r["n_name"]: r["revenue"]
            for r in fn(spark, SF_DIR).collect()
        }
        if ref is None:
            ref = rows
        else:
            assert set(rows) == set(ref), (name, set(rows) ^ set(ref))
            for k in rows:
                assert abs(rows[k] - ref[k]) < 1e-2, (name, k, rows[k], ref[k])
        times = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            times.append(time.time() - t0)
        print(f"{name:16s} best {min(times):.3f}s  all {[round(t,3) for t in times]}")
    spark.stop()


if __name__ == "__main__":
    main()
