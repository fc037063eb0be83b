"""A/B harness for q5 plan variants at SMALL scale (sf0.1 default).

The r9 semi-reduce plan won at sf2.5 (1.61 -> 1.38 s) but its ~8
dependent stages pay job-launch latency that dominates at latency
scale: the r9 clean bench recorded q5 at 0.934 s @ sf0.1 where the
pre-r9 shape ran ~0.29 s, dragging the headline gate from ~1.7x to
2.0x. This harness times the candidate shapes under the SAME session
tuning bench_spark applies, parity-checked. Usage:

    python tools/ab_q5_small.py [sf_dir]
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
from columnar_database_project_spark.session import (  # noqa: E402
    get_spark,
    tune_for_scale,
)
from tools.ab_q5 import v1_semi_reduce  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def v_old(spark, sf_dir):
    """Pre-r9 shape: fact joins on full-width rows, nationkey filter
    last, nation/region broadcast at the end."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def v_hybrid(spark, sf_dir):
    """Old join order (li->orders->cust->supp, nationkey filter after)
    but with slim column projections and the ASIA filter pushed into
    customer/supplier via broadcast semi joins (map-side, no extra
    stage barrier)."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    nat = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nat.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum("rev"), 4).alias("revenue"))
    )


def main() -> None:
    spark = get_spark(
        "ab_q5_small", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_scale(spark, SF_DIR)
    variants = {
        "current": q5_local_supplier_volume,
        "v1_semi_reduce": v1_semi_reduce,
        "v_old": v_old,
        "v_hybrid": v_hybrid,
    }
    ref = None
    for name, fn in variants.items():
        rows = {r["n_name"]: r["revenue"] for r in fn(spark, SF_DIR).collect()}
        if ref is None:
            ref = rows
        else:
            assert set(rows) == set(ref), (name, set(rows) ^ set(ref))
            for k in rows:
                assert abs(rows[k] - ref[k]) < 1e-2, (name, k, rows[k], ref[k])
        times = []
        for _ in range(5):
            t0 = time.time()
            fn(spark, SF_DIR).toPandas()
            times.append(time.time() - t0)
        print(
            f"{name:16s} best {min(times):.3f}s  all {[round(t, 3) for t in times]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
