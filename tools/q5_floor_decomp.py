"""q5 last-mile floor decomposition at sf2.5 (VERDICT r11 #4).

With the denorm orders⋈customer leg active, what does the residual
bucketed-q5 wall consist of?  Terms measured (best-of-5, warmed, noop
sink per guide §1.4 so the sink cost never pollutes attribution):

  empty_scan   — lineitem aggregate under a never-true pushed filter:
                 the fixed plan-submit/scan-machinery floor.
  li_project   — scan+project+sum of the three lineitem columns q5
                 reads (no join): the pure fact-side data term.
  li_leg_join  — lineitem ⋈ leg (bucketed, zero-Exchange) + count-sum:
                 adds the co-located join term.
  full_q5      — the registry query (toPandas, as benched).

full_q5 − li_leg_join ≈ supplier attach + n_name agg + result fetch.

Usage: python tools/q5_floor_decomp.py [sf_dir] [--forced]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from columnar_database_project_spark.catalog import (
        get_layout_override,
        load_table,
    )
    from columnar_database_project_spark.operators.relational import (
        _region_nation_keys,
        q5_local_supplier_volume,
    )
    from columnar_database_project_spark.plans.verify import count_shuffles
    from columnar_database_project_spark.session import (
        get_spark,
        tune_for_scale,
    )
    from columnar_database_project_spark.sources.bucketed import (
        DENORM_NAME,
        materialize_fact_layout,
    )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    forced = "--forced" in sys.argv[1:]
    sf = args[0] if args else os.path.join(REPO, ".bench_data", "sf2.5")
    base = os.path.join(
        REPO, ".bench_data", f"fact_layout_{os.path.basename(sf.rstrip('/'))}"
    )
    spark = get_spark(
        "q5_floor_decomp",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_scale(spark, sf)
    if forced:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    materialize_fact_layout(spark, sf, base)

    def best5_noop(df) -> float:
        df.write.format("noop").mode("overwrite").save()
        df.write.format("noop").mode("overwrite").save()
        b = float("inf")
        for _ in range(5):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            b = min(b, time.time() - t0)
        return round(b, 3)

    def best5_pd(mk) -> float:
        mk().toPandas()
        mk().toPandas()
        b = float("inf")
        for _ in range(5):
            t0 = time.time()
            mk().toPandas()
            b = min(b, time.time() - t0)
        return round(b, 3)

    li = load_table(spark, sf, "lineitem")
    keys, _names = _region_nation_keys(sf, "ASIA")

    empty = li.filter(F.col("l_quantity") > F.lit(10_000_000)).agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("s")
    )
    proj = li.select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    ).agg(F.sum("rev").alias("s"), F.sum("l_suppkey").alias("k"))

    leg_src = get_layout_override(spark, sf, DENORM_NAME)
    assert leg_src is not None, "denorm leg missing"
    leg = (
        leg_src.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("c_nationkey").isin(keys)
        ).select("o_orderkey", "c_nationkey")
    )
    li_slim = load_table(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    joined = li_slim.join(leg, F.col("l_orderkey") == F.col("o_orderkey")).agg(
        F.sum("rev").alias("s"), F.count(F.lit(1)).alias("n")
    )

    spark.sparkContext.setJobDescription("q5 decomp: empty_scan")
    t_empty = best5_noop(empty)
    spark.sparkContext.setJobDescription("q5 decomp: li_project")
    t_proj = best5_noop(proj)
    spark.sparkContext.setJobDescription("q5 decomp: li_leg_join")
    t_join = best5_noop(joined)
    spark.sparkContext.setJobDescription("q5 decomp: full_q5")
    t_full = best5_pd(lambda: q5_local_supplier_volume(spark, sf))
    spark.sparkContext.setJobDescription(None)

    q5_df = q5_local_supplier_volume(spark, sf)
    print(f"regime          : {'forced' if forced else 'aqe'}")
    print(f"exchanges(q5)   : {count_shuffles(q5_df)}")
    print(f"empty_scan      : {t_empty}")
    print(f"li_project      : {t_proj}  (+{round(t_proj - t_empty, 3)} data term)")
    print(f"li_leg_join     : {t_join}  (+{round(t_join - t_proj, 3)} join term)")
    print(f"full_q5         : {t_full}  (+{round(t_full - t_join, 3)} supp+agg+fetch)")


if __name__ == "__main__":
    main()
