"""topk floor decomposition at sf2.5 (VERDICT r12 #3).

topk is the last headline path without a term-attribution postmortem
(q1 got one in r10, q5 in r12). Terms measured (best-of-5, warmed,
noop sink per guide §1.4 so sink cost never pollutes attribution):

  empty_scan   — lineitem aggregate under a never-true pushed filter:
                 the fixed plan-submit/scan-machinery floor.
  li_project   — scan+project+reduce of the three columns topk reads
                 (l_orderkey, l_linenumber, l_extendedprice): the pure
                 data term. TakeOrderedAndProject cannot cost less
                 than this — every row must be read and compared.
  takeordered  — the registry topk plan through the noop sink: adds
                 the per-partition top-10 heap + driver-side merge.
  full_topk    — the registry query via toPandas (as benched): adds
                 the 10-row Arrow result fetch.

Run twice — flat, and with the bucketed layout override active
(materialize_fact_layout) — to attribute the bucketed leg's residual:
if takeordered − li_project ≈ 0 and li_project − empty_scan is the
scan term, the path is floor-plus-scan and there is nothing left to
optimize in local mode (the r10 q1 conclusion, now with topk's own
numbers).

Usage: python tools/topk_floor_decomp.py [sf_dir] [--bucketed]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from columnar_database_project_spark.catalog import load_table
    from columnar_database_project_spark.operators.relational import q_topk
    from columnar_database_project_spark.plans.verify import count_shuffles
    from columnar_database_project_spark.session import (
        get_spark,
        tune_for_scale,
    )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bucketed = "--bucketed" in sys.argv[1:]
    sf = args[0] if args else os.path.join(REPO, ".bench_data", "sf2.5")
    spark = get_spark(
        "topk_floor_decomp",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_scale(spark, sf)
    if bucketed:
        from columnar_database_project_spark.sources.bucketed import (
            materialize_fact_layout,
        )

        base = os.path.join(
            REPO,
            ".bench_data",
            f"fact_layout_{os.path.basename(sf.rstrip('/'))}",
        )
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
    empty = li.filter(F.col("l_quantity") > F.lit(10_000_000)).agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("s")
    )
    # NOTE (r13 finding): with spark.sql.parquet.aggregatePushdown on
    # (this engine's default), plain sums/counts over a scan answer
    # from footer statistics — the arithmetic below BLOCKS the
    # pushdown so this term measures a real vectorized read of the
    # three columns topk touches.
    sel = li.select("l_orderkey", "l_linenumber", "l_extendedprice")
    proj = sel.agg(
        F.sum(
            F.col("l_extendedprice")
            + F.col("l_orderkey")
            + F.col("l_linenumber")
        ).alias("s")
    )

    def plain_topk():
        # the pre-r13 registry shape: TakeOrderedAndProject over EVERY
        # row (per-row heap on a ColumnarToRow feed)
        return (
            sel.orderBy(
                F.col("l_extendedprice").desc(),
                F.col("l_orderkey"),
                F.col("l_linenumber"),
            ).limit(10)
        )

    spark.sparkContext.setJobDescription("topk decomp: empty_scan")
    t_empty = best5_noop(empty)
    spark.sparkContext.setJobDescription("topk decomp: li_vector_scan")
    t_proj = best5_noop(proj)
    spark.sparkContext.setJobDescription("topk decomp: plain takeordered")
    t_plain = best5_pd(lambda: plain_topk())
    spark.sparkContext.setJobDescription("topk decomp: registry topk")
    t_full = best5_pd(lambda: q_topk(spark, sf))
    spark.sparkContext.setJobDescription(None)

    df = q_topk(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    print(f"layout          : {'bucketed' if bucketed else 'flat'}")
    print(f"exchanges(topk) : {count_shuffles(df)}")
    print(
        "TakeOrderedAndProject in plan : "
        f"{'TakeOrderedAndProject' in plan}"
    )
    print(f"empty_scan      : {t_empty}")
    print(f"li_vector_scan  : {t_proj}  (+{round(t_proj - t_empty, 3)} vectorized data term)")
    print(
        f"plain_takeorder : {t_plain}  "
        f"(+{round(t_plain - t_proj, 3)} row-at-a-time heap term)"
    )
    print(
        f"registry_topk   : {t_full}  "
        f"({round(t_plain - t_full, 3)} saved by the r13 price-floor prefilter)"
    )


if __name__ == "__main__":
    main()
