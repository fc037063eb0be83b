"""A/B q5 (and q3) flat vs the denormalized orders⋈customer layout
leg, in both planner regimes (VERDICT r10 #1 harness).

Regimes:
  aqe    — the proxy-scale regime: AQE size-gates join strategies,
           small sides broadcast.
  forced — autoBroadcastJoinThreshold=-1: every join pays its
           shuffle, the regime a 100 TB fact join actually lives in.

Usage: python tools/ab_q5_layout.py [sf_dir]   (default .bench_data/sf2.5)

r11 record (idle box, best-of-3 warmed, parity-checked in
tests/test_bucketed.py):
    aqe    flat: exchanges=1 best=1.591   bucketed: exchanges=1 best=0.944
    forced flat: exchanges=7 best=6.164   bucketed: exchanges=3 best=0.795
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from columnar_database_project_spark.catalog import (
        clear_layout_overrides,
    )
    from columnar_database_project_spark.operators.relational import (
        q3_shipping_priority,
        q5_local_supplier_volume,
    )
    from columnar_database_project_spark.plans.verify import count_shuffles
    from columnar_database_project_spark.session import (
        get_spark,
        tune_for_scale,
    )
    from columnar_database_project_spark.sources.bucketed import (
        materialize_fact_layout,
    )

    sf = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".bench_data", "sf2.5"
    )
    base = os.path.join(
        REPO, ".bench_data", f"fact_layout_{os.path.basename(sf.rstrip('/'))}"
    )
    spark = get_spark(
        "ab_q5_layout",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_scale(spark, sf)

    def best3(q) -> float:
        q(spark, sf).toPandas()
        q(spark, sf).toPandas()
        b = float("inf")
        for _ in range(3):
            t0 = time.time()
            q(spark, sf).toPandas()
            b = min(b, time.time() - t0)
        return round(b, 3)

    for qname, q in (
        ("q5", q5_local_supplier_volume),
        ("q3", q3_shipping_priority),
    ):
        for regime in ("aqe", "forced"):
            if regime == "forced":
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            else:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            for tag in ("flat", "bucketed"):
                if tag == "flat":
                    clear_layout_overrides(spark, sf)
                else:
                    materialize_fact_layout(spark, sf, base)
                ex = count_shuffles(q(spark, sf))
                print(
                    f"{qname} {regime} {tag}: exchanges={ex} "
                    f"best={best3(q)}",
                    flush=True,
                )
    clear_layout_overrides(spark, sf)


if __name__ == "__main__":
    main()
