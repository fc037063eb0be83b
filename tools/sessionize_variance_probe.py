"""events_sessionize sf2.5 variance experiment (VERDICT r12 #6).

The r12 record: sessionize at sf2.5 ranged 0.9–4.3 s across bench
takes with an unchanged one-Exchange plan. Two candidate causes were
named: window-state memory (spill) or the lack of user-key
pre-partitioning. This probe A/Bs the window-buffer confs interleaved
against defaults, and separately measures the spread with and without
the bench's System.gc() settle.

r13 measured record (12 interleaved rounds each, sf2.5 = 2.5 M events,
max 99 / avg 66.7 events per user):

  default + settle : best 0.849  med 1.202  max 1.543  (spread 0.69)
  tuned   + settle : best 0.917  med 1.118  max 1.466  (spread 0.55)
      (tuned = windowExec.buffer.in.memory.threshold 1M,
               windowExec.buffer.spill.threshold 128M)
  default no-settle: best 0.727  med 0.810  max 1.176  (spread 0.45)

Conclusions (the committed postmortem):
  1. Window-state memory is NOT the term: the largest per-user group
     is 99 rows — 2% of the default 4096-row in-memory threshold —
     so WindowExec never spills at this scale, and raising the
     thresholds moves nothing outside noise.
  2. The spread is engine-side GC/JIT variance, not the plan: the
     plan is identical across every take (1 Exchange), and the
     biggest mover is whether a forced full GC lands near the timed
     window — the System.gc() settle, which exists to keep the
     PREVIOUS query's debt out of the next query's window in the long
     pairwise sweep, itself costs ~0.3 s median when the same query
     repeats in isolation.
  3. Pre-partitioning events by user_id (a bucketed events layout
     leg) would remove the one Exchange but not the GC term that
     actually moves the number — not worth a new layout leg.

Usage: python tools/sessionize_variance_probe.py [sf_dir]
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
    from columnar_database_project_spark.operators.events import (
        q_events_sessionize,
    )
    from columnar_database_project_spark.session import (
        get_spark,
        tune_for_scale,
    )

    sf = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".bench_data", "sf2.5"
    )
    spark = get_spark(
        "sessvar", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_scale(spark, sf)
    ev = load_table(spark, sf, "events")
    stats = (
        ev.groupBy("user_id")
        .count()
        .agg(F.max("count"), F.avg("count"))
        .collect()[0]
    )
    print(f"events rows={ev.count()} max/user={stats[0]} avg/user={stats[1]:.1f}")

    def run() -> float:
        t0 = time.time()
        q_events_sessionize(spark, sf).toPandas()
        return time.time() - t0

    def setconf(tuned: bool) -> None:
        if tuned:
            spark.conf.set(
                "spark.sql.windowExec.buffer.in.memory.threshold", str(1 << 20)
            )
            spark.conf.set(
                "spark.sql.windowExec.buffer.spill.threshold", str(1 << 27)
            )
        else:
            spark.conf.unset("spark.sql.windowExec.buffer.in.memory.threshold")
            spark.conf.unset("spark.sql.windowExec.buffer.spill.threshold")

    def gc_settle() -> None:
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # pragma: no cover - defensive
            pass

    for t in (False, True):
        setconf(t)
        q_events_sessionize(spark, sf).toPandas()  # warm both plans
    res: dict[bool, list[float]] = {False: [], True: []}
    for _ in range(12):  # interleaved: window drift → within-pair
        for t in (False, True):
            setconf(t)
            gc_settle()
            res[t].append(round(run(), 3))
    for t in (False, True):
        arr = res[t]
        print(f"{'tuned  ' if t else 'default'} takes={arr}")
        print(
            f"   best={min(arr):.3f} med={sorted(arr)[len(arr) // 2]:.3f} "
            f"max={max(arr):.3f} spread={max(arr) - min(arr):.3f}"
        )
    setconf(False)
    nos = [round(run(), 3) for _ in range(12)]
    print(f"default-no-settle takes={nos}")
    print(
        f"   best={min(nos):.3f} med={sorted(nos)[len(nos) // 2]:.3f} "
        f"max={max(nos):.3f}"
    )


if __name__ == "__main__":
    main()
