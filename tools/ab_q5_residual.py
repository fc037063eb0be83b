"""q5 residual experiments (VERDICT r11 #4) — A/B the two suggested
restructures of the bucketed q5 tail against the shipped plan, with
exact-parity checks, in both planner regimes.

  current — the registry q5 (denorm leg + broadcast supplier attach,
            groupBy the mapped n_name string).
  intkey  — group the heavy agg on the int s_nationkey, attach the
            name AFTER (narrower agg key, +1 tiny re-group Exchange).
  preagg  — partial-reduce (l_suppkey, c_nationkey) BEFORE the
            supplier join so the suppkey shuffle carries <=|supplier|
            x|nations| rows instead of detail rows (guide s2.3
            "aggregate before you shuffle").

r12 record at sf2.5 (best-of-5 warmed, parity=True everywhere):
  aqe    : current 0.568 (1 Exchange) | intkey 0.612 (2) | preagg 0.737 (3)
  forced : current 0.672 (3)          | intkey 0.683 (4) | preagg 0.931 (4)

r13 adds `preagg_fold` (VERDICT r12 #7: fold the 25-group agg into the
supplier attach — one reduce before ONE broadcast attach carrying
n_name, one final agg). Sequential best-of-5 record at sf2.5:
  aqe    : current 0.556 (1) | intkey 0.484 (2) | preagg 0.556 (3) | fold 0.596 (2)
  forced : current 0.753 (3) | intkey 0.678 (4) | preagg 0.645 (4) | fold 0.616 (3)
The sequential intkey "win" did not survive an INTERLEAVED 12-round
A/B (window drift becomes within-pair): current med 0.515 / best
0.447 < intkey 0.558/0.476 < fold 0.792/0.678. Verdict: honest
negative again in the AQE regime the bench runs — current stays the
registry shape. The fold IS the fastest forced-regime shape (0.616 vs
current 0.753, 1.22x) — like preagg, it is the shape to re-A/B on a
real cluster where no side broadcasts; recorded, not shipped.

Honest negative, both regimes: at proxy scale the extra stage
barriers (~0.1 s each) cost more than the shuffled-byte savings (the
whole detail shuffle is ~4M narrow rows). At true fact scale the
preagg shape is the one to re-A/B (the byte term grows ~linearly,
the barrier term is fixed) — noted in OPTIMIZATION_r12.md; the
registry query keeps the measured-fastest shape.

Usage: python tools/ab_q5_residual.py [--forced]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import functions as F
from columnar_database_project_spark.catalog import get_layout_override, load_table
from columnar_database_project_spark.operators.relational import (
    _region_nation_keys, q5_local_supplier_volume)
from columnar_database_project_spark.plans.verify import count_shuffles
from columnar_database_project_spark.session import get_spark, tune_for_scale
from columnar_database_project_spark.sources.bucketed import DENORM_NAME, materialize_fact_layout

args = [a for a in sys.argv[1:] if not a.startswith("--")]
sf = args[0] if args else os.path.join(REPO, ".bench_data", "sf2.5")
base = os.path.join(
    REPO, ".bench_data", f"fact_layout_{os.path.basename(sf.rstrip('/'))}"
)
spark = get_spark("q5x", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
tune_for_scale(spark, sf)
materialize_fact_layout(spark, sf, base)
forced = "--forced" in sys.argv
if forced:
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

keys, names = _region_nation_keys(sf, "ASIA")
name_map = F.create_map(*[F.lit(x) for k in sorted(keys) for x in (k, names[k])])

def leg():
    src = get_layout_override(spark, sf, DENORM_NAME)
    return (src.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("c_nationkey").isin(keys)).select("o_orderkey", "c_nationkey"))

def li():
    return load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))

def supp_int():
    return (load_table(spark, sf, "supplier")
            .select("s_suppkey", "s_nationkey")
            .filter(F.col("s_nationkey").isin(keys)))

def variant_current():
    return q5_local_supplier_volume(spark, sf)

def variant_intkey():
    # group on the int nationkey; attach the name AFTER the heavy agg
    j = (li().join(leg(), F.col("l_orderkey") == F.col("o_orderkey"))
         .join(supp_int(), (F.col("l_suppkey") == F.col("s_suppkey"))
               & (F.col("c_nationkey") == F.col("s_nationkey"))))
    agg = j.groupBy("s_nationkey").agg(F.sum("rev").alias("r"))
    return (agg.withColumn("n_name", name_map[F.col("s_nationkey")])
            .groupBy("n_name").agg(F.round(F.sum("r"), 4).alias("revenue")))

def variant_preagg():
    # partial-reduce (l_suppkey, c_nationkey) BEFORE the supplier join:
    # the suppkey shuffle then carries <=|suppliers|x|nations| rows
    j = li().join(leg(), F.col("l_orderkey") == F.col("o_orderkey"))
    pre = j.groupBy("l_suppkey", "c_nationkey").agg(F.sum("rev").alias("r"))
    j2 = pre.join(supp_int(), (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
    agg = j2.groupBy("s_nationkey").agg(F.sum("r").alias("r"))
    return (agg.withColumn("n_name", name_map[F.col("s_nationkey")])
            .groupBy("n_name").agg(F.round(F.sum("r"), 4).alias("revenue")))

def variant_preagg_fold():
    # VERDICT r12 #7: fold the 25-group agg INTO the supplier attach —
    # partial-reduce (l_suppkey, c_nationkey) once, then ONE broadcast
    # attach carrying n_name in the build side (like current) and ONE
    # final n_name agg. vs `preagg`: the intkey re-group detour is gone
    # (2 Exchanges, not 3); vs `current`: the attach probes ~|supplier|
    # ×|nations| reduced rows instead of every detail row, at the cost
    # of one extra reduce Exchange before it.
    supp_named = (supp_int()
                  .withColumn("n_name", name_map[F.col("s_nationkey")]))
    j = li().join(leg(), F.col("l_orderkey") == F.col("o_orderkey"))
    pre = j.groupBy("l_suppkey", "c_nationkey").agg(F.sum("rev").alias("r"))
    j2 = pre.join(supp_named, (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
    return j2.groupBy("n_name").agg(F.round(F.sum("r"), 4).alias("revenue"))

def best5(mk):
    mk().toPandas(); mk().toPandas()
    b = float("inf")
    for _ in range(5):
        t0 = time.time(); mk().toPandas(); b = min(b, time.time() - t0)
    return round(b, 3)

ref = variant_current().toPandas().sort_values("n_name").reset_index(drop=True)
for tag, mk in (("current", variant_current), ("intkey", variant_intkey), ("preagg", variant_preagg), ("preagg_fold", variant_preagg_fold)):
    got = mk().toPandas()[["n_name","revenue"]].sort_values("n_name").reset_index(drop=True)
    parity = got.equals(ref[["n_name","revenue"]])
    print(f"{tag:8s} exch={count_shuffles(mk())} best5={best5(mk)} parity={parity}")
