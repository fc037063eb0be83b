"""Row-group-size sweep — the reference's benchmark2 protocol.

The reference compared its canonical filter query over a 16,384-row
microblock file vs ~122k-row natural row groups and concluded
"optimal row group size: 100k-1M rows" (reference benchmark2.py:10-13,
:242-243 — conclusion committed only as a comment, no data). This tool
produces the actual numbers for our engine: it rewrites lineitem at
several block sizes and times the canonical filter + an aggregation at
each, printing one JSON line.

Usage: python tools/rg_size_sweep.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from columnar_database_project_spark.catalog import load_table  # noqa: E402
from columnar_database_project_spark.session import get_spark  # noqa: E402
from columnar_database_project_spark.sources.microblock import (  # noqa: E402
    MicroBlockWriter,
)

BLOCK_SIZES = [16_384, 65_536, 131_072, 524_288]
RUNS = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_root = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="rgsweep_")
    spark = get_spark("rg_size_sweep")
    li = load_table(spark, sf_dir, "lineitem")
    results = {}
    for bs in BLOCK_SIZES:
        path = os.path.join(out_root, f"lineitem_{bs}")
        MicroBlockWriter(block_rows=bs).write(li, path)
        n_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
        df = spark.read.parquet(path)
        df.limit(1).collect()  # warm
        t_filter = min(
            _time(lambda: df.filter(F.col("l_quantity").between(18, 24)).collect())
            for _ in range(RUNS)
        )
        t_agg = min(
            _time(
                lambda: df.groupBy("l_returnflag")
                .agg(F.sum("l_extendedprice"))
                .collect()
            )
            for _ in range(RUNS)
        )
        results[str(bs)] = {
            "n_blocks": n_files,
            "filter_sec": round(t_filter, 3),
            "agg_sec": round(t_agg, 3),
        }
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps({"metric": "rg_size_sweep", "sf_dir": sf_dir, "results": results}))


def _time(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    main()
