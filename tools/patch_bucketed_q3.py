"""Re-run ONLY the bucketed-q3 bench section and patch it into
BENCH.json.

Exists because a full bench.py run is ~18 min and the bucketed-q3
section can fail independently (r7: the session-catalog-vs-marker gap
dropped it from the artifact while everything else was healthy).
Methodology is identical to the full run — it calls
``bench.bench_bucketed_q3`` itself — so the patched cell is the same
measurement the full run would have recorded.

Usage: python tools/patch_bucketed_q3.py [sf4_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import bench
    from columnar_database_project_spark.session import get_spark

    sf4_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, ".bench_data", "sf2.5")
    )
    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    result = bench.bench_bucketed_q3(spark, sf4_dir)
    path = os.path.join(REPO, "BENCH.json")
    with open(path) as fh:
        artifact = json.load(fh)
    artifact.setdefault("scaling", {}).setdefault("sf2.5", {})[
        "bucketed_q3"
    ] = result
    with open(path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({"bucketed_q3": result}))


if __name__ == "__main__":
    main()
