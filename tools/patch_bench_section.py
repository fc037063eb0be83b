"""Re-run ONE bench section and patch it into BENCH.json.

Exists because a full bench.py run is ~20+ min and individual sections
can fail independently (r7: the session-catalog-vs-marker gap dropped
bucketed-q3 from the artifact while everything else was healthy).
Methodology is identical to the full run — each entry calls the same
``bench.bench_*`` function — so a patched cell is the measurement the
full run would have recorded.

Usage: python tools/patch_bench_section.py SECTION [sf_dir]

Top-level sections (default sf_dir = $SPARK_GRAFT_SF_DIR or sf0.1):
  prefetch_ab | lsh_skew | ann_operating_point | orc_vs_parquet |
  layout_pruning | bloom_pruning | cow_dml | hive_pruning
sf2.5 scaling sections (default sf_dir = .bench_data/sf2.5):
  bucketed_headliners | scan_throughput | ivf_recall(sf2.5)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOP = {
    "prefetch_ab",
    "lsh_skew",
    "ann_operating_point",
    "orc_vs_parquet",
    "layout_pruning",
    "bloom_pruning",
    "cow_dml",
    "hive_pruning",
}
SF25 = {"bucketed_headliners", "scan_throughput", "ivf_recall"}

FN = {  # section key -> bench function name
    "ann_operating_point": "bench_ann_operating_point",
    "ivf_recall": "bench_ann_operating_point",
    "orc_vs_parquet": "bench_orc_scan",
    "bucketed_headliners": "bench_bucketed_headliners",
}


def main() -> None:
    import bench
    from columnar_database_project_spark.session import get_spark

    section = sys.argv[1]
    if section not in TOP | SF25:
        raise SystemExit(f"unknown section {section!r}")
    default_dir = (
        os.path.join(REPO, ".bench_data", "sf2.5")
        if section in SF25
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else default_dir
    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(REPO, "BENCH.json")
    with open(path) as fh:
        artifact = json.load(fh)
    fn = getattr(bench, FN.get(section, f"bench_{section}"))
    if section == "bucketed_headliners":
        # Same health-gated wrapper as bench.main() — a patched cell
        # must carry the same clean-window provenance as the full run.
        sec25 = artifact.get("scaling", {}).get("sf2.5", {})
        result, takes = bench.health_gated(
            "bucketed-sf2.5",
            lambda: fn(
                spark,
                sf_dir,
                sec25.get("queries"),
                sec25.get("baseline_duckdb"),
            ),
        )
        result["health"] = takes
    elif section == "ivf_recall":
        sec25 = artifact.get("scaling", {}).get("sf2.5", {})
        result = fn(
            spark,
            sf_dir,
            (sec25.get("queries") or {}).get("sim_topk_bruteforce"),
            (sec25.get("baseline_duckdb") or {}).get("sim_topk_bruteforce"),
        )
    elif section == "ann_operating_point":
        # Same passthrough as the ivf_recall branch, from the headline
        # tables: bench.main() hands these comparators to the full-run
        # call, and dropping them here would silently lose
        # bruteforce_sec / ivf_vs_duckdb_exact from the patched cell
        # (ADVICE r10).
        result = fn(
            spark,
            sf_dir,
            (artifact.get("queries") or {}).get("sim_topk_bruteforce"),
            (artifact.get("baseline_duckdb") or {}).get("sim_topk_bruteforce"),
        )
    else:
        result = fn(spark, sf_dir)
    if section in SF25:
        artifact.setdefault("scaling", {}).setdefault("sf2.5", {})[
            section
        ] = result
    else:
        artifact[section] = result
    with open(path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({section: result}))


if __name__ == "__main__":
    main()
