"""MicroBlockIndex + zone-map pruning over a real microblock layout.

Strategy (SURVEY §5 "consequence for us"): write lineitem as
row-group-sized files (block = file), build the index from footers,
then assert the pruner is (a) conservative — every row matching the
predicate lives in a candidate block — and (b) effective — provably
non-matching blocks are pruned, and Spark's own pushdown agrees."""

from __future__ import annotations

import duckdb
import pytest

from columnar_database_project_spark.catalog import load_table
from columnar_database_project_spark.plans.sql_where import extract_where
from columnar_database_project_spark.sources.index import MicroBlockIndex
from columnar_database_project_spark.sources.microblock import (
    MicroBlockWriter,
    read_block,
)


@pytest.fixture(scope="module")
def block_layout(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mb") / "lineitem_blocks")
    li = load_table(spark, sf_dir, "lineitem").orderBy("l_orderkey", "l_linenumber")
    # ~6000 rows at sf0.001 → 500-row blocks → ~12 blocks
    MicroBlockWriter(block_rows=500).write(li.repartition(1), out)
    idx = MicroBlockIndex.build(out, table_id="lineitem")
    return out, idx


class TestIndexBuild:
    def test_blocks_and_columns(self, block_layout):
        _, idx = block_layout
        assert idx.num_blocks >= 10
        cols = set(idx.by_column)
        assert {"l_orderkey", "l_quantity", "l_shipdate"} <= cols
        # every block has stats for every column
        for bid in range(idx.num_blocks):
            stats = idx.stats_for_block(bid)
            assert stats["l_quantity"].min is not None
            assert stats["l_quantity"].max is not None

    def test_row_ranges_are_contiguous(self, block_layout):
        _, idx = block_layout
        ranges = [idx.block_row_range(b) for b in sorted(idx.by_block)]
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert lo2 == hi1 + 1

    def test_to_spark_observability(self, spark, block_layout):
        _, idx = block_layout
        df = idx.to_spark(spark)
        assert df.count() == len(idx.blocks)
        assert "ewma_usage" in df.columns

    def test_usage_counters(self, block_layout):
        _, idx = block_layout
        bm = next(iter(idx.by_block[0].values()))
        assert bm.access_count == 0
        idx.mark_access([0])
        assert bm.access_count == 1
        assert 0 < bm.ewma_usage <= 0.2 + 1e-9


class TestPruning:
    def _actual_matching_blocks(self, idx, where: str) -> set[int]:
        """Ground truth via DuckDB: which blocks physically contain
        matching rows."""
        con = duckdb.connect()
        out = set()
        for bid in sorted(idx.by_block):
            f = idx.block_file(bid)
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{f}') WHERE {where}"
            ).fetchone()[0]
            if n > 0:
                out.add(bid)
        return out

    @pytest.mark.parametrize(
        "where",
        [
            "l_orderkey BETWEEN 100 AND 200",
            "l_orderkey < 50",
            "l_orderkey >= 5900",
            "l_orderkey = 1000",
            "l_orderkey IN (1, 2, 3)",
            "l_orderkey > 100 AND l_orderkey <= 300",
            "l_orderkey < 100 OR l_orderkey > 5900",
            "l_quantity BETWEEN 18 AND 24",
        ],
    )
    def test_conservative(self, block_layout, where):
        _, idx = block_layout
        pred = extract_where(f"SELECT * FROM t WHERE {where}")
        candidates = set(idx.candidate_blocks(pred))
        actual = self._actual_matching_blocks(idx, where)
        # never prune a block that contains matches
        assert actual <= candidates

    def test_effective_on_sorted_key(self, block_layout):
        _, idx = block_layout
        # data sorted by l_orderkey → a narrow range must prune most blocks
        pred = extract_where("SELECT * FROM t WHERE l_orderkey BETWEEN 100 AND 200")
        candidates = idx.candidate_blocks(pred)
        assert 0 < len(candidates) < idx.num_blocks / 2

    def test_impossible_prunes_everything(self, block_layout):
        _, idx = block_layout
        pred = extract_where("SELECT * FROM t WHERE l_orderkey > 99999999")
        # v3 semantics (SURVEY §2.5.2): provably empty → no candidates
        assert idx.candidate_blocks(pred) == []

    def test_spark_result_matches_on_pruned_set(self, spark, block_layout):
        """Union of candidate blocks + residual filter ≡ full-scan filter
        (the reference's stage-5/8 correctness invariant)."""
        out, idx = block_layout
        where = "l_orderkey BETWEEN 100 AND 200"
        pred = extract_where(f"SELECT * FROM t WHERE {where}")
        candidates = idx.candidate_blocks(pred)
        from functools import reduce

        dfs = [read_block(spark, idx, b) for b in candidates]
        merged = reduce(lambda a, b: a.unionByName(b), dfs)
        via_blocks = merged.filter(pred.to_column()).count()
        full = spark.read.parquet(out).filter(pred.to_column()).count()
        assert via_blocks == full > 0
