"""Bloom-sidecar differential fuzzing: random point/IN lookups over a
real mixed-type layout, with the un-pruned scan as the oracle.

test_bloom.py pins specific cases; this suite drives the WHOLE bloom
path (SQL text → WHERE grammar → zone-map ∧ bloom triage → candidate
scan) on a seeded stream of random equality predicates over int,
string and TIMESTAMP columns — the timestamp-as-string-literal case is
exactly where the canon coercion bug lived, so it stays under fuzz."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from columnar_database_project_spark.catalog import load_table
from columnar_database_project_spark.plans.sql_where import parse_where
from columnar_database_project_spark.sources.bloom import (
    _canon,
    _params,
    _set_bits,
    _test_bits,
    build_bloom_index,
)
from columnar_database_project_spark.sources.index import MicroBlockIndex
from columnar_database_project_spark.sources.microblock import (
    MicroBlockWriter,
    read_block,
)

SEED = 0xB100F


class TestCanonLiteralForms:
    @settings(max_examples=50, deadline=None)
    @given(
        st.one_of(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            st.datetimes(),
            st.text(max_size=30),
        )
    )
    def test_probe_as_string_literal_never_false_negative(self, v):
        """Whatever form a value is STORED in, probing with the string
        form the WHERE grammar would deliver must still hit: canon(v)
        == canon(str(v)) for every coercible type."""
        m, k = _params(64, 0.01)
        import numpy as np

        bm = np.zeros(m // 8, dtype=np.uint8)
        _set_bits(bm, m, k, [v])
        enc = _canon(str(v))
        if _canon(v) is None:
            return
        assert enc is not None and _test_bits(bm, m, k, enc), (
            v,
            _canon(v),
            enc,
        )


@pytest.fixture(scope="module")
def fuzz_layout(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bloomfuzz") / "orders")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"
    )
    n = orders.count()
    MicroBlockWriter(block_rows=max(64, n // 12)).write(
        orders.repartition(12, "o_orderkey"), path
    )
    blooms = build_bloom_index(
        spark, path, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"]
    )
    idx = MicroBlockIndex.build(path, table_id="orders")
    idx.attach_blooms(blooms)
    pools = {
        "o_orderkey": [int(r[0]) for r in orders.select("o_orderkey").limit(40).collect()]
        + [99_999_999, -5],
        "o_custkey": [int(r[0]) for r in orders.select("o_custkey").distinct().limit(20).collect()]
        + [123_456],
        "o_orderstatus": [
            str(r[0]) for r in orders.select("o_orderstatus").distinct().collect()
        ]
        + ["ZZ"],
        "o_orderdate": [
            str(r[0]) for r in orders.select("o_orderdate").distinct().limit(25).collect()
        ]
        + ["2050-01-01 00:00:00"],
    }
    return spark, path, idx, pools


def _sql_lit(col, v):
    if col in ("o_orderstatus", "o_orderdate"):
        return "'" + str(v).replace("'", "''") + "'"
    return str(v)


class TestRandomPointLookupParity:
    def test_candidates_scan_equals_full_scan(self, fuzz_layout):
        """60 seeded random = / IN predicates across all four columns:
        scanning ONLY the bloom-refined candidate blocks must return
        exactly the full-scan row count — a single false prune fails."""
        spark, path, idx, pools = fuzz_layout
        rng = random.Random(SEED)
        full = spark.read.parquet(path)
        prunes = 0
        for i in range(60):
            col = rng.choice(list(pools))
            if rng.random() < 0.3:
                vals = rng.sample(pools[col], min(3, len(pools[col])))
                clause = f"{col} IN ({', '.join(_sql_lit(col, v) for v in vals)})"
            else:
                clause = f"{col} = {_sql_lit(col, rng.choice(pools[col]))}"
            pred = parse_where(clause)
            cands = idx.candidate_blocks(pred)
            want = full.filter(clause).count()
            got = sum(
                read_block(spark, idx, b).filter(clause).count()
                for b in cands
            )
            assert got == want, (clause, len(cands), got, want)
            prunes += idx.num_blocks - len(cands)
        # sanity: the fuzz exercised actual pruning, not 60 scan-alls
        assert prunes > 0
