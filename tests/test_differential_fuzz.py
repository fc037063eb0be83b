"""Differential fuzzing: the full engine path vs DuckDB on random
§2.2-grammar predicates.

The registry's 185 fixed queries check fixed plans; this suite checks
the ENGINE PIPELINE (SQL → WHERE extraction → zone-map prediction →
Spark execution) on a seeded stream of random predicate trees over a
real microblock layout, with DuckDB evaluating the *same SQL* over the
*same block files* as the value oracle. A pruning bug that drops a
block, a parser bug that mis-extracts a WHERE, or a three-valued-logic
bug in a filter shows up as a row/value mismatch here even if no
registry query happens to hit the broken shape.

Deterministic by construction (seeded RNG, no hypothesis shrinking
across Spark sessions — one session, ~60 queries, seconds not minutes).
Reference behavior being checked: prune-then-re-evaluate must be
invisible to results (reference query_enginev5.py:87-95,302-305).
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from columnar_database_project_spark.catalog import load_table
from columnar_database_project_spark.engine import MicroBlockEngine
from columnar_database_project_spark.sources.index import MicroBlockIndex
from columnar_database_project_spark.sources.microblock import MicroBlockWriter

N_RANDOM_PREDICATES = 40
SEED = 0xC0FFEE

# Column model for the generator: (name, kind, literal pool).
# Literal pools deliberately straddle the data's range so predicates
# land empty, full, and partial — the three pruning regimes.
NUM_COLS = {
    "l_orderkey": [0, 1, 500, 3000, 6000, 999999],
    "l_quantity": [-5, 1, 10, 25, 50, 51, 9999],
    "l_linenumber": [0, 1, 3, 7, 8],
    "l_discount": [0.0, 0.02, 0.05, 0.1, 0.11],
    "l_extendedprice": [0.0, 900.0, 20000.0, 60000.0, 1e9],
}
STR_COLS = {
    "l_returnflag": ["A", "N", "R", "X"],
    "l_linestatus": ["F", "O", "Q"],
}
TS_COLS = {
    "l_shipdate": [
        "1992-01-01 00:00:00",
        "1994-06-30 00:00:00",
        "1996-03-15 00:00:00",
        "1999-12-31 00:00:00",
    ],
}


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _leaf(rng: random.Random) -> str:
    kind = rng.randrange(6)
    if kind == 0:  # numeric comparison (incl. = only for ints)
        col = rng.choice(list(NUM_COLS))
        v = rng.choice(NUM_COLS[col])
        ops = ["<", "<=", ">", ">="]
        if isinstance(v, int):
            ops += ["=", "!=", "<>"]
        return f"{col} {rng.choice(ops)} {_sql_lit(v)}"
    if kind == 1:  # string equality family
        col = rng.choice(list(STR_COLS))
        v = rng.choice(STR_COLS[col])
        return f"{col} {rng.choice(['=', '!=', '<>'])} {_sql_lit(v)}"
    if kind == 2:  # BETWEEN / NOT BETWEEN
        col = rng.choice(list(NUM_COLS))
        lo, hi = sorted(rng.sample(NUM_COLS[col], 2))
        neg = rng.choice(["", "NOT "])
        return f"{col} {neg}BETWEEN {_sql_lit(lo)} AND {_sql_lit(hi)}"
    if kind == 3:  # IN / NOT IN over literals
        col, pool = rng.choice(list(STR_COLS.items()) + [("l_quantity", NUM_COLS["l_quantity"])])
        vals = rng.sample(pool, rng.randrange(1, min(4, len(pool)) + 1))
        neg = rng.choice(["", "NOT "])
        return f"{col} {neg}IN ({', '.join(_sql_lit(v) for v in vals)})"
    if kind == 4:  # timestamp window (string literal, both engines coerce)
        col = rng.choice(list(TS_COLS))
        lo, hi = sorted(rng.sample(TS_COLS[col], 2))
        if rng.random() < 0.5:
            return f"{col} BETWEEN {_sql_lit(lo)} AND {_sql_lit(hi)}"
        return f"{col} {rng.choice(['<', '>='])} {_sql_lit(lo)}"
    # IS NULL / IS NOT NULL (lineitem has no NULLs → constant leaves,
    # still exercises the parser + Catalyst folding)
    col = rng.choice(list(NUM_COLS) + list(STR_COLS))
    return f"{col} IS {rng.choice(['', 'NOT '])}NULL"


def _pred(rng: random.Random, depth: int = 0) -> str:
    r = rng.random()
    if depth >= 3 or r < 0.45:
        return _leaf(rng)
    if r < 0.55:
        return f"NOT ({_pred(rng, depth + 1)})"
    op = rng.choice(["AND", "OR"])
    return f"({_pred(rng, depth + 1)}) {op} ({_pred(rng, depth + 1)})"


# Hand-picked regressions-in-waiting: all-pruned, contradiction,
# tautology, and two shapes OUTSIDE the §2.2 grammar (function call,
# col ⊕ col) that must fall back to scan-all without changing results.
EDGE_PREDICATES = [
    "l_quantity > 9999",
    "l_quantity > 30 AND l_quantity < 2",
    "l_quantity >= -5 OR l_returnflag = 'A'",
    "abs(l_discount) <= 0.1",
    "l_quantity > l_linenumber",
]

QUERY_SHAPES = [
    (
        "SELECT count(*) AS c,"
        " CAST(sum(l_quantity) AS DOUBLE) AS sq,"
        " CAST(sum(l_extendedprice) AS DOUBLE) AS sp"
        " FROM lineitem WHERE {p}"
    ),
    (
        "SELECT l_returnflag, count(*) AS c,"
        " CAST(avg(l_discount) AS DOUBLE) AS ad"
        " FROM lineitem WHERE {p}"
        " GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    (
        "SELECT l_orderkey, l_linenumber FROM lineitem WHERE {p}"
        " ORDER BY l_orderkey, l_linenumber LIMIT 20"
    ),
]


@pytest.fixture(scope="module")
def diff_setup(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fuzz") / "lineitem_blocks")
    li = load_table(spark, sf_dir, "lineitem").orderBy(
        "l_orderkey", "l_linenumber"
    )
    MicroBlockWriter(block_rows=500).write(li.repartition(1), out)
    idx = MicroBlockIndex.build(out, table_id="lineitem")
    eng = MicroBlockEngine(spark, index=idx)
    eng.register("lineitem", spark.read.parquet(out))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM parquet_scan('{out}/*.parquet')"
    )
    return eng, con


def _norm(rows):
    # sort on the non-float cells only: group keys are distinct, so
    # float summation jitter must never influence row order
    def key(r):
        return tuple(v for v in r if not isinstance(v, float))

    return sorted((tuple(r) for r in rows), key=key)


def _rows_equal(got, want) -> bool:
    """Cell-wise equality with float tolerance: double summation is
    order-dependent, so cross-engine sums agree only to ~1e-12
    relative — exact compare (or compare-after-round near a rounding
    boundary) would flake."""
    if len(got) != len(want):
        return False
    for rg, rw in zip(got, want):
        if len(rg) != len(rw):
            return False
        for a, b in zip(rg, rw):
            if isinstance(a, float) or isinstance(b, float):
                if a is None or b is None:
                    if a is not b:
                        return False
                elif math.isnan(a) != math.isnan(b):
                    return False
                elif not math.isnan(a) and not math.isclose(
                    a, b, rel_tol=1e-9, abs_tol=1e-8
                ):
                    return False
            elif a != b:
                return False
    return True


def _run_both(eng: MicroBlockEngine, con, sql: str):
    got = _norm([tuple(r) for r in eng.query(sql).collect()])
    want = _norm(con.execute(sql).fetchall())
    return got, want


class TestDifferentialFuzz:
    def test_random_predicates_match_duckdb(self, diff_setup):
        eng, con = diff_setup
        rng = random.Random(SEED)
        mismatches = []
        for i in range(N_RANDOM_PREDICATES):
            p = _pred(rng)
            shape = QUERY_SHAPES[i % len(QUERY_SHAPES)]
            sql = shape.format(p=p)
            got, want = _run_both(eng, con, sql)
            if not _rows_equal(got, want):
                mismatches.append((sql, got[:3], want[:3]))
        assert not mismatches, mismatches

    def test_edge_predicates_match_duckdb(self, diff_setup):
        eng, con = diff_setup
        for p in EDGE_PREDICATES:
            for shape in QUERY_SHAPES:
                sql = shape.format(p=p)
                got, want = _run_both(eng, con, sql)
                assert _rows_equal(got, want), (sql, got[:3], want[:3])

    def test_prediction_is_sound_for_random_predicates(self, diff_setup):
        """End-to-end pruning soundness: for every generated WHERE the
        engine's predicted block set must cover every block that holds
        a matching row (prediction is advisory for prefetch, but an
        unsound prediction means the zone-map logic would drop data if
        it ever drove the scan)."""
        import pyarrow.parquet as pq

        eng, con = diff_setup
        idx = eng.index
        rng = random.Random(SEED + 1)
        # materialize each block (file, row_group) once as an Arrow
        # table duckdb can query
        readers: dict = {}
        block_tables = {}
        for bid in sorted(idx.by_block):
            f = idx.block_file(bid)
            rg = next(iter(idx.by_block[bid].values())).row_group_id
            pf = readers.setdefault(f, pq.ParquetFile(f))
            block_tables[bid] = pf.read_row_group(rg)
        for _ in range(15):
            p = _pred(rng)
            pred_blocks = set(
                idx.predict_blocks_for_sql(f"SELECT * FROM lineitem WHERE {p}")
            )
            needed = set()
            for bid, tbl in block_tables.items():
                con.register("blk", tbl)
                (n,) = con.execute(
                    f"SELECT count(*) FROM blk WHERE {p}"
                ).fetchone()
                con.unregister("blk")
                if n:
                    needed.add(bid)
            missing = needed - pred_blocks
            assert not missing, (p, sorted(missing)[:5], len(pred_blocks))
