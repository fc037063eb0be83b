"""Differential fuzzing, part 2: the aggregate / window / set-op
grammar through the engine path vs DuckDB.

`test_differential_fuzz.py` covers the WHERE grammar (predicate trees,
pruning soundness). This module fuzzes the rest of the §2.3 relational
surface the registry exercises only at fixed points: random GROUP BY
key sets (plain / ROLLUP / CUBE / GROUPING SETS), random aggregate
lists with HAVING, ranking and frame windows over unique sort keys,
set operations, equi-joins against orders (inner/left/semi/anti with
aggregation on top), and scalar-function projections — each executed
by the full engine pipeline (``MicroBlockEngine.query`` →
``spark.sql``) and by DuckDB over the same microblock files, values
compared with float tolerance.

The grammar is restricted to the dialect intersection: every aggregate
is aliased and cast so both engines agree on result type, window
ORDER BY keys are unique (l_orderkey, l_linenumber) so ranking is
deterministic, and result ordering is normalized in Python (no SQL
ORDER BY — Spark and DuckDB default NULL ordering differs, and rollup
rows contain NULL keys).

Reference behavior being checked: the engine must be a transparent SQL
surface over the block layout (reference query_enginev5.py:302-305
delegates wholesale; ours delegates to Catalyst) — any divergence on
this grammar is an engine/catalog bug, not an operator bug.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from columnar_database_project_spark.catalog import load_table
from columnar_database_project_spark.engine import MicroBlockEngine
from columnar_database_project_spark.sources.index import MicroBlockIndex
from columnar_database_project_spark.sources.microblock import MicroBlockWriter

from test_differential_fuzz import _pred, _rows_equal

SEED = 0xA66F00D
N_RANDOM_AGG = 30
N_RANDOM_SETOP = 10

# Aggregates: (alias, expression) — every expression is cast so Spark
# and DuckDB return the same Python type from fetch/collect.
AGG_POOL = [
    ("c", "count(*)"),
    ("cd", "count(DISTINCT l_orderkey)"),
    ("sq", "CAST(sum(l_quantity) AS DOUBLE)"),
    ("sp", "CAST(sum(l_extendedprice) AS DOUBLE)"),
    ("ad", "CAST(avg(l_discount) AS DOUBLE)"),
    ("mq", "CAST(max(l_quantity) AS DOUBLE)"),
    ("nq", "CAST(min(l_quantity) AS DOUBLE)"),
    ("cc", "count(CASE WHEN l_discount > 0.05 THEN 1 END)"),
]
# Plain-column keys are eligible for ROLLUP/CUBE/GROUPING SETS; the
# expression key only for plain GROUP BY (kept simple cross-dialect).
KEY_POOL = ["l_returnflag", "l_linestatus", "l_linenumber"]
EXPR_KEY = ("k_upper", "upper(l_returnflag)")
HAVING_POOL = [
    "count(*) > 3",
    "count(*) > 0",
    "sum(l_quantity) > 100",
    "min(l_quantity) >= 1",
]

# Window expressions whose results are deterministic despite ties.
# (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem
# (observed dup keys with different quantities), so:
# - rank/dense_rank are tie-safe by definition (equal keys → equal
#   rank), row_number is multiset-safe here because tied rows project
#   to identical output tuples;
# - ROWS frames and lag need a TOTAL order — ORD adds every remaining
#   column as tiebreak, after which any still-tied rows are full
#   duplicates and permuting them cannot change the output multiset;
# - the RANGE frame is peer-inclusive, so ties are inside the frame
#   either way.
ORD = (
    "l_orderkey, l_linenumber, l_quantity, l_extendedprice,"
    " l_discount, l_partkey, l_suppkey"
)
WINDOW_EXPRS = [
    "rank() OVER (PARTITION BY l_returnflag"
    " ORDER BY l_orderkey, l_linenumber)",
    "dense_rank() OVER (PARTITION BY l_returnflag"
    " ORDER BY l_orderkey, l_linenumber)",
    "row_number() OVER (PARTITION BY l_linestatus"
    " ORDER BY l_orderkey, l_linenumber)",
    f"CAST(sum(l_quantity) OVER (PARTITION BY l_returnflag"
    f" ORDER BY {ORD}"
    f" ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)",
    f"lag(l_orderkey, 1) OVER (PARTITION BY l_returnflag"
    f" ORDER BY {ORD})",
    "CAST(avg(l_extendedprice) OVER (PARTITION BY l_linenumber"
    " ORDER BY l_orderkey"
    " RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)",
]


@pytest.fixture(scope="module")
def agg_setup(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fuzz_agg") / "lineitem_blocks")
    li = load_table(spark, sf_dir, "lineitem").orderBy(
        "l_orderkey", "l_linenumber"
    )
    MicroBlockWriter(block_rows=500).write(li.repartition(1), out)
    idx = MicroBlockIndex.build(out, table_id="lineitem")
    eng = MicroBlockEngine(spark, index=idx)
    eng.register("lineitem", spark.read.parquet(out))
    orders_path = f"{sf_dir}/orders.parquet"
    eng.register("orders", spark.read.parquet(orders_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM parquet_scan('{out}/*.parquet')"
    )
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM parquet_scan('{orders_path}')"
    )
    return eng, con


def _norm(rows):
    """Order-normalize with NULL-safe, type-safe keys (rollup rows mix
    None with strings; naive tuple sort would TypeError). Numeric
    cells ARE part of the key — the testdata has duplicate
    (l_orderkey, l_linenumber) pairs, so excluding floats would
    zip-pair different rows that share their integer cells. Including
    them is tolerance-safe: materially different floats sort the same
    way on both engines, and jitter-close floats pass the
    ``_rows_equal`` tolerance whichever way they land."""

    import datetime as dt

    def naive_utc(v):
        # Spark collects session-zone (UTC) timestamps as NAIVE
        # datetimes; DuckDB reading UTC-adjusted TIMESTAMP_MICROS
        # parquet returns AWARE ones — same instant, different repr
        if isinstance(v, dt.datetime) and v.tzinfo is not None:
            return v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v

    def cell_key(v):
        if v is None:
            return (1, "", 0.0)
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return (0, "num", float(v))
        return (0, type(v).__name__, str(v))

    def key(r):
        return tuple(cell_key(v) for v in r)

    return sorted((tuple(naive_utc(v) for v in r) for r in rows), key=key)


def _run_both(eng: MicroBlockEngine, con, sql: str):
    got = _norm([tuple(r) for r in eng.query(sql).collect()])
    want = _norm(con.execute(sql).fetchall())
    return got, want


def _gen_agg_query(rng: random.Random) -> str:
    n_keys = rng.randrange(0, 3)
    keys = rng.sample(KEY_POOL, n_keys)
    use_expr_key = n_keys > 0 and rng.random() < 0.25
    aggs = rng.sample(AGG_POOL, rng.randrange(1, 4))
    select = []
    group_exprs = []
    if use_expr_key:
        alias, expr = EXPR_KEY
        select.append(f"{expr} AS {alias}")
        group_exprs.append(expr)
        keys = keys[:1]  # expression key replaces the extra column key
    else:
        select.extend(keys)
        group_exprs.extend(keys)
    select.extend(f"{expr} AS {alias}" for alias, expr in aggs)
    sql = "SELECT " + ", ".join(select) + " FROM lineitem"
    if rng.random() < 0.6:
        sql += f" WHERE {_pred(rng)}"
    if group_exprs:
        grouping = "plain"
        if not use_expr_key and len(group_exprs) >= 1 and rng.random() < 0.4:
            grouping = rng.choice(["rollup", "cube", "sets"])
        if grouping == "rollup":
            sql += f" GROUP BY ROLLUP ({', '.join(group_exprs)})"
        elif grouping == "cube":
            sql += f" GROUP BY CUBE ({', '.join(group_exprs)})"
        elif grouping == "sets":
            subsets = ["(" + ", ".join(group_exprs) + ")", "()"]
            if len(group_exprs) == 2:
                subsets.insert(1, f"({group_exprs[0]})")
            sql += f" GROUP BY GROUPING SETS ({', '.join(subsets)})"
        else:
            sql += f" GROUP BY {', '.join(group_exprs)}"
        if rng.random() < 0.3:
            sql += f" HAVING {rng.choice(HAVING_POOL)}"
    return sql


def _orders_pred(rng: random.Random) -> str:
    """Random predicate over orders columns (straddles the data range
    so join probes land empty, full, and partial)."""
    kind = rng.randrange(4)
    if kind == 0:
        return f"o_orderstatus {rng.choice(['=', '!='])} " + rng.choice(
            ["'F'", "'O'", "'P'", "'X'"]
        )
    if kind == 1:
        v = rng.choice([0.0, 1000.0, 50000.0, 200000.0, 1e9])
        return f"o_totalprice {rng.choice(['<', '>=', '>'])} {v!r}"
    if kind == 2:
        lo, hi = sorted(
            rng.sample(
                ["'1992-01-01'", "'1994-06-30'", "'1996-03-15'", "'1999-12-31'"],
                2,
            )
        )
        return f"o_orderdate BETWEEN {lo} AND {hi}"
    v = rng.choice([0, 10, 300, 1500, 99999])
    return f"o_custkey {rng.choice(['<', '>=', '='])} {v}"


JOIN_SHAPES = [
    # inner equi-join, both-side filters, grouped aggregate on top
    (
        "SELECT l.l_returnflag AS k, count(*) AS c,"
        " CAST(sum(l.l_extendedprice) AS DOUBLE) AS sp"
        " FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
        " WHERE ({pl}) AND ({po}) GROUP BY l.l_returnflag"
    ),
    # left outer with the orders predicate in the ON clause — the
    # classic ON-vs-WHERE outer-join semantics divergence point
    (
        "SELECT count(*) AS c, count(o.o_orderkey) AS cj,"
        " count(DISTINCT l.l_orderkey) AS cd"
        " FROM lineitem l LEFT JOIN orders o"
        " ON l.l_orderkey = o.o_orderkey AND ({po})"
        " WHERE {pl}"
    ),
    # semi join via IN subquery
    (
        "SELECT count(*) AS c, CAST(sum(l_quantity) AS DOUBLE) AS sq"
        " FROM lineitem WHERE ({pl}) AND l_orderkey IN"
        " (SELECT o_orderkey FROM orders WHERE {po})"
    ),
    # anti join via correlated NOT EXISTS
    (
        "SELECT count(*) AS c, CAST(max(l_extendedprice) AS DOUBLE) AS mp"
        " FROM lineitem l WHERE ({pl}) AND NOT EXISTS"
        " (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey"
        " AND ({po}))"
    ),
]

# Scalar-function projection over the dialect-shared subset. round()
# is deliberately absent: Spark rounds HALF_UP, DuckDB HALF_EVEN, so a
# value ending in 5 at the target precision diverges legitimately.
SCALAR_SHAPE = (
    "SELECT l_orderkey, l_linenumber,"
    " upper(l_returnflag) || '-' || lower(l_linestatus) AS tag,"
    " substr(l_returnflag, 1, 1) AS s1,"
    " length(l_linestatus) AS ln,"
    " abs(l_discount - 0.05) AS adx,"
    " CAST(floor(l_extendedprice / 100) AS BIGINT) AS fe,"
    " CAST(ceil(l_quantity) AS BIGINT) AS cq,"
    " coalesce(nullif(l_returnflag, 'A'), 'Z') AS cz,"
    " CAST(year(l_shipdate) AS BIGINT) AS y,"
    " CAST(month(l_shipdate) AS BIGINT) AS m"
    " FROM lineitem WHERE {p}"
)


class TestDifferentialFuzzAgg:
    def test_random_aggregates_match_duckdb(self, agg_setup):
        eng, con = agg_setup
        rng = random.Random(SEED)
        mismatches = []
        for _ in range(N_RANDOM_AGG):
            sql = _gen_agg_query(rng)
            got, want = _run_both(eng, con, sql)
            if not _rows_equal(got, want):
                mismatches.append((sql, got[:3], want[:3]))
        assert not mismatches, mismatches

    def test_window_shapes_match_duckdb(self, agg_setup):
        eng, con = agg_setup
        rng = random.Random(SEED + 1)
        mismatches = []
        for i, wexpr in enumerate(WINDOW_EXPRS):
            for _ in range(2):
                p = _pred(rng)
                sql = (
                    f"SELECT l_orderkey, l_linenumber, {wexpr} AS w"
                    f" FROM lineitem WHERE {p}"
                )
                got, want = _run_both(eng, con, sql)
                if not _rows_equal(got, want):
                    mismatches.append((sql, got[:3], want[:3]))
        assert not mismatches, mismatches

    def test_set_operations_match_duckdb(self, agg_setup):
        eng, con = agg_setup
        rng = random.Random(SEED + 2)
        mismatches = []
        for i in range(N_RANDOM_SETOP):
            p1, p2 = _pred(rng), _pred(rng)
            op = ["INTERSECT", "EXCEPT", "UNION", "UNION ALL"][i % 4]
            sql = (
                f"SELECT l_orderkey FROM lineitem WHERE {p1}"
                f" {op} "
                f"SELECT l_orderkey FROM lineitem WHERE {p2}"
            )
            got, want = _run_both(eng, con, sql)
            if not _rows_equal(got, want):
                mismatches.append((sql, len(got), len(want)))
        assert not mismatches, mismatches

    def test_join_shapes_match_duckdb(self, agg_setup):
        eng, con = agg_setup
        rng = random.Random(SEED + 3)
        mismatches = []
        for i in range(12):
            shape = JOIN_SHAPES[i % len(JOIN_SHAPES)]
            sql = shape.format(pl=_pred(rng), po=_orders_pred(rng))
            got, want = _run_both(eng, con, sql)
            if not _rows_equal(got, want):
                mismatches.append((sql, got[:3], want[:3]))
        assert not mismatches, mismatches

    def test_scalar_functions_match_duckdb(self, agg_setup):
        eng, con = agg_setup
        rng = random.Random(SEED + 4)
        mismatches = []
        for _ in range(4):
            sql = SCALAR_SHAPE.format(p=_pred(rng))
            got, want = _run_both(eng, con, sql)
            if not _rows_equal(got, want):
                mismatches.append((sql, got[:2], want[:2]))
        assert not mismatches, mismatches

    def test_empty_match_aggregate_row_semantics(self, agg_setup):
        """No-GROUP-BY aggregate over zero matching rows: one row,
        count 0, NULL sums — the shape DuckDB and Spark must agree on
        exactly (a classic engine divergence point)."""
        eng, con = agg_setup
        sql = (
            "SELECT count(*) AS c, CAST(sum(l_quantity) AS DOUBLE) AS sq"
            " FROM lineitem WHERE l_quantity > 999999"
        )
        got, want = _run_both(eng, con, sql)
        assert got == want == [(0, None)]


@pytest.fixture(scope="module")
def orc_setup(spark, sf_dir, tmp_path_factory):
    """Engine over an ORC microblock layout; DuckDB over the parquet
    twin written from the SAME ordered frame (DuckDB reads no ORC —
    the parquet twin carries identical rows by construction)."""
    base = tmp_path_factory.mktemp("fuzz_orc")
    li = load_table(spark, sf_dir, "lineitem").orderBy(
        "l_orderkey", "l_linenumber"
    )
    one = li.repartition(1)
    MicroBlockWriter(block_rows=500, format="orc").write(
        one, str(base / "orc")
    )
    MicroBlockWriter(block_rows=500).write(one, str(base / "pq"))
    eng = MicroBlockEngine(spark)
    eng.register("lineitem", spark.read.orc(str(base / "orc")))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM parquet_scan('{base}/pq/*.parquet')"
    )
    return eng, con


class TestDifferentialFuzzOrc:
    """The whole fuzz grammar again, but the engine reads ORC.

    The parquet run (above) establishes that the grammar matches
    DuckDB; this run isolates the ORC READ PATH — a type drift
    (timestamp NTZ/LTZ is the historical offender,
    tests/test_catalog_vanilla_session.py), a stripe-boundary bug, or
    a pushdown divergence shows up as a mismatch HERE while the
    parquet twin stays green."""

    def test_random_predicates_and_aggregates_match(self, orc_setup):
        eng, con = orc_setup
        rng = random.Random(SEED + 5)
        mismatches = []
        for i in range(12):
            p = _pred(rng)
            sql = (
                "SELECT count(*) AS c,"
                " CAST(sum(l_quantity) AS DOUBLE) AS sq,"
                " CAST(sum(l_extendedprice) AS DOUBLE) AS sp"
                f" FROM lineitem WHERE {p}"
            )
            got, want = _run_both(eng, con, sql)
            if not _rows_equal(got, want):
                mismatches.append((sql, got, want))
        for _ in range(8):
            sql = _gen_agg_query(rng)
            got, want = _run_both(eng, con, sql)
            if not _rows_equal(got, want):
                mismatches.append((sql, got[:3], want[:3]))
        assert not mismatches, mismatches

    def test_timestamp_roundtrip_matches(self, orc_setup):
        """Direct probe of the historical ORC hazard: date-window
        counts and min/max over the timestamp column must agree with
        the parquet twin exactly."""
        eng, con = orc_setup
        sql = (
            "SELECT count(*) AS c, min(l_shipdate) AS lo,"
            " max(l_shipdate) AS hi FROM lineitem"
            " WHERE l_shipdate >= '1994-01-01'"
            " AND l_shipdate < '1996-06-15 12:00:00'"
        )
        got, want = _run_both(eng, con, sql)
        assert got == want, (got, want)
