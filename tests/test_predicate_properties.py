"""Property-based soundness proof for zone-map pruning.

The one invariant block pruning must never violate: if ANY row in a
block satisfies the predicate (SQL three-valued semantics), then
``may_match`` over the block's zone-map stats must return True — a
False is a promise that the block can be skipped without changing
query results. Hypothesis drives random predicate trees (all node
types, mixed int/float/str literals, NULLs, cross-type comparisons)
against random blocks and checks the promise on every example.

Driver-side pure logic — no SparkSession needed, so hundreds of
examples run in milliseconds.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from columnar_database_project_spark.plans.predicate import (
    And,
    Between,
    Cmp,
    ColumnStats,
    InList,
    IsNotNull,
    IsNull,
    Not,
    Or,
    TruePred,
)

COLS = ("x", "y")

# Cell values: ints, floats, short strings, or NULL. NaN excluded —
# parquet writers are inconsistent about NaN in stats, and the index
# builder never feeds NaN min/max (pyarrow drops them).
_num = st.one_of(
    st.integers(min_value=-50, max_value=50),
    st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
)
_cell = st.one_of(st.none(), _num, st.sampled_from(["a", "b", "cc", "zz"]))
_literal = st.one_of(_num, st.sampled_from(["a", "b", "cc", "zz"]))

_rows = st.lists(
    st.tuples(_cell, _cell), min_size=1, max_size=12
)

_leaf = st.one_of(
    st.just(TruePred()),
    st.builds(
        Cmp,
        st.sampled_from(["=", "!=", ">", ">=", "<", "<="]),
        st.sampled_from(COLS),
        _literal,
    ),
    st.builds(Between, st.sampled_from(COLS), _literal, _literal),
    st.builds(
        InList,
        st.sampled_from(COLS),
        st.lists(_literal, min_size=0, max_size=4).map(tuple),
    ),
    st.builds(IsNull, st.sampled_from(COLS)),
    st.builds(IsNotNull, st.sampled_from(COLS)),
)

_pred = st.recursive(
    _leaf,
    lambda inner: st.one_of(
        st.builds(And, inner, inner),
        st.builds(Or, inner, inner),
        st.builds(Not, inner),
    ),
    max_leaves=6,
)


def _stats_for(rows: list[tuple]) -> dict[str, ColumnStats]:
    """Zone maps exactly as the index builder derives them from parquet
    footers: min/max over non-null values only (absent when the block
    is all-null), plus null/value counts."""
    out = {}
    for ci, col in enumerate(COLS):
        vals = [r[ci] for r in rows if r[ci] is not None]
        # parquet stats are per-type; a column of mixed int/float is
        # promoted — mimic by keeping python semantics (comparable).
        # Mixed str/num in one column can't come from a real parquet
        # column; min/max over them is undefined → treat as absent.
        has_num = any(isinstance(v, (int, float)) for v in vals)
        has_str = any(isinstance(v, str) for v in vals)
        if vals and not (has_num and has_str):
            mn, mx = min(vals), max(vals)
        else:
            mn = mx = None
        out[col] = ColumnStats(
            min=mn, max=mx, null_count=len(rows) - len(vals), num_values=len(rows)
        )
    return out


# SQL three-valued row evaluation: True / False / None (=UNKNOWN).
def _cmp3(op: str, a, b):
    if a is None or b is None:
        return None
    num = (int, float)
    if isinstance(a, num) != isinstance(b, num):
        # cross-type comparison: engines either error or treat as no
        # match; either way the row is not RETURNED, so model as False
        # (never True — that is all soundness needs).
        return False
    return {
        "=": a == b,
        "!=": a != b,
        ">": a > b,
        ">=": a >= b,
        "<": a < b,
        "<=": a <= b,
    }[op]


def _eval3(p, row: dict):
    if isinstance(p, TruePred):
        return True
    if isinstance(p, Cmp):
        return _cmp3(p.op, row[p.col], p.value)
    if isinstance(p, Between):
        lo = _cmp3(">=", row[p.col], p.lo)
        hi = _cmp3("<=", row[p.col], p.hi)
        return _and3(lo, hi)
    if isinstance(p, InList):
        acc = False
        for v in p.values:
            acc = _or3(acc, _cmp3("=", row[p.col], v))
        return acc
    if isinstance(p, IsNull):
        return row[p.col] is None
    if isinstance(p, IsNotNull):
        return row[p.col] is not None
    if isinstance(p, And):
        return _and3(_eval3(p.left, row), _eval3(p.right, row))
    if isinstance(p, Or):
        return _or3(_eval3(p.left, row), _eval3(p.right, row))
    if isinstance(p, Not):
        c = _eval3(p.child, row)
        return None if c is None else (not c)
    raise AssertionError(f"unknown node {p!r}")


def _and3(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def _or3(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return True if (a or b) else False


@settings(max_examples=400, deadline=None)
@given(rows=_rows, pred=_pred)
def test_prune_is_sound_for_any_predicate_and_block(rows, pred):
    """may_match == False must imply no row matches (blocks are only
    skipped when provably empty of matches)."""
    stats = _stats_for(rows)
    if pred.may_match(stats):
        return  # MAYBE/True: block scanned, nothing to prove
    for r in rows:
        row = dict(zip(COLS, r))
        assert _eval3(pred, row) is not True, (
            f"UNSOUND PRUNE: {pred!r} pruned a block containing "
            f"matching row {row} (stats={stats})"
        )


@settings(max_examples=200, deadline=None)
@given(rows=_rows, pred=_pred)
def test_conjunction_never_prunes_less_than_its_parts(rows, pred):
    """Structural monotonicity: AND can only prune MORE than either
    conjunct alone; OR can only prune LESS. Guards against a future
    edit accidentally inverting a combinator."""
    stats = _stats_for(rows)
    other = IsNotNull("x")
    assert And(pred, other).may_match(stats) <= (
        pred.may_match(stats) and other.may_match(stats)
    )
    assert Or(pred, other).may_match(stats) >= (
        pred.may_match(stats) or other.may_match(stats)
    )
