"""Property-based tests (hypothesis) for the pure hashing / vector /
PQ kernels — the single-source-of-truth functions shared by Spark
plans, Pandas-UDF batch code, and the DuckDB oracle SQL. These run
driver-side with no SparkSession, so hypothesis can afford hundreds of
examples; the Spark-side tests elsewhere pin the kernels' integration,
these pin their algebra.
"""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from columnar_database_project_spark.functions.hashing import (
    MERSENNE_P,
    SHINGLE_W,
    SIMHASH_BITS,
    minhash_signature,
    shingles,
    simhash32,
    tokenize,
)
from columnar_database_project_spark.functions.vector import (
    cosine_matrix,
    normalize_rows,
)
from columnar_database_project_spark.operators.similarity import (
    PQ_K,
    PQ_M,
    PQ_SUB,
    _pq_assign,
)

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)
texts = st.lists(words, min_size=0, max_size=40).map(" ".join)


# ------------------------------------------------------------ tokenize


@given(texts)
def test_tokenize_roundtrip_and_no_empties(text):
    """Tokens of a space-joined word list are the words themselves;
    no token is empty unless the text is (the documented '' → ['']
    sentinel)."""
    toks = tokenize(text)
    if text.strip():
        assert toks == text.split()
        assert all(toks)
    else:
        assert toks == [""]


@given(texts, st.integers(min_value=1, max_value=6))
def test_tokenize_whitespace_invariance(text, n_spaces):
    """Any run of whitespace tokenizes identically to one space —
    the contract that keeps the Python kernel, Spark split(trim()),
    and DuckDB regexp_split_to_array in agreement."""
    noisy = (" " * n_spaces).join(text.split()) + " " * (n_spaces - 1)
    assert tokenize(noisy) == tokenize(text)


# ------------------------------------------------------------ shingles


@given(texts)
def test_shingle_count_and_width(text):
    """max(n - W, 0) + 1 windows before dedup → the set is never
    larger; every shingle has at most W tokens."""
    toks = tokenize(text)
    sh = shingles(text)
    assert 1 <= len(sh) <= max(len(toks) - SHINGLE_W, 0) + 1
    assert all(len(s.split(" ")) <= SHINGLE_W for s in sh)


@given(texts)
def test_shingles_of_superstring_contain_originals(text):
    """Appending W or more tokens preserves every full-width shingle
    of the original — the containment axiom the shingle-overlap dedup
    operators rely on."""
    toks = tokenize(text)
    if len(toks) < SHINGLE_W or not text.strip():
        return
    extended = text + " " + " ".join(["pad"] * SHINGLE_W)
    full_width = {s for s in shingles(text) if len(s.split(" ")) == SHINGLE_W}
    assert full_width <= shingles(extended)


# ------------------------------------------------------------- minhash


@given(texts)
def test_minhash_memo_path_identical(text):
    """The memoized and unmemoized hashing paths are the same
    function — a silent divergence here would split the dedup
    operators from their oracle."""
    memo: dict[str, int] = {}
    a = minhash_signature(text)
    b = minhash_signature(text, _memo=memo)
    assert (a == b).all()
    # memo holds exactly the shingle hashes it claims to
    assert set(memo) == shingles(text)


@given(texts)
def test_minhash_range_and_determinism(text):
    sig = minhash_signature(text)
    assert sig.shape == (16,)
    assert ((0 <= sig) & (sig < MERSENNE_P)).all()
    assert (sig == minhash_signature(text)).all()


# ------------------------------------------------------------- simhash


@given(st.lists(words, min_size=1, max_size=20), st.randoms())
def test_simhash_is_bag_of_tokens(toks, rnd):
    """SimHash depends only on token counts: any permutation of the
    tokens hashes identically, and doubling every count (text + text)
    preserves every majority vote's sign."""
    text = " ".join(toks)
    shuffled = list(toks)
    rnd.shuffle(shuffled)
    h = simhash32(text)
    assert 0 <= h < (1 << SIMHASH_BITS)
    assert simhash32(" ".join(shuffled)) == h
    assert simhash32(text + " " + text) == h


# -------------------------------------------------------------- vector


finite_rows = st.lists(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, width=64
        ),
        min_size=4,
        max_size=4,
    ),
    min_size=1,
    max_size=8,
)


@given(finite_rows)
# Regression (hypothesis, 2026-08-15): a row whose only nonzero
# component squares into subnormal range made the plain norm lose
# significand bits — "unit" norm came back 0.9999980.
@example([[0.0, 0.0, 0.0, 6.268482409221865e-160]])
def test_normalize_rows_unit_or_zero(rows):
    m = np.array(rows, dtype=np.float64)
    norms = np.linalg.norm(normalize_rows(m), axis=1)
    for orig, n in zip(np.linalg.norm(m, axis=1), norms):
        if orig == 0:
            assert n == 0  # zero rows stay zero, no NaN
        else:
            assert abs(n - 1.0) < 1e-9


@given(finite_rows, finite_rows)
def test_cosine_matrix_bounds_and_self_diag(a_rows, b_rows):
    a = np.array(a_rows, dtype=np.float64)
    b = np.array(b_rows, dtype=np.float64)
    c = cosine_matrix(a, b)
    assert c.shape == (len(a_rows), len(b_rows))
    assert (np.abs(c) <= 1 + 1e-9).all()
    d = np.diagonal(cosine_matrix(a, a))
    nz = np.linalg.norm(a, axis=1) != 0
    assert np.allclose(d[nz], 1.0)


# ------------------------------------------------------------------ PQ


pq_vectors = st.lists(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=64),
        min_size=PQ_M * PQ_SUB,
        max_size=PQ_M * PQ_SUB,
    ),
    min_size=1,
    max_size=6,
)


def _random_books(seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randn(PQ_M, PQ_K, PQ_SUB)


@settings(max_examples=50, deadline=None)
@given(pq_vectors, st.integers(min_value=0, max_value=1000))
def test_pq_assign_range_and_optimality(rows, seed):
    """Codes are valid indices, and each assigned code minimizes the
    rounded subspace distance (argmin optimality — the property the
    SQL oracle's ORDER BY dist, code re-derives)."""
    v = np.array(rows, dtype=np.float64)
    books = _random_books(seed)
    codes = _pq_assign(v, books)
    assert codes.shape == (len(rows), PQ_M)
    assert ((0 <= codes) & (codes < PQ_K)).all()
    sub = v.reshape(len(rows), PQ_M, PQ_SUB)
    for i in range(len(rows)):
        for m in range(PQ_M):
            d = np.round(
                np.linalg.norm(sub[i, m][None, :] - books[m], axis=-1), 6
            )
            assert d[codes[i, m]] == d.min()
            # tie policy: lowest code among the minimizers
            assert codes[i, m] == int(np.flatnonzero(d == d.min())[0])


@settings(max_examples=25, deadline=None)
@given(pq_vectors, st.integers(min_value=0, max_value=1000), st.randoms())
def test_pq_assign_row_equivariance(rows, seed, rnd):
    """Assignment is per-row: permuting input rows permutes codes."""
    v = np.array(rows, dtype=np.float64)
    books = _random_books(seed)
    perm = list(range(len(rows)))
    rnd.shuffle(perm)
    codes = _pq_assign(v, books)
    assert (_pq_assign(v[perm], books) == codes[perm]).all()


# ------------------------------------------------- WHERE-parser roundtrip


from columnar_database_project_spark.plans.predicate import (  # noqa: E402
    And,
    Between,
    Cmp,
    InList,
    IsNotNull,
    IsNull,
    Not,
    Or,
)
from columnar_database_project_spark.plans.sql_where import (  # noqa: E402
    extract_where,
    parse_where,
)

_p_cols = st.sampled_from(("x", "y_col"))
# plain-decimal literals only: the WHERE grammar (like the
# reference's) has no scientific notation — such a clause parses as
# a failure and safely falls back to scan-all, which is outside this
# roundtrip's scope
_p_num = st.one_of(
    st.integers(min_value=-999, max_value=999),
    st.integers(min_value=-999_000, max_value=999_000).map(
        lambda n: n / 1000.0
    ),
)
_p_lit = st.one_of(_p_num, st.sampled_from(["a", "zz", "hello world"]))

_p_leaf = st.one_of(
    st.builds(Cmp, st.sampled_from(["=", "!=", ">", ">=", "<", "<="]), _p_cols, _p_lit),
    st.builds(Between, _p_cols, _p_lit, _p_lit),
    st.builds(
        InList, _p_cols, st.lists(_p_lit, min_size=1, max_size=4).map(tuple)
    ),
    st.builds(IsNull, _p_cols),
    st.builds(IsNotNull, _p_cols),
)
_p_tree = st.recursive(
    _p_leaf,
    lambda inner: st.one_of(
        st.builds(And, inner, inner),
        st.builds(Or, inner, inner),
        st.builds(Not, inner),
    ),
    max_leaves=8,
)


def _lit_sql(v) -> str:
    if isinstance(v, str):
        return "'" + v + "'"
    return repr(v)


def _render(p) -> str:
    if isinstance(p, Cmp):
        return f"{p.col} {p.op} {_lit_sql(p.value)}"
    if isinstance(p, Between):
        return f"{p.col} BETWEEN {_lit_sql(p.lo)} AND {_lit_sql(p.hi)}"
    if isinstance(p, InList):
        return f"{p.col} IN ({', '.join(_lit_sql(v) for v in p.values)})"
    if isinstance(p, IsNull):
        return f"{p.col} IS NULL"
    if isinstance(p, IsNotNull):
        return f"{p.col} IS NOT NULL"
    if isinstance(p, And):
        return f"({_render(p.left)} AND {_render(p.right)})"
    if isinstance(p, Or):
        return f"({_render(p.left)} OR {_render(p.right)})"
    if isinstance(p, Not):
        return f"NOT ({_render(p.child)})"
    raise AssertionError(type(p))


@settings(max_examples=200, deadline=None)
@given(_p_tree)
def test_where_parser_roundtrip(tree):
    """Render any predicate AST to WHERE-clause SQL, parse it back,
    and recover a structurally identical tree — the parser and the
    pruning AST agree on the whole supported grammar, so a predicate
    the engine prunes by is exactly the one the SQL said."""
    clause = _render(tree)
    assert parse_where(clause) == tree
    # and embedded in a full statement via the WHERE extractor,
    # including a trailing clause the splitter must not swallow
    sql = f"SELECT * FROM t WHERE {clause} ORDER BY x LIMIT 5"
    assert extract_where(sql) == tree
