"""Minimal SQL WHERE-clause parser → predicate AST.

The reference uses sqlglot to extract the ``WHERE`` subtree and walks
it for pruning (reference query_enginev5.py:74-85); sqlglot is not
available here, so this is a small hand-written tokenizer + recursive
descent parser covering exactly the pruning language (SURVEY §2.2):

    expr   := or
    or     := and (OR and)*
    and    := unary (AND unary)*
    unary  := NOT unary | primary
    primary:= '(' expr ')'
             | col (=|!=|<>|<|<=|>|>=) literal
             | literal (=|!=|<>|<|<=|>|>=) col       (normalized)
             | col [NOT] BETWEEN literal AND literal
             | col [NOT] IN '(' literal (',' literal)* ')'
             | col IS [NOT] NULL

Anything outside this grammar raises ``WhereParseError`` and callers
fall back to scan-all (the reference's parse-failure behavior,
query_enginev5.py:77-85). Literals follow the reference's int / float /
string lattice (query_enginev5.py:222-230).
"""

from __future__ import annotations

import re

from columnar_database_project_spark.plans.predicate import (
    And,
    Between,
    Cmp,
    InList,
    IsNotNull,
    IsNull,
    Not,
    Or,
    Pred,
    TruePred,
)


class WhereParseError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    \s*(
        (?P<num>-?\d+\.\d+|-?\d+)
      | (?P<str>'(?:[^']|'')*')
      | (?P<op><=|>=|!=|<>|=|<|>)
      | (?P<lpar>\()
      | (?P<rpar>\))
      | (?P<comma>,)
      | (?P<word>[A-Za-z_][A-Za-z_0-9.]*)
    )
    """,
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "BETWEEN", "IN", "IS", "NULL"}


def _tokenize(s: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise WhereParseError(f"unexpected input at {s[pos:pos + 20]!r}")
        pos = m.end()
        if m.group("num"):
            out.append(("num", m.group("num")))
        elif m.group("str"):
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("op"):
            op = m.group("op")
            out.append(("op", "!=" if op == "<>" else op))
        elif m.group("lpar"):
            out.append(("lpar", "("))
        elif m.group("rpar"):
            out.append(("rpar", ")"))
        elif m.group("comma"):
            out.append(("comma", ","))
        else:
            w = m.group("word")
            if w.upper() in _KEYWORDS:
                out.append(("kw", w.upper()))
            else:
                out.append(("ident", w))
    return out


def _literal(tok: tuple[str, str]):
    kind, text = tok
    if kind == "str":
        return text
    if kind == "num":
        return float(text) if "." in text else int(text)
    raise WhereParseError(f"expected literal, got {tok}")


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind: str, value: str | None = None):
        t = self.next()
        if t[0] != kind or (value is not None and t[1] != value):
            raise WhereParseError(f"expected {kind} {value or ''}, got {t}")
        return t

    def parse(self) -> Pred:
        e = self.or_expr()
        if self.peek()[0] != "eof":
            raise WhereParseError(f"trailing tokens at {self.peek()}")
        return e

    def or_expr(self) -> Pred:
        left = self.and_expr()
        while self.peek() == ("kw", "OR"):
            self.next()
            left = Or(left, self.and_expr())
        return left

    def and_expr(self) -> Pred:
        left = self.unary()
        while self.peek() == ("kw", "AND"):
            self.next()
            left = And(left, self.unary())
        return left

    def unary(self) -> Pred:
        if self.peek() == ("kw", "NOT"):
            self.next()
            return Not(self.unary())
        return self.primary()

    def primary(self) -> Pred:
        t = self.peek()
        if t[0] == "lpar":
            self.next()
            e = self.or_expr()
            self.expect("rpar")
            return e
        if t[0] in ("num", "str"):
            # literal ⊕ col → normalized to col ⊕ literal
            lit = _literal(self.next())
            op = self.expect("op")[1]
            col = self.expect("ident")[1]
            flipped = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=", "!=": "!="}
            return Cmp(flipped[op], col, lit)
        if t[0] != "ident":
            raise WhereParseError(f"unexpected token {t}")
        col = self.next()[1]
        t = self.peek()
        if t[0] == "op":
            op = self.next()[1]
            return Cmp(op, col, _literal(self.next()))
        if t == ("kw", "IS"):
            self.next()
            if self.peek() == ("kw", "NOT"):
                self.next()
                self.expect("kw", "NULL")
                return IsNotNull(col)
            self.expect("kw", "NULL")
            return IsNull(col)
        negate = False
        if t == ("kw", "NOT"):
            self.next()
            negate = True
            t = self.peek()
        if t == ("kw", "BETWEEN"):
            self.next()
            lo = _literal(self.next())
            self.expect("kw", "AND")
            hi = _literal(self.next())
            e: Pred = Between(col, lo, hi)
            return Not(e) if negate else e
        if t == ("kw", "IN"):
            self.next()
            self.expect("lpar")
            vals = [_literal(self.next())]
            while self.peek()[0] == "comma":
                self.next()
                vals.append(_literal(self.next()))
            self.expect("rpar")
            e = InList(col, tuple(vals))
            return Not(e) if negate else e
        raise WhereParseError(f"unexpected token {t} after column {col!r}")


def parse_where(clause: str) -> Pred:
    """Parse a WHERE-clause body (no leading WHERE) → predicate AST."""
    toks = _tokenize(clause)
    if not toks:
        return TruePred()
    return _Parser(toks).parse()


_WHERE_SPLIT_RE = re.compile(
    r"\bWHERE\b(.*?)(?:\bGROUP\s+BY\b|\bORDER\s+BY\b|\bHAVING\b|\bLIMIT\b|\bWINDOW\b|$)",
    re.IGNORECASE | re.DOTALL,
)


def extract_where(sql: str) -> Pred:
    """Extract and parse the (first) WHERE clause of a SQL string.

    No WHERE, or a clause outside the supported grammar → TruePred
    (scan all), matching the reference's fallback
    (query_enginev5.py:77-85).
    """
    m = _WHERE_SPLIT_RE.search(sql)
    if not m:
        return TruePred()
    try:
        return parse_where(m.group(1).strip())
    except WhereParseError:
        return TruePred()
