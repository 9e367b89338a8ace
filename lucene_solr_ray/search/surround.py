"""Surround query language -> span/boolean AST.

Re-expression of ``lucene/queryparser/src/java/org/apache/lucene/
queryparser/surround/`` (grammar in parser/QueryParser.jj; semantics in
docs/surround/README.txt and query/DistanceQuery.java):

- infix operators, left-associative, case-insensitive:
  ``AND`` / ``OR`` / ``NOT`` / ``nW`` / ``nN`` (``aa AND bb``,
  ``cc 3w dd``, ``cc N dd N ee`` == ``(cc N dd) N ee``);
- prefix operators: ``AND(...)`` / ``OR(...)`` / ``nW(...)`` /
  ``nN(...)`` (``20n(aa*, bb*)``);
- distance ops W (ordered) / N (unordered) with default n=1, max 99,
  lowered to SpanNear with ``slop = n - 1``
  (DistanceQuery.java:97);
- term truncation ``*`` / ``?`` (suffix and internal), lowered to
  Prefix/Wildcard leaves that rewrite per shard through
  SpanMultiTermQueryWrapper semantics (query.rewrite_span_multiterms);
- ``field:`` prefixes are accepted and validated away (single text
  field, like the classic parser surface here);
- distance operands must be distance subqueries (terms, truncations,
  OR of those, nested distance ops) — AND/NOT inside a distance op is
  rejected exactly like SrndBooleanQuery has no DistanceSubQuery
  implementation in the reference.
"""

from __future__ import annotations

import re

from .query import (
    BooleanQuery,
    MatchNoDocs,
    PrefixQuery,
    Query,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
    TermQuery,
    WildcardQuery,
)

_TOKEN_RE = re.compile(r"\s*(\(|\)|,|[^\s(),]+)")
_DIST_RE = re.compile(r"^(\d{0,2})([wn])$", re.IGNORECASE)
MAX_DISTANCE = 99


class _Tokens:
    def __init__(self, text: str):
        self.toks = _TOKEN_RE.findall(text)
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of surround query")
        self.i += 1
        return t


def _dist_op(tok: str) -> tuple[int, bool] | None:
    """(n, ordered) for W/N/nW/nN tokens, else None."""
    m = _DIST_RE.match(tok)
    if not m:
        return None
    n = int(m.group(1)) if m.group(1) else 1
    if not 1 <= n <= MAX_DISTANCE:
        raise ValueError(f"distance out of range 1..99: {tok!r}")
    return n, m.group(2).lower() == "w"


def _is_op(tok: str | None) -> bool:
    return tok is not None and (
        tok.upper() in ("AND", "OR", "NOT") or _dist_op(tok) is not None)


def _leaf(tok: str, analyzer) -> Query:
    from ..analysis.analyzer import java_lowercase

    if ":" in tok and not tok.startswith(":"):
        field, _, rest = tok.partition(":")
        if field in ("text", "body", "content", "title"):
            tok = rest or tok
    if "*" in tok or "?" in tok:
        body = java_lowercase(tok)
        if body.endswith("*") and "*" not in body[:-1] and "?" not in body[:-1]:
            return PrefixQuery(prefix=body[:-1])
        return WildcardQuery(pattern=body)
    terms, _ = analyzer.analyze(tok)
    if not terms:
        return MatchNoDocs()
    if len(terms) == 1:
        return TermQuery(terms[0])
    # a token that analyzes into several terms acts as an adjacency
    return SpanNearQuery(tuple(SpanTermQuery(t) for t in terms),
                         slop=0, in_order=True)


def _to_span(q: Query) -> Query:
    """Lower a parsed operand for use INSIDE a distance op
    (SpanNearClauseFactory.java:55 — term, truncation, OR, nested
    distance only)."""
    if isinstance(q, TermQuery):
        return SpanTermQuery(q.term)
    if isinstance(q, (SpanTermQuery, SpanNearQuery, SpanOrQuery)):
        return q
    if isinstance(q, (PrefixQuery, WildcardQuery)):
        return q  # rewritten per shard at search time
    if isinstance(q, BooleanQuery) and not q.must and not q.must_not:
        return SpanOrQuery(tuple(_to_span(c) for c in q.should))
    if isinstance(q, MatchNoDocs):
        from .query import _CPX_NO_MATCH

        return SpanTermQuery(_CPX_NO_MATCH)
    raise ValueError(
        "only terms, truncations, OR and nested distance ops can appear "
        f"inside a distance operator, got {type(q).__name__}")


def parse_surround(text: str, analyzer=None) -> Query:
    """Parse a surround query. Infix precedence (loosest to tightest):
    OR, AND, NOT, distance ops — so ``aa and bb or cc`` ==
    ``(aa and bb) or cc`` and ``aa NOT bb NOT cc`` ==
    ``(aa NOT bb) NOT cc`` (README examples)."""
    if analyzer is None:
        from ..analysis import get_analyzer

        analyzer = get_analyzer("standard")
    ts = _Tokens(text)
    q = _parse_or(ts, analyzer)
    if ts.peek() is not None:
        raise ValueError(f"trailing input at token {ts.peek()!r}")
    return q


def _parse_or(ts: _Tokens, analyzer) -> Query:
    left = _parse_and(ts, analyzer)
    clauses = [left]
    while ts.peek() is not None and ts.peek().upper() == "OR":
        ts.next()
        clauses.append(_parse_and(ts, analyzer))
    if len(clauses) == 1:
        return left
    return BooleanQuery(should=clauses, min_should_match=1)


def _parse_and(ts: _Tokens, analyzer) -> Query:
    left = _parse_not(ts, analyzer)
    clauses = [left]
    while ts.peek() is not None and ts.peek().upper() == "AND":
        ts.next()
        clauses.append(_parse_not(ts, analyzer))
    if len(clauses) == 1:
        return left
    return BooleanQuery(must=clauses)


def _parse_not(ts: _Tokens, analyzer) -> Query:
    left = _parse_dist(ts, analyzer)
    while ts.peek() is not None and ts.peek().upper() == "NOT":
        ts.next()
        right = _parse_dist(ts, analyzer)
        left = BooleanQuery(must=[left], must_not=[right])
    return left


def _parse_dist(ts: _Tokens, analyzer) -> Query:
    left = _parse_primary(ts, analyzer)
    while ts.peek() is not None and _dist_op(ts.peek()) is not None:
        n, ordered = _dist_op(ts.next())
        right = _parse_primary(ts, analyzer)
        left = SpanNearQuery((_to_span(left), _to_span(right)),
                             slop=n - 1, in_order=ordered)
    return left


def _parse_primary(ts: _Tokens, analyzer) -> Query:
    tok = ts.next()
    if tok == "(":
        q = _parse_or(ts, analyzer)
        if ts.next() != ")":
            raise ValueError("expected ')'")
        return q
    up = tok.upper()
    dop = _dist_op(tok)
    if ts.peek() == "(" and (up in ("AND", "OR") or dop is not None):
        # prefix form: OP(a, b, ...)
        ts.next()
        args = [_parse_or(ts, analyzer)]
        while ts.peek() == ",":
            ts.next()
            args.append(_parse_or(ts, analyzer))
        if ts.next() != ")":
            raise ValueError("expected ')' closing prefix operator")
        if up == "AND":
            return BooleanQuery(must=args)
        if up == "OR":
            return BooleanQuery(should=args, min_should_match=1)
        n, ordered = dop
        return SpanNearQuery(tuple(_to_span(a) for a in args),
                             slop=n - 1, in_order=ordered)
    if tok in (")", ","):
        raise ValueError(f"unexpected {tok!r}")
    return _leaf(tok, analyzer)
