"""PrecedenceQueryParser: boolean-precedence variant of the classic
syntax (``lucene/queryparser/src/java/org/apache/lucene/queryparser/
flexible/precedence/PrecedenceQueryParser.java:33-43`` + the
``BooleanModifiersQueryNodeProcessor`` pipeline).

Same surface grammar as the classic parser, but AND binds tighter than
OR: ``a AND b OR c AND d`` parses to ``(+a +b) (+c +d)`` — two nested
MUST groups as SHOULD clauses — instead of the classic flat
``+a +b +c +d``. Explicit grouping with parentheses composes. The AST
reuses the engine's Query nodes, so every scorer (in-process shard,
distributed, oracle) runs it unchanged.
"""

from __future__ import annotations

import re as _re

from .query import (
    BooleanQuery,
    MatchNoDocs,
    PhraseQuery,
    Query,
    _parse_term_like,
)

_SLOP_RE = _re.compile(r"~(\d+)")


def _lex(text: str, analyzer) -> list:
    """Tokens: ("LP",)/("RP",), ("OP","AND"/"OR"), ("MOD","+"/"-"),
    ("ATOM", Query). Phrases, ranges and regexes are single atoms."""
    out: list = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == "(":
            out.append(("LP",))
            i += 1
            continue
        if c == ")":
            out.append(("RP",))
            i += 1
            continue
        if c in "+-":
            out.append(("MOD", c))
            i += 1
            continue
        if c == "!":
            out.append(("MOD", "-"))
            i += 1
            continue
        if c == '"':
            j = text.find('"', i + 1)
            if j == -1:
                j = n
            body = text[i + 1:j]
            i = j + 1
            slop = 0
            m = _SLOP_RE.match(text, i)
            if i < n and text[i] == "~" and m:
                slop = int(m.group(1))
                i = m.end()
            terms, positions = analyzer.analyze(body)
            if not terms:
                out.append(("ATOM", MatchNoDocs()))
            else:
                base = positions[0]
                out.append(("ATOM", PhraseQuery(
                    tuple(terms), tuple(p - base for p in positions),
                    slop=slop)))
            continue
        if c == "[":
            j = text.find("]", i + 1)
            if j != -1:
                out.append(("ATOM", _parse_term_like(text[i:j + 1],
                                                     analyzer)))
                i = j + 1
                continue
        if c == "/":
            j = text.find("/", i + 1)
            if j != -1:
                out.append(("ATOM", _parse_term_like(text[i:j + 1],
                                                     analyzer)))
                i = j + 1
                continue
        j = i
        while j < n and not text[j].isspace() and text[j] not in '"()':
            j += 1
        word = text[i:j]
        i = j
        up = word.upper()
        if up in ("AND", "&&"):
            out.append(("OP", "AND"))
        elif up in ("OR", "||"):
            out.append(("OP", "OR"))
        elif up == "NOT":
            out.append(("MOD", "-"))
        else:
            out.append(("ATOM", _parse_term_like(word, analyzer)))
    return out


def parse_precedence(text: str, analyzer=None) -> Query:
    """Parse with boolean precedence: OR level > AND level > unary."""
    if analyzer is None:
        from ..analysis import get_analyzer

        analyzer = get_analyzer("standard")
    tokens = _lex(text, analyzer)
    pos = 0

    def peek():
        return tokens[pos] if pos < len(tokens) else None

    def take():
        nonlocal pos
        t = tokens[pos]
        pos += 1
        return t

    def parse_unary():
        """-> (op, Query) with op in {"", "+", "-"}."""
        op = ""
        while peek() and peek()[0] == "MOD":
            op = take()[1]
        t = peek()
        if t is None:
            return (op, MatchNoDocs())
        if t[0] == "LP":
            take()
            q = parse_or()
            if peek() and peek()[0] == "RP":
                take()
            return (op, q)
        if t[0] == "ATOM":
            take()
            return (op, t[1])
        if t[0] == "RP":
            # dangling operator right before ')': leave the RP for the
            # enclosing group — consuming it would drag outside tokens
            # into the group
            return (op, MatchNoDocs())
        # dangling AND/OR (lenient: ignore)
        take()
        return parse_unary()

    def parse_and():
        """-> list of (op, Query) forming one AND chain (len 1 = no
        explicit AND around this entry)."""
        entries = [parse_unary()]
        while peek() and peek() == ("OP", "AND"):
            take()
            entries.append(parse_unary())
        return entries

    def _chain_query(entries) -> tuple[str, Query]:
        """AND chain -> one (op, query) contribution for the OR level.
        A real chain becomes a nested MUST group ((+a +b); modifiers
        inside the chain keep their meaning: - -> MUST_NOT)."""
        if len(entries) == 1:
            return entries[0]
        bq = BooleanQuery()
        for op, q in entries:
            if isinstance(q, MatchNoDocs):
                continue
            if op == "-":
                bq.must_not.append(q)
            else:
                bq.must.append(q)
        return ("", bq)

    def parse_or() -> Query:
        groups = [_chain_query(parse_and())]
        while peek() is not None and peek()[0] != "RP":
            if peek() == ("OP", "OR"):
                take()
                continue
            groups.append(_chain_query(parse_and()))
        if len(groups) == 1 and groups[0][0] == "":
            q = groups[0][1]
            if isinstance(q, BooleanQuery) or not isinstance(q, Query):
                return q
        bq = BooleanQuery()
        for op, q in groups:
            if isinstance(q, MatchNoDocs):
                continue
            if op == "+":
                bq.must.append(q)
            elif op == "-":
                bq.must_not.append(q)
            else:
                bq.should.append(q)
        return bq

    out = parse_or()
    if not isinstance(out, BooleanQuery):
        bq = BooleanQuery()
        bq.should.append(out)
        return bq
    return out
