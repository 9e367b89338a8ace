"""Query AST + a classic-QueryParser-subset parser.

AST nodes mirror the reference query classes the parity workload needs
(``lucene/core/src/java/org/apache/lucene/search/TermQuery.java``,
``BooleanQuery.java``, ``PhraseQuery.java``); the parser covers the classic
grammar subset term / AND / OR / NOT / +req / -prohibited / "phrase"
(``lucene/queryparser/.../classic/QueryParserBase.java:470-724``).

Terms inside the AST are *already analyzed* (the query-side analyzer runs at
parse time, exactly the chain used at index time).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    pass


@dataclass(frozen=True)
class TermQuery(Query):
    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class PhraseQuery(Query):
    terms: tuple[str, ...]
    positions: tuple[int, ...]  # relative positions (stopword holes preserved)
    boost: float = 1.0


@dataclass
class BooleanQuery(Query):
    must: list[Query] = field(default_factory=list)
    should: list[Query] = field(default_factory=list)
    must_not: list[Query] = field(default_factory=list)

    def clauses(self):
        return self.must + self.should + self.must_not


class MatchNoDocs(Query):
    """A clause that analyzed away entirely (e.g. a pure-stopword term)."""


def _analyze_chunk(chunk: str, analyzer, boost: float = 1.0) -> Query:
    """One whitespace-delimited query chunk -> Term / Phrase / MatchNoDocs.

    Classic parser behavior: if query-side analysis yields multiple tokens,
    the chunk becomes a phrase query (QueryParserBase.newFieldQuery).
    """
    terms, positions = analyzer.analyze(chunk)
    if not terms:
        return MatchNoDocs()
    if len(terms) == 1:
        return TermQuery(terms[0], boost)
    base = positions[0]
    return PhraseQuery(tuple(terms), tuple(p - base for p in positions), boost)


def parse_query(text: str, analyzer=None) -> Query:
    """Parse the classic-syntax subset into an AST.

    Supported: bare terms (implicit OR), AND / OR / NOT connectives,
    +required / -prohibited prefixes, "quoted phrases". Field prefixes and
    the wildcard/fuzzy/range syntax are not part of the parity surface.
    """
    if analyzer is None:
        from ..analysis import get_analyzer

        analyzer = get_analyzer("standard")

    # tokenize the query surface: quoted phrases are atoms
    i, n = 0, len(text)
    pending_op = ""
    pending_bool: str | None = None
    clauses: list[tuple[str | None, str, Query]] = []  # (bool_conn, op, query)

    def flush(chunk: str, is_phrase: bool):
        nonlocal pending_op, pending_bool
        if is_phrase:
            terms, positions = analyzer.analyze(chunk)
            if not terms:
                q: Query = MatchNoDocs()
            else:
                base = positions[0]
                q = PhraseQuery(tuple(terms), tuple(p - base for p in positions))
        else:
            upper = chunk.upper()
            if upper == "AND":
                pending_bool = "AND"
                return
            if upper == "OR":
                pending_bool = "OR"
                return
            if upper == "NOT":
                pending_op = "-"
                return
            q = _analyze_chunk(chunk, analyzer)
        clauses.append((pending_bool, pending_op, q))
        pending_op = ""
        pending_bool = None

    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c in "+-":
            pending_op = c
            i += 1
            continue
        if c == '"':
            j = text.find('"', i + 1)
            if j == -1:
                j = n
            flush(text[i + 1:j], True)
            i = j + 1
            continue
        j = i
        while j < n and not text[j].isspace() and text[j] != '"':
            j += 1
        flush(text[i:j], False)
        i = j

    # assemble: classic parser semantics with default OR operator —
    # AND promotes both adjacent clauses to MUST; NOT/- makes MUST_NOT
    entries: list[list] = []  # [op, query] with op in {"", "+", "-"}
    for conn, op, q in clauses:
        entry = [op, q]
        if conn == "AND":
            if entries and entries[-1][0] == "":
                entries[-1][0] = "+"
            if entry[0] == "":
                entry[0] = "+"
        entries.append(entry)

    bq = BooleanQuery()
    for op, q in entries:
        if isinstance(q, MatchNoDocs):
            continue
        if op == "+":
            bq.must.append(q)
        elif op == "-":
            bq.must_not.append(q)
        else:
            bq.should.append(q)

    # collapse single positive clause
    if not bq.must_not and len(bq.must) + len(bq.should) == 1:
        return (bq.must or bq.should)[0]
    return bq
