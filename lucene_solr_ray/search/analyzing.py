"""AnalyzingQueryParser (``lucene/queryparser/src/java/org/apache/
lucene/queryparser/analyzing/AnalyzingQueryParser.java:39-199``):
classic syntax where prefix / wildcard / fuzzy terms pass through the
analyzer instead of only being lowercased.

- wildcard terms: each chunk between ``*`` / ``?`` is analyzed
  separately and re-joined around the wildcards (:71-106);
- prefix terms: the prefix (without the trailing ``*``) is analyzed
  (:118-122); fuzzy terms: the base term is analyzed (:137-142);
- ``analyzeSingleChunk`` requires the analyzer to return exactly ONE
  token for a chunk, else a ParseException (:152-189) — stemmers or
  folding filters qualify, tokenizing filters do not.

Implemented as an AST rewrite over the classic parse: multiterm nodes
are rebuilt with analyzed parts, boolean structure is preserved, and
the result runs on every scorer unchanged.
"""

from __future__ import annotations

import re as _re
from dataclasses import replace as _replace

from .query import (
    BooleanQuery,
    FuzzyQuery,
    PrefixQuery,
    Query,
    WildcardQuery,
    parse_query,
)

_WILD_SPLIT = _re.compile(r"([*?])")


class AnalyzingParseError(ValueError):
    """ParseException analog: a chunk analyzed to != 1 token."""


def _analyze_chunk(chunk: str, analyzer, full: str) -> str:
    terms, _ = analyzer.analyze(chunk)
    if len(terms) != 1:
        raise AnalyzingParseError(
            f"Unable to analyze single chunk {chunk!r} of {full!r}: "
            f"analyzer returned {len(terms)} tokens "
            f"(AnalyzingQueryParser.analyzeSingleChunk)")
    return terms[0]


def _rewrite(q: Query, analyzer) -> Query:
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            must=[_rewrite(c, analyzer) for c in q.must],
            should=[_rewrite(c, analyzer) for c in q.should],
            must_not=[_rewrite(c, analyzer) for c in q.must_not],
            min_should_match=q.min_should_match)
    if isinstance(q, PrefixQuery):
        return _replace(q, prefix=_analyze_chunk(q.prefix, analyzer,
                                                 q.prefix + "*"))
    if isinstance(q, WildcardQuery):
        parts = _WILD_SPLIT.split(q.pattern)
        out = []
        for p in parts:
            if p in ("*", "?"):
                out.append(p)
            elif p:
                out.append(_analyze_chunk(p, analyzer, q.pattern))
        return _replace(q, pattern="".join(out))
    if isinstance(q, FuzzyQuery):
        return _replace(q, term=_analyze_chunk(q.term, analyzer, q.term))
    return q


def parse_analyzing(text: str, analyzer=None) -> Query:
    """Classic parse, then analyze the expanded-term nodes."""
    if analyzer is None:
        from ..analysis import get_analyzer

        analyzer = get_analyzer("standard")
    return _rewrite(parse_query(text, analyzer), analyzer)
