"""XML query parser (CoreParser analog).

Re-expression of ``lucene/queryparser/src/java/org/apache/lucene/
queryparser/xml/CoreParser.java:65-109`` and its builders/: an XML
element tree lowers to the query AST. Element set supported (attribute
names and defaults match the reference builders):

- ``<TermQuery fieldName=.. boost=..>raw-term</TermQuery>`` — the text
  is the term VERBATIM (TermQueryBuilder does not analyze);
- ``<TermsQuery>`` — text analyzed, one SHOULD TermQuery per token
  (TermsQueryBuilder);
- ``<MatchAllDocsQuery/>``;
- ``<BooleanQuery minimumNumberShouldMatch=0 boost=1>`` with
  ``<Clause occurs="should|must|mustNot|filter">`` children
  (BooleanQueryBuilder:55-76; ``filter`` maps to MUST with the scoring
  contribution our ConstantScore(0-boost) wrapper suppresses);
- ``<RangeQuery lowerTerm=.. upperTerm=.. includeLower=true
  includeUpper=true/>`` (RangeQueryBuilder:33-40);
- ``<DisjunctionMaxQuery tieBreaker=0>`` (child queries as clauses);
- ``<ConstantScoreQuery boost=1>`` wrapping one child;
- ``<UserQuery>classic syntax</UserQuery>`` (UserInputQueryBuilder);
- span family: ``<SpanTerm>``, ``<SpanNear slop= inOrder=false>``,
  ``<SpanOr>``, ``<SpanOrTerms>`` (analyzed), ``<SpanFirst end=..>``,
  ``<SpanNot>`` with ``<Include>``/``<Exclude>`` children,
  ``<BoostingTermQuery>`` treated as a boosted SpanTerm.

``fieldName`` attributes are accepted and validated away — single text
field, the same surface the classic parser exposes here.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    MatchAllDocsQuery,
    Query,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    TermQuery,
    TermRangeQuery,
    parse_query,
)


class XMLParserError(ValueError):
    """ParserException analog."""


def _attr(e: ET.Element, name: str, default=None, typ=str):
    v = e.get(name)
    if v is None:
        if default is None and typ is not str:
            raise XMLParserError(f"<{e.tag}> requires attribute {name!r}")
        return default
    if typ is bool:
        return v.strip().lower() == "true"
    return typ(v)


def _children(e: ET.Element) -> list[ET.Element]:
    return [c for c in e if isinstance(c.tag, str)]


def parse_xml_query(xml: str, analyzer=None) -> Query:
    """Parse one XML query document into the AST."""
    if analyzer is None:
        from ..analysis import get_analyzer

        analyzer = get_analyzer("standard")
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as exc:
        raise XMLParserError(f"malformed query XML: {exc}") from None
    return _build(root, analyzer)


def _build(e: ET.Element, analyzer) -> Query:
    tag = e.tag
    boost = _attr(e, "boost", 1.0, float)
    if tag == "TermQuery":
        term = (e.text or "").strip()
        if not term:
            raise XMLParserError("TermQuery requires term text")
        return TermQuery(term, boost=boost)
    if tag == "BoostingTermQuery":
        term = (e.text or "").strip()
        return SpanTermQuery(term, boost=boost)
    if tag == "TermsQuery":
        terms, _ = analyzer.analyze(e.text or "")
        return BooleanQuery(should=[TermQuery(t) for t in terms],
                            min_should_match=1)
    if tag == "MatchAllDocsQuery":
        return MatchAllDocsQuery(boost=boost)
    if tag == "BooleanQuery":
        must, should, must_not = [], [], []
        for c in _children(e):
            if c.tag != "Clause":
                continue
            occurs = (c.get("occurs") or "should").lower()
            subs = _children(c)
            if not subs:
                raise XMLParserError("Clause requires a child query")
            q = _build(subs[0], analyzer)
            if occurs == "must":
                must.append(q)
            elif occurs == "mustnot":
                must_not.append(q)
            elif occurs == "filter":
                # non-scoring required clause
                must.append(ConstantScoreQuery(query=q, boost=0.0))
            elif occurs == "should":
                should.append(q)
            else:
                raise XMLParserError(f"invalid occurs value {occurs!r}")
        msm = _attr(e, "minimumNumberShouldMatch", 0, int)
        return BooleanQuery(must=must, should=should, must_not=must_not,
                            min_should_match=msm)
    if tag == "RangeQuery":
        return TermRangeQuery(
            lower=e.get("lowerTerm", ""),
            upper=e.get("upperTerm", ""),
            include_lower=_attr(e, "includeLower", True, bool),
            include_upper=_attr(e, "includeUpper", True, bool))
    if tag == "DisjunctionMaxQuery":
        return DisMaxQuery(
            clauses=[_build(c, analyzer) for c in _children(e)],
            tie_breaker=_attr(e, "tieBreaker", 0.0, float))
    if tag == "ConstantScoreQuery":
        subs = _children(e)
        if len(subs) != 1:
            raise XMLParserError("ConstantScoreQuery wraps exactly one "
                                 "child query")
        return ConstantScoreQuery(query=_build(subs[0], analyzer),
                                  boost=boost)
    if tag == "UserQuery":
        return parse_query((e.text or "").strip(), analyzer)
    if tag == "SpanTerm":
        return SpanTermQuery((e.text or "").strip(), boost=boost)
    if tag == "SpanNear":
        slop = _attr(e, "slop", None, int)
        if slop is None:
            raise XMLParserError("SpanNear requires slop")
        return SpanNearQuery(
            tuple(_build(c, analyzer) for c in _children(e)),
            slop=slop, in_order=_attr(e, "inOrder", False, bool),
            boost=boost)
    if tag in ("SpanOr",):
        return SpanOrQuery(tuple(_build(c, analyzer)
                                 for c in _children(e)), boost=boost)
    if tag == "SpanOrTerms":
        terms, _ = analyzer.analyze(e.text or "")
        return SpanOrQuery(tuple(SpanTermQuery(t) for t in terms),
                           boost=boost)
    if tag == "SpanFirst":
        subs = _children(e)
        if len(subs) != 1:
            raise XMLParserError("SpanFirst wraps exactly one span query")
        end = _attr(e, "end", None, int)
        if end is None:
            raise XMLParserError("SpanFirst requires end")
        inner = _build(subs[0], analyzer)
        if isinstance(inner, SpanTermQuery):
            return SpanFirstQuery(term=inner.term, end=end, boost=boost)
        return SpanFirstQuery(end=end, boost=boost, query=inner)
    if tag == "SpanNot":
        inc = exc = None
        for c in _children(e):
            if c.tag == "Include":
                inc = _build(_children(c)[0], analyzer)
            elif c.tag == "Exclude":
                exc = _build(_children(c)[0], analyzer)
        if inc is None or exc is None:
            raise XMLParserError("SpanNot requires Include and Exclude")
        return SpanNotQuery(include=inc, exclude=exc, boost=boost)
    raise XMLParserError(f"unknown query element <{tag}>")
