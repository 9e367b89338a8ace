"""AnalyzingQueryParser: expanded terms pass through the analyzer
(transcribed from TestAnalyzingQueryParser.java shapes)."""

import pytest

from lucene_solr_ray.analysis.filters import (
    CustomAnalyzer,
    ascii_folding_filter,
    lowercase_filter,
)
from lucene_solr_ray.search.analyzing import (
    AnalyzingParseError,
    parse_analyzing,
)
from lucene_solr_ray.search.query import (
    BooleanQuery,
    FuzzyQuery,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
)

AN = CustomAnalyzer([lowercase_filter, ascii_folding_filter])


def _only(q):
    if not isinstance(q, BooleanQuery):
        return q
    clauses = q.must + q.should
    assert len(clauses) == 1
    return clauses[0]


def test_wildcard_chunks_analyzed():
    q = _only(parse_analyzing("über*ung*", AN))
    assert q == WildcardQuery(pattern="uber*ung*")


def test_prefix_analyzed():
    q = _only(parse_analyzing("Übersetz*", AN))
    assert q == PrefixQuery(prefix="ubersetz")


def test_fuzzy_analyzed():
    q = _only(parse_analyzing("Übersetzung~2", AN))
    assert q == FuzzyQuery(term="ubersetzung", max_edits=2)


def test_plain_terms_analyzed_as_before():
    q = parse_analyzing("Mötley Crüe", AN)
    assert _flat_terms(q) == ["motley", "crue"]


def _flat_terms(q):
    out = []
    for c in q.must + q.should:
        assert isinstance(c, TermQuery)
        out.append(c.term)
    return out


def test_multi_token_chunk_raises():
    # the standard tokenizer splits foo-bar -> two tokens in one chunk
    with pytest.raises(AnalyzingParseError):
        parse_analyzing("foo-bar*", AN)


def test_structure_preserved():
    q = parse_analyzing("alpha AND Über*", AN)
    assert isinstance(q, BooleanQuery)
    assert TermQuery("alpha", 1.0) in q.must
    assert WildcardQuery(pattern="uber*") in q.must or \
        PrefixQuery(prefix="uber") in q.must
