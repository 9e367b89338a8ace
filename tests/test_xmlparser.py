"""XML query parser (CoreParser.java:65-109 element set)."""

import pytest

from lucene_solr_ray.data.transcripts import transcripts_path
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    MatchAllDocsQuery,
    SpanNearQuery,
    SpanTermQuery,
    TermQuery,
    TermRangeQuery,
    parse_query,
)
from lucene_solr_ray.search.searcher import IndexSearcher
from lucene_solr_ray.search.xmlparser import XMLParserError, parse_xml_query


def test_term_and_boolean_shapes():
    q = parse_xml_query('<TermQuery boost="2.5">ray</TermQuery>')
    assert q == TermQuery("ray", boost=2.5)
    q = parse_xml_query("""
      <BooleanQuery minimumNumberShouldMatch="1">
        <Clause occurs="must"><TermQuery>ray</TermQuery></Clause>
        <Clause occurs="should"><TermQuery>data</TermQuery></Clause>
        <Clause occurs="mustNot"><TermQuery>noise</TermQuery></Clause>
      </BooleanQuery>""")
    assert q.must == [TermQuery("ray")]
    assert q.should == [TermQuery("data")]
    assert q.must_not == [TermQuery("noise")]
    assert q.min_should_match == 1


def test_filter_clause_is_nonscoring_must():
    q = parse_xml_query("""
      <BooleanQuery>
        <Clause occurs="filter"><TermQuery>ray</TermQuery></Clause>
        <Clause occurs="should"><TermQuery>data</TermQuery></Clause>
      </BooleanQuery>""")
    assert q.must == [ConstantScoreQuery(query=TermQuery("ray"),
                                         boost=0.0)]


def test_range_dismax_terms_matchall():
    q = parse_xml_query('<RangeQuery lowerTerm="aaa" upperTerm="bbb" '
                        'includeUpper="false"/>')
    assert q == TermRangeQuery(lower="aaa", upper="bbb",
                               include_lower=True, include_upper=False)
    q = parse_xml_query("""
      <DisjunctionMaxQuery tieBreaker="0.3">
        <TermQuery>ray</TermQuery><TermQuery>data</TermQuery>
      </DisjunctionMaxQuery>""")
    assert isinstance(q, DisMaxQuery) and q.tie_breaker == 0.3
    q = parse_xml_query("<TermsQuery>Ray AND Data</TermsQuery>")
    assert TermQuery("ray") in q.should and TermQuery("data") in q.should
    assert parse_xml_query("<MatchAllDocsQuery/>") == MatchAllDocsQuery()


def test_span_elements():
    q = parse_xml_query("""
      <SpanNear slop="2" inOrder="true">
        <SpanTerm>ray</SpanTerm>
        <SpanOrTerms>data index</SpanOrTerms>
      </SpanNear>""")
    assert isinstance(q, SpanNearQuery) and q.slop == 2 and q.in_order
    assert q.clauses[0] == SpanTermQuery("ray")
    assert {c.term for c in q.clauses[1].clauses} == {"data", "index"}
    q = parse_xml_query("""
      <SpanNot>
        <Include><SpanTerm>ray</SpanTerm></Include>
        <Exclude><SpanTerm>data</SpanTerm></Exclude>
      </SpanNot>""")
    assert q.include == SpanTermQuery("ray")


def test_errors():
    for bad in ("<SpanNear><SpanTerm>a</SpanTerm></SpanNear>",  # no slop
                "<Unknown/>", "<TermQuery></TermQuery>",
                "<BooleanQuery><Clause occurs='nope'>"
                "<TermQuery>a</TermQuery></Clause></BooleanQuery>",
                "not xml at all <"):
        with pytest.raises(XMLParserError):
            parse_xml_query(bad)


@pytest.fixture(scope="module")
def xidx(ray_session, tmp_path_factory):
    src = transcripts_path("tiny")
    out = tmp_path_factory.mktemp("xmlq") / "idx"
    build_index(src, str(out), num_shards=3)
    return IndexSearcher(str(out))


def test_xml_results_match_classic_equivalents(xidx):
    s = xidx
    xml = """
      <BooleanQuery>
        <Clause occurs="must"><TermQuery>ray</TermQuery></Clause>
        <Clause occurs="must"><TermQuery>data</TermQuery></Clause>
      </BooleanQuery>"""
    assert s.search(parse_xml_query(xml), k=50) == \
        s.search("ray AND data", k=50)
    assert s.search(parse_xml_query("<UserQuery>ray AND data</UserQuery>"),
                    k=50) == s.search("ray AND data", k=50)


def test_matchalldocs_hits_every_live_doc(xidx):
    s = xidx
    hits = s.search(MatchAllDocsQuery(), k=10**6)
    # num_docs, not doc_count: MatchAllDocs includes docs whose text
    # analyzed to zero tokens (doc_count is BM25's docs-with-field stat)
    assert len(hits) == s.manifest["stats"]["num_docs"]
    assert all(sc == 1.0 for _, sc in hits)


def test_filter_clause_doesnt_score(xidx):
    s = xidx
    filtered = dict(s.search(parse_xml_query("""
      <BooleanQuery>
        <Clause occurs="filter"><TermQuery>ray</TermQuery></Clause>
        <Clause occurs="must"><TermQuery>data</TermQuery></Clause>
      </BooleanQuery>"""), k=10**6))
    plain = dict(s.search(parse_xml_query("""
      <BooleanQuery>
        <Clause occurs="must"><TermQuery>ray</TermQuery></Clause>
        <Clause occurs="must"><TermQuery>data</TermQuery></Clause>
      </BooleanQuery>"""), k=10**6))
    assert filtered.keys() == plain.keys()  # same doc set
    data_only = dict(s.search(TermQuery("data"), k=10**6))
    for d, sc in filtered.items():
        assert sc == pytest.approx(data_only[d], rel=1e-6)


# --- parser totality fuzz ------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_xml_parser_total(text):
    try:
        parse_xml_query(text)
    except XMLParserError:
        pass
