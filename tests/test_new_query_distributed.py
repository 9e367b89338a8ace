"""Distributed parity for the continuation-session query surfaces:
complex-phrase, surround, XML, MatchAllDocs through the actor pool."""

import pytest

from lucene_solr_ray.data.transcripts import transcripts_path
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.actors import DistributedSearcher
from lucene_solr_ray.search.query import (
    MatchAllDocsQuery,
    parse_complex_phrase,
)
from lucene_solr_ray.search.searcher import IndexSearcher
from lucene_solr_ray.search.surround import parse_surround
from lucene_solr_ray.search.xmlparser import parse_xml_query


@pytest.fixture(scope="module")
def pair(ray_session, tmp_path_factory):
    src = transcripts_path("tiny")
    out = tmp_path_factory.mktemp("nqd") / "idx"
    build_index(src, str(out), num_shards=4)
    return IndexSearcher(str(out)), DistributedSearcher(str(out),
                                                        num_actors=2)


def test_distributed_parity_new_query_languages(pair):
    local, dist = pair
    queries = [
        parse_complex_phrase('"ra* data"'),
        parse_complex_phrase('"(ray data) index"~2'),
        parse_surround("ray w data"),
        parse_surround("3w(ra*, data)"),
        parse_surround("ray and data or index"),
        parse_xml_query("<BooleanQuery>"
                        "<Clause occurs='must'><TermQuery>ray</TermQuery>"
                        "</Clause><Clause occurs='should'>"
                        "<TermQuery>data</TermQuery></Clause>"
                        "</BooleanQuery>"),
        parse_xml_query("<SpanNear slop='1' inOrder='true'>"
                        "<SpanTerm>ray</SpanTerm><SpanTerm>data</SpanTerm>"
                        "</SpanNear>"),
        MatchAllDocsQuery(),
    ]
    got = dist.search_batch(queries, k=25)
    for q, hits in zip(queries, got):
        assert hits == local.search(q, k=25), q
