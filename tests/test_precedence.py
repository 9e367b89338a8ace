"""PrecedenceQueryParser: AND binds tighter than OR — structural trees
per the flexible/precedence javadoc example, plus engine result identity
against the equivalent hand-built nested query."""

import pytest

from lucene_solr_ray.analysis import StandardAnalyzer
from lucene_solr_ray.data.transcripts import transcripts_path
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.precedence import parse_precedence
from lucene_solr_ray.search.query import (
    BooleanQuery,
    PhraseQuery,
    TermQuery,
    parse_query,
)
from lucene_solr_ray.search.searcher import IndexSearcher

AN = StandardAnalyzer()


def T(t):
    return TermQuery(t, 1.0)


def parse(text):
    return parse_precedence(text, AN)


def test_javadoc_example():
    # <a AND b OR c AND d> -> <(+a +b) (+c +d)>
    q = parse("alpha AND beta OR gamma AND delta")
    assert q == BooleanQuery(should=[
        BooleanQuery(must=[T("alpha"), T("beta")]),
        BooleanQuery(must=[T("gamma"), T("delta")]),
    ])
    # classic parser flattens the same input to +a +b +c +d
    flat = parse_query("alpha AND beta OR gamma AND delta")
    assert flat == BooleanQuery(
        must=[T("alpha"), T("beta"), T("gamma"), T("delta")])


def test_single_chain_and_plain_terms():
    assert parse("alpha AND beta") == BooleanQuery(
        must=[T("alpha"), T("beta")])
    assert parse("alpha beta") == BooleanQuery(
        should=[T("alpha"), T("beta")])
    assert parse("alpha") == BooleanQuery(should=[T("alpha")])


def test_modifiers_inside_chain():
    q = parse("alpha AND NOT beta OR gamma")
    assert q == BooleanQuery(should=[
        BooleanQuery(must=[T("alpha")], must_not=[T("beta")]),
        T("gamma"),
    ])
    q2 = parse("+alpha -beta gamma")
    assert q2 == BooleanQuery(must=[T("alpha")], must_not=[T("beta")],
                              should=[T("gamma")])


def test_parentheses_override():
    q = parse("alpha AND (beta OR gamma)")
    assert q == BooleanQuery(must=[
        T("alpha"),
        BooleanQuery(should=[T("beta"), T("gamma")]),
    ])


def test_phrase_atom_in_chain():
    q = parse('"ray data"~1 AND lake')
    assert q == BooleanQuery(must=[
        PhraseQuery(("ray", "data"), (0, 1), slop=1), T("lake")])


def test_lenient_garbage():
    for text in ("AND", "OR OR", "(", ")", "a AND", "NOT", '"unclosed'):
        parse(text)  # must not raise


@pytest.fixture(scope="module")
def searcher(ray_session, tmp_path_factory):
    src = transcripts_path("tiny")
    out = tmp_path_factory.mktemp("prec_idx") / "idx"
    build_index(src, str(out), num_shards=3)
    return IndexSearcher(str(out))


def test_engine_results_match_hand_query(searcher):
    got = searcher.search(parse("ray AND data OR lake AND house"), k=20)
    hand = BooleanQuery(should=[
        BooleanQuery(must=[T("ray"), T("data")]),
        BooleanQuery(must=[T("lake"), T("house")]),
    ])
    want = searcher.search(hand, k=20)
    assert got == want
    # and it differs from the classic flat parse on this corpus unless
    # some doc matches all four terms
    flat = searcher.search(
        parse_query("ray AND data OR lake AND house"), k=20)
    flat_docs = {d for d, _ in flat}
    got_docs = {d for d, _ in got}
    assert flat_docs <= got_docs


def test_dangling_operator_in_group_does_not_swallow_rp():
    # "(alpha AND) OR beta": the lenient recovery must not consume ')'
    q = parse("(alpha AND) OR beta")
    assert q == BooleanQuery(should=[
        BooleanQuery(must=[T("alpha")]),
        T("beta"),
    ])
