"""BM25 golden scenario (FIXTURES.md §3 micro-corpus) against the oracle,
plus parser tests. Literal expected values hand-derived from the reference
formulas (BM25Similarity.java:61-74,99-105,241-245; SmallFloat-315)."""

import numpy as np
import pytest

from lucene_solr_ray.search import BooleanQuery, PhraseQuery, TermQuery, parse_query
from lucene_solr_ray.search.oracle import OracleIndex

DOCS = [
    (0, "ray data builds the index"),
    (1, "ray ray ray scales out"),
    (2, "lucene index segments merge fast"),
    (3, "the quick query finds ray"),
    (4, "merge the segments"),
]


@pytest.fixture(scope="module")
def idx():
    oi = OracleIndex()
    oi.add_all(DOCS)
    return oi


def test_collection_stats(idx):
    assert idx.doc_count == 5
    assert idx.sum_total_term_freq == 20  # 4+5+5+4+2 after stop filtering
    assert float(idx.avgdl) == 4.0


def test_term_stats(idx):
    assert idx.doc_freq("ray") == 3
    assert idx.total_term_freq("ray") == 5
    assert idx.doc_freq("index") == 2
    assert idx.doc_freq("segments") == 2
    assert idx.doc_freq("the") == 0  # stopword never indexed


def test_norm_bytes(idx):
    # SmallFloat-315 of 1/sqrt(len): len4 -> 120, len5 -> 119, len2 -> 121
    assert idx.norms[0] == 120
    assert idx.norms[1] == 119
    assert idx.norms[4] == 121


def test_single_term_scores(idx):
    res = idx.search("ray", k=10)
    assert [d for d, _ in res] == [1, 0, 3]
    scores = {d: s for d, s in res}
    assert scores[1] == np.float32(0.7948539)
    # docs 0 and 3: identical freq=1, len=4 -> identical score; tie -> lower id
    assert scores[0] == scores[3] == np.float32(0.5389965)


def test_idf_float32(idx):
    from lucene_solr_ray.search import bm25

    assert bm25.idf(3, 5) == np.float32(0.5389965)
    assert bm25.idf(2, 5) == np.float32(0.87546873)


def test_and_query(idx):
    res = idx.search("ray AND index", k=10)
    assert [d for d, _ in res] == [0]
    # sum of the two clause scores
    ray = {d: s for d, s in idx.search("ray", k=10)}
    index = {d: s for d, s in idx.search("index", k=10)}
    assert res[0][1] == np.float32(np.float32(ray[0]) + np.float32(index[0]))


def test_or_query(idx):
    res = idx.search("ray OR merge", k=10)
    assert {d for d, _ in res} == {0, 1, 2, 3, 4}


def test_must_not(idx):
    res = idx.search("ray -segments", k=10)
    assert [d for d, _ in res] == [1, 0, 3]
    res2 = idx.search("merge -fast", k=10)
    assert [d for d, _ in res2] == [4]


def test_phrase(idx):
    res = idx.search('"segments merge"', k=10)
    assert [d for d, _ in res] == [2]
    # doc4 "merge the segments" has both terms but not adjacent (hole at "the")
    res2 = idx.search('"merge segments"', k=10)
    assert [d for d, _ in res2] == []


def test_phrase_with_stopword_hole(idx):
    # query "merge the segments" analyzes to terms (merge, segments) with
    # positions (0, 2) — matches doc4 exactly (same hole)
    res = idx.search('"merge the segments"', k=10)
    assert [d for d, _ in res] == [4]


def test_topk_cutoff(idx):
    res = idx.search("ray OR merge", k=2)
    assert len(res) == 2
    full = idx.search("ray OR merge", k=10)
    assert res == full[:2]


def test_stopword_only_query(idx):
    assert idx.search("the", k=10) == []


def test_unknown_term(idx):
    assert idx.search("zzzmissing", k=10) == []


# --- parser shape tests ---

def test_parse_single_term():
    q = parse_query("ray")
    assert q == TermQuery("ray")


def test_parse_implicit_or():
    q = parse_query("ray merge")
    assert isinstance(q, BooleanQuery)
    assert q.should == [TermQuery("ray"), TermQuery("merge")]
    assert q.must == [] and q.must_not == []


def test_parse_and():
    q = parse_query("ray AND index")
    assert isinstance(q, BooleanQuery)
    assert q.must == [TermQuery("ray"), TermQuery("index")]


def test_parse_plus_minus():
    q = parse_query("+ray -segments merge")
    assert isinstance(q, BooleanQuery)
    assert q.must == [TermQuery("ray")]
    assert q.must_not == [TermQuery("segments")]
    assert q.should == [TermQuery("merge")]


def test_parse_not_keyword():
    q = parse_query("ray NOT segments")
    assert isinstance(q, BooleanQuery)
    assert q.must_not == [TermQuery("segments")]


def test_parse_phrase():
    q = parse_query('"segments merge"')
    assert q == PhraseQuery(("segments", "merge"), (0, 1))


def test_parse_phrase_hole():
    q = parse_query('"merge the segments"')
    assert q == PhraseQuery(("merge", "segments"), (0, 2))


def test_parse_stopword_clause_dropped():
    q = parse_query("ray the")
    assert q == TermQuery("ray")


def test_parse_multi_token_chunk_becomes_phrase():
    # classic parser: one chunk analyzing to multiple tokens -> phrase
    q = parse_query("foo-bar")
    assert q == PhraseQuery(("foo", "bar"), (0, 1))


# --- multi-term queries (constant-score rewrite, MultiTermQuery.java:68) ---

def test_prefix_query(idx):
    res = idx.search("seg*", k=10)
    # docs 2 and 4 contain "segments"; constant score 1.0, tie -> lower id
    assert [(d, float(s)) for d, s in res] == [(2, 1.0), (4, 1.0)]


def test_wildcard_query(idx):
    res = idx.search("*ndex", k=10)
    assert {d for d, _ in res} == {0, 2}
    assert all(float(s) == 1.0 for _, s in res)


def test_fuzzy_query(idx):
    # "luceen"~2 matches "lucene" (doc 2)
    res = idx.search("luceen~2", k=10)
    assert [d for d, _ in res] == [2]
    # one transposition = one edit (Damerau/OSA, FuzzyQuery default)
    res1 = idx.search("luceen~1", k=10)
    assert [d for d, _ in res1] == [2]
    # but a genuinely 2-edit term fails at ~1
    assert idx.search("lucccne~1", k=10) == []


def test_range_query(idx):
    # [merge TO ray] covers merge, out, quick, query, ray (lexicographic)
    res = idx.search("[merge TO ray]", k=10)
    assert {d for d, _ in res} == {0, 1, 2, 3, 4}


def test_multiterm_in_boolean(idx):
    res = idx.search("seg* AND fast", k=10)
    assert [d for d, _ in res] == [2]
    # score = 1.0 (constant) + bm25(fast)
    fast = {d: s for d, s in idx.search("fast", k=10)}
    import numpy as np

    assert res[0][1] == np.float32(np.float32(1.0) + fast[2])


def test_parse_multiterm_shapes():
    from lucene_solr_ray.search.query import (
        FuzzyQuery,
        PrefixQuery,
        TermRangeQuery,
        WildcardQuery,
    )

    assert parse_query("seg*") == PrefixQuery(prefix="seg")
    assert parse_query("s?g*") == WildcardQuery(pattern="s?g*")
    assert parse_query("lucene~1") == FuzzyQuery(term="lucene", max_edits=1)
    assert parse_query("lucene~") == FuzzyQuery(term="lucene", max_edits=2)
    assert parse_query("[alpha TO beta]") == TermRangeQuery(
        lower="alpha", upper="beta")


def test_parse_boost_and_field_prefix():
    q = parse_query("ray^2.5")
    assert q == TermQuery("ray", boost=2.5)
    q2 = parse_query("text:ray")
    assert q2 == TermQuery("ray")
    q3 = parse_query("12:30")  # colon kept, not a field prefix
    assert q3 == PhraseQuery(("12", "30"), (0, 1))


def test_boost_scales_score(idx):
    import numpy as np

    boosted = {d: s for d, s in idx.search("ray^3", k=10)}
    # boost multiplies weightValue before the tf quotient
    from lucene_solr_ray.search import bm25
    from lucene_solr_ray.util.smallfloat import encode_norm

    w = bm25.weight_value(bm25.idf(3, 5), boost=3.0)
    cache = bm25.norm_cache(np.float32(4.0))
    f = np.float32(3.0)
    expected_doc1 = np.float32(w * f / (f + cache[int(encode_norm(5))]))
    assert boosted[1] == expected_doc1
