"""Span family: SpanNear (ordered/unordered), SpanOr, SpanNot.

Kernel cases hand-derived from the reference semantics
(NearSpansOrdered.java:100-118, NearSpansUnordered.java:195,258,
SpanNotQuery.java, SpanScorer.java computeSlopFactor); engine-vs-oracle
identity over a multi-shard index in the test_oracle fuzz style."""

import numpy as np
import pytest

from lucene_solr_ray.data.transcripts import transcripts_path
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.oracle import OracleIndex
from lucene_solr_ray.search.query import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    parse_query,
    parse_span,
    span_freq,
    span_spans,
)
from lucene_solr_ray.search.searcher import IndexSearcher


def _pos_of_factory(doc: str):
    toks = doc.split()
    def pos_of(term):
        ps = [i for i, t in enumerate(toks) if t == term]
        return ps or None
    return pos_of


def T(t):
    return SpanTermQuery(t)


def test_near_ordered_hand_cases():
    # "t1 t2 t1 t3 t2 t3" with slop 1 matches twice (the NearSpansOrdered
    # javadoc's own example)
    pos = _pos_of_factory("t1 t2 t1 t3 t2 t3")
    q = SpanNearQuery((T("t1"), T("t2"), T("t3")), slop=1, in_order=True)
    spans = span_spans(q, pos)
    assert len(spans) == 2
    assert spans[0] == (0, 4, 1)   # t1(0) t2(1) .. t3(3): gap 0 + 1
    assert spans[1] == (2, 6, 1)   # t1(2) .. t2(4) t3(5): gap 1 + 0
    # slop 0: no match (no adjacent ordered triple)
    q0 = SpanNearQuery((T("t1"), T("t2"), T("t3")), slop=0, in_order=True)
    assert span_spans(q0, pos) == []
    # exact adjacency
    pos2 = _pos_of_factory("a b c x a c b")
    qa = SpanNearQuery((T("a"), T("b"), T("c")), slop=0, in_order=True)
    assert span_spans(qa, pos2) == [(0, 3, 0)]
    # ordered a c b: a(0) stretches to c(2), b(6) -> width 4 (no at slop 0);
    # a(4) c(5) b(6) is adjacent -> width 0 match
    qb = SpanNearQuery((T("a"), T("c"), T("b")), slop=0, in_order=True)
    assert span_spans(qb, pos2) == [(4, 7, 0)]
    # b a c ordered never occurs
    qc = SpanNearQuery((T("b"), T("a"), T("c")), slop=0, in_order=True)
    assert span_spans(qc, pos2) == []
    # ... but does within slop 2: b(1) a(4)? width (4-2)=2 then c(5): +0
    qc2 = SpanNearQuery((T("b"), T("a"), T("c")), slop=2, in_order=True)
    assert span_spans(qc2, pos2) == [(1, 6, 2)]


def test_near_unordered_hand_cases():
    pos = _pos_of_factory("a x b")
    q = SpanNearQuery((T("a"), T("b")), slop=0, in_order=False)
    # window a(0)..b(3): 3 - 0 - 2 = 1 > 0
    assert span_spans(q, pos) == []
    q1 = SpanNearQuery((T("a"), T("b")), slop=1, in_order=False)
    assert span_spans(q1, pos) == [(0, 3, 2)]  # width = b.start - a.start
    # unordered matches reversed order too
    pos2 = _pos_of_factory("b a")
    assert span_spans(q1, pos2) == [(0, 2, 1)]
    # overlap (same position terms impossible; adjacent counts twice when
    # both windows qualify)
    pos3 = _pos_of_factory("a b a")
    spans = span_spans(SpanNearQuery((T("a"), T("b")), slop=0,
                                     in_order=False), pos3)
    assert spans == [(0, 2, 1), (1, 3, 1)]


def test_span_or_and_not():
    pos = _pos_of_factory("a b c a z c")
    assert span_spans(SpanOrQuery((T("a"), T("c"))), pos) == \
        [(0, 1, 0), (2, 3, 0), (3, 4, 0), (5, 6, 0)]
    # spanNot: "a" not immediately followed by "b"
    near_ab = SpanNearQuery((T("a"), T("b")), slop=0, in_order=True)
    notq = SpanNotQuery(T("a"), near_ab)
    # a(0) overlaps the ab span (0,2) -> dropped; a(3) kept
    assert span_spans(notq, pos) == [(3, 4, 0)]
    # pre/post widen the forbidden window
    pos2 = _pos_of_factory("z a z b")
    n = SpanNotQuery(T("a"), T("b"))
    assert span_spans(n, pos2) == [(1, 2, 0)]
    n_post = SpanNotQuery(T("a"), T("b"), post=2)
    assert span_spans(n_post, pos2) == []


def test_span_freq_slop_factor():
    # freq = sum 1/(1+width) over matches
    pos = _pos_of_factory("t1 t2 t1 t3 t2 t3")
    q = SpanNearQuery((T("t1"), T("t2"), T("t3")), slop=1, in_order=True)
    assert span_freq(q, pos) == pytest.approx(2 * (1 / 2))


def test_parse_span_syntax():
    q = parse_query('spanNear([ray, data], 2, false)')
    assert isinstance(q, SpanNearQuery)
    assert [c.term for c in q.clauses] == ["ray", "data"]
    assert q.slop == 2 and q.in_order is False
    q2 = parse_query("spanOr([ray, spanNear([big, data], 0, true)])")
    assert isinstance(q2, SpanOrQuery)
    assert isinstance(q2.clauses[1], SpanNearQuery)
    q3 = parse_query("spanNot(ray, data)")
    assert isinstance(q3, SpanNotQuery)
    q4 = parse_query("spanFirst(ray, 3)")
    assert isinstance(q4, SpanFirstQuery) and q4.end == 3
    with pytest.raises(ValueError):
        parse_span("spanNear([a, b")


@pytest.fixture(scope="module")
def engine_and_oracle(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    src = transcripts_path("tiny")
    out = tmp_path_factory.mktemp("spanidx") / "idx"
    build_index(src, str(out), num_shards=4)
    searcher = IndexSearcher(str(out))
    texts = pq.read_table(src, columns=["text"]).column("text").to_pylist()
    oracle = OracleIndex()
    oracle.add_all(enumerate(texts))
    return searcher, oracle, texts


def test_span_engine_matches_oracle(engine_and_oracle):
    searcher, oracle, texts = engine_and_oracle
    # harvest common word pairs from the corpus for meaningful queries
    rng = np.random.default_rng(5)
    words = sorted({w for t in texts[:50] for w in t.lower().split()
                    if w.isalpha() and len(w) > 2})
    queries = []
    for _ in range(60):
        a, b = (words[int(rng.integers(0, len(words)))],
                words[int(rng.integers(0, len(words)))])
        c = words[int(rng.integers(0, len(words)))]
        slop = int(rng.integers(0, 5))
        order = bool(rng.integers(0, 2))
        queries.append(SpanNearQuery((T(a), T(b)), slop=slop,
                                     in_order=order))
        queries.append(SpanOrQuery((T(a), SpanNearQuery(
            (T(b), T(c)), slop=slop, in_order=order))))
        queries.append(SpanNotQuery(
            T(a), SpanNearQuery((T(a), T(b)), slop=1, in_order=True)))
    n_nonempty = 0
    for q in queries:
        got = searcher.search(q, k=10)
        want = oracle.search(q, k=10)
        assert [(d, float(s)) for d, s in got] == \
            [(d, float(s)) for d, s in want], q
        n_nonempty += bool(got)
    assert n_nonempty > 10  # the fuzz actually exercised matches


def test_span_rank_sane_on_real_index(engine_and_oracle):
    searcher, oracle, texts = engine_and_oracle
    # a genuinely-occurring adjacent pair must be found by ordered near
    from lucene_solr_ray.analysis import get_analyzer

    analyzer = get_analyzer("standard")
    pair = None
    for t in texts:
        terms, positions = analyzer.analyze(t)
        for i in range(len(terms) - 1):
            if (positions[i + 1] == positions[i] + 1
                    and terms[i] != terms[i + 1]):
                pair = (terms[i], terms[i + 1])
                break
        if pair:
            break
    if pair is None:
        pytest.skip("no adjacent distinct pair")
    q = SpanNearQuery((T(pair[0]), T(pair[1])), slop=0, in_order=True)
    hits = searcher.search(q, k=10)
    assert hits  # at least the harvested doc matches


def test_parse_span_totality_fuzz():
    """Random operator soup either parses or raises ValueError — never
    any other exception (parser-totality contract, matching the classic
    and streaming grammars' fuzz)."""
    import numpy as np

    rng = np.random.default_rng(13)
    pieces = ["spanNear(", "spanOr(", "spanNot(", "spanFirst(", "[", "]",
              "(", ")", ",", "ray", "data", "3", "true", "false", "", " ",
              "spanNear([a, b], 1, true)", "~", "*"]
    for _ in range(300):
        n = int(rng.integers(1, 7))
        s = " ".join(pieces[int(rng.integers(0, len(pieces)))]
                     for _ in range(n))
        try:
            parse_span(s)
        except ValueError:
            pass


def test_near_unordered_composite_no_phantom_matches():
    """Regression: with composite subspans a cell's end can DECREASE on
    advance; a cached max-end cell then emitted matches violating the
    slop bound. The max cell is recomputed per window."""
    from lucene_solr_ray.search.query import _near_unordered

    subs = [[(0, 10, 0), (1, 2, 0)], [(0, 1, 0), (5, 6, 0)]]
    out = _near_unordered(subs, slop=0)
    # cells {(1,2),(5,6)}: window 6-1-2=3 > 0 must NOT match
    assert (1, 2, 0) not in out
    for s, e, w in out:
        assert e - s >= 0
    assert out == [(0, 10, 0), (0, 10, 0)]


def test_span_first_wraps_composite_queries(engine_and_oracle):
    """SpanFirst over an arbitrary span query (SpanPositionRange
    composition): kernel filter by end, engine == oracle."""
    from lucene_solr_ray.search.query import parse_span

    # kernel: the ab span at (0,2) passes end<=2; the one at (4,6) fails
    pos = _pos_of_factory("a b z z a b")
    inner = SpanNearQuery((T("a"), T("b")), slop=0, in_order=True)
    q = SpanFirstQuery(end=2, query=inner)
    assert span_spans(q, pos) == [(0, 2, 0)]
    assert span_spans(SpanFirstQuery(end=6, query=inner), pos) == \
        [(0, 2, 0), (4, 6, 0)]
    # parser accepts a composite clause
    p = parse_span("spanFirst(spanNear([a, b], 0, true), 2)")
    assert isinstance(p, SpanFirstQuery) and p.query is not None
    # engine == oracle on the real index
    searcher, oracle, texts = engine_and_oracle
    words = sorted({w for t in texts[:30] for w in t.lower().split()
                    if w.isalpha() and len(w) > 2})
    checked = 0
    for a, b in zip(words[:20], words[5:25]):
        q = SpanFirstQuery(end=4, query=SpanNearQuery(
            (T(a), T(b)), slop=2, in_order=False))
        got = searcher.search(q, k=10)
        want = oracle.search(q, k=10)
        assert [(d, float(s)) for d, s in got] == \
            [(d, float(s)) for d, s in want], (a, b)
        checked += bool(got)
