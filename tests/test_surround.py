"""Surround query language (lucene/queryparser/surround): infix/prefix
AND/OR/NOT/nW/nN with slop = n-1, truncation inside distance ops."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.query import (
    BooleanQuery,
    PrefixQuery,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
    TermQuery,
    rewrite_span_multiterms,
    span_spans,
)
from lucene_solr_ray.search.searcher import IndexSearcher
from lucene_solr_ray.search.surround import parse_surround


def test_infix_boolean_shapes():
    q = parse_surround("aa and bb or cc")
    assert isinstance(q, BooleanQuery) and q.min_should_match == 1
    assert q.should[0] == BooleanQuery(must=[TermQuery("aa"),
                                             TermQuery("bb")])
    assert q.should[1] == TermQuery("cc")
    q = parse_surround("aa NOT bb NOT cc")  # left-assoc
    assert q == BooleanQuery(
        must=[BooleanQuery(must=[TermQuery("aa")],
                           must_not=[TermQuery("bb")])],
        must_not=[TermQuery("cc")])


def test_distance_ops_slop_and_order():
    q = parse_surround("cc 3w dd")
    assert q == SpanNearQuery((SpanTermQuery("cc"), SpanTermQuery("dd")),
                              slop=2, in_order=True)
    q = parse_surround("cc N dd N ee")  # default n=1, left-assoc
    inner = SpanNearQuery((SpanTermQuery("cc"), SpanTermQuery("dd")),
                          slop=0, in_order=False)
    assert q == SpanNearQuery((inner, SpanTermQuery("ee")),
                              slop=0, in_order=False)


def test_prefix_forms():
    q = parse_surround("99w(aa, bb, cc)")
    assert isinstance(q, SpanNearQuery) and q.slop == 98 and q.in_order
    assert len(q.clauses) == 3
    q = parse_surround("and(aa, bb, cc)")
    assert q == BooleanQuery(must=[TermQuery("aa"), TermQuery("bb"),
                                   TermQuery("cc")])
    q = parse_surround("20n(aa*, bb*)")
    assert isinstance(q, SpanNearQuery) and not q.in_order
    assert q.clauses == (PrefixQuery(prefix="aa"), PrefixQuery(prefix="bb"))


def test_or_inside_distance_becomes_spanor():
    q = parse_surround("3w(aa or bb, cc)")
    assert isinstance(q.clauses[0], SpanOrQuery)


def test_and_inside_distance_rejected():
    with pytest.raises(ValueError):
        parse_surround("3w(aa and bb, cc)")


def test_distance_range_enforced():
    with pytest.raises(ValueError):
        parse_surround("100w(aa, bb)")


def test_truncation_rewrite_in_span():
    q = parse_surround("w(jo*, smith)")
    vocab = sorted(["john", "jon", "smith", "zeta"])
    rq = rewrite_span_multiterms(q, vocab)
    assert isinstance(rq.clauses[0], SpanOrQuery)
    assert {c.term for c in rq.clauses[0].clauses} == {"john", "jon"}

    def pos_of_factory(doc):
        toks = doc.split()
        def pos_of(t):
            ps = [i for i, x in enumerate(toks) if x == t]
            return ps or None
        return pos_of

    assert span_spans(rq, pos_of_factory("john smith")) != []
    assert span_spans(rq, pos_of_factory("smith john")) == []
    assert span_spans(rq, pos_of_factory("zeta smith")) == []


@pytest.fixture(scope="module")
def sr_index(ray_session, tmp_path_factory):
    rng = np.random.default_rng(23)
    vocab = ["alpha", "beta", "gamma", "delta", "ray", "data", "span"]
    docs = [" ".join(rng.choice(vocab, size=7)) for _ in range(250)]
    root = tmp_path_factory.mktemp("surround")
    src = root / "src.parquet"
    n = len(docs)
    pq.write_table(pa.table({
        "conv_id": [f"c{i:05d}" for i in range(n)],
        "turn_idx": pa.array([0] * n, type=pa.int32()),
        "role": ["user"] * n,
        "text": docs,
        "tool": [""] * n,
        "ts": pa.array([0] * n, type=pa.timestamp("us")),
    }), src)
    out = root / "idx"
    build_index(str(src), str(out), num_shards=3)
    return IndexSearcher(str(out)), docs


@pytest.mark.parametrize("qs", [
    "alpha w beta", "alpha 3w beta", "alpha N beta", "2n(ray, data)",
    "al* w beta", "3w(alpha or gamma, de*)", "alpha and beta",
    "alpha NOT beta", "and(ray, data, span)"])
def test_engine_matches_bruteforce(sr_index, qs):
    s, docs = sr_index
    q = parse_surround(qs)
    got = {d for d, _ in s.search(q, k=len(docs))}

    vocab = sorted({t for d in docs for t in d.split()})
    from lucene_solr_ray.search.query import (MatchNoDocs,
                                              MultiTermQuery,
                                              expand_multi_term)

    def matches(node, toks) -> bool:
        def pos_of(t):
            ps = [i for i, x in enumerate(toks) if x == t]
            return ps or None
        if isinstance(node, TermQuery):
            return node.term in toks
        if isinstance(node, MultiTermQuery):
            return any(t in toks for t in expand_multi_term(node, vocab))
        if isinstance(node, BooleanQuery):
            ok = all(matches(c, toks) for c in node.must)
            if node.should:
                n_sh = sum(matches(c, toks) for c in node.should)
                ok = ok and n_sh >= max(node.min_should_match,
                                        0 if node.must else 1)
            ok = ok and not any(matches(c, toks) for c in node.must_not)
            return ok
        if isinstance(node, MatchNoDocs):
            return False
        rq = rewrite_span_multiterms(node, vocab)
        return bool(span_spans(rq, pos_of))

    want = {i for i, d in enumerate(docs) if matches(q, d.split())}
    assert got == want, qs


# --- parser totality fuzz (the repo's grammar-fuzz pattern) -------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=50))
def test_surround_parser_total(text):
    """Any input either parses or raises ValueError — never crashes."""
    try:
        parse_surround(text)
    except ValueError:
        pass


_TOK = st.sampled_from(["aa", "bb", "cc*", "a?c", "3w", "n", "AND", "OR",
                        "NOT", "(", ")", ",", "99w", "100w", "w"])


@settings(max_examples=300, deadline=None)
@given(st.lists(_TOK, max_size=10))
def test_surround_tokens_total(toks):
    try:
        parse_surround(" ".join(toks))
    except ValueError:
        pass
