"""ComplexPhraseQueryParser: phrases with embedded wildcards / fuzzy /
OR groups / negation (ComplexPhraseQueryParser.java:65,210,252-345)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.query import (
    ComplexPhraseQuery,
    PrefixQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    TermQuery,
    parse_complex_phrase,
    rewrite_complex_phrase,
    span_spans,
)
from lucene_solr_ray.search.searcher import IndexSearcher

VOCAB = ["john", "jon", "jonathan", "smith", "smythe", "payne", "gork",
         "albert", "ray"]


def test_parse_produces_complex_phrase_nodes():
    q = parse_complex_phrase('"jo* smith"~2')
    assert isinstance(q, ComplexPhraseQuery)
    assert q.slop == 2 and q.in_order is True
    assert len(q.clauses) == 2
    assert q.clauses[0] == (False, PrefixQuery(prefix="jo"))
    assert q.clauses[1] == (False, TermQuery("smith"))


def test_single_plain_term_phrase_stays_termquery():
    # rewrite contract :257 — a one-term phrase returns the TermQuery
    q = parse_complex_phrase('"smith"')
    out = rewrite_complex_phrase(q, VOCAB)
    assert out == TermQuery("smith")


def test_rewrite_expansion_and_groups():
    q = parse_complex_phrase('"(john jon jonath*) smith"')
    out = rewrite_complex_phrase(q, sorted(VOCAB))
    assert isinstance(out, SpanNearQuery) and out.in_order
    pos0, pos1 = out.clauses
    assert isinstance(pos0, SpanOrQuery)
    assert {c.term for c in pos0.clauses} == {"john", "jon", "jonathan"}
    assert pos1 == SpanTermQuery("smith")


def test_rewrite_empty_expansion_matches_nothing():
    # 'must match nothing' dummy clause (:296-299): "fred smithe*" with
    # no smithe* terms must NOT match on just fred
    q = parse_complex_phrase('"john qzx*"')
    out = rewrite_complex_phrase(q, sorted(VOCAB))
    assert isinstance(out, SpanNearQuery)
    dummy = out.clauses[1]
    assert isinstance(dummy, SpanTermQuery)
    assert dummy.term not in VOCAB


def test_rewrite_negative_elements():
    # (:315-345) negatives -> SpanNot(include=positives near with
    # slop+numNeg, exclude=all-clauses near at slop)
    q = parse_complex_phrase('"john -payne smith"')
    out = rewrite_complex_phrase(q, sorted(VOCAB))
    assert isinstance(out, SpanNotQuery)
    inc, exc = out.include, out.exclude
    assert isinstance(inc, SpanNearQuery) and len(inc.clauses) == 2
    assert inc.slop == 0 + 1  # slop + numNegatives
    assert isinstance(exc, SpanNearQuery) and len(exc.clauses) == 3
    assert exc.slop == 0


def test_span_kernel_negative_semantics():
    q = rewrite_complex_phrase(
        parse_complex_phrase('"john -payne smith"'), sorted(VOCAB))

    def pos_of_factory(doc):
        toks = doc.split()
        def pos_of(t):
            ps = [i for i, x in enumerate(toks) if x == t]
            return ps or None
        return pos_of

    # adjacent positives with the negative between -> excluded
    assert span_spans(q, pos_of_factory("john payne smith")) == []
    # positives adjacent, no payne -> matches (include slop 1 allows gap 1)
    assert span_spans(q, pos_of_factory("john smith")) != []
    assert span_spans(q, pos_of_factory("john gork smith")) != []
    assert span_spans(q, pos_of_factory("smith john")) == []  # in-order


@pytest.fixture(scope="module")
def cp_index(ray_session, tmp_path_factory):
    rng = np.random.default_rng(13)
    docs = [" ".join(rng.choice(VOCAB, size=8)) for _ in range(300)]
    docs += ["john smith walks", "jonathan smythe runs", "jon smith payne",
             "payne john smith", "albert gork", "john payne smith"]
    root = tmp_path_factory.mktemp("cpx")
    src = root / "src.parquet"
    pq.write_table(pa.table({
        "conv_id": [f"c{i:05d}" for i in range(len(docs))],
        "turn_idx": pa.array([0] * len(docs), type=pa.int32()),
        "role": ["user"] * len(docs),
        "text": docs,
        "tool": [""] * len(docs),
        "ts": pa.array([0] * len(docs), type=pa.timestamp("us")),
    }), src)
    out = root / "idx"
    build_index(str(src), str(out), num_shards=3)
    return IndexSearcher(str(out)), docs


@pytest.mark.parametrize("qs", [
    '"jo* smith"', '"(john jon) sm*"~1', '"john -payne smith"~1',
    '"jonathan~1 smythe"', '"jo* [p TO t]"', '"albert gork"'])
def test_engine_matches_bruteforce(cp_index, qs):
    s, docs = cp_index
    q = parse_complex_phrase(qs)
    hits = s.search(q, k=len(docs))
    got = {d for d, _ in hits}

    want = set()
    vocab = sorted({t for d in docs for t in d.split()})
    rq = rewrite_complex_phrase(q, vocab)
    for i, d in enumerate(docs):
        toks = d.split()
        def pos_of(t, _toks=toks):
            ps = [j for j, x in enumerate(_toks) if x == t]
            return ps or None
        if span_spans(rq, pos_of):
            want.add(i)
    assert got == want, qs


# --- parser totality fuzz ------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_complex_phrase_parser_total(text):
    """parse + rewrite against a tiny vocab never crash outside
    ValueError."""
    try:
        q = parse_complex_phrase(text)
    except ValueError:
        return
    from lucene_solr_ray.search.query import ComplexPhraseQuery

    def walk(node):
        if isinstance(node, ComplexPhraseQuery):
            try:
                rewrite_complex_phrase(node, ["alpha", "beta"])
            except ValueError:
                pass
    walk(q)
