"""SynonymQuery: blended-stats scoring (SynonymQuery.java:141-249)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.analysis.filters import (
    CustomAnalyzer,
    lowercase_filter,
    make_synonym_filter,
)
from lucene_solr_ray.data.transcripts import transcripts_path
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.oracle import OracleIndex
from lucene_solr_ray.search.query import (
    BooleanQuery,
    SynonymQuery,
    TermQuery,
    parse_query,
)
from lucene_solr_ray.search.searcher import IndexSearcher


def test_parser_emits_synonym_query():
    an = CustomAnalyzer([lowercase_filter,
                         make_synonym_filter({"fast": ["quick", "rapid"]})])
    q = parse_query("fast", an)
    assert isinstance(q, SynonymQuery)
    assert set(q.terms) == {"fast", "quick", "rapid"}
    # non-synonym chunk stays a TermQuery
    assert parse_query("other", an) == TermQuery("other")
    # AND of a synonym chunk and a plain term
    q2 = parse_query("fast AND other", an)
    assert isinstance(q2, BooleanQuery)
    assert any(isinstance(c, SynonymQuery) for c in q2.must)


@pytest.fixture(scope="module")
def syn_pair(ray_session, tmp_path_factory):
    src = transcripts_path("tiny")
    out = tmp_path_factory.mktemp("syn") / "idx"
    build_index(src, str(out), num_shards=3)
    s = IndexSearcher(str(out))
    texts = pq.read_table(src, columns=["text"]).column("text").to_pylist()
    oi = OracleIndex()
    oi.add_all(enumerate(texts))
    return s, oi


def test_synonym_scores_match_oracle(syn_pair):
    s, oi = syn_pair
    for terms in [("ray", "data"), ("ray", "nosuchterm"),
                  ("index", "data", "ray")]:
        q = SynonymQuery(terms)
        got = dict(s.search(q, k=100_000))
        want = {int(d): np.float32(v)
                for d, v in oi._score_synonym(q).items()}
        assert got.keys() == want.keys(), terms
        for d in got:
            assert np.float32(got[d]) == want[d], (terms, d)


def test_synonym_blended_stats_semantics(syn_pair):
    """freq sums; df maxes — a doc with both synonyms outranks the same
    doc under either single term (same norm, bigger tf, one idf)."""
    s, oi = syn_pair
    q = SynonymQuery(("ray", "data"))
    syn = dict(s.search(q, k=100_000))
    ray_only = dict(s.search(TermQuery("ray"), k=100_000))
    # union of matchers
    data_only = dict(s.search(TermQuery("data"), k=100_000))
    assert syn.keys() == ray_only.keys() | data_only.keys()
    # pseudo-df = max(df) -> never less selective than the rarer term
    df_ray, df_data = oi.doc_freq("ray"), oi.doc_freq("data")
    assert df_ray and df_data


def test_synonym_distributed_parity(syn_pair, ray_session):
    from lucene_solr_ray.search.actors import DistributedSearcher

    s, _ = syn_pair
    q = SynonymQuery(("ray", "data", "index"))
    dist = DistributedSearcher(s.index_dir, num_actors=2)
    assert dist.search_batch([q], k=40)[0] == s.search(q, k=40)


def test_boosting_query_demotes_context_matches(syn_pair, ray_session):
    """BoostingQuery.java:106-130: same doc set as match; context
    matches score *= negative_boost."""
    from lucene_solr_ray.search.query import BoostingQuery

    s, _ = syn_pair
    plain = dict(s.search(TermQuery("ray"), k=100_000))
    ctx = set(d for d, _ in s.search(TermQuery("data"), k=100_000))
    bq = BoostingQuery(match=TermQuery("ray"), context=TermQuery("data"),
                       negative_boost=0.25)
    got = dict(s.search(bq, k=100_000))
    assert got.keys() == plain.keys()
    for d, sc in got.items():
        want = plain[d] * np.float32(0.25) if d in ctx else plain[d]
        assert np.float32(sc) == np.float32(want), d
    assert any(d in ctx for d in got)  # the demotion path was exercised

    from lucene_solr_ray.search.actors import DistributedSearcher

    dist = DistributedSearcher(s.index_dir, num_actors=2)
    assert dist.search_batch([bq], k=30)[0] == s.search(bq, k=30)
