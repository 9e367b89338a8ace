"""Query-time field facets, prefix suggest, collapse search."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.data.transcripts import transcripts_path
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.features import _all_hits, collapse_search
from lucene_solr_ray.search.oracle import OracleIndex
from lucene_solr_ray.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def searcher(ray_session, tmp_path_factory):
    src = transcripts_path("tiny")
    out = tmp_path_factory.mktemp("facet") / "idx"
    build_index(src, str(out), num_shards=3)
    return IndexSearcher(str(out)), src


def test_facet_role_matches_recount(searcher):
    s, src = searcher
    table = pq.read_table(src, columns=["role", "text"])
    roles = table.column("role").to_pylist()
    texts = table.column("text").to_pylist()
    oi = OracleIndex()
    oi.add_all(enumerate(texts))

    for q in ["ray", "data OR index", "ray AND data"]:
        got = dict(s.facet(q, "role"))
        matching = oi._score_clause(s.parse(q))
        expected: dict[str, int] = {}
        for d in matching:
            expected[roles[d]] = expected.get(roles[d], 0) + 1
        assert got == expected, q


def test_facet_ordering(searcher):
    s, _ = searcher
    out = s.facet("ray OR data OR index", "role")
    counts = [c for _, c in out]
    assert counts == sorted(counts, reverse=True)
    lim = s.facet("ray OR data OR index", "role", limit=1)
    assert lim == out[:1]


def test_facet_unknown_field_raises(searcher):
    s, _ = searcher
    with pytest.raises(KeyError):
        s.facet("ray", "nonexistent_field")


def test_suggest_prefix(searcher):
    s, _ = searcher
    out = s.suggest("t0", k=5)
    assert out and all(t.startswith("t0") for t, _ in out)
    dfs = [df for _, df in out]
    assert dfs == sorted(dfs, reverse=True)
    # df values are the global docFreq
    from lucene_solr_ray.search.query import TermQuery

    top_term, top_df = out[0]
    assert s.global_df(TermQuery(top_term))[top_term] == top_df


def test_collapse_search(searcher):
    s, _ = searcher
    hits = collapse_search(s, "ray data", k=5)
    assert hits
    convs = [c for _, _, c in hits]
    assert len(set(convs)) == len(convs)  # one head per conversation
    # head score equals max turn score within that conversation
    docs, scores = _all_hits(s, "ray data")
    dm = s.docmap()
    for doc_id, score, conv in hits:
        mask = np.array([dm[d] == conv for d in docs])
        assert float(score) == float(scores[mask].max())


def test_distributed_facet_matches_local(searcher):
    from lucene_solr_ray.search.actors import DistributedSearcher

    s, _ = searcher
    dist = DistributedSearcher(s.index_dir, num_actors=2)
    try:
        for q in ["ray", "data OR index"]:
            assert dist.facet(q, "role") == s.facet(q, "role"), q
    finally:
        dist.close()


def test_facet_missing_field_docs_omitted(searcher):
    """Docs without the field are omitted from facet counts, not bucketed
    under a literal 'None' (SimpleFacets missing-value semantics)."""
    s, _ = searcher
    full = dict(s.facet("ray", "role"))
    values = s.docvalues("role").copy()
    docs_hit, _ = __import__(
        "lucene_solr_ray.search.features", fromlist=["_all_hits"])._all_hits(s, "ray")
    # blank out the field for half the hit docs
    blanked = docs_hit[::2]
    values[blanked] = None
    s._docvalue_cache["role"] = values
    try:
        got = dict(s.facet("ray", "role"))
    finally:
        s._docvalue_cache.pop("role", None)
    assert "None" not in got
    assert sum(got.values()) == sum(full.values()) - len(blanked)


def test_terms_component(searcher):
    s, src = searcher
    # count order: df desc, value asc ties; all terms carry positive df
    out = s.terms(limit=10)
    assert len(out) == 10
    dfs = [d for _, d in out]
    assert dfs == sorted(dfs, reverse=True)
    # prefix filter
    t0 = s.terms(prefix="t0", limit=50)
    assert t0 and all(t.startswith("t0") for t, _ in t0)
    # regex filter + index order
    rx = s.terms(regex="t0+1.*", limit=20, sort="index")
    assert rx and [t for t, _ in rx] == sorted(t for t, _ in rx)
    # global df equals the sum the suggester computes
    sug = dict(s.suggest("t0", k=5))
    for t, d in s.terms(prefix="t0", limit=5):
        if t in sug:
            assert sug[t] == d
