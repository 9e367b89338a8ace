"""Score explanations (Explanation.java / Solr debugQuery):
explained value == served score, components multiply/sum correctly."""

import numpy as np
import pytest

from lucene_solr_ray.data.transcripts import transcripts_path
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.query import TermQuery
from lucene_solr_ray.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def xs(ray_session, tmp_path_factory):
    src = transcripts_path("tiny")
    out = tmp_path_factory.mktemp("explain") / "idx"
    build_index(src, str(out), num_shards=3)
    return IndexSearcher(str(out))


def test_explained_value_equals_served_score(xs):
    for q in ["ray", "ray AND data", "ray OR data OR index",
              '"ray data"', "ray data -error"]:
        hits = xs.search(q, k=5)
        assert hits, q
        for doc_id, score in hits:
            ex = xs.explain(q, doc_id)
            assert ex is not None, (q, doc_id)
            assert np.float32(ex["value"]) == np.float32(score), (q, doc_id)


def test_term_explanation_components_multiply(xs):
    hits = xs.search(TermQuery("ray"), k=3)
    for doc_id, score in hits:
        ex = xs.explain(TermQuery("ray"), doc_id)
        assert "weight(text:ray" in ex["description"]
        boost, idf, tf = (d["value"] for d in ex["details"])
        assert float(score) == pytest.approx(boost * idf * tf, rel=1e-5)
        assert "idf(docFreq=" in ex["details"][1]["description"]


def test_boolean_explanation_sums_clauses(xs):
    q = "ray AND data"
    doc_id, score = xs.search(q, k=1)[0]
    ex = xs.explain(q, doc_id)
    assert ex["description"] == "sum of:"
    assert len(ex["details"]) == 2
    assert float(score) == pytest.approx(
        sum(d["value"] for d in ex["details"]), rel=1e-5)


def test_nonmatching_doc_returns_none(xs):
    hits = {d for d, _ in xs.search("zzznotindexed", k=10)}
    assert not hits
    assert xs.explain("zzznotindexed", 0) is None
    # a real doc that doesn't match this query
    d0, _ = xs.search("ray", k=1)[0]
    assert xs.explain("zzznotindexed", d0) is None


def test_spellcheck_collation(xs):
    """SpellCheckCollator.java:69: misspelled words replaced by verified
    suggestions; the collation is re-run and must have hits."""
    out = xs.spellcheck_collate("rqy AND data")
    assert out is not None
    assert out["collation"] == "ray AND data"
    assert out["hits"] == len(xs.search("ray AND data", k=10**6))
    # two misspellings at once
    out2 = xs.spellcheck_collate("rqy dtaa")
    assert out2 is not None and out2["hits"] > 0
    # every collated word is now a real index term
    for tok in out2["collation"].split():
        assert xs.global_df(TermQuery(tok)).get(tok, 0) > 0
    # correctly-spelled query: no collation needed
    assert xs.spellcheck_collate("ray data") is None
    # unfixable garbage: None
    assert xs.spellcheck_collate("qqqqqqzzzzxxxx") is None


def test_distributed_collation_parity(xs, ray_session):
    """DistributedSearcher.spellcheck_collate == in-process collation
    (same corpus, same walk; hit counts verified by scatter)."""
    from lucene_solr_ray.search.actors import DistributedSearcher

    ds = DistributedSearcher(xs.index_dir, num_actors=3)
    for q in ("rqy AND data", "rqy dtaa", "ray data",
              "qqqqqqzzzzxxxx"):
        assert ds.spellcheck_collate(q) == xs.spellcheck_collate(q), q
