"""CommonTermsQuery: df-threshold rewrite (CommonTermsQuery.java:183)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.query import (
    BooleanQuery,
    CommonTermsQuery,
    MatchNoDocs,
    TermQuery,
    rewrite_common_terms,
)
from lucene_solr_ray.search.searcher import IndexSearcher


def test_rewrite_split_and_promotion():
    df = {"the": 900, "rare": 3, "word": 5}
    q = CommonTermsQuery(terms=("the", "rare", "word"),
                         max_term_frequency=0.5)
    out = rewrite_common_terms(q, df, 1000)
    assert isinstance(out, BooleanQuery)
    (low,) = out.must
    (high,) = out.should
    assert low.should == [TermQuery("rare"), TermQuery("word")]
    assert high.should == [TermQuery("the")]
    # absolute threshold when >= 1
    out2 = rewrite_common_terms(
        CommonTermsQuery(terms=("the", "rare"), max_term_frequency=10),
        df, 1000)
    assert out2.must[0].should == [TermQuery("rare")]
    # all-common -> promoted to a conjunction ('prevent slow queries')
    out3 = rewrite_common_terms(
        CommonTermsQuery(terms=("the",), max_term_frequency=0.1), df, 1000)
    assert out3.must[0].must == [TermQuery("the")]
    # no terms at all
    assert isinstance(rewrite_common_terms(
        CommonTermsQuery(terms=()), {}, 10), MatchNoDocs)


def test_must_not_occur_rejected():
    with pytest.raises(ValueError):
        CommonTermsQuery(terms=("a",), low_freq_occur="MUST_NOT")


@pytest.fixture(scope="module")
def ct_index(ray_session, tmp_path_factory):
    rng = np.random.default_rng(31)
    # 'filler' in ~every doc (common); 'gem' rare
    docs = []
    for i in range(300):
        toks = ["filler"] + list(rng.choice(
            ["alpha", "beta", "gamma", "delta"], size=5))
        if i % 37 == 0:
            toks.append("gem")
        docs.append(" ".join(toks))
    root = tmp_path_factory.mktemp("cterms")
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


def test_common_terms_end_to_end(ct_index):
    s, docs = ct_index
    q = CommonTermsQuery(terms=("filler", "gem"), max_term_frequency=0.5)
    hits = s.search(q, k=1000)
    # only 'gem' docs match (filler is common -> optional), but filler
    # still contributes score on matching docs
    want = {i for i, d in enumerate(docs) if "gem" in d.split()}
    assert {d for d, _ in hits} == want
    gem_only = dict(s.search(TermQuery("gem"), k=1000))
    for d, sc in hits:
        assert sc > gem_only[d]  # common group added score


def test_common_terms_distributed_parity(ct_index, ray_session):
    from lucene_solr_ray.search.actors import DistributedSearcher

    s, _ = ct_index
    q = CommonTermsQuery(terms=("filler", "gem", "alpha"),
                         max_term_frequency=0.3)
    dist = DistributedSearcher(s.index_dir, num_actors=2)
    assert dist.search_batch([q], k=50)[0] == s.search(q, k=50)
