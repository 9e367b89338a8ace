"""MaxScore / block-max disjunction pruning: bit-identical to exhaustive."""

import numpy as np
import pytest

from lucene_solr_ray.data.transcripts import transcripts_path
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.searcher import IndexSearcher

OR_QUERIES = [
    "ray OR data", "ray OR data OR index OR query OR merge",
    "t00001 OR the OR data", "engine OR scale OR batch OR t01999",
    "data OR index OR term OR actor OR shard OR stream OR cache",
    "t00042 OR t00043", "ray OR zzzmissing",
]


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    src = transcripts_path("small")  # ~13k docs -> heavy terms span blocks
    out = tmp_path_factory.mktemp("ms") / "idx"
    build_index(src, str(out), num_shards=2)
    return IndexSearcher(str(out))


@pytest.mark.parametrize("q", OR_QUERIES)
@pytest.mark.parametrize("k", [1, 3, 10])
def test_maxscore_equals_exhaustive(small_index, q, k):
    s = small_index
    query = s.parse(q)
    if not hasattr(query, "should"):
        pytest.skip("not a disjunction after analysis")
    df_map = s.global_df(query)
    for sh in s.shards:
        fast = sh.search(query, df_map, k, use_maxscore=True)
        slow = sh.search(query, df_map, k, use_maxscore=False)
        assert fast == slow, f"query={q!r} k={k} shard={sh.shard_id}"


def test_block_selective_decode_matches_full(small_index):
    s = small_index
    sh = s.shards[0]
    # pick the heaviest term (most blocks)
    term = max(sh._terms, key=lambda t: sh._df[sh._terms[t]])
    full_docs, full_freqs, _ = sh._postings(term)
    assert len(full_docs) > 3 * 128, "need a multi-block term for this test"
    rng = np.random.default_rng(0)
    probe = np.sort(rng.choice(full_docs, size=50, replace=False))
    sub_docs, sub_freqs = sh._freqs_for_docs(term, probe)
    # every probed doc must appear in the selective decode with its freq
    pos = np.searchsorted(sub_docs, probe)
    np.testing.assert_array_equal(sub_docs[pos], probe)
    expect = full_freqs[np.searchsorted(full_docs, probe)]
    np.testing.assert_array_equal(sub_freqs[pos], expect)


def test_maxscore_prunes_terms(small_index):
    """With many heavy terms and small k the discovery loop must stop
    before consuming every term (the whole point of the bound)."""
    s = small_index
    sh = s.shards[0]
    query = s.parse(
        "data OR index OR term OR actor OR shard OR stream OR cache OR "
        "merge OR scale OR batch OR t00042")
    df_map = s.global_df(query)
    # count decodes by spying on _score_term
    calls = []
    orig = sh._score_term

    def spy(q, dm):
        calls.append(q.term)
        return orig(q, dm)

    sh._score_term = spy
    try:
        sh.search(query, df_map, k=1, use_maxscore=True)
    finally:
        sh._score_term = orig
    # exact rescore re-calls _score_term for essential terms only; pruning
    # must leave at least one term handled via block-selective decode
    assert len(set(calls)) < len(query.should), calls
