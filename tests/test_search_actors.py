"""Actor-pool serving == in-process searcher; check_index passes."""

import pytest

from lucene_solr_ray.data.transcripts import transcripts_path
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.check import check_index
from lucene_solr_ray.search.actors import DistributedSearcher
from lucene_solr_ray.search.searcher import IndexSearcher

QUERIES = ["ray", "data index", "ray AND data", '"ray data"', "+index -error",
           "the", "zzzmissing"]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    src = transcripts_path("tiny")
    out = tmp_path_factory.mktemp("aidx") / "idx"
    build_index(src, str(out), num_shards=4, batch_size=64)
    return str(out)


def test_actor_pool_matches_local(built):
    local = IndexSearcher(built)
    dist = DistributedSearcher(built, num_actors=2)
    try:
        batch = dist.search_batch(QUERIES, k=10)
        for q, got in zip(QUERIES, batch):
            expected = local.search(q, k=10)
            assert [(d, float(s)) for d, s in got] == \
                [(d, float(s)) for d, s in expected], f"query={q!r}"
    finally:
        dist.close()


def test_check_index_passes(built):
    report = check_index(built)
    assert report["status"] == "ok"
    assert report["docs"] > 0 and report["postings"] > 0


def test_check_index_detects_corruption(built, tmp_path):
    import shutil
    from pathlib import Path

    bad = tmp_path / "bad"
    shutil.copytree(built, bad)
    # corrupt: truncate one shard's terms file
    shard = sorted((bad / "shards").iterdir())[0]
    import pyarrow.parquet as pq

    t = pq.read_table(shard / "terms.parquet")
    pq.write_table(t.slice(0, max(1, t.num_rows // 2)), shard / "terms.parquet")
    with pytest.raises(AssertionError):
        check_index(str(bad))
