"""Search-result clustering (ClusteringComponent / Carrot2 analog):
topic separation, determinism, labels exclude query terms."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.clustering import cluster_results
from lucene_solr_ray.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def topic_index(ray_session, tmp_path_factory):
    """Two clearly separated topics, both matching the query term
    'shared': cooking docs and astronomy docs."""
    cooking = [
        "shared recipe: simmer the garlic butter sauce with basil",
        "shared kitchen tips for garlic butter and fresh basil pasta",
        "a shared sauce of butter garlic basil for pasta dinner",
        "shared cooking: pasta sauce with basil and roasted garlic",
    ]
    astro = [
        "shared telescope views of the nebula and distant galaxy cluster",
        "shared astronomy log: galaxy nebula photos from the telescope",
        "a shared star chart of the galaxy with telescope coordinates",
        "shared observation: nebula imaging through the new telescope",
    ]
    texts = cooking + astro
    t = pa.table({
        "conv_id": pa.array([f"c-{i:04d}" for i in range(len(texts))]),
        "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
        "role": pa.array(["user"] * len(texts)),
        "text": pa.array(texts),
        "tool": pa.array([""] * len(texts)),
        "ts": pa.array(list(range(len(texts))), type=pa.int64()),
    })
    d = tmp_path_factory.mktemp("clus")
    src = d / "docs.parquet"
    pq.write_table(t, src)
    out = d / "idx"
    build_index(str(src), str(out), num_shards=2)
    return str(out), len(cooking)


def test_cluster_separates_topics(topic_index):
    idx, n_cooking = topic_index
    s = IndexSearcher(idx)
    clusters = cluster_results(s, "shared", top_n=20, n_clusters=2,
                               min_df=2)
    assert len(clusters) == 2
    groups = [sorted(d for d, _ in cl["docs"]) for cl in clusters]
    # doc_ids 0..3 are cooking, 4..7 astronomy — clean separation
    assert sorted(map(tuple, groups)) == [(0, 1, 2, 3), (4, 5, 6, 7)]
    # labels come from topic vocabulary, never the query term
    for cl in clusters:
        assert cl["label"]
        assert "shared" not in cl["label"].split(", ")
    topic_words = {"garlic", "butter", "basil", "pasta", "sauce",
                   "telescope", "galaxy", "nebula", "star"}
    for cl in clusters:
        assert set(cl["label"].split(", ")) & topic_words


def test_cluster_deterministic(topic_index):
    idx, _ = topic_index
    s = IndexSearcher(idx)
    a = cluster_results(s, "shared", top_n=20, n_clusters=2, seed=3)
    b = cluster_results(s, "shared", top_n=20, n_clusters=2, seed=3)
    assert a == b


def test_cluster_cohesion_and_order(topic_index):
    idx, _ = topic_index
    s = IndexSearcher(idx)
    clusters = cluster_results(s, "shared", top_n=20, n_clusters=2)
    for cl in clusters:
        assert 0.0 < cl["score"] <= 1.0 + 1e-9
        # docs keep their search ranking inside the cluster
        scores = [sc for _, sc in cl["docs"]]
        assert scores == sorted(scores, reverse=True) or len(scores) <= 1


def test_cluster_no_hits(topic_index):
    idx, _ = topic_index
    s = IndexSearcher(idx)
    assert cluster_results(s, "zzznotthere") == []


def test_cluster_degenerate_single_doc(topic_index):
    idx, _ = topic_index
    s = IndexSearcher(idx)
    out = cluster_results(s, "recipe", top_n=5, n_clusters=3)
    # one matching doc -> one catch-all cluster
    assert len(out) == 1 and len(out[0]["docs"]) == 1


def test_cluster_topk_docs_driver_shape(ray_session):
    """Driver query: deterministic, every member row carries its
    cluster's label, clusters ordered by size desc."""
    from lucene_solr_ray.pipelines.fulltext import cluster_topk_docs

    t1 = cluster_topk_docs("/root/testdata/sf0.001").to_pandas()
    t2 = cluster_topk_docs("/root/testdata/sf0.001").to_pandas()
    pd_testing = __import__("pandas.testing", fromlist=["assert_frame_equal"])
    pd_testing.assert_frame_equal(t1, t2)
    assert len(t1) > 0
    sizes = t1.groupby("cluster").size()
    assert list(sizes.index) == sorted(sizes.index)
    assert list(sizes) == sorted(sizes, reverse=True)
    # per-cluster ranks are contiguous from 0
    for _, g in t1.groupby("cluster"):
        assert list(g["rank"]) == list(range(len(g)))
