"""Block join, rerank, MLT, highlight over a built tiny index."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.data.transcripts import transcripts_path
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.features import (
    highlight,
    more_like_this,
    rerank,
    search_conversations,
)
from lucene_solr_ray.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def searcher(ray_session, tmp_path_factory):
    src = transcripts_path("tiny")
    out = tmp_path_factory.mktemp("fidx") / "idx"
    build_index(src, str(out), num_shards=3, batch_size=64)
    return IndexSearcher(str(out)), src


def test_block_join_max(searcher):
    s, src = searcher
    hits = search_conversations(s, "ray", k=5, score_mode="max")
    assert hits
    # oracle: group turn-level scores by conv, take max
    from collections import defaultdict

    from lucene_solr_ray.search.features import _all_hits

    docs, scores = _all_hits(s, "ray")
    dm = s.docmap()
    agg = defaultdict(lambda: np.float32(0.0))
    for d, sc in zip(docs, scores):
        agg[dm[d]] = max(agg[dm[d]], sc)
    expected = sorted(agg.items(), key=lambda kv: (-float(kv[1]), kv[0]))[:5]
    assert [(c, float(x)) for c, x in hits] == \
        [(c, float(x)) for c, x in expected]


def test_block_join_total(searcher):
    s, _ = searcher
    hits_max = search_conversations(s, "ray data", k=5, score_mode="max")
    hits_tot = search_conversations(s, "ray data", k=5, score_mode="total")
    assert hits_max and hits_tot
    # total >= max for any conversation
    tot = dict(hits_tot)
    for conv, m in hits_max:
        if conv in tot:
            assert float(tot[conv]) >= float(m) - 1e-6


def test_rerank_boosts_phrase_matches(searcher):
    s, _ = searcher
    base = s.search("ray data", k=10)
    rr = rerank(s, "ray data", '"ray data"', k=10, top_n=20, weight=5.0)
    assert rr
    base_map = dict(base)
    for doc_id, score in rr:
        if doc_id in base_map:
            assert float(score) >= float(base_map[doc_id]) - 1e-6


def test_more_like_this(searcher):
    s, src = searcher
    texts = pq.read_table(src, columns=["text"]).column("text").to_pylist()
    seed = texts[3]
    hits = more_like_this(s, seed, k=5)
    assert hits
    assert all(isinstance(d, int) for d, _ in hits)


def test_highlight(searcher):
    out = highlight("The ray data engine builds an index quickly",
                    "ray AND index", window=15)
    assert "<b>ray</b>" in out
    out2 = highlight("nothing relevant here", "zzz")
    assert "<b>" not in out2


def test_highlight_respects_analysis(searcher):
    # query-side analysis lowercases; highlight matches original casing
    out = highlight("Ray Data rocks", "ray")
    assert "<b>Ray</b>" in out
