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


# --- round 2: function-boosted search + search-side stats ---

def test_boosted_search_matches_recompute(searcher):
    import numpy as np
    import pyarrow.parquet as _pq

    from lucene_solr_ray.search.features import _all_hits, boosted_search

    s, src = searcher
    table = _pq.read_table(src, columns=["turn_idx"])
    turn = table.column("turn_idx").to_numpy(zero_copy_only=False)
    got = boosted_search(s, "ray data", "recip(turn_idx,1,10,10)", k=8)
    docs, scores = _all_hits(s, "ray data")
    boost = 10.0 / (turn[docs].astype(np.float64) + 10.0)
    final = scores.astype(np.float64) * boost
    order = np.lexsort((docs, -final))[:8]
    want = [(int(docs[i]), float(final[i])) for i in order]
    assert got == want
    # boosting reorders vs plain BM25 for at least some rank
    plain = [d for d, _ in s.search("ray data", k=8)]
    assert [d for d, _ in got] != plain or len(plain) <= 1


def test_boosted_search_unknown_field(searcher):
    import pytest as _pytest

    from lucene_solr_ray.search.features import boosted_search

    s, _ = searcher
    with _pytest.raises(KeyError):
        boosted_search(s, "ray", "recip(nonexistent,1,10,10)")


def test_field_stats(searcher):
    import numpy as np
    import pyarrow.parquet as _pq

    from lucene_solr_ray.search.features import _all_hits, field_stats

    s, src = searcher
    table = _pq.read_table(src, columns=["turn_idx"])
    turn = table.column("turn_idx").to_numpy(zero_copy_only=False)
    st = field_stats(s, "ray", "turn_idx")
    docs, _ = _all_hits(s, "ray")
    v = turn[docs].astype(np.float64)
    assert st["count"] == len(v)
    assert st["min"] == v.min() and st["max"] == v.max()
    assert st["sum"] == v.sum()
    assert abs(st["mean"] - v.mean()) < 1e-12


def test_query_elevation(searcher):
    from lucene_solr_ray.search.features import elevate

    s, _ = searcher
    base = s.search("ray", k=10)
    assert len(base) >= 3
    pin = [base[5][0] if len(base) > 5 else base[-1][0], base[2][0]]
    out = elevate(s, "ray", pin, k=10)
    assert [d for d, _ in out[:2]] == pin
    # remaining ranking preserves BM25 order minus the pinned docs
    rest = [d for d, _ in out[2:]]
    want_rest = [d for d, _ in base if d not in pin][:len(rest)]
    assert rest == want_rest
    # exclusion removes a doc entirely
    out2 = elevate(s, "ray", pin[:1], k=10, exclude_ids=[pin[1]])
    assert pin[1] not in [d for d, _ in out2]
    assert out2[0][0] == pin[0]
