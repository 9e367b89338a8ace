"""MultiPhraseQuery: per-slot term alternatives with real position
alignment (MultiPhraseQuery.java:47, UnionPostingsEnum)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.analysis.filters import (
    CustomAnalyzer,
    lowercase_filter,
    make_synonym_filter,
)
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.oracle import OracleIndex
from lucene_solr_ray.search.query import (
    MultiPhraseQuery,
    parse_query,
)
from lucene_solr_ray.search.searcher import IndexSearcher


def test_parser_emits_multiphrase_for_mixed_streams():
    an = CustomAnalyzer([lowercase_filter,
                         make_synonym_filter({"fast": ["quick"]})])
    q = parse_query('"fast car"', an)
    # quoted phrases analyze via the phrase path; use a chunk that the
    # tokenizer splits: 'fast-car' is one whitespace chunk, two tokens
    q = parse_query("fast-car", an)
    assert isinstance(q, MultiPhraseQuery)
    assert q.slots == (("fast", "quick"), ("car",))
    assert q.positions == (0, 1)


@pytest.fixture(scope="module")
def mp_pair(ray_session, tmp_path_factory):
    docs = [
        "the fast car drove",          # matches fast|quick + car
        "the quick car drove",         # matches via alternative
        "a quick red car",             # gap -> not adjacent
        "fast boat quick car",         # 'quick car' adjacent at 2,3
        "car fast",                    # wrong order
        "nothing here",
    ] * 20
    root = tmp_path_factory.mktemp("mphrase")
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
    oi = OracleIndex()
    oi.add_all(enumerate(docs))
    return IndexSearcher(str(out)), oi, docs


def test_multiphrase_exact_matches_and_scores(mp_pair):
    s, oi, docs = mp_pair
    q = MultiPhraseQuery(slots=(("fast", "quick"), ("car",)),
                         positions=(0, 1))
    got = dict(s.search(q, k=100_000))
    want = {int(d): np.float32(v)
            for d, v in oi._score_multi_phrase(q).items()}
    assert got.keys() == want.keys()
    for d in got:
        assert np.float32(got[d]) == want[d]
    # semantic spot-checks on the first copy of each doc
    matched = {d % 6 for d in got}
    assert matched == {0, 1, 3}


def test_multiphrase_sloppy(mp_pair):
    s, oi, docs = mp_pair
    q = MultiPhraseQuery(slots=(("fast", "quick"), ("car",)),
                         positions=(0, 1), slop=1)
    got = dict(s.search(q, k=100_000))
    want = {int(d): np.float32(v)
            for d, v in oi._score_multi_phrase(q).items()}
    assert got.keys() == want.keys()
    for d in got:
        assert np.float32(got[d]) == want[d]
    # slop 1 now admits 'quick red car' and transposed 'car fast'
    assert {d % 6 for d in got} >= {0, 1, 2, 3}


def test_multiphrase_missing_slot_matches_nothing(mp_pair):
    s, _, _ = mp_pair
    q = MultiPhraseQuery(slots=(("fast",), ("zzzznope",)),
                         positions=(0, 1))
    assert s.search(q, k=10) == []


def test_multiphrase_distributed_parity(mp_pair, ray_session):
    from lucene_solr_ray.search.actors import DistributedSearcher

    s, _, _ = mp_pair
    q = MultiPhraseQuery(slots=(("fast", "quick"), ("car",)),
                         positions=(0, 1))
    dist = DistributedSearcher(s.index_dir, num_actors=2)
    assert dist.search_batch([q], k=50)[0] == s.search(q, k=50)
