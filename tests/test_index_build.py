"""End-to-end distributed build + search vs the single-process oracle
(BaseDistributedSearchTestCase control-instance pattern), partition-count
equivalence, and resume."""

import json
import shutil
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.data.transcripts import generate_transcripts, transcripts_path
from lucene_solr_ray.index.build import build_index, read_manifest
from lucene_solr_ray.search.oracle import OracleIndex
from lucene_solr_ray.search.searcher import IndexSearcher

QUERIES = [
    "ray", "data", "index", "the", "t00001", "zzzmissing",
    "ray AND data", "ray OR merge", "ray data index",
    "+index -error", "query NOT cache",
    '"ray data"', '"the quick"',
    "engine scale batch", "İstanbul", "foo.bar",
    "ra*", "t0000*", "?ndex", "merg~1", "[scale TO shard]",
    "ra* AND data", "eng*ne",
]


@pytest.fixture(scope="module")
def tiny_index(ray_session, tmp_path_factory):
    src = transcripts_path("tiny")
    out = tmp_path_factory.mktemp("idx") / "tiny_index"
    manifest = build_index(src, str(out), num_shards=4, batch_size=64)
    return src, str(out), manifest


@pytest.fixture(scope="module")
def oracle(tiny_index):
    src, _, _ = tiny_index
    table = pq.read_table(src)
    oi = OracleIndex()
    texts = table.column("text").to_pylist()
    oi.add_all(enumerate(texts))
    return oi


def test_manifest_stats_match_oracle(tiny_index, oracle):
    _, _, manifest = tiny_index
    assert manifest["stats"]["doc_count"] == oracle.doc_count
    assert manifest["stats"]["sum_total_term_freq"] == oracle.sum_total_term_freq
    assert manifest["stats"]["num_docs"] == len(oracle.doc_lengths)
    total_postings = sum(s["posting_count"] for s in manifest["shards"])
    assert total_postings == sum(len(v) for v in oracle.postings.values())


def test_global_df_matches_oracle(tiny_index, oracle):
    _, out, _ = tiny_index
    searcher = IndexSearcher(out)
    for term in ["ray", "data", "index", "t00001"]:
        from lucene_solr_ray.search.query import TermQuery

        assert searcher.global_df(TermQuery(term)).get(term, 0) == \
            oracle.doc_freq(term), term


def test_search_rank_identical_to_oracle(tiny_index, oracle):
    _, out, _ = tiny_index
    searcher = IndexSearcher(out)
    for q in QUERIES:
        expected = oracle.search(q, k=10)
        got = searcher.search(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in expected], f"query={q!r}"
        for (d1, s1), (d2, s2) in zip(got, expected):
            assert s1 == s2, f"score mismatch for {q!r} doc {d1}: {s1} != {s2}"


def test_partition_count_equivalence(ray_session, tiny_index, oracle, tmp_path):
    """1-shard and 8-shard builds return identical results (N-vs-1 control)."""
    src, _, _ = tiny_index
    out1 = tmp_path / "idx1"
    out8 = tmp_path / "idx8"
    build_index(src, str(out1), num_shards=1, batch_size=1000)
    build_index(src, str(out8), num_shards=8, batch_size=17)
    s1, s8 = IndexSearcher(str(out1)), IndexSearcher(str(out8))
    for q in QUERIES:
        r1 = [(d, float(s)) for d, s in s1.search(q, k=10)]
        r8 = [(d, float(s)) for d, s in s8.search(q, k=10)]
        assert r1 == r8, f"query={q!r}"


def test_norms_match_oracle(tiny_index, oracle):
    _, out, _ = tiny_index
    searcher = IndexSearcher(out)
    for sh in searcher.shards:
        lo = sh.base
        hi = min(sh.base + sh.docs_per_shard, len(oracle.doc_lengths))
        for d in range(lo, hi):
            assert int(sh.norms[d - lo]) == oracle.norms[d], f"doc {d}"


def test_resume_skips_completed_shards(ray_session, tmp_path):
    src = transcripts_path("tiny")
    out = tmp_path / "idx_resume"
    m1 = build_index(src, str(out), num_shards=4, keep_runs=True)
    # delete one shard, resume: only that shard is rebuilt, result identical
    shards = sorted((out / "shards").iterdir())
    shutil.rmtree(shards[1])
    m2 = build_index(src, str(out), num_shards=4, resume=True, keep_runs=True)
    assert m1["stats"] == m2["stats"]
    assert m1["shards"] == m2["shards"]
    s = IndexSearcher(str(out))
    assert s.search("ray", k=5)  # index is functional after resume


def test_doc_id_is_rank_of_sorted_order(ray_session, tmp_path):
    """doc_id must equal the rank under (conv_id, turn_idx) — verify via norms
    docmap against an explicitly sorted source read."""
    src = transcripts_path("tiny")
    out = tmp_path / "idx_rank"
    build_index(src, str(out), num_shards=2)
    import pyarrow.dataset as pads

    norms = pads.dataset(str(out / "norms"), format="parquet",
                         partitioning="hive").to_table(
        columns=["doc_id", "conv_id", "turn_idx"])
    order = np.argsort(norms.column("doc_id").to_numpy(zero_copy_only=False))
    conv = np.asarray(norms.column("conv_id").to_pylist(), dtype=object)[order]
    turn = norms.column("turn_idx").to_numpy(zero_copy_only=False)[order]
    src_table = pq.read_table(src, columns=["conv_id", "turn_idx"])
    assert list(conv) == src_table.column("conv_id").to_pylist()
    np.testing.assert_array_equal(
        turn, src_table.column("turn_idx").to_numpy(zero_copy_only=False))


def test_aligned_equals_groupby_shuffle(ray_session, tmp_path):
    """The aligned per-shard encode and the explicit groupby shuffle
    produce identical indexes and identical search results."""
    src = transcripts_path("tiny")
    a = tmp_path / "aligned"
    g = tmp_path / "grouped"
    build_index(src, str(a), num_shards=4, shuffle="aligned")
    build_index(src, str(g), num_shards=4, shuffle="groupby")
    sa, sg = IndexSearcher(str(a)), IndexSearcher(str(g))
    for q in QUERIES:
        ra = [(d, float(s)) for d, s in sa.search(q, k=10)]
        rg = [(d, float(s)) for d, s in sg.search(q, k=10)]
        assert ra == rg, f"query={q!r}"
    ma, mg = sa.manifest, sg.manifest
    assert ma["stats"] == mg["stats"]
    assert ma["shards"] == mg["shards"]


def test_manifest_records_input_lineage(tiny_index):
    _, _, manifest = tiny_index
    lineage = manifest["lineage"]
    assert lineage and lineage[0]["doc_lo"] == 0
    # lineage spans cover every doc exactly once, in order
    hi = 0
    for entry in lineage:
        assert entry["doc_lo"] == hi
        hi = entry["doc_hi"]
    assert hi == manifest["stats"]["num_docs"]
    assert all("file" in e and e["row_groups"] for e in lineage)
