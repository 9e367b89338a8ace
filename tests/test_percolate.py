"""Percolation / saved-query routing (MemoryIndex.java:78 use case)."""

import pyarrow as pa
import pytest

import ray.data as rd

from lucene_solr_ray.pipelines.percolate import percolate


def _route(docs, queries, analyzer="simple"):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs),
    }))
    out = percolate(ds, queries, analyzer=analyzer).to_pandas()
    return {(int(r.doc_id), r.query_name) for r in out.itertuples()}


DOCS = [
    "the batch filter runs",          # 0
    "filter then batch",              # 1  (both terms, not adjacent)
    "customer scan report",           # 2
    "slow customer stream",           # 3
    "nothing relevant",               # 4
]


def test_term_and_bool_masks(ray_session):
    got = _route(DOCS, {
        "both": "batch AND filter",
        "either": "scan OR stream",
        "cust_not_slow": "customer -slow",
    })
    assert got == {
        (0, "both"), (1, "both"),
        (2, "either"), (3, "either"),
        (2, "cust_not_slow"),
    }


def test_phrase_takes_positional_fallback(ray_session):
    got = _route(DOCS, {"adj": '"batch filter"'})
    # doc 1 has both terms but not adjacent -> prefilter passes it,
    # the oracle kernel rejects it
    assert got == {(0, "adj")}


def test_multiterm_expansion_against_batch_vocab(ray_session):
    got = _route(DOCS, {"pfx": "cust*"})
    assert got == {(2, "pfx"), (3, "pfx")}


def test_sloppy_phrase_fallback(ray_session):
    got = _route(DOCS, {"slop": '"batch runs"~2'})
    assert got == {(0, "slop")}


def test_standard_analyzer_drops_stopwords(ray_session):
    # "the" is a stopword in the standard chain: a query for it matches
    # nothing, and phrase positions skip the hole
    got = _route(DOCS, {"phrase": '"batch filter"'}, analyzer="standard")
    assert got == {(0, "phrase")}


def test_empty_stream_and_no_matches(ray_session):
    assert _route(["xyz"], {"q": "missing"}) == set()


def test_scored_percolation_pins_one_doc_searcher(ray_session, tmp_path):
    """MemoryIndex.java:91 semantics: every matched (doc, query) carries
    the BM25 score of the query against the ONE-document index built
    from that doc alone — pinned against the real IndexSearcher over an
    actual one-doc on-disk index, same analyzer."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.data.transcripts import generate_transcripts
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.searcher import IndexSearcher

    queries = {
        "both": "batch AND filter",
        "either": "scan OR stream",
        "adj": '"batch filter"',
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
        "text": pa.array(DOCS),
    }))
    got = percolate(ds, queries, analyzer="simple",
                    scores=True).to_pandas()
    assert len(got) > 0 and "score" in got.columns

    for r in got.itertuples():
        t = generate_transcripts(1, seed=1)
        texts = [DOCS[int(r.doc_id)]]
        t = t.slice(0, 1).set_column(
            t.column_names.index("text"), "text", pa.array(texts))
        src = tmp_path / f"one_{r.doc_id}_{r.query_name}.parquet"
        pq.write_table(t, src)
        idx = tmp_path / f"idx_{r.doc_id}_{r.query_name}"
        build_index(str(src), str(idx), num_shards=1, analyzer="simple")
        hits = IndexSearcher(str(idx)).search(queries[r.query_name], k=1)
        assert hits, (r.doc_id, r.query_name)
        assert float(hits[0][1]) == float(r.score), \
            (r.doc_id, r.query_name, hits[0][1], r.score)
