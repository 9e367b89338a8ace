"""Postings-codec SPI (PostingsFormat analog): raw32 and varint indexes
must be search-identical; every lifecycle op (update, delete, expunge,
check) dispatches on the manifest's codec."""

import json
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.data.transcripts import generate_transcripts, transcripts_path
from lucene_solr_ray.index import segment
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.check import check_index
from lucene_solr_ray.search.searcher import IndexSearcher


def test_codec_registry():
    assert segment.get_codec("varint").name == "varint"
    assert segment.get_codec("raw32").name == "raw32"
    with pytest.raises(ValueError, match="unknown postings codec"):
        segment.get_codec("nosuch")


def test_raw32_roundtrip_primitives():
    c = segment.get_codec("raw32")
    vals = np.array([0, 1, 127, 128, 300000, 2**31], dtype=np.int64)
    enc = c.encode(vals)
    assert len(enc) == 4 * len(vals)
    np.testing.assert_array_equal(c.decode(enc), vals)
    np.testing.assert_array_equal(c.lengths(vals), np.full(6, 4))


@pytest.fixture(scope="module")
def pair(ray_session, tmp_path_factory):
    src = transcripts_path("tiny")
    root = tmp_path_factory.mktemp("codecs")
    build_index(src, str(root / "v"), num_shards=3)
    build_index(src, str(root / "r"), num_shards=3,
                postings_codec="raw32")
    return root, IndexSearcher(str(root / "v")), \
        IndexSearcher(str(root / "r"))


def test_manifest_records_codec(pair):
    root, sv, sr = pair
    mv = json.loads((root / "v" / "manifest.json").read_text())
    mr = json.loads((root / "r" / "manifest.json").read_text())
    assert mv["params"]["postings_codec"] == "varint"
    assert mr["params"]["postings_codec"] == "raw32"


@pytest.mark.parametrize("q", [
    "ray", "ray AND data", '"ray data"', "ray -data", "ind*",
    "ray data index build", '"index build"~2',
])
def test_search_identical_across_codecs(pair, q):
    _, sv, sr = pair
    hv = sv.search(q, k=50)
    hr = sr.search(q, k=50)
    assert [d for d, _ in hv] == [d for d, _ in hr], q
    for (d1, s1), (d2, s2) in zip(hv, hr):
        assert np.float32(s1) == np.float32(s2), (q, d1)


def test_check_index_both_codecs(pair):
    root, _, _ = pair
    assert check_index(str(root / "v"))["status"] == "ok"
    assert check_index(str(root / "r"))["status"] == "ok"


def test_raw32_segments_are_fixed_width(pair):
    root, _, _ = pair
    t = pq.read_table(root / "r" / "shards" / "shard=00000"
                      / "terms.parquet")
    df = t.column("df").to_numpy(zero_copy_only=False)
    enc = t.column("doc_ids_enc").to_pylist()
    for n, b in zip(df, enc):
        assert len(b) == 4 * n


def test_update_and_expunge_on_raw32(ray_session, tmp_path):
    from lucene_solr_ray.index.update import (
        delete_documents,
        expunge_deletes,
        update_index,
    )

    t2 = generate_transcripts(180, seed=5)
    t1 = t2.slice(0, 120)                    # prefix split, keys sorted
    later = t2.slice(120)
    pq.write_table(t1, tmp_path / "a.parquet")
    pq.write_table(later, tmp_path / "b.parquet")
    idx = tmp_path / "idx"
    build_index(str(tmp_path / "a.parquet"), str(idx), num_shards=2,
                postings_codec="raw32")
    update_index(str(idx), str(tmp_path / "b.parquet"))
    m = json.loads((idx / "manifest.json").read_text())
    assert m["params"]["postings_codec"] == "raw32"
    assert check_index(str(idx))["status"] == "ok"

    # full-corpus reference build must agree after the incremental path
    pq.write_table(t2, tmp_path / "full.parquet")
    build_index(str(tmp_path / "full.parquet"), str(tmp_path / "ref"),
                num_shards=2, postings_codec="raw32")
    s_inc = IndexSearcher(str(idx))
    s_ref = IndexSearcher(str(tmp_path / "ref"))
    for q in ("ray", "ray AND data", '"ray data"'):
        assert s_inc.search(q, k=30) == s_ref.search(q, k=30), q

    delete_documents(str(idx), doc_ids=[0, 1, 2])
    expunge_deletes(str(idx))
    assert check_index(str(idx))["status"] == "ok"
    s2 = IndexSearcher(str(idx))
    assert not {0, 1, 2} & {d for d, _ in s2.search("ray", k=1000)}


def test_resume_codec_mismatch_rejected(ray_session, tmp_path):
    src = transcripts_path("tiny")
    idx = tmp_path / "idx"
    build_index(src, str(idx), num_shards=2, postings_codec="raw32",
                keep_runs=True)
    with pytest.raises(ValueError, match="postings_codec"):
        build_index(src, str(idx), num_shards=2, resume=True,
                    postings_codec="varint")


def test_unknown_codec_rejected_up_front(ray_session, tmp_path):
    with pytest.raises(ValueError, match="unknown postings codec"):
        build_index(transcripts_path("tiny"), str(tmp_path / "x"),
                    num_shards=2, postings_codec="pfor")
