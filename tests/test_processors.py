"""Ingest update-processor chain (field mutators) + merge crash recovery."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.sources import processors as up


T = pa.table({
    "conv_id": pa.array(["a", "b", "c"]),
    "text": pa.array(["  hi there ", "", None]),
    "n": pa.array([1, None, 3], type=pa.int64()),
})


def test_clone_and_length():
    t = up.clone_field("text", "text_copy")(T)
    assert t.column("text_copy").to_pylist() == t.column("text").to_pylist()
    t2 = up.field_length("conv_id", "conv_len")(T)
    assert t2.column("conv_len").to_pylist() == [1, 1, 1]


def test_regex_replace_and_trim():
    t = up.trim_field("text")(up.regex_replace("text", "hi", "yo")(T))
    assert t.column("text").to_pylist() == ["yo there", "", None]


def test_default_value_fills_and_creates():
    t = up.default_value("n", 0)(T)
    assert t.column("n").to_pylist() == [1, 0, 3]
    t2 = up.default_value("lang", "en")(T)
    assert t2.column("lang").to_pylist() == ["en"] * 3


def test_remove_blank():
    t = up.remove_blank("text")(T)
    assert t.column("text").to_pylist() == ["  hi there ", None, None]


def test_timestamp_fixed():
    ts = np.datetime64("2024-05-01T00:00:00", "us")
    t = up.timestamp_field("ingested_at", fixed=ts)(T)
    assert all(v == ts for v in
               t.column("ingested_at").to_numpy(zero_copy_only=False))


def test_chain_in_one_map_batches(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(T)
    out = up.apply_chain(ds, [
        up.trim_field("text"),
        up.remove_blank("text"),
        up.default_value("text", "(empty)"),
        up.field_length("text", "text_len"),
    ]).to_pandas()
    assert out["text"].tolist() == ["hi there", "(empty)", "(empty)"]
    assert out["text_len"].tolist() == [8, 7, 7]


def test_merge_crash_recovery(ray_session, tmp_path):
    """A crash between set-aside and replacement must be recoverable: the
    aside dir is restored before the next merge runs."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from lucene_solr_ray.data.transcripts import generate_transcripts
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.index.check import check_index
    from lucene_solr_ray.index.update import update_index
    from lucene_solr_ray.search.searcher import IndexSearcher

    table = generate_transcripts(60, seed=77)
    convs = sorted(set(table.column("conv_id").to_pylist()))
    import pyarrow.compute as pc

    cut = convs[40]
    first = table.filter(pc.less(table.column("conv_id"), pa.scalar(cut)))
    second = table.filter(
        pc.greater_equal(table.column("conv_id"), pa.scalar(cut)))
    pq.write_table(first, tmp_path / "first.parquet")
    pq.write_table(second, tmp_path / "second.parquet")
    idx = tmp_path / "idx"
    build_index(str(tmp_path / "first.parquet"), str(idx), docs_per_shard=80)
    # simulate the crash window: tail shard set aside, replacement missing
    shards = sorted((idx / "shards").glob("shard=*"))
    tail = shards[-1]
    sid = tail.name.split("=")[1]
    aside = tail.parent / f".merging-shard={sid}"
    os.rename(tail, aside)
    assert not tail.exists() and aside.exists()
    # the next update's merge must restore the old segment and proceed
    m = update_index(str(idx), str(tmp_path / "second.parquet"))
    assert not aside.exists() and tail.exists()
    assert check_index(str(idx))["status"] == "ok"
    s = IndexSearcher(str(idx))
    assert s.search("ray", k=3)
