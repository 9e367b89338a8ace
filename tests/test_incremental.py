"""Incremental update == from-scratch rebuild (NRT/TopicStream semantics)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.data.transcripts import generate_transcripts
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.check import check_index
from lucene_solr_ray.index.update import update_index
from lucene_solr_ray.search.searcher import IndexSearcher

QUERIES = ["ray", "data index", "ray AND data", '"ray data"', "t00001",
           "+index -error", "engine OR merge"]


@pytest.fixture(scope="module")
def split_sources(tmp_path_factory):
    root = tmp_path_factory.mktemp("incr")
    table = generate_transcripts(120, seed=11)
    # split on a conversation boundary to keep (conv_id, turn_idx) append-only
    convs = table.column("conv_id").to_pylist()
    cut_conv = sorted(set(convs))[80]
    import pyarrow.compute as pc

    first = table.filter(pc.less(table.column("conv_id"), pa.scalar(cut_conv)))
    second = table.filter(
        pc.greater_equal(table.column("conv_id"), pa.scalar(cut_conv)))
    pq.write_table(table, root / "all.parquet")
    pq.write_table(first, root / "first.parquet")
    pq.write_table(second, root / "second.parquet")
    return root


def test_update_equals_rebuild(ray_session, split_sources, tmp_path):
    full_dir = tmp_path / "full"
    incr_dir = tmp_path / "incr"
    m_full = build_index(str(split_sources / "all.parquet"), str(full_dir),
                         docs_per_shard=150)
    build_index(str(split_sources / "first.parquet"), str(incr_dir),
                docs_per_shard=150)
    m_incr = update_index(str(incr_dir), str(split_sources / "second.parquet"))

    assert m_incr["stats"] == pytest.approx(m_full["stats"])
    assert m_incr["version"] == 2
    assert check_index(str(incr_dir))["status"] == "ok"

    s_full = IndexSearcher(str(full_dir))
    s_incr = IndexSearcher(str(incr_dir))
    for q in QUERIES:
        rf = [(d, float(s)) for d, s in s_full.search(q, k=10)]
        ri = [(d, float(s)) for d, s in s_incr.search(q, k=10)]
        assert rf == ri, f"query={q!r}"


def test_update_rejects_stale_input(ray_session, split_sources, tmp_path):
    incr_dir = tmp_path / "incr2"
    build_index(str(split_sources / "first.parquet"), str(incr_dir),
                docs_per_shard=150)
    update_index(str(incr_dir), str(split_sources / "second.parquet"))
    with pytest.raises(ValueError, match="checkpoint"):
        update_index(str(incr_dir), str(split_sources / "second.parquet"))
