"""Replication: snapshot/restore (backup) + incremental fetchindex.

Semantics: lucene/replicator IndexRevision/LocalReplicator +
solr ReplicationHandler/IndexFetcher (see index/replicator.py header).
"""

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.data.transcripts import generate_transcripts
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.check import check_index
from lucene_solr_ray.index.replicator import (
    replicate,
    restore,
    revision_info,
    snapshot,
)
from lucene_solr_ray.index.update import (
    atomic_update,
    delete_documents,
    update_index,
)
from lucene_solr_ray.search.searcher import IndexSearcher


def _results(index_dir, queries=("ray", "data OR index", "ray AND data")):
    s = IndexSearcher(str(index_dir))
    return {q: s.search(q, k=20) for q in queries}


@pytest.fixture()
def master(ray_session, tmp_path):
    src = tmp_path / "src.parquet"
    pq.write_table(generate_transcripts(200, seed=5), src)
    idx = tmp_path / "master"
    build_index(str(src), str(idx), num_shards=3)
    return tmp_path, idx


def _later_batch(tmp_path, n=60, seed=6):
    t = generate_transcripts(n, seed=seed)
    # shift conv ids past the master's checkpoint so update accepts it
    cid = [f"zz-{c}" for c in t.column("conv_id").to_pylist()]
    t = t.set_column(t.schema.get_field_index("conv_id"), "conv_id",
                     pa.array(cid))
    later = tmp_path / "later.parquet"
    pq.write_table(t, later)
    return str(later)


def test_snapshot_restore_roundtrip(master):
    tmp_path, idx = master
    before = _results(idx)
    info = snapshot(str(idx), str(tmp_path / "snap"))
    assert info["files"] == len(revision_info(str(idx))["files"])

    # mutate the master AFTER the snapshot
    update_index(str(idx), _later_batch(tmp_path))
    delete_documents(str(idx), doc_ids=[1, 3, 5])
    assert _results(idx) != before

    restore(str(tmp_path / "snap"), str(tmp_path / "restored"))
    assert check_index(str(tmp_path / "restored"))["status"] == "ok"
    assert _results(tmp_path / "restored") == before


def test_snapshot_refuses_existing_target(master):
    tmp_path, idx = master
    snapshot(str(idx), str(tmp_path / "snap"))
    with pytest.raises(FileExistsError):
        snapshot(str(idx), str(tmp_path / "snap"))
    with pytest.raises(FileExistsError):
        restore(str(tmp_path / "snap"), str(idx))


def test_replicate_full_then_incremental(master):
    tmp_path, idx = master
    replica = tmp_path / "replica"

    r1 = replicate(str(idx), str(replica))
    total = len(revision_info(str(idx))["files"])
    assert r1["copied"] == total and r1["deleted"] == 0
    assert _results(replica) == _results(idx)

    # no-op when in sync
    r2 = replicate(str(idx), str(replica))
    assert r2["copied"] == 0 and r2["deleted"] == 0

    # incremental after an update: only new/changed files move
    update_index(str(idx), _later_batch(tmp_path))
    r3 = replicate(str(idx), str(replica))
    assert 0 < r3["copied"] < len(revision_info(str(idx))["files"])
    assert _results(replica) == _results(idx)
    assert check_index(str(replica))["status"] == "ok"


def test_replicate_picks_up_docvalue_rewrites(master):
    """atomic_update rewrites a norms partition in place (same file
    names): the crc path must still sync it."""
    tmp_path, idx = master
    replica = tmp_path / "replica"
    replicate(str(idx), str(replica))

    s = IndexSearcher(str(idx))
    conv = s.docmap()[0]
    atomic_update(str(idx), [{"conv_id": str(conv), "turn_idx": 0,
                              "role": {"set": "replicated-role"}}])
    r = replicate(str(idx), str(replica))
    assert r["copied"] > 0
    got = IndexSearcher(str(replica)).docvalues("role")[0]
    assert got == "replicated-role"


def test_replicate_deletes_stale_files(master):
    tmp_path, idx = master
    replica = tmp_path / "replica"
    replicate(str(idx), str(replica))
    stale = replica / "shards" / "shard=00099" / "terms.parquet"
    stale.parent.mkdir(parents=True)
    stale.write_bytes(b"junk")
    r = replicate(str(idx), str(replica))
    assert r["deleted"] == 1
    assert not stale.exists()
    assert _results(replica) == _results(idx)


def test_replicate_picks_up_expunge(master):
    """expunge_deletes rewrites shard segments in place — the sync must
    detect the new content even at equal file sizes (crc path)."""
    from lucene_solr_ray.index.update import delete_documents, \
        expunge_deletes

    tmp_path, idx = master
    replica = tmp_path / "replica"
    replicate(str(idx), str(replica))
    delete_documents(str(idx), doc_ids=[1, 2, 3])
    expunge_deletes(str(idx))
    r = replicate(str(idx), str(replica))
    assert r["copied"] > 0
    assert _results(replica) == _results(idx)
    assert check_index(str(replica))["status"] == "ok"
