"""UpdateLog write-ahead logging, crash replay, and CDCR forwarding
(UpdateLog.java:74,414,815; CdcrReplicator.java:42)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.data.transcripts import generate_transcripts
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.tlog import (
    UpdateLog,
    cdcr_bootstrap,
    cdcr_forward,
    log_status,
    logged_add,
    logged_atomic_update,
    logged_delete,
    recover_from_log,
)
from lucene_solr_ray.index.update import read_deletes, realtime_get
from lucene_solr_ray.search.searcher import IndexSearcher

QUERIES = ["ray", "data index", "ray AND data", '"ray data"']


@pytest.fixture(scope="module")
def sources(tmp_path_factory):
    root = tmp_path_factory.mktemp("tlog")
    table = generate_transcripts(60, seed=23)
    table = table.append_column(
        "score", pa.array(np.arange(table.num_rows, dtype=np.int64) % 9,
                          type=pa.int64()))
    convs = sorted(set(table.column("conv_id").to_pylist()))
    cut = convs[40]
    first = table.filter(pc.less(table.column("conv_id"), pa.scalar(cut)))
    second = table.filter(
        pc.greater_equal(table.column("conv_id"), pa.scalar(cut)))
    pq.write_table(first, root / "first.parquet")
    pq.write_table(second, root / "second.parquet")
    return root, first, second


def _build(sources, tmp_path, name):
    root, first, _ = sources
    idx = tmp_path / name
    build_index(str(root / "first.parquet"), str(idx), docs_per_shard=100)
    return str(idx)


def _key(table, i):
    return (table.column("conv_id")[i].as_py(),
            table.column("turn_idx")[i].as_py())


def _results(idx):
    s = IndexSearcher(idx)
    return {q: [(d, round(sc, 5)) for d, sc in s.search(q, k=10)]
            for q in QUERIES}


def test_logged_ops_apply_and_mark(ray_session, sources, tmp_path):
    root, first, second = sources
    idx = _build(sources, tmp_path, "idx")
    logged_add(idx, str(root / "second.parquet"))
    k0 = _key(first, 0)
    logged_delete(idx, keys=[k0])
    k1 = _key(first, 5)
    logged_atomic_update(
        idx, [{"conv_id": k1[0], "turn_idx": k1[1],
               "score": {"inc": 100}}])
    st = log_status(idx)
    assert st["entries"] == 3 and st["unapplied"] == []
    assert st["last_version"] == 3
    # ops really applied
    assert realtime_get(idx, keys=[k0]) is None or \
        realtime_get(idx, keys=[k0]).num_rows == 0 or \
        realtime_get(idx, keys=[k0]).column("doc_id")[0].as_py() in \
        read_deletes(idx)
    got = realtime_get(idx, keys=[k1])
    base = first.column("score")[5].as_py()
    assert got.column("score")[0].as_py() == base + 100
    # inc was logged as its post-image set (idempotence contract)
    log = UpdateLog(idx)
    atomic_entry = [e for e in log.entries() if e["op"] == "atomic"][0]
    assert atomic_entry["updates"][0]["score"] == {"set": base + 100}


def test_delete_by_doc_id_logs_keys(ray_session, sources, tmp_path):
    root, first, _ = sources
    idx = _build(sources, tmp_path, "idx_del")
    k = _key(first, 3)
    doc_id = realtime_get(idx, keys=[k]).column("doc_id")[0].as_py()
    logged_delete(idx, doc_ids=[doc_id])
    entry = UpdateLog(idx).entries()[-1]
    assert [tuple(x) for x in entry["keys"]] == [k]
    assert doc_id in read_deletes(idx)


def test_crash_replay_converges(ray_session, sources, tmp_path):
    """Log entries WITHOUT applying (crash before apply); recover_from_log
    replays the tail and the index equals the cleanly-updated twin."""
    root, first, second = sources
    crashed = _build(sources, tmp_path, "crashed")
    clean = _build(sources, tmp_path, "clean")

    # clean twin: apply everything normally (logged, applied, marked)
    logged_add(clean, str(root / "second.parquet"))
    k = _key(first, 2)
    logged_delete(clean, keys=[k])

    # crashed twin: entries hit the log but the apply never ran
    log = UpdateLog(crashed)
    v1 = log.append({"op": "add", "overwrite": True},
                    payload=str(root / "second.parquet"))
    v2 = log.append({"op": "delete", "keys": [list(k)]})
    assert log_status(crashed)["unapplied"] == [v1, v2]

    info = recover_from_log(crashed)
    assert info["adds"] == 1 and info["deletes"] == 1
    assert info["replayed"] == [v1, v2]
    assert log_status(crashed)["unapplied"] == []
    assert _results(crashed) == _results(clean)
    # idempotent: a second recovery is a no-op
    info2 = recover_from_log(crashed)
    assert info2["replayed"] == []
    assert _results(crashed) == _results(clean)


def test_replay_after_partial_apply_is_idempotent(ray_session, sources,
                                                  tmp_path):
    """Crash BETWEEN apply and mark_applied: replay re-applies the entry;
    overwrite-by-key semantics keep the index correct (one live copy)."""
    root, first, second = sources
    idx = _build(sources, tmp_path, "partial")
    twin = _build(sources, tmp_path, "partial_twin")
    logged_add(twin, str(root / "second.parquet"))

    log = UpdateLog(idx)
    v = log.append({"op": "add", "overwrite": False},
                   payload=str(root / "second.parquet"))
    entry = log.entries()[-1]
    # crash exactly between apply and mark_applied
    orig = UpdateLog.mark_applied
    UpdateLog.mark_applied = lambda self, version: (_ for _ in ()).throw(
        RuntimeError("crash"))
    try:
        with pytest.raises(RuntimeError):
            log.apply_entry(entry)
    finally:
        UpdateLog.mark_applied = orig
    assert log_status(idx)["unapplied"] == [v]

    info = recover_from_log(idx)
    # the manifest's atomically-published tlog_applied marker detects the
    # completed apply: nothing is re-applied, the entry is only marked
    assert info["replayed"] == [] and info["already_applied"] == [v]
    assert log_status(idx)["unapplied"] == []
    assert _results(idx) == _results(twin)


def test_cdcr_bootstrap_and_forward(ray_session, sources, tmp_path):
    root, first, second = sources
    src = _build(sources, tmp_path, "cdcr_src")
    tgt = str(tmp_path / "cdcr_tgt")
    cdcr_bootstrap(src, tgt)

    logged_add(src, str(root / "second.parquet"))
    k = _key(first, 7)
    logged_delete(src, keys=[k])
    k2 = _key(first, 9)
    logged_atomic_update(
        src, [{"conv_id": k2[0], "turn_idx": k2[1], "score": {"inc": 5}}])

    fwd = cdcr_forward(src, tgt)
    assert fwd == {"adds": 1, "deletes": 1, "atomics": 1,
                   "from": 0, "to": 3}
    assert _results(tgt) == _results(src)
    assert realtime_get(tgt, keys=[k2]).column("score")[0].as_py() == \
        realtime_get(src, keys=[k2]).column("score")[0].as_py()

    # checkpointed: nothing further to forward
    fwd2 = cdcr_forward(src, tgt)
    assert fwd2["adds"] == fwd2["deletes"] == fwd2["atomics"] == 0
    assert fwd2["from"] == 3

    # new op stream forwards incrementally
    logged_delete(src, keys=[_key(second, 0)])
    fwd3 = cdcr_forward(src, tgt)
    assert fwd3 == {"adds": 0, "deletes": 1, "atomics": 0,
                    "from": 3, "to": 4}
    assert _results(tgt) == _results(src)


def test_bootstrap_refuses_existing_target(ray_session, sources, tmp_path):
    src = _build(sources, tmp_path, "boot_src")
    with pytest.raises(FileExistsError):
        cdcr_bootstrap(src, src)


def test_logged_delete_retry_is_noop(ray_session, sources, tmp_path):
    """Solr delete-by-id of a missing/tombstoned doc is a no-op; the
    WAL'd retry path must not raise (review finding: KeyError broke it)."""
    root, first, _ = sources
    idx = _build(sources, tmp_path, "retry")
    k = _key(first, 4)
    doc_id = realtime_get(idx, keys=[k]).column("doc_id")[0].as_py()
    logged_delete(idx, doc_ids=[doc_id])
    logged_delete(idx, doc_ids=[doc_id])   # tombstoned -> resolves to []
    entries = UpdateLog(idx).entries()
    assert entries[-1]["keys"] == []
    assert doc_id in read_deletes(idx)


def test_poison_entry_marked_failed_and_stream_unblocked(
        ray_session, sources, tmp_path):
    """A logged entry whose apply raises blocks new logged updates until
    recover_from_log marks it failed (LogReplayer counts errors and
    continues), after which the stream flows again."""
    root, first, second = sources
    idx = _build(sources, tmp_path, "poison")
    # reverse-sorted add payload -> update_index rejects it every time
    bad = second.sort_by([("conv_id", "descending"),
                          ("turn_idx", "descending")])
    import pyarrow.parquet as pq_
    pq_.write_table(bad, tmp_path / "bad.parquet")
    with pytest.raises(ValueError):
        logged_add(idx, str(tmp_path / "bad.parquet"))
    # tail is dirty: new logged updates are refused (Solr blocks updates
    # while replay is pending)
    with pytest.raises(RuntimeError, match="un-applied"):
        logged_delete(idx, keys=[_key(first, 0)])
    info = recover_from_log(idx)
    assert len(info["errors"]) == 1 and info["replayed"] == []
    st = log_status(idx)
    assert st["failed"] == [info["errors"][0]["version"]]
    assert st["unapplied"] == []
    # stream unblocked
    logged_delete(idx, keys=[_key(first, 0)])


def test_bootstrap_excludes_source_log(ray_session, sources, tmp_path):
    root, first, _ = sources
    src = _build(sources, tmp_path, "boot2_src")
    logged_delete(src, keys=[_key(first, 1)])   # source log has entries
    tgt = str(tmp_path / "boot2_tgt")
    cdcr_bootstrap(src, tgt)
    from pathlib import Path
    assert not (Path(tgt) / "tlog").exists() or \
        list((Path(tgt) / "tlog").glob("tlog.*")) == []
    # the source's tlog_applied marker must not poison the fresh target
    # log: a first logged op on the target must actually run
    st = log_status(tgt)
    assert st["tlog_applied"] == 0 and st["entries"] == 0
    k = _key(first, 2)
    logged_delete(tgt, keys=[k])
    assert log_status(tgt)["tlog_applied"] == 1


def test_logged_add_dataset_payload_streams(ray_session, sources,
                                            tmp_path):
    """A Dataset source is logged via write_parquet (a payload
    directory), never collected on the driver, and applies from the
    logged payload."""
    import ray.data as rd

    root, first, second = sources
    idx = _build(sources, tmp_path, "ds_payload")
    logged_add(idx, rd.from_arrow(second))
    log = UpdateLog(idx)
    entry = log.entries()[-1]
    assert entry["payload"].endswith(".pq")
    assert (log.path / entry["payload"]).is_dir()
    twin = _build(sources, tmp_path, "ds_payload_twin")
    logged_add(twin, str(root / "second.parquet"))
    assert _results(idx) == _results(twin)
