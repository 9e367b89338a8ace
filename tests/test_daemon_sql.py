"""DaemonStream analog + DataImportHandler/JDBC (DuckDB) source."""

import duckdb
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def sql_db(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("dih") / "import.duckdb")
    con = duckdb.connect(p)
    con.sql("CREATE TABLE docs AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    con.close()
    return p


def test_load_sql_single(ray_session, sql_db):
    from lucene_solr_ray.sources.loaders import load_sql

    ds = load_sql(sql_db, "SELECT doc_id, text FROM docs")
    con = duckdb.connect(sql_db, read_only=True)
    want = con.sql("SELECT count(*) FROM docs").fetchone()[0]
    con.close()
    assert ds.count() == want
    assert set(ds.schema().names) == {"doc_id", "text"}


def test_load_sql_partitioned_equals_single(ray_session, sql_db):
    """The range-partitioned parallel import returns exactly the single-
    connection result (SqlEntityProcessor split semantics: no dropped or
    duplicated boundary rows)."""
    from lucene_solr_ray.sources.loaders import load_sql

    single = load_sql(sql_db, "SELECT doc_id, lang FROM docs").to_pandas()
    part = load_sql(sql_db, "SELECT doc_id, lang FROM docs",
                    partition_col="doc_id",
                    num_partitions=5).to_pandas()
    s = single.sort_values("doc_id").reset_index(drop=True)
    g = part.sort_values("doc_id").reset_index(drop=True)
    assert s.equals(g)


def test_load_sql_into_index(ray_session, sql_db, tmp_path):
    """DIH end-to-end: SQL source -> schema adapter -> build_index."""
    import pyarrow as pa

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.searcher import IndexSearcher
    from lucene_solr_ray.sources.loaders import load_sql

    ds = load_sql(sql_db, "SELECT doc_id, text FROM docs WHERE doc_id < 60",
                  partition_col="doc_id", num_partitions=3)

    def to_schema(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.utf8_lpad(pc.cast(t.column("doc_id"), pa.string()), 8, "0")
        return pa.table({
            "conv_id": pc.binary_join_element_wise(
                pa.repeat("doc-", t.num_rows), ids, ""),
            "turn_idx": pa.nulls(t.num_rows, pa.int32()).fill_null(0),
            "text": t.column("text"),
        })

    out = tmp_path / "dih_idx"
    build_index(ds.map_batches(to_schema, batch_format="pyarrow"),
                str(out), num_shards=2, assume_sorted=False)
    s = IndexSearcher(str(out))
    assert s.manifest["stats"]["num_docs"] == 60
    assert len(s.search("table OR query OR data", k=5)) > 0


def test_daemon_stream_runs_and_tracks(ray_session):
    from lucene_solr_ray.pipelines.daemon import (DaemonStream, get_daemon,
                                                  kill_daemon, list_daemons)

    calls = []
    d = DaemonStream("t1", lambda: calls.append(1) or len(calls),
                     run_interval_ms=10)
    assert d.run(3) == 3
    assert d.iterations == 3 and d.last_exception is None
    st = d.status()
    assert st["id"] == "t1" and st["iterations"] == 3
    assert any(row["id"] == "t1" for row in list_daemons())
    assert get_daemon("t1") is d

    # errors are recorded, iteration count still advances (reference
    # daemons survive a failing run)
    def boom():
        raise RuntimeError("nope")
    b = DaemonStream("t2", boom)
    b.run_once()
    assert b.iterations == 1 and "nope" in b.last_exception
    assert kill_daemon("t1") and not kill_daemon("t1")


def test_daemon_thread_lifecycle(ray_session):
    import time

    from lucene_solr_ray.pipelines.daemon import DaemonStream, kill_daemon

    d = DaemonStream("t3", lambda: 42, run_interval_ms=5)
    d.start()
    deadline = time.time() + 5
    while d.iterations < 3 and time.time() < deadline:
        time.sleep(0.01)
    d.stop()
    assert d.iterations >= 3 and d.state == "STOPPED"
    assert d.last_result == 42
    kill_daemon("t3")


def test_daemon_stream_expression(ray_session):
    """daemon(...) in the expression language returns a handle whose
    every iteration re-evaluates the inner stream."""
    from lucene_solr_ray.pipelines.daemon import kill_daemon
    from lucene_solr_ray.pipelines.streaming_expr import evaluate

    d = evaluate('daemon(id="d9", runInterval=50, '
                 'search(events, q="*:*", fl="event_id,value", '
                 'sort="event_id asc", rows=5))',
                 "/root/testdata/sf0.001")
    out = d.run_once()
    assert out.count() == 5
    assert d.iterations == 1
    kill_daemon("d9")
