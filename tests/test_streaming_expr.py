"""Streaming-expression language: parse + evaluate against pandas/DuckDB
recomputation over the sf tables."""

import duckdb
import pandas as pd
import pytest

from lucene_solr_ray.pipelines.streaming_expr import Expr, evaluate, parse_expr

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "events"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def _df(expr: str) -> pd.DataFrame:
    out = evaluate(expr, SF).to_pandas()
    return out[sorted(out.columns)].sort_values(
        by=sorted(out.columns)).reset_index(drop=True)


def _sql(con, q: str) -> pd.DataFrame:
    out = con.sql(q).df()
    return out[sorted(out.columns)].sort_values(
        by=sorted(out.columns)).reset_index(drop=True)


def test_parse_tree():
    e = parse_expr('innerJoin(search(orders, fl="o_orderkey"), '
                   'search(customer), on="o_custkey=c_custkey")')
    assert e.name == "innerJoin"
    assert e.args[0] == Expr("search", ["orders"], {"fl": "o_orderkey"})
    assert e.args[1].name == "search"
    assert e.params["on"] == "o_custkey=c_custkey"
    with pytest.raises(ValueError, match="unknown stream function"):
        evaluate("daemonize(search(orders))", SF)


def test_search_select(ray_session, con):
    got = _df('select(search(orders, fl="o_orderkey,o_totalprice"), '
              'o_orderkey, o_totalprice as price)')
    want = _sql(con, "SELECT o_orderkey, o_totalprice AS price FROM orders")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_search_fq_range(ray_session, con):
    got = _df('search(orders, fl="o_orderkey,o_totalprice", '
              'fq="o_totalprice:[100000 TO 200000]")')
    want = _sql(con, "SELECT o_orderkey, o_totalprice FROM orders "
                     "WHERE o_totalprice BETWEEN 100000 AND 200000")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_inner_join(ray_session, con):
    got = _df('innerJoin(search(orders, fl="o_orderkey,o_custkey"), '
              'search(customer, fl="c_custkey,c_name"), '
              'on="o_custkey=c_custkey")')
    want = _sql(con, "SELECT o_orderkey, o_custkey, c_name FROM orders "
                     "JOIN customer ON o_custkey = c_custkey")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_left_outer_join(ray_session, con):
    got = _df('leftOuterJoin(search(customer, fl="c_custkey,c_name"), '
              'search(orders, fl="o_custkey,o_orderkey"), '
              'on="c_custkey=o_custkey")')
    want = _sql(con, "SELECT c_custkey, c_name, o_orderkey FROM customer "
                     "LEFT JOIN orders ON c_custkey = o_custkey")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_intersect_complement(ray_session, con):
    big = ('search(orders, fl="o_custkey,o_totalprice", '
           'fq="o_totalprice:[420000 TO 999999999]")')
    got = _df(f'intersect(search(customer, fl="c_custkey,c_name"), '
              f'{big}, on="c_custkey=o_custkey")')
    want = _sql(con, "SELECT c_custkey, c_name FROM customer WHERE "
                     "c_custkey IN (SELECT o_custkey FROM orders "
                     "WHERE o_totalprice >= 420000)")
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    got2 = _df(f'complement(search(customer, fl="c_custkey,c_name"), '
               f'{big}, on="c_custkey=o_custkey")')
    want2 = _sql(con, "SELECT c_custkey, c_name FROM customer WHERE "
                      "c_custkey NOT IN (SELECT o_custkey FROM orders "
                      "WHERE o_totalprice >= 420000)")
    assert len(want2) > 0
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)


def test_rollup_metrics(ray_session, con):
    got = _df('rollup(search(lineitem, '
              'fl="l_returnflag,l_quantity"), over="l_returnflag", '
              'sum(l_quantity), count(*), avg(l_quantity))')
    want = _sql(con, 'SELECT l_returnflag, sum(l_quantity) AS "sum(l_quantity)", '
                     'count(*) AS "count(*)", avg(l_quantity) AS "avg(l_quantity)" '
                     "FROM lineitem GROUP BY l_returnflag")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_top_and_sort(ray_session, con):
    out = evaluate('top(search(orders, fl="o_orderkey,o_totalprice"), '
                   'sort="o_totalprice desc", n="5")', SF).to_pandas()
    want = con.sql("SELECT o_orderkey, o_totalprice FROM orders "
                   "ORDER BY o_totalprice DESC LIMIT 5").df()
    assert sorted(out["o_totalprice"]) == sorted(want["o_totalprice"])


def test_unique_and_merge(ray_session, con):
    got = _df('unique(merge(search(orders, fl="o_custkey"), '
              'search(orders, fl="o_custkey")), over="o_custkey")')
    want = _sql(con, "SELECT DISTINCT o_custkey FROM orders")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_fulltext_search_stream(ray_session):
    out = evaluate('search(documents, q="table scan", rows="5")',
                   SF).to_pandas()
    assert list(out.columns) == ["doc_id", "score"]
    assert 0 < len(out) <= 5
    assert (out["score"].to_numpy()[:-1] >= out["score"].to_numpy()[1:]).all()


# --- fuzz: stream parser is total (ValueError or tree, never a crash) --

from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_stream_parser_total(text):
    try:
        parse_expr(text)
    except ValueError:
        pass


def test_having_filters_on_aggregate(ray_session):
    """having(rollup(...), gt(metric, N)) == SQL HAVING."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    out = evaluate(
        'having('
        '  rollup(search(orders, fl="o_orderstatus,o_totalprice"),'
        '         over="o_orderstatus", count(*)),'
        '  gt(count(*), 100))', sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    want = con.execute(
        "SELECT o_orderstatus, count(*) AS c FROM orders "
        "GROUP BY 1 HAVING count(*) > 100").fetchdf()
    got = dict(zip(out["o_orderstatus"], out["count(*)"]))
    assert got == dict(zip(want["o_orderstatus"], want["c"]))
    # other evaluators parse
    few = evaluate(
        'having(search(orders, fl="o_orderkey,o_totalprice"),'
        ' lteq(o_totalprice, 50000))', sf).to_pandas()
    assert len(few) == 160  # duckdb: count(*) FILTER (o_totalprice<=50000)
    assert (few["o_totalprice"] <= 50000).all()


def test_facet_stream_function(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    out = evaluate(
        'facet(lineitem, buckets="l_returnflag", sum(l_quantity), count(*))',
        sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = con.execute(
        "SELECT l_returnflag, sum(l_quantity) s, count(*) c "
        "FROM lineitem GROUP BY 1").fetchdf()
    got = out.set_index("l_returnflag")
    for _, r in want.iterrows():
        assert got.loc[r["l_returnflag"], "count(*)"] == r["c"]
        assert abs(got.loc[r["l_returnflag"], "sum(l_quantity)"]
                   - r["s"]) < 1e-6


def test_random_stream_function(ray_session):
    out1 = evaluate('random(events, rows="25", on="event_id")',
                    SF).to_pandas()
    out2 = evaluate('random(events, rows="25", on="event_id")',
                    SF).to_pandas()
    assert len(out1) == 25
    # deterministic (RandomStream with a fixed seed analog)
    assert sorted(out1["event_id"]) == sorted(out2["event_id"])
    # genuinely scattered, not a head() slice
    assert sorted(out1["event_id"]) != sorted(out1["event_id"])[:25] or \
        max(out1["event_id"]) > 100


def test_stats_stream_function(ray_session):
    import duckdb

    out = evaluate(
        'stats(events, count(*), sum(value), avg(value), max(value))',
        SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = con.execute("SELECT count(*) c, sum(value) s, avg(value) a, "
                       "max(value) m FROM events").fetchone()
    assert out["count(*)"][0] == want[0]
    assert abs(out["sum(value)"][0] - want[1]) < 1e-6
    assert abs(out["avg(value)"][0] - want[2]) < 1e-9
    assert out["max(value)"][0] == want[3]


def test_update_stream_function(ray_session, tmp_path):
    import pyarrow.dataset as pads

    dest = tmp_path / "sink"
    out = evaluate(
        f'update("{dest}", search(events, fl="event_id,value"))',
        SF).to_pandas()
    assert out["batchIndexed"][0] == 1000
    written = pads.dataset(str(dest), format="parquet")
    assert written.count_rows() == 1000
    assert set(written.schema.names) == {"event_id", "value"}


def test_outer_hash_join(ray_session, con):
    got = _df('outerHashJoin(search(customer, fl="c_custkey,c_name"), '
              'search(orders, fl="o_custkey,o_orderkey"), '
              'on="c_custkey=o_custkey")')
    want = _sql(con, "SELECT c_custkey, c_name, o_orderkey FROM customer "
                     "LEFT JOIN orders ON c_custkey = o_custkey")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_select_replace_with_value(ray_session, con):
    got = _df('select(search(orders, fl="o_orderkey,o_orderstatus"), '
              'o_orderkey, o_orderstatus, '
              'replace(o_orderstatus, "O", withValue="OPEN"))')
    want = _sql(con, "SELECT o_orderkey, CASE WHEN o_orderstatus='O' THEN "
                     "'OPEN' ELSE o_orderstatus END AS o_orderstatus "
                     "FROM orders")
    pd.testing.assert_frame_equal(got, want)


def test_select_replace_with_field_after_rename(ray_session, con):
    # ops run after projection+rename (SelectStream.java read order)
    got = _df('select(search(orders, fl="o_orderkey,o_custkey,o_orderstatus"),'
              ' o_orderkey, o_custkey as k, o_orderstatus, '
              'replace(o_orderstatus, "F", withField="k"))')
    want = _sql(con, "SELECT o_orderkey, o_custkey AS k, "
                     "CASE WHEN o_orderstatus='F' THEN CAST(o_custkey AS "
                     "VARCHAR) ELSE o_orderstatus END AS o_orderstatus "
                     "FROM orders")
    pd.testing.assert_frame_equal(got, want)


def test_select_concat_null_renders_as_string(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from lucene_solr_ray.pipelines.streaming_expr import _select_ops_fn, parse_expr

    e = parse_expr('concat(fields="a,b", as="c", delim="-")')
    t = pa.table({"a": ["x", None], "b": ["y", "z"]})
    out = _select_ops_fn([e])(t)
    assert out.column("c").to_pylist() == ["x-y", "null-z"]


def test_select_concat_stream(ray_session, con):
    got = _df('select(search(orders, fl="o_orderkey,o_orderstatus,o_orderpriority"), '
              'o_orderkey, o_orderstatus, o_orderpriority, '
              'concat(fields="o_orderstatus,o_orderpriority", as="tag", delim="/"))')
    want = _sql(con, "SELECT o_orderkey, o_orderstatus, o_orderpriority, "
                     "o_orderstatus || '/' || "
                     "o_orderpriority AS tag FROM orders")
    pd.testing.assert_frame_equal(got, want)


def test_reduce_distinct(ray_session, con):
    got = _df('reduce(search(orders, fl="o_custkey"), by="o_custkey", '
              'distinct())')
    want = _sql(con, "SELECT DISTINCT o_custkey FROM orders")
    pd.testing.assert_frame_equal(got, want)


def test_reduce_group_topn(ray_session, con):
    out = evaluate(
        'reduce(search(orders, fl="o_custkey,o_orderkey,o_totalprice"), '
        'by="o_custkey", group(sort="o_totalprice desc", n=2))', SF
    ).to_pandas()
    # head fields == best tuple of the group; group list is best-first
    # and capped at n (GroupOperation.java:106-128)
    want = con.sql(
        "SELECT o_custkey, max(o_totalprice) AS best, "
        "count(*) AS cnt FROM orders GROUP BY o_custkey").df()
    want["cnt"] = want["cnt"].clip(upper=2)
    got = out.sort_values("o_custkey").reset_index(drop=True)
    want = want.sort_values("o_custkey").reset_index(drop=True)
    assert (got["o_custkey"].to_numpy() == want["o_custkey"].to_numpy()).all()
    assert got["o_totalprice"].to_numpy() == pytest.approx(
        want["best"].to_numpy())
    sizes = got["group"].map(len).to_numpy()
    assert (sizes == want["cnt"].to_numpy()).all()
    for _, row in got.head(20).iterrows():
        prices = [g["o_totalprice"] for g in row["group"]]
        assert prices == sorted(prices, reverse=True)
        assert row["o_totalprice"] == prices[0]


def test_replace_type_mismatch_is_noop(ray_session):
    import pyarrow as pa
    from lucene_solr_ray.pipelines.streaming_expr import (
        _select_ops_fn,
        parse_expr,
    )

    # numeric original vs string column: Java equals -> never matches
    e = parse_expr('replace(s, 7, withValue="X")')
    t = pa.table({"s": ["7", "a", None]})
    out = _select_ops_fn([e])(t)
    assert out.column("s").to_pylist() == ["7", "a", None]


def test_reduce_distinct_deterministic_representative(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from lucene_solr_ray.pipelines.streaming_expr import evaluate

    # same group arrives in different block layouts; the survivor must
    # be the lexicographically-smallest tuple either way
    rows = pa.table({
        "k": [1, 1, 2, 2, 1, 2],
        "v": ["d", "b", "z", "m", "a", "q"],
    })
    import lucene_solr_ray.pipelines.streaming_expr as se

    outs = []
    for nblocks in (1, 3):
        ds = rd.from_arrow(rows).repartition(nblocks)
        orig = se._eval_search

        def fake_search(e, sf_dir, _ds=ds):
            return _ds

        se._eval_search = fake_search
        try:
            out = evaluate('reduce(search(events), by="k", distinct())',
                           "unused").to_pandas()
        finally:
            se._eval_search = orig
        outs.append(out.sort_values("k").reset_index(drop=True))
    assert outs[0].equals(outs[1])
    assert outs[0]["v"].tolist() == ["a", "m"]


def test_replace_no_match_keeps_dtype(ray_session):
    import pyarrow as pa
    from lucene_solr_ray.pipelines.streaming_expr import (
        _select_ops_fn,
        parse_expr,
    )

    # type-mismatched original: no tuple matches, column must come back
    # bit-identical (NOT promoted to string by the replacement fallback)
    e = parse_expr('replace(n, "x", withValue="y")')
    t = pa.table({"n": pa.array([1, 2, None], type=pa.int64())})
    out = _select_ops_fn([e])(t)
    assert out.column("n").type == pa.int64()
    assert out.column("n").to_pylist() == [1, 2, None]
