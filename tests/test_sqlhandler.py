"""Parallel SQL interface (SQLHandler.java analog): the engine executes
SQL itself; DuckDB runs the identical string as the oracle."""

import duckdb
import pandas as pd
import pytest

from lucene_solr_ray.pipelines.sqlhandler import (
    SQLParseError,
    parse_sql,
    sql_query,
)

SF = "/root/testdata/sf0.001"
TABLES = ("orders", "lineitem", "events", "customer", "documents")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("sql", [
    "SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 200000",
    "SELECT o_orderstatus, count(*) AS cnt FROM orders "
    "GROUP BY o_orderstatus",
    "SELECT o_orderstatus, o_orderpriority, count(*) AS cnt, "
    "sum(o_custkey) AS s FROM orders "
    "GROUP BY o_orderstatus, o_orderpriority",
    "SELECT count(*) AS cnt, min(o_custkey) AS mn, max(o_custkey) AS mx "
    "FROM orders WHERE o_orderstatus = 'F'",
    "SELECT event_type, count(*) AS cnt FROM events "
    "WHERE value >= 100 AND value < 300 GROUP BY event_type",
    "SELECT o_orderkey AS k FROM orders WHERE o_custkey <> 7 "
    "AND o_totalprice <= 60000",
    "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang "
    "ORDER BY cnt DESC, lang LIMIT 3",
])
def test_sql_matches_duckdb(ray_session, con, sql):
    got = _norm(sql_query(sql, SF).to_pandas())
    want = _norm(con.sql(sql).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def test_sql_avg_matches_duckdb(ray_session, con):
    sql = ("SELECT o_orderstatus, avg(o_totalprice) AS a FROM orders "
           "GROUP BY o_orderstatus")
    got = _norm(sql_query(sql, SF).to_pandas())
    want = _norm(con.sql(sql).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-12)


def test_sql_order_limit(ray_session, con):
    sql = ("SELECT o_orderkey, o_totalprice FROM orders "
           "ORDER BY o_totalprice DESC, o_orderkey LIMIT 5")
    got = sql_query(sql, SF).to_pandas()
    want = con.sql(sql).df()
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()


def test_sql_rejects_bad_shapes():
    for bad in [
        "DELETE FROM orders",
        "SELECT * FRM orders",
        "SELECT x FROM nosuchtable",
        "SELECT o_orderkey, count(*) FROM orders",       # missing GROUP BY
        "SELECT sum(*) FROM orders",
        "SELECT o_orderkey FROM orders WHERE o_custkey LIKE 'x%'",
    ]:
        with pytest.raises(SQLParseError):
            plan = parse_sql(bad)
            sql_query(bad, SF)


def test_parse_shapes():
    p = parse_sql("SELECT a, count(*) AS c FROM orders WHERE b >= 3 "
                  "GROUP BY a ORDER BY c DESC LIMIT 7")
    assert p["table"] == "orders"
    assert p["items"][0] == ("col", None, "a", "a")
    assert p["items"][1] == ("agg", "count", "*", "c")
    assert p["where"] == [("b", ">=", 3)]
    assert p["group"] == ["a"]
    assert p["order"] == [("c", True)]
    assert p["limit"] == 7


def test_sql_having(ray_session, con):
    sql = ("SELECT o_orderpriority, count(*) AS cnt FROM orders "
           "GROUP BY o_orderpriority HAVING cnt >= 250 "
           "ORDER BY cnt DESC, o_orderpriority")
    got = _norm(sql_query(sql, SF).to_pandas())
    want = _norm(con.sql(sql).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)
    assert len(got) > 0


def test_sql_having_requires_group():
    with pytest.raises(SQLParseError):
        parse_sql("SELECT count(*) AS c FROM orders HAVING c > 1")


# --- generative fuzz: random grammar-valid SQL vs DuckDB ----------------

from hypothesis import given, settings
from hypothesis import strategies as st

_NUM_COLS = ["o_custkey", "o_totalprice"]
_STR_COLS = ["o_orderstatus", "o_orderpriority"]
_OPS = ["=", "!=", "<", "<=", ">", ">="]


@st.composite
def _sql(draw):
    group = draw(st.lists(st.sampled_from(_STR_COLS), unique=True,
                          min_size=0, max_size=2))
    aggs = ["count(*) AS cnt"]
    for i, (fn, col) in enumerate(draw(st.lists(
            st.tuples(st.sampled_from(["sum", "min", "max"]),
                      st.sampled_from(_NUM_COLS)),
            min_size=0, max_size=2))):
        aggs.append(f"{fn}({col}) AS a{i}")
    if group:
        sel = ", ".join(group + aggs)
        tail = " GROUP BY " + ", ".join(group)
    else:
        sel = ", ".join(aggs)
        tail = ""
    conds = []
    for col, op in draw(st.lists(
            st.tuples(st.sampled_from(_NUM_COLS), st.sampled_from(_OPS)),
            min_size=0, max_size=2)):
        val = draw(st.integers(0, 300000))
        conds.append(f"{col} {op} {val}")
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    return f"SELECT {sel} FROM orders{where}{tail}"


@settings(max_examples=60, deadline=None)
@given(_sql())
def test_generated_sql_matches_duckdb(ray_session, gen_con, sql):
    got = _norm(sql_query(sql, SF).to_pandas())
    want = _norm(gen_con.sql(sql).df())
    if len(want) == 0:
        assert len(got) == 0
        return
    # float sum() is order-dependent across partitions — tolerance compare
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-9, atol=1e-9)


@pytest.fixture(scope="module")
def gen_con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW orders AS SELECT * FROM "
          f"read_parquet('{SF}/orders.parquet')")
    return c
