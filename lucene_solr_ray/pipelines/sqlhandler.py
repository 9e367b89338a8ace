"""Parallel SQL interface (SQLHandler analog).

Re-expression of ``solr/core/src/java/org/apache/solr/handler/
SQLHandler.java`` (the hand-rolled SQL-to-TupleStream translator of
this snapshot): a compact SQL subset parses onto the engine's Ray Data
operators — the same mapping the reference performs onto streaming
expressions (SELECT -> SearchStream/FacetStream, GROUP BY ->
RollupStream over a hash partition, ORDER BY -> RankStream, LIMIT ->
LimitStream).

Supported surface (the reference's documented basic grammar):

    SELECT <field | agg(field) | count(*)> [AS alias], ...
    FROM <table>
    [WHERE <field op literal> [AND ...]]       op: = != <> < <= > >=
    [GROUP BY f1, f2, ...]
    [ORDER BY col [ASC|DESC], ...]
    [LIMIT n]

Aggregates: count/sum/min/max/avg. Everything executes as streaming
Dataset transforms: pruned parquet read, vectorized per-batch WHERE,
partial-plus-final groupby aggregation, distributed sort, limit. The
column list prunes the read; an aggregate query's shuffle carries only
the group keys + agg inputs.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from .util import TABLES, read

_AGGS = ("count", "sum", "min", "max", "avg")

_SELECT_RE = re.compile(
    r"^\s*select\s+(?P<sel>.+?)\s+from\s+(?P<tbl>\w+)"
    r"(?:\s+where\s+(?P<where>.+?))?"
    r"(?:\s+group\s+by\s+(?P<group>.+?))?"
    r"(?:\s+having\s+(?P<having>.+?))?"
    r"(?:\s+order\s+by\s+(?P<order>.+?))?"
    r"(?:\s+limit\s+(?P<limit>\d+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)

_ITEM_RE = re.compile(
    r"^(?:(?P<agg>\w+)\(\s*(?P<arg>\*|\w+)\s*\)|(?P<col>\w+))"
    r"(?:\s+as\s+(?P<alias>\w+))?$", re.IGNORECASE)

_COND_RE = re.compile(
    r"^(?P<col>\w+)\s*(?P<op>=|!=|<>|<=|>=|<|>)\s*(?P<val>.+)$")


class SQLParseError(ValueError):
    pass


def _parse_literal(v: str):
    v = v.strip()
    if (v.startswith("'") and v.endswith("'")) or \
            (v.startswith('"') and v.endswith('"')):
        return v[1:-1]
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        raise SQLParseError(f"bad literal: {v!r}") from None


def _split_commas(s: str) -> list[str]:
    """Split on commas not inside parentheses."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [x for x in out if x]


def parse_sql(sql: str) -> dict:
    m = _SELECT_RE.match(sql)
    if not m:
        raise SQLParseError(f"unsupported SQL shape: {sql!r}")
    tbl = m.group("tbl").lower()
    if tbl not in TABLES:
        raise SQLParseError(f"unknown table {tbl!r}")
    items = []
    for it in _split_commas(m.group("sel")):
        im = _ITEM_RE.match(it.strip())
        if not im:
            raise SQLParseError(f"bad select item: {it!r}")
        if im.group("agg"):
            agg = im.group("agg").lower()
            if agg not in _AGGS:
                raise SQLParseError(f"unsupported aggregate {agg!r}")
            arg = im.group("arg")
            if arg == "*" and agg != "count":
                raise SQLParseError(f"{agg}(*) is not valid")
            name = im.group("alias") or f"{agg}({arg})"
            items.append(("agg", agg, arg, name))
        else:
            col = im.group("col")
            items.append(("col", None, col, im.group("alias") or col))
    conds = []
    if m.group("where"):
        for part in re.split(r"\s+and\s+", m.group("where"),
                             flags=re.IGNORECASE):
            cm = _COND_RE.match(part.strip())
            if not cm:
                raise SQLParseError(f"bad condition: {part!r}")
            conds.append((cm.group("col"), cm.group("op"),
                          _parse_literal(cm.group("val"))))
    group = [c.strip() for c in m.group("group").split(",")] \
        if m.group("group") else []
    having = []
    if m.group("having"):
        for part in re.split(r"\s+and\s+", m.group("having"),
                             flags=re.IGNORECASE):
            cm = _COND_RE.match(part.strip())
            if not cm:
                raise SQLParseError(f"bad HAVING condition: {part!r}")
            having.append((cm.group("col"), cm.group("op"),
                           _parse_literal(cm.group("val"))))
    if having and not group:
        raise SQLParseError("HAVING requires GROUP BY")
    order = []
    if m.group("order"):
        for part in m.group("order").split(","):
            bits = part.split()
            if not bits:
                continue
            desc = len(bits) > 1 and bits[1].lower() == "desc"
            order.append((bits[0], desc))
    limit = int(m.group("limit")) if m.group("limit") else None
    return {"table": tbl, "items": items, "where": conds,
            "group": group, "having": having, "order": order,
            "limit": limit}


_OPS = {"=": pc.equal, "!=": pc.not_equal, "<>": pc.not_equal,
        "<": pc.less, "<=": pc.less_equal, ">": pc.greater,
        ">=": pc.greater_equal}


def sql_query(sql: str, sf_dir: str):
    """Execute one SQL statement against the test tables, returning a
    Dataset (SQLHandler request surface)."""
    plan = parse_sql(sql)
    items, group = plan["items"], plan["group"]
    aggs = [i for i in items if i[0] == "agg"]
    plains = [i for i in items if i[0] == "col"]
    if aggs and not group and plains:
        raise SQLParseError("non-aggregated columns need GROUP BY")
    for kind, _, col, _ in plains:
        if group and col not in group:
            raise SQLParseError(f"column {col!r} not in GROUP BY")

    # pruned read: only referenced columns leave storage
    needed = {c for _, _, c, _ in plains}
    needed |= {arg for _, _, arg, _ in aggs if arg != "*"}
    needed |= {c for c, _, _ in plan["where"]}
    needed |= set(group)
    ds = read(sf_dir, plan["table"], sorted(needed) or None)

    if plan["where"]:
        conds = plan["where"]

        def flt(t: pa.Table) -> pa.Table:
            mask = None
            for col, op, val in conds:
                c = t.column(col)
                m2 = _OPS[op](c, pa.scalar(val))
                mask = m2 if mask is None else pc.and_(mask, m2)
            return t.filter(pc.fill_null(mask, False))

        ds = ds.map_batches(flt, batch_format="pyarrow",
                            zero_copy_batch=True)

    if aggs or group:
        from ray.data.aggregate import Count, Max, Min, Sum

        ray_aggs = []
        post_avg = []  # avg computed exactly as sum/count in float64
        need_count = any(a[1] in ("count", "avg") for a in aggs)
        if need_count:
            ray_aggs.append(Count(alias_name="__cnt"))
        seen = set()
        for _, agg, arg, name in aggs:
            if agg == "count":
                continue
            key = ("sum" if agg == "avg" else agg, arg)
            if key not in seen:
                seen.add(key)
                cls = {"sum": Sum, "min": Min, "max": Max}[key[0]]
                ray_aggs.append(cls(arg, alias_name=f"__{key[0]}_{arg}"))
            if agg == "avg":
                post_avg.append((name, arg))
        if group:
            grouped = ds.groupby(group).aggregate(*ray_aggs)
        elif len(ray_aggs) == 1 and need_count:
            # Ray quirk (2.49): a GLOBAL Count() with no `on` column
            # returns 0 when it is the only aggregate (it is correct in
            # groupby and when siblings are present) — use ds.count()
            grouped = {"__cnt": ds.count()}
        else:
            grouped = ds.aggregate(*ray_aggs)
        if not group:  # global aggregate: one dict -> one-row table
            import ray.data as rd

            row = grouped
            out = {}
            for _, agg, arg, name in aggs:
                if agg == "count":
                    out[name] = [int(row["__cnt"])]
                elif agg == "avg":
                    out[name] = [float(row[f"__sum_{arg}"])
                                 / max(int(row["__cnt"]), 1)]
                else:
                    out[name] = [row[f"__{agg}_{arg}"]]
            return rd.from_arrow(pa.table(out))

        def shape(t: pa.Table) -> pa.Table:
            cols = {}
            for kind, agg, arg, name in items:
                if kind == "col":
                    cols[name] = t.column(arg)
                elif agg == "count":
                    cols[name] = t.column("__cnt").cast(pa.int64())
                elif agg == "avg":
                    s = t.column(f"__sum_{arg}").to_numpy(
                        zero_copy_only=False).astype("float64")
                    n = t.column("__cnt").to_numpy(
                        zero_copy_only=False).astype("float64")
                    cols[name] = pa.array(s / n, type=pa.float64())
                else:
                    cols[name] = t.column(f"__{agg}_{arg}")
            return pa.table(cols)

        ds = grouped.map_batches(shape, batch_format="pyarrow")
        if plan["having"]:
            hconds = plan["having"]

            def hav(t: pa.Table) -> pa.Table:
                mask = None
                for col, op, val in hconds:
                    m2 = _OPS[op](t.column(col), pa.scalar(val))
                    mask = m2 if mask is None else pc.and_(mask, m2)
                return t.filter(pc.fill_null(mask, False))

            ds = ds.map_batches(hav, batch_format="pyarrow")
    elif plains:
        renames = {c: name for _, _, c, name in plains}

        def project(t: pa.Table) -> pa.Table:
            return pa.table({name: t.column(c)
                             for c, name in renames.items()})

        ds = ds.map_batches(project, batch_format="pyarrow",
                            zero_copy_batch=True)

    if plan["order"]:
        keys = [k for k, _ in plan["order"]]
        desc = [d for _, d in plan["order"]]
        ds = ds.sort(keys, descending=desc)
    if plan["limit"] is not None:
        ds = ds.limit(plan["limit"])
    return ds


SQL_HANDLER_QUERY = (
    "SELECT o_orderstatus, count(*) AS cnt, max(o_custkey) AS max_cust, "
    "min(o_custkey) AS min_cust, sum(o_custkey) AS sum_cust "
    "FROM orders WHERE o_totalprice >= 50000 AND o_orderstatus <> 'X' "
    "GROUP BY o_orderstatus ORDER BY cnt DESC, o_orderstatus LIMIT 3")


def sql_handler_orders(sf_dir: str):
    """Driver query: the engine executes SQL_HANDLER_QUERY itself; the
    DuckDB oracle runs the IDENTICAL string (oracle == input)."""
    return sql_query(SQL_HANDLER_QUERY, sf_dir)
