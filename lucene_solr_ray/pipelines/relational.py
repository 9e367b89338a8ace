"""Relational / streaming-expression operators over the test tables.

Each function is the Ray-Data re-expression of a reference operator
(SURVEY.md §2.6-§2.9); each has a matching ANSI-SQL oracle in
``__ray_entry__.oracle_sql``. Computed columns are named identically in
both. Float aggregates are rounded half-away-from-zero (DuckDB ROUND
semantics) at a precision safely above double-accumulation noise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min, Sum

from .joins import broadcast_hash_join, partitioned_hash_join
from .util import read, round_col


# --- facets (SimpleFacets.java:102-417; JSON facet aggs, search/facet/) ---

def facet_lang(sf_dir: str):
    """Field facet counts: documents by lang."""
    return (read(sf_dir, "documents", ["lang"])
            .groupby("lang").aggregate(Count(alias_name="cnt")))


def facet_source_lang(sf_dir: str):
    """Flat two-key facet: documents by (source, lang)."""
    return (read(sf_dir, "documents", ["source", "lang"])
            .groupby(["source", "lang"]).aggregate(Count(alias_name="cnt")))


_MISSING_SENTINEL = "\x00__missing__"


def json_facet(ds, fields: list[str], limits: list[int],
               missing: bool = False, all_buckets: bool = False,
               num_buckets: bool = False):
    """Nested JSON facet buckets (``solr/core/.../search/facet/
    FacetField.java`` semantics): per level, buckets sorted by count desc
    (tie -> value asc) with a per-parent-bucket limit. ``missing`` /
    ``allBuckets`` / ``numBuckets`` mirror the JSON Facet API options
    (FacetFieldProcessor's SpecialSlotAcc trio): the missing-value
    bucket, the limit-independent aggregate over every bucket, and the
    pre-limit distinct bucket count — attached at every nesting level.

    ONE distributed groupby over the full key tuple computes every leaf
    count (never a per-bucket query fan-out, and the option trio adds NO
    extra shuffle: nulls are folded to a sentinel key per batch so the
    same counts table answers all three); the bucket tree and the
    per-parent limits are assembled from that (small, cardinality-bounded)
    counts table. Returns the nested bucket dict.
    """
    if missing:
        flds = list(fields)

        def fold_nulls(t: pa.Table) -> pa.Table:
            for f in flds:
                col = t.column(f)
                if col.null_count:
                    idx = t.schema.get_field_index(f)
                    t = t.set_column(idx, f, pc.fill_null(
                        col, _MISSING_SENTINEL))
            return t

        ds = ds.map_batches(fold_nulls, batch_format="pyarrow")
    counts = (ds.groupby(fields).aggregate(Count(alias_name="cnt"))
              .to_pandas())

    def build(df: pd.DataFrame, level: int) -> dict:
        fld = fields[level]
        is_missing = (df[fld] == _MISSING_SENTINEL
                      if missing else df[fld].isna())
        present, absent = df[~is_missing], df[is_missing]
        totals = (present.groupby(fld, sort=False)["cnt"].sum()
                  .reset_index()
                  .sort_values(["cnt", fld], ascending=[False, True]))
        node = {}
        if num_buckets:
            node["numBuckets"] = int(len(totals))
        if all_buckets:
            node["allBuckets"] = {"count": int(present["cnt"].sum())}
        if missing:
            node["missing"] = {"count": int(absent["cnt"].sum())}
        buckets = []
        for _, row in totals.head(limits[level]).iterrows():
            bucket = {"val": row[fld], "count": int(row["cnt"])}
            if level + 1 < len(fields):
                sub = build(present[present[fld] == row[fld]], level + 1)
                bucket["buckets"] = sub.pop("buckets")
                bucket.update(sub)
            buckets.append(bucket)
        node["buckets"] = buckets
        return node

    return build(counts, 0)


def nested_facet_source_lang(sf_dir: str, top_sources: int = 2,
                             top_langs: int = 2):
    """Nested facet as a flat SQL-checkable table: the top-N sources by
    count, each with its top-M langs (count desc, value asc ties)."""
    ds = read(sf_dir, "documents", ["source", "lang"])
    tree = json_facet(ds, ["source", "lang"], [top_sources, top_langs])
    rows = [(b["val"], sb["val"], sb["count"])
            for b in tree["buckets"] for sb in b.get("buckets", [])]
    return pa.table({
        "source": pa.array([r[0] for r in rows]),
        "lang": pa.array([r[1] for r in rows]),
        "cnt": pa.array([r[2] for r in rows], type=pa.int64()),
    })


def facet_options_docs(sf_dir: str, limit: int = 2):
    """JSON facet option trio over documents.source as one flat
    SQL-checkable table: top-``limit`` buckets plus the level's
    numBuckets / allBuckets / missing scalars repeated per row."""
    ds = read(sf_dir, "documents", ["source"])
    node = json_facet(ds, ["source"], [limit], missing=True,
                      all_buckets=True, num_buckets=True)
    rows = node["buckets"]
    n = len(rows)
    return pa.table({
        "source": pa.array([b["val"] for b in rows]),
        "cnt": pa.array([b["count"] for b in rows], type=pa.int64()),
        "num_buckets": pa.array([node["numBuckets"]] * n,
                                type=pa.int64()),
        "all_count": pa.array([node["allBuckets"]["count"]] * n,
                              type=pa.int64()),
        "missing_count": pa.array([node["missing"]["count"]] * n,
                                  type=pa.int64()),
    })


def stat_sorted_facet_orders(sf_dir: str, limit: int = 3):
    """JSON facet buckets sorted by a NESTED aggregate instead of count
    (``solr/core/.../search/facet/FacetField.java`` ``sort:"x desc"``):
    top order-priorities by sum(o_totalprice). One distributed groupby
    computes count + sum per bucket; the tiny bucket table sorts on the
    driver (bucket cardinality, not row count)."""
    ds = read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    out = (ds.groupby("o_orderpriority")
           .aggregate(Count(alias_name="cnt"),
                      Sum("o_totalprice", alias_name="sum_price")))
    df = out.to_pandas()
    df = (df.sort_values(["sum_price", "o_orderpriority"],
                         ascending=[False, True])
          .head(limit).reset_index(drop=True))
    return round_col(pa.Table.from_pandas(df, preserve_index=False),
                     "sum_price", 2)


# --- range facets (RangeFacetProcessor.java:45; RangeFacetRequest) ---

def range_facet(ds, field: str, start: float, end: float, gap: float,
                hardend: bool = False, include_other: bool = True):
    """Numeric range facet with Solr ``facet.range`` semantics
    (``solr/core/.../handler/component/RangeFacetProcessor.java:45``):
    buckets ``[lo, lo+gap)`` from ``start`` while ``lo < end`` (the last
    bucket's upper edge is clamped to ``end`` when ``hardend``, else it
    overshoots), ``include=lower`` edge handling, plus the
    ``before`` / ``after`` / ``between`` other-buckets. Empty buckets are
    emitted with count 0 (Solr default mincount=0).

    One vectorized bincount per batch (bucket count is tiny, values
    stream), then a small groupby merge — no driver-side pass.
    Returns (bucket, cnt): bucket is the range start as a string, or
    one of ``before`` / ``after`` / ``between``.
    """
    from ray.data.aggregate import Sum

    n_buckets = int(np.ceil((end - start) / gap))
    actual_end = end if hardend else start + n_buckets * gap
    # index layout: 0..n_buckets-1 ranges, then before/after/between
    i_before, i_after, i_between = n_buckets, n_buckets + 1, n_buckets + 2

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(field).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        counts = np.zeros(n_buckets + 3, dtype=np.int64)
        below = v < start
        above = v >= actual_end
        mid = ~(below | above)
        vm = v[mid]
        idx = np.floor((vm - start) / gap).astype(np.int64)
        # hardend clamps the last bucket's width; values in [start+n*gap
        # rounding edge] stay in the last bucket
        np.clip(idx, 0, n_buckets - 1, out=idx)
        counts[:n_buckets] = np.bincount(idx, minlength=n_buckets)
        counts[i_before] = int(below.sum())
        counts[i_after] = int(above.sum())
        counts[i_between] = int(mid.sum())
        return pa.table({"i": pa.array(np.arange(n_buckets + 3)),
                         "cnt": pa.array(counts)})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("i").aggregate(Sum("cnt", alias_name="cnt")))

    def label(t: pa.Table) -> pa.Table:
        idx = t.column("i").to_numpy(zero_copy_only=False)
        names = []
        keep = np.ones(len(idx), dtype=bool)
        for j, i in enumerate(idx):
            if i < n_buckets:
                lo = start + i * gap
                names.append(str(int(lo)) if float(lo).is_integer()
                             else str(float(lo)))
            elif i == i_before:
                names.append("before")
            elif i == i_after:
                names.append("after")
            else:
                names.append("between")
            if i >= n_buckets and not include_other:
                keep[j] = False
        out = pa.table({"bucket": pa.array(names, type=pa.string()),
                        "cnt": t.column("cnt").cast(pa.int64())})
        return out.filter(pa.array(keep))

    return merged.map_batches(label, batch_format="pyarrow")


def range_facet_events(sf_dir: str):
    """facet.range over events.value: start=50, end=350, gap=50 + others."""
    return range_facet(read(sf_dir, "events", ["value"]),
                       "value", start=50, end=350, gap=50)


def date_range_facet(ds, field: str, start: str, end: str, gap: str,
                     hardend: bool = False, include_other: bool = True,
                     now=None):
    """facet.range over a DATE field with date-math gap stepping
    (``RangeFacetProcessor.java:45`` + DateRangeEndpointCalculator:
    every bucket edge is the previous edge with ``gap`` applied through
    DateMathParser, so ``+1MONTH`` yields CALENDAR months, not fixed
    30-day strides). Endpoints accept date math too (``NOW/DAY-7DAYS``).

    Edges are computed once on the driver (bucket count is tiny); values
    stream through one vectorized searchsorted per batch — the math never
    runs per row. Returns (bucket, cnt) with the bucket labeled by its
    ISO start instant, plus before / after / between like the numeric
    facet."""
    from ..functions.datemath import parse_date_math

    s = parse_date_math(start, now=now)
    e = parse_date_math(end, now=now)
    if not s < e:
        raise ValueError(f"start {start!r} must precede end {end!r}")
    iso = "%Y-%m-%dT%H:%M:%SZ"
    edges = [s]
    while edges[-1] < e:
        nxt = parse_date_math(edges[-1].strftime(iso) + gap, now=now)
        if nxt <= edges[-1]:
            raise ValueError(f"gap {gap!r} must move time forward")
        edges.append(nxt)
    if hardend:
        edges[-1] = e
    n_buckets = len(edges) - 1
    labels = [d.strftime(iso) for d in edges[:-1]]
    edges_np = np.array([np.datetime64(d.replace(tzinfo=None), "us")
                         for d in edges])
    i_before, i_after, i_between = n_buckets, n_buckets + 1, n_buckets + 2

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(field)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        v = v[~np.isnat(v)]
        counts = np.zeros(n_buckets + 3, dtype=np.int64)
        below = v < edges_np[0]
        above = v >= edges_np[-1]
        mid = ~(below | above)
        idx = np.searchsorted(edges_np, v[mid], side="right") - 1
        counts[:n_buckets] = np.bincount(idx, minlength=n_buckets)
        counts[i_before] = int(below.sum())
        counts[i_after] = int(above.sum())
        counts[i_between] = int(mid.sum())
        return pa.table({"i": pa.array(np.arange(n_buckets + 3)),
                         "cnt": pa.array(counts)})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("i").aggregate(Sum("cnt", alias_name="cnt")))

    def label(t: pa.Table) -> pa.Table:
        idx = t.column("i").to_numpy(zero_copy_only=False)
        names, keep = [], np.ones(len(idx), dtype=bool)
        for j, i in enumerate(idx):
            if i < n_buckets:
                names.append(labels[i])
            else:
                names.append(("before", "after", "between")[i - n_buckets])
                if not include_other:
                    keep[j] = False
        out = pa.table({"bucket": pa.array(names, type=pa.string()),
                        "cnt": t.column("cnt").cast(pa.int64())})
        return out.filter(pa.array(keep))

    return merged.map_batches(label, batch_format="pyarrow")


def date_range_facet_events(sf_dir: str):
    """facet.range over events.ts: +7DAYS gaps across January 2024."""
    return date_range_facet(read(sf_dir, "events", ["ts"]), "ts",
                            "2024-01-01T00:00:00Z",
                            "2024-02-01T00:00:00Z", "+7DAYS")


# --- interval facets (IntervalFacets.java:53-101) ---

def _parse_interval(spec: str) -> tuple[float, bool, float, bool]:
    """Parse one ``facet.interval.set`` spec per the reference syntax
    contract (``solr/core/.../request/IntervalFacets.java:68-80``):
    ``[``/``(`` start, comma, end, ``)``/``]``; ``*`` = unbounded (and
    ``[*`` / ``*]`` are treated as open like the reference does)."""
    s = spec.strip()
    if len(s) < 5 or s[0] not in "([" or s[-1] not in ")]":
        raise ValueError(f"bad interval syntax: {spec!r}")
    lo_s, _, hi_s = s[1:-1].partition(",")
    if not _:
        raise ValueError(f"bad interval syntax (no comma): {spec!r}")
    lo_s, hi_s = lo_s.strip(), hi_s.strip()
    if not lo_s or not hi_s:
        raise ValueError(f"interval ends can't be empty: {spec!r}")
    lo = -np.inf if lo_s == "*" else float(lo_s)
    hi = np.inf if hi_s == "*" else float(hi_s)
    lo_incl = s[0] == "[" and lo_s != "*"
    hi_incl = s[-1] == "]" and hi_s != "*"
    if lo > hi:
        raise ValueError(f"start > end: {spec!r}")
    return lo, lo_incl, hi, hi_incl


def interval_facet(ds, field: str, intervals: list[str]):
    """``facet.interval`` counts (``IntervalFacets.java:53``: the count of
    each interval equals the count of the equivalent range query; intervals
    may overlap, so one row can contribute to several — unlike
    ``facet.range`` buckets).

    Vectorized: one boolean-mask reduction per (batch, interval) — the
    interval list is tiny and the values stream; partial count vectors
    merge through a small groupby. Empty intervals are emitted with
    count 0. Returns (bucket, cnt) with the original spec string as the
    bucket label, in the caller's interval order.
    """
    parsed = [_parse_interval(s) for s in intervals]

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(field).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        counts = np.empty(len(parsed), dtype=np.int64)
        for i, (lo, lo_incl, hi, hi_incl) in enumerate(parsed):
            m = (v >= lo) if lo_incl else (v > lo)
            m &= (v <= hi) if hi_incl else (v < hi)
            counts[i] = int(m.sum())
        return pa.table({"i": pa.array(np.arange(len(parsed))),
                         "cnt": pa.array(counts)})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("i").aggregate(Sum("cnt", alias_name="cnt")))

    def label(t: pa.Table) -> pa.Table:
        idx = t.column("i").to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array([intervals[i] for i in idx],
                               type=pa.string()),
            "cnt": t.column("cnt").cast(pa.int64()),
        })

    return merged.map_batches(label, batch_format="pyarrow")


def interval_facet_events(sf_dir: str):
    """facet.interval over events.value: overlapping + unbounded sets."""
    return interval_facet(
        read(sf_dir, "events", ["value"]), "value",
        ["[*,100)", "[50,150)", "[100,200]", "(200,*]"])


# --- pivot facets (PivotFacetProcessor.java:53) ---

def pivot_facet(ds, fields: list[str], limits: list[int] | None = None,
                mincount: int = 1):
    """Arbitrary-depth pivot facet tree
    (``solr/core/.../handler/component/PivotFacetProcessor.java:53``):
    per level, buckets sorted count desc (tie -> value asc), per-parent
    ``limit``, buckets under ``mincount`` pruned.

    ONE distributed groupby over the full field tuple computes every leaf
    count (the distributed-refinement protocol collapses to an exact
    single pass because counts shuffle by full key); the tree is
    assembled from that cardinality-bounded counts table. Returns
    Solr-style ``[{field, value, count, pivot: [...]}]``.
    """
    limits = limits or [100] * len(fields)
    counts = (ds.groupby(fields).aggregate(Count(alias_name="cnt"))
              .to_pandas())

    def build(df: pd.DataFrame, level: int) -> list[dict]:
        fld = fields[level]
        totals = (df.groupby(fld, sort=False)["cnt"].sum().reset_index())
        totals = totals[totals["cnt"] >= mincount]
        totals = (totals.sort_values(["cnt", fld], ascending=[False, True])
                  .head(limits[level]))
        out = []
        for _, row in totals.iterrows():
            bucket = {"field": fld, "value": row[fld],
                      "count": int(row["cnt"])}
            if level + 1 < len(fields):
                sub = build(df[df[fld] == row[fld]], level + 1)
                if sub:
                    bucket["pivot"] = sub
            out.append(bucket)
        return out

    return build(counts, 0)


def pivot_facet_orders(sf_dir: str):
    """3-level pivot (status -> priority -> order year), per-level limits
    (3, 3, 2), flattened to the leaf rows for the SQL oracle."""
    ds = read(sf_dir, "orders",
              ["o_orderstatus", "o_orderpriority", "o_orderdate"])

    def add_year(t: pa.Table) -> pa.Table:
        return t.append_column(
            "o_year", pc.year(t.column("o_orderdate")).cast(pa.int64()))

    tree = pivot_facet(ds.map_batches(add_year, batch_format="pyarrow"),
                       ["o_orderstatus", "o_orderpriority", "o_year"],
                       limits=[3, 3, 2])
    rows = [(b1["value"], b2["value"], b3["value"], b3["count"])
            for b1 in tree for b2 in b1.get("pivot", [])
            for b3 in b2.get("pivot", [])]
    return pa.table({
        "o_orderstatus": pa.array([r[0] for r in rows], type=pa.string()),
        "o_orderpriority": pa.array([r[1] for r in rows], type=pa.string()),
        "o_year": pa.array([r[2] for r in rows], type=pa.int64()),
        "cnt": pa.array([r[3] for r in rows], type=pa.int64()),
    })


# --- stats component (StatsComponent.java / StatsValuesFactory.java) ---

def stats_events(sf_dir: str):
    """min/max/sum/count of events.value per event_type; sum rounded to 2."""
    out = (read(sf_dir, "events", ["event_type", "value"])
           .groupby("event_type")
           .aggregate(Count(alias_name="cnt"),
                      Min("value", alias_name="min_value"),
                      Max("value", alias_name="max_value"),
                      Sum("value", alias_name="sum_value")))
    return out.map_batches(
        lambda t: round_col(t, "sum_value", 2), batch_format="pyarrow")


# --- rollup (RollupStream.java:43-169 over Bucket[] x Metric[]) ---

def rollup_lineitem(sf_dir: str):
    """Grouped rollup: (returnflag, linestatus) -> sum qty, sum price, count."""
    out = (read(sf_dir, "lineitem",
                ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                      Sum("l_extendedprice", alias_name="sum_price"),
                      Count(alias_name="cnt")))
    return out.map_batches(
        lambda t: round_col(round_col(t, "sum_qty", 2), "sum_price", 2),
        batch_format="pyarrow")


# --- top-k / rank (RankStream.java:45-57; TopFieldCollector) ---

def topk_orders(sf_dir: str):
    """Top 10 orders by totalprice desc, orderkey asc tie-break."""
    ds = read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"],
                   descending=[True, False]).limit(10)


# --- scalar expressions (ValueSource zoo, queries/function/valuesource/) ---

def select_expr_lineitem(sf_dir: str):
    """Computed columns: revenue = extendedprice*(1-discount), qty2 = 2*qty,
    filtered to shipdate < 1997-01-01."""
    ds = read(sf_dir, "lineitem",
              ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
               "l_discount", "l_shipdate"])

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("l_shipdate"),
                             pa.scalar(np.datetime64("1997-01-01", "us"))))
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        qty2 = pc.multiply(t.column("l_quantity"), pa.scalar(2.0))
        out = pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_linenumber": t.column("l_linenumber"),
            "revenue": rev,
            "qty2": qty2,
        })
        return round_col(out, "revenue", 4)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def function_query_lineitem(sf_dir: str):
    """Composable function query (ValueSource zoo): one registry-parsed
    expression — sum/mul/sub/recip/log over lineitem columns — evaluated
    vectorized per batch (``functions.valuesource``)."""
    from ..functions import compile_expr

    fn = compile_expr(
        "sum(mul(l_extendedprice,sub(1,l_discount)),"
        "recip(l_quantity,1,10,10),log(l_extendedprice))")
    ds = read(sf_dir, "lineitem",
              ["l_orderkey", "l_linenumber", "l_quantity",
               "l_extendedprice", "l_discount"])

    def apply(t: pa.Table) -> pa.Table:
        out = pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_linenumber": t.column("l_linenumber"),
            "fscore": fn(t),
        })
        return round_col(out, "fscore", 4)

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def scale_boost_lineitem(sf_dir: str):
    """ScaleFloatFunction with INDEX-GLOBAL bounds: scale() is bound to
    the whole-table min/max by a streaming pre-pass (two floats per
    batch; ``valuesource.bind_scale_global``), so the result is
    independent of block boundaries — the distributed re-expression of
    ScaleFloatFunction.java:35's every-reader weights map."""
    from ..functions.valuesource import (
        bind_scale_global,
        eval_expr,
        parse_func,
    )

    ds = read(sf_dir, "lineitem",
              ["l_orderkey", "l_linenumber", "l_quantity",
               "l_extendedprice", "l_discount"])
    ast = parse_func(
        "sum(scale(mul(l_extendedprice,sub(1,l_discount)),0,1),"
        "scale(l_quantity,0,100))")
    bound = bind_scale_global(ast, ds)

    def apply(t: pa.Table) -> pa.Table:
        out = pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_linenumber": t.column("l_linenumber"),
            "sscore": eval_expr(bound, t),
        })
        return round_col(out, "sscore", 6)

    return ds.map_batches(apply, batch_format="pyarrow",
                          zero_copy_batch=True)


def expression_lineitem(sf_dir: str):
    """expressions-module query (``lucene/expressions/.../js/
    JavascriptCompiler.java``): an INFIX JS-syntax expression with
    arithmetic, a comparison, and a ternary, compiled onto the same
    vectorized kernel registry as the prefix function queries."""
    from ..functions.valuesource import eval_expr, parse_infix

    ast = parse_infix(
        "l_extendedprice * (1 - l_discount) + "
        "(l_quantity > 25 ? sqrt(l_extendedprice) : l_quantity % 7)")
    ds = read(sf_dir, "lineitem",
              ["l_orderkey", "l_linenumber", "l_quantity",
               "l_extendedprice", "l_discount"])

    def apply(t: pa.Table) -> pa.Table:
        out = pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_linenumber": t.column("l_linenumber"),
            "escore": eval_expr(ast, t),
        })
        return round_col(out, "escore", 4)

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


# --- function range query ({!frange}) ---

def frange(ds, expr: str, l: float | None = None, u: float | None = None,
           incl: bool = True, incu: bool = True):
    """FunctionRangeQuery over a compiled ValueSource
    (``solr/core/.../search/FunctionRangeQuery.java:33`` +
    ``FunctionRangeQParserPlugin.java:40`` ``{!frange l= u= incl= incu=}``
    semantics): keep rows whose function value lies within the bounds;
    a missing bound is unbounded on that side. The expression evaluates
    vectorized per Arrow batch and the filter streams — no materialize."""
    from ..functions import compile_expr

    fn = compile_expr(expr)

    def flt(t: pa.Table) -> pa.Table:
        v = fn(t)
        mask = pa.array(np.ones(len(t), dtype=bool))
        if l is not None:
            op = pc.greater_equal if incl else pc.greater
            mask = pc.and_(mask, op(v, pa.scalar(float(l))))
        if u is not None:
            op = pc.less_equal if incu else pc.less
            mask = pc.and_(mask, op(v, pa.scalar(float(u))))
        return t.filter(pc.fill_null(mask, False))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def frange_lineitem(sf_dir: str):
    """{!frange l=900 u=1000 incu=false}div(l_extendedprice,l_quantity),
    rolled up per returnflag."""
    ds = read(sf_dir, "lineitem",
              ["l_returnflag", "l_extendedprice", "l_quantity"])
    ds = frange(ds, "div(l_extendedprice,l_quantity)",
                l=900.0, u=1000.0, incl=True, incu=False)
    out = (ds.groupby("l_returnflag")
           .aggregate(Count(alias_name="cnt"),
                      Sum("l_extendedprice", alias_name="sum_price")))
    return out.map_batches(lambda t: round_col(t, "sum_price", 2),
                           batch_format="pyarrow")


# --- range filter (PointRangeQuery / TrieField range) ---

def range_filter_events(sf_dir: str):
    """Count + rounded sum of value per type for a ts/value range.

    The predicate is pushed INTO the parquet read (row-group statistics
    prune whole chunks before they ever leave storage; Ray applies the
    residual exactly) — nothing outside the range is scanned."""
    import pyarrow.dataset as pads

    import ray.data as rd

    expr = ((pads.field("ts") >= pa.scalar(np.datetime64("2024-01-08", "us")))
            & (pads.field("ts") < pa.scalar(np.datetime64("2024-01-22", "us")))
            & (pads.field("value") >= pa.scalar(10.0)))
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"], filter=expr)
    out = (ds.groupby("event_type")
           .aggregate(Count(alias_name="cnt"), Sum("value", alias_name="sum_value")))
    return out.map_batches(lambda t: round_col(t, "sum_value", 2),
                           batch_format="pyarrow")


def datemath_range_events(sf_dir: str, now: str = "2024-01-22T12:34:56Z"):
    """range_filter_events with Solr date-math endpoints
    (DateMathParser.java:138): ``[NOW-14DAYS/DAY TO NOW/HOUR-30MINUTES)``
    with NOW pinned (the reference's ``NOW=`` request param) so the
    DuckDB oracle can use the same anchor. The math evaluates to scalar
    endpoints, so the predicate still pushes into the parquet read."""
    import pyarrow.dataset as pads

    import ray.data as rd

    from ..functions.datemath import parse_date_math

    lo = parse_date_math("NOW-14DAYS/DAY", now)
    hi = parse_date_math("NOW/HOUR-30MINUTES", now)
    expr = ((pads.field("ts") >= pa.scalar(np.datetime64(lo, "us")))
            & (pads.field("ts") < pa.scalar(np.datetime64(hi, "us"))))
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"], filter=expr)
    out = (ds.groupby("event_type")
           .aggregate(Count(alias_name="cnt"),
                      Sum("value", alias_name="sum_value")))
    return out.map_batches(lambda t: round_col(t, "sum_value", 2),
                           batch_format="pyarrow")


# --- distinct (UniqueAgg exact cardinality, search/facet/UniqueAgg.java) ---

def distinct_users_events(sf_dir: str):
    """Exact count-distinct user_id per event_type: per-batch partial
    dedup, ONE bucket shuffle on hash(type, user) with vectorized
    per-bucket distinct counting, then a tiny per-type sum (the naive
    groupby over all (type, user) pairs pays per-group Python overhead
    on |distinct pairs| groups)."""
    from ray.data.aggregate import Sum

    from .util import bucketed_group_agg

    ds = read(sf_dir, "events", ["event_type", "user_id"])

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["event_type", "user_id"])

    def count_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["event_type", "user_id"])
        return (g.groupby("event_type", sort=False).size()
                .reset_index(name="n_users"))

    partial = bucketed_group_agg(ds, ["event_type", "user_id"],
                                 count_partial, pre=dedup_pairs)
    return (partial.groupby("event_type")
            .aggregate(Sum("n_users", alias_name="n_users"))
            .select_columns(["event_type", "n_users"]))


# --- collapse (CollapsingQParserPlugin) / grouping (lucene/grouping) ---

def collapse_orders(sf_dir: str):
    """Best order per customer: max totalprice, tie -> min orderkey.
    Vectorized per hash bucket (ONE sort + drop_duplicates per bucket;
    per-customer map_groups pays per-group overhead on |customers|)."""
    from .util import bucketed_group_agg

    ds = read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True])
        return g.drop_duplicates("o_custkey")

    return bucketed_group_agg(ds, ["o_custkey"], best, pre=best)


def group_topk_orders(sf_dir: str):
    """Top-2 orders per customer by (totalprice desc, orderkey asc) —
    vectorized per hash bucket; the per-batch partial keeps each key's
    local top-2 (a superset of the global top-2)."""
    from .util import bucketed_group_agg

    ds = read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True])
        return g.groupby("o_custkey", sort=False).head(2)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return top2(g)[["o_custkey", "o_orderkey"]]

    return bucketed_group_agg(ds, ["o_custkey"], finish, pre=top2)


# --- set ops (MergeStream.java:40 sorted union) ---

def merge_union_events(sf_dir: str):
    """Union of two filtered event streams (click + error)."""
    ds = read(sf_dir, "events", ["event_id", "event_type", "value"])

    def fil(kind: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("event_type"), pa.scalar(kind)))
        return fn

    a = ds.map_batches(fil("click"), batch_format="pyarrow")
    b = ds.map_batches(fil("error"), batch_format="pyarrow")
    u = a.union(b)
    return u.map_batches(lambda t: round_col(t, "value", 4), batch_format="pyarrow")


# --- joins (SURVEY.md §2.5) ---

def hashjoin_orders_customer(sf_dir: str):
    """Broadcast hash join: orders x customer."""
    import pyarrow.parquet as pq

    customers = pq.read_table(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_name", "c_mktsegment"])
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    joined = broadcast_hash_join(orders, customers, on="o_custkey",
                                 right_on="c_custkey")
    return joined.select_columns(
        ["o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice"])


def innerjoin_lineitem_orders(sf_dir: str):
    """Partitioned hash join: lineitem x orders (both 'large')."""
    li = read(sf_dir, "lineitem",
              ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"])
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderstatus"])
    joined = partitioned_hash_join(li, orders, on="l_orderkey",
                                   right_on="o_orderkey")

    def fn(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        out = pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_linenumber": t.column("l_linenumber"),
            "o_custkey": t.column("o_custkey"),
            "o_orderstatus": t.column("o_orderstatus"),
            "revenue": rev,
        })
        return round_col(out, "revenue", 4)

    return joined.map_batches(fn, batch_format="pyarrow")


def leftouter_customer_orders(sf_dir: str):
    """LeftOuterJoinStream analog: every customer with its order count
    (0 when none). Per-customer counts via bucketed partial aggregation,
    then a native left-outer join — the counts side stays a Dataset
    (never pulled to the driver; at scale it is O(|customers|))."""
    from .util import bucketed_group_agg, materialize_typed, native_join

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("o_custkey", sort=False).size()
                .reset_index(name="n_orders"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("o_custkey", sort=False)["n_orders"].sum()
                .reset_index())

    # materialize_typed purges the schema-less empty blocks that group ops
    # emit for empty partitions — those crash the join at high parallelism
    counts = materialize_typed(
        bucketed_group_agg(read(sf_dir, "orders", ["o_custkey"]),
                           ["o_custkey"], merge, pre=partial),
        pa.schema([("o_custkey", pa.int64()), ("n_orders", pa.int64())]))
    cust = read(sf_dir, "customer", ["c_custkey", "c_name"])
    joined = native_join(cust, counts, on="c_custkey", right_on="o_custkey",
                         join_type="left_outer")

    def finish(t: pa.Table) -> pa.Table:
        n = pc.coalesce(t.column("n_orders"), pa.scalar(0, type=pa.int64()))
        return pa.table({
            "c_custkey": t.column("c_custkey"),
            "c_name": t.column("c_name"),
            "n_orders": n.cast(pa.int64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def sample_events(sf_dir: str):
    """Deterministic ~10% sample (RandomStream / RandomSamplingCollector
    analog): Knuth multiplicative hash of the id — reproducible across
    engines, unlike seed-dependent block sampling, hence SQL-checkable."""
    ds = read(sf_dir, "events", ["event_id", "event_type", "value"])

    def fil(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        # mask to 32 bits BEFORE the Knuth multiply: the masked product
        # is < 2^64 so uint64 arithmetic is exact (no wraparound), and
        # the SQL oracle can reproduce it in HUGEINT at any id scale
        ids32 = ids.astype(np.uint64) % np.uint64(2**32)
        h = (ids32 * np.uint64(2654435761)) % np.uint64(2**32)
        keep = h < np.uint64(429496729)  # 2^32 / 10
        out = t.filter(pa.array(keep))
        return round_col(out, "value", 4)

    return ds.map_batches(fil, batch_format="pyarrow", zero_copy_batch=True)


_BIG_ORDER = 420_000.0  # threshold keeping both semi and anti sides non-empty


def _big_orders_ds(sf_dir: str):
    """High-value orders key stream (stays a Dataset — the size-gated
    set ops broadcast it only under their cap, never a driver array)."""
    ds = read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    return ds.map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"),
                                      pa.scalar(_BIG_ORDER))),
        batch_format="pyarrow")


def semijoin_customers(sf_dir: str):
    """Customers having >=1 high-value order (IntersectStream semi-join)."""
    from .joins import semi_join_ds

    cust = read(sf_dir, "customer", ["c_custkey", "c_name"])
    return semi_join_ds(cust, _big_orders_ds(sf_dir), on="c_custkey",
                        right_on="o_custkey")


def antijoin_customers(sf_dir: str):
    """Customers with no high-value order (ComplementStream anti-join)."""
    from .joins import anti_join_ds

    cust = read(sf_dir, "customer", ["c_custkey", "c_name"])
    return anti_join_ds(cust, _big_orders_ds(sf_dir), on="c_custkey",
                        right_on="o_custkey")


# --- drill-down / drill-sideways (lucene/facet) ---

def drill_sideways(ds, filters: dict[str, object],
                   facet_fields: list[str] | None = None):
    """DrillSideways (``lucene/facet/src/java/org/apache/lucene/facet/
    DrillSideways.java:63`` + DrillSidewaysScorer's near-miss collection):
    apply a DrillDownQuery of per-dimension equality filters; each
    dimension's facet counts are computed with EVERY OTHER dimension's
    filter applied but its own dropped, so the UI can show what the user
    would get by switching this dimension's selection. Extra
    ``facet_fields`` (no filter of their own) count under the full drill
    -down, and a ``__hits__`` row carries the fully-filtered hit count.

    The reference collects near-misses (docs failing exactly one
    dimension) in one scorer pass; here one ``map_batches`` pass builds
    all dimension masks vectorized and emits per-(dim, value) partial
    counts — corpus rows stream once, only (dim, value, cnt) partials
    shuffle through one bucketed merge."""
    from .util import bucketed_group_agg

    dims = list(filters)
    extra = [f for f in (facet_fields or []) if f not in filters]
    cols = dims + extra

    def partial(t: pa.Table) -> pd.DataFrame:
        masks = {d: pc.equal(t.column(d), pa.scalar(filters[d]))
                 .to_numpy(zero_copy_only=False).astype(bool)
                 for d in dims}
        all_mask = np.logical_and.reduce(list(masks.values())) \
            if dims else np.ones(len(t), dtype=bool)
        out = []
        for d in cols:
            if d in filters:
                others = [masks[o] for o in dims if o != d]
                sel = (np.logical_and.reduce(others) if others
                       else np.ones(len(t), dtype=bool))
            else:
                sel = all_mask
            vals = t.column(d).to_pandas()[sel]
            vc = vals.value_counts()
            out.append(pd.DataFrame({"dim": d,
                                     "val": vc.index.astype(str),
                                     "cnt": vc.to_numpy(np.int64)}))
        out.append(pd.DataFrame({"dim": ["__hits__"], "val": [""],
                                 "cnt": [np.int64(all_mask.sum())]}))
        return pd.concat(out, ignore_index=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["dim", "val"], sort=False)["cnt"].sum()
               .reset_index())
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_agg(partials, ["dim", "val"], merge)


def drill_sideways_docs(sf_dir: str):
    """DrillSideways over documents: drill-down {lang=en, source=src1};
    lang counts see only the source filter, source counts only the lang
    filter, and n_chars-parity (derived dim) counts the full drill-down."""
    ds = read(sf_dir, "documents", ["lang", "source", "n_chars"])

    def add_parity(t: pa.Table) -> pa.Table:
        par = pc.if_else(
            pc.equal(pc.bit_wise_and(t.column("n_chars"), 1), 0),
            pa.scalar("even"), pa.scalar("odd"))
        return t.append_column("len_parity", par)

    return drill_sideways(
        ds.map_batches(add_parity, batch_format="pyarrow"),
        {"lang": "en", "source": "src1"},
        facet_fields=["len_parity"])


# --- taxonomy facets (lucene/facet hierarchical dimensions) -------------

def taxonomy_facet(ds, dim_cols: list[str], path: tuple = (),
                   topn: int = 10) -> pa.Table:
    """``Facets.getTopChildren(topN, dim, path...)`` over a hierarchy
    stored as ordered component columns (``FacetField("Publish Date",
    "2010", "10", "15")`` — ``lucene/demo/.../facet/
    SimpleFacetsExample.java:69``; API ``lucene/facet/src/java/org/
    apache/lucene/facet/Facets.java:34``, counting
    ``taxonomy/IntTaxonomyFacets.java:90-130``).

    Rows matching the ``path`` prefix count their next component; the
    result carries the reference FacetResult fields — child labels with
    counts (count desc, label asc tie-break), ``value`` = total count
    under the path, ``childCount`` = distinct children — as one table:
    child rows plus a ``__total__`` row. Per batch: one vectorized
    prefix mask + value_counts partial (child-cardinality rows); the
    driver merge is children-scale, never corpus-scale."""
    if len(path) >= len(dim_cols):
        raise ValueError("path must leave at least one child level")
    child = dim_cols[len(path)]

    def partial(t: pa.Table) -> pa.Table:
        mask = None
        for col, want in zip(dim_cols, path):
            m = pc.equal(t.column(col), pa.scalar(want))
            mask = m if mask is None else pc.and_(mask, m)
        vals = t.column(child) if mask is None else \
            pc.filter(t.column(child), pc.fill_null(mask, False))
        vc = pa.table({"label": vals}).group_by("label").aggregate(
            [("label", "count")])
        return pa.table({
            "label": vc.column("label"),
            "cnt": vc.column("label_count").cast(pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("label", as_index=False)["cnt"].sum()
           .sort_values(["cnt", "label"], ascending=[False, True],
                        kind="mergesort"))
    total = int(agg["cnt"].sum())
    child_count = int(len(agg))
    top = agg.head(topn)
    out = pa.table({
        "label": pa.array(list(top["label"]) + ["__total__"]),
        "cnt": pa.array(list(top["cnt"].astype("int64"))
                        + [total], type=pa.int64()),
        "child_count": pa.array([child_count] * (len(top) + 1),
                                type=pa.int64()),
    })
    return out


def taxonomy_facet_events(sf_dir: str):
    """Driver query: date-hierarchy taxonomy facet over events
    (year/month/day components from ts) — top-10 days under the path
    ("2024", "01"), plus the path total row."""
    ds = read(sf_dir, "events", ["ts"])

    def components(t: pa.Table) -> pa.Table:
        ts = t.column("ts")
        return pa.table({
            "year": pc.strftime(ts, format="%Y"),
            "month": pc.strftime(ts, format="%m"),
            "day": pc.strftime(ts, format="%d"),
        })

    comp = ds.map_batches(components, batch_format="pyarrow")
    return taxonomy_facet(comp, ["year", "month", "day"],
                          path=("2024", "01"), topn=10)


def sampled_facet(ds, field: str, key: str, rate_denom: int = 8,
                  ) -> pa.Table:
    """Sampling facets (``lucene/facet/src/java/org/apache/lucene/facet/
    RandomSamplingFacetsCollector.java:40-253``): count facets over a
    sampled hit set, then amortize — ``correctedCount =
    (int)(count / samplingRate)`` (:245), total clamped to the doc count
    (:253). The reference samples one doc per ``binSize = 1/rate`` bin
    with a seeded XORShift (:170); the deterministic re-expression keeps
    the ``key`` rows whose Knuth multiplicative hash falls in the lowest
    ``1/rate_denom`` of hash space — partition-invariant and
    SQL-reproducible. Per batch: one hash mask + value_counts partial
    (facet-cardinality rows); the driver merge is label-scale."""
    cut = np.uint64(2**32 // rate_denom)

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(key).to_numpy(zero_copy_only=False)
        # 32-bit mask before the multiply keeps uint64 exact (no mod-2^64
        # wrap) and SQL-reproducible at any id scale
        ids32 = ids.astype(np.uint64) % np.uint64(2**32)
        h = (ids32 * np.uint64(2654435761)) % np.uint64(2**32)
        vals = t.column(field).to_numpy(zero_copy_only=False)[h < cut]
        n_batch = len(t)
        s = pd.Series(vals).value_counts()
        # a NULL label carries the batch total: value_counts never
        # emits null, so it cannot collide with a real facet value
        # (an empty-string value is legitimate and must count)
        return pa.table({
            "label": pa.array(list(s.index.astype(str)) + [None]),
            "cnt": pa.array(list(s.to_numpy().astype(np.int64))
                            + [np.int64(n_batch)]),
        })

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas())
    null_mask = parts["label"].isna()
    n_total = int(parts.loc[null_mask, "cnt"].sum())
    agg = (parts[~null_mask]
           .groupby("label", as_index=False)["cnt"].sum()
           .sort_values("label", kind="mergesort"))
    sample_cnt = agg["cnt"].to_numpy().astype(np.int64)
    corrected = sample_cnt * rate_denom                      # :245
    total = min(n_total, int(sample_cnt.sum()) * rate_denom)  # :253
    return pa.table({
        "label": pa.array(list(agg["label"]) + ["__total__"]),
        "sample_cnt": pa.array(list(sample_cnt)
                               + [np.int64(sample_cnt.sum())],
                               type=pa.int64()),
        "est_cnt": pa.array(list(corrected) + [np.int64(total)],
                            type=pa.int64()),
    })


def sampled_facet_events(sf_dir: str):
    """Driver query: amortized sampled facet over events.event_type
    (1/8 deterministic sample on event_id)."""
    ds = read(sf_dir, "events", ["event_id", "event_type"])
    return sampled_facet(ds, "event_type", "event_id", rate_denom=8)
