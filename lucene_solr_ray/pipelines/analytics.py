"""Analytics component: expression aggregates over facet buckets
(``solr/contrib/analytics/src/java/org/apache/solr/analytics/`` —
AnalyticsRequestManager / ExpressionFactory: arbitrary value-source
expressions reduced per facet bucket, e.g.
``sum(mult(price,quantity))`` grouped by a field facet).

Ray-Data shape: ONE pass of ``map_batches`` evaluates every expression
vectorized (the shared ValueSource kernel chain) and pre-aggregates per
batch per bucket (pandas groupby on the tiny in-batch key set), so the
all-to-all ``groupby`` that follows only shuffles one partial row per
(block, bucket) — decomposable-aggregate pushdown, never raw rows.
Scales: shuffle volume is O(blocks × buckets), independent of row
count; avg is carried as (sum, count) partials and finalized after the
merge.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions import parse_func
from ..functions.valuesource import Field, Func, eval_expr
from .util import read, round_col

#: reduction -> (partial columns, merge strategy)
_REDUCTIONS = ("sum", "min", "max", "avg", "count")


def parse_spec(spec: str):
    """``"sum:mul(a,b)"`` -> (reduction, AST). The part after the colon
    is the per-row ValueSource expression; the prefix is the bucket
    reduction (the analytics contrib's mapping/reduction split)."""
    red, _, expr = spec.partition(":")
    if red not in _REDUCTIONS:
        raise ValueError(f"unknown reduction {red!r}; one of {_REDUCTIONS}")
    return red, parse_func(expr)


def expr_fields(node) -> set[str]:
    if isinstance(node, Field):
        return {node.name}
    if isinstance(node, Func):
        out: set[str] = set()
        for a in node.args:
            out |= expr_fields(a)
        return out
    return set()


def facet_analytics(ds, keys: list[str], exprs: dict[str, str]):
    """Expression-over-facet analytics: group ``ds`` by ``keys`` and
    reduce each named expression per bucket. Returns a Ray Dataset with
    one row per bucket, columns = keys + expression names."""
    from ray.data.aggregate import Max, Min, Sum

    parsed = {name: parse_spec(spec) for name, spec in exprs.items()}

    def partial(batch: pa.Table) -> pd.DataFrame:
        cols = {k: batch.column(k).to_pandas() for k in keys}
        for name, (red, ast) in parsed.items():
            v = eval_expr(ast, batch)
            arr = (pa.repeat(v, batch.num_rows).to_pandas()
                   if isinstance(v, pa.Scalar) else v.to_pandas())
            cols["__v_" + name] = arr
        df = pd.DataFrame(cols)
        g = df.groupby(keys, sort=False)
        parts = {}
        for name, (red, _) in parsed.items():
            c = "__v_" + name
            if red in ("sum", "avg"):
                parts[name + "__s"] = g[c].sum()
            if red in ("count", "avg"):
                parts[name + "__c"] = g[c].count()
            if red == "min":
                parts[name + "__mn"] = g[c].min()
            if red == "max":
                parts[name + "__mx"] = g[c].max()
        return pd.DataFrame(parts).reset_index()

    aggs = []
    for name, (red, _) in parsed.items():
        if red in ("sum", "avg"):
            aggs.append(Sum(name + "__s", alias_name=name + "__s"))
        if red in ("count", "avg"):
            aggs.append(Sum(name + "__c", alias_name=name + "__c"))
        if red == "min":
            aggs.append(Min(name + "__mn", alias_name=name + "__mn"))
        if red == "max":
            aggs.append(Max(name + "__mx", alias_name=name + "__mx"))

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(keys).aggregate(*aggs))

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = {k: batch.column(k) for k in keys}
        for name, (red, _) in parsed.items():
            if red == "sum":
                out[name] = batch.column(name + "__s")
            elif red == "count":
                out[name] = batch.column(name + "__c").cast(pa.int64())
            elif red == "avg":
                out[name] = pc.divide(
                    batch.column(name + "__s").cast(pa.float64()),
                    batch.column(name + "__c").cast(pa.float64()))
            elif red == "min":
                out[name] = batch.column(name + "__mn")
            elif red == "max":
                out[name] = batch.column(name + "__mx")
        return pa.table(out)

    return merged.map_batches(finalize, batch_format="pyarrow")


def analytics_lineitem(sf_dir: str):
    """Driver query: TPC-H-Q1-shaped analytics facet — per
    (l_returnflag, l_linestatus) bucket, expression reductions
    revenue / avg_qty / max_price / cnt (oracled in SQL)."""
    exprs = {
        "revenue": "sum:mul(l_extendedprice,sub(1,l_discount))",
        "avg_qty": "avg:l_quantity",
        "max_price": "max:l_extendedprice",
        "cnt": "count:l_quantity",
    }
    need: set[str] = set()
    for spec in exprs.values():
        need |= expr_fields(parse_spec(spec)[1])
    ds = read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus"] + sorted(need))
    out = facet_analytics(ds, ["l_returnflag", "l_linestatus"], exprs)

    def rounder(t: pa.Table) -> pa.Table:
        t = round_col(t, "revenue", 4)
        t = round_col(t, "avg_qty", 6)
        return t

    return out.map_batches(rounder, batch_format="pyarrow")
