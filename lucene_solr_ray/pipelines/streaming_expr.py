"""Streaming-expression language: parse and evaluate the reference's
composable stream syntax over Ray Datasets.

Re-expression of the Solr streaming expression surface
(``solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/expr/
StreamExpressionParser.java`` and the stream registry in
``solr/core/.../handler/StreamHandler.java``): an expression string like

    innerJoin(
      search(lineitem, fl="l_orderkey,l_extendedprice"),
      search(orders, fl="o_orderkey,o_custkey"),
      on="l_orderkey=o_orderkey")

parses into a tree and evaluates to a ``ray.data.Dataset`` — each stream
function maps onto the Ray-Data-first operator implemented elsewhere in
this package (native hash-shuffle joins, bucketed aggregation, dataset
sort/limit/union). ``search`` reads a test table with column pruning (the
reference's search() hits a collection; here collections are the parquet
tables, and ``q=...`` full-text search is served by the documents index).

Supported stream functions (the commonly-composed core): search, select
(with replace()/concat() StreamOperations), innerJoin, leftOuterJoin,
hashJoin, outerHashJoin, intersect, complement, merge, unique, reduce
(with distinct()/group() ReduceOperations), sort, top, rollup + metrics
sum()/count()/min()/max()/avg().
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .util import bucketed_group_agg, native_join, read

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


# --- parser (StreamExpressionParser analog) -----------------------------

@dataclass
class Expr:
    name: str
    args: list          # positional: Expr or bare string
    params: dict        # key="value" named parameters


_TOK = re.compile(r"""\s*(
      [A-Za-z_][A-Za-z0-9_.]*      # identifier
    | -?[0-9]*\.?[0-9]+            # numeric literal (having/facet args)
    | "(?:[^"\\]|\\.)*"            # double-quoted string
    | [(),=*]
)""", re.VERBOSE)


def parse_expr(text: str) -> Expr:
    tokens: list[str] = []
    i = 0
    while i < len(text):
        if text[i:].strip() == "":
            break
        m = _TOK.match(text, i)
        if not m:
            raise ValueError(f"bad stream syntax at {text[i:i+30]!r}")
        tokens.append(m.group(1))
        i = m.end()

    pos = 0

    def peek():
        return tokens[pos] if pos < len(tokens) else None

    def take(expected=None):
        nonlocal pos
        t = peek()
        if t is None or (expected and t != expected):
            raise ValueError(f"expected {expected!r}, got {t!r}")
        pos += 1
        return t

    def unquote(t: str) -> str:
        if t.startswith('"'):
            return t[1:-1].replace('\\"', '"')
        return t

    def body(name: str) -> Expr:
        take("(")
        args: list = []
        params: dict = {}
        while peek() != ")":
            t = take()
            if peek() == "(":  # nested stream function
                args.append(body(t))
            elif peek() == "=":
                take("=")
                params[t] = unquote(take())
            else:
                args.append(unquote(t))
            if peek() == ",":
                take(",")
        take(")")
        return Expr(name, args, params)

    out = body(take())
    if pos != len(tokens):
        raise ValueError(f"trailing tokens: {tokens[pos:]}")
    return out


# --- evaluator ----------------------------------------------------------

def _sort_spec(spec: str):
    """'f1 asc, f2 desc' -> (keys, descending flags)."""
    keys, desc = [], []
    for part in spec.split(","):
        bits = part.split()
        keys.append(bits[0])
        desc.append(len(bits) > 1 and bits[1].lower() == "desc")
    return keys, desc


def _eval_search(e: Expr, sf_dir: str) -> rd.Dataset:
    if not e.args or e.args[0] not in TABLES:
        raise ValueError(f"search: unknown collection {e.args[:1]}")
    table = e.args[0]
    cols = None
    if "fl" in e.params:
        cols = [c.strip() for c in e.params["fl"].split(",")]
    q = e.params.get("q")
    if q and table == "documents":
        # full-text search over the documents index (BM25); fl selects
        # from the hit rows (doc_id, score)
        from .fulltext import docs_index
        from ..search.searcher import IndexSearcher

        searcher = IndexSearcher(docs_index(sf_dir))
        k = int(e.params.get("rows", 10))
        hits = searcher.search(q, k=k)
        t = pa.table({
            "doc_id": pa.array([d for d, _ in hits], type=pa.int64()),
            "score": pa.array([float(s) for _, s in hits],
                              type=pa.float64()),
        })
        return rd.from_arrow(t)
    ds = read(sf_dir, table, cols)
    if "fq" in e.params:  # simple range filter: field:[lo TO hi]
        m = re.fullmatch(r"(\w+):\[(\S+) TO (\S+)\]", e.params["fq"])
        if not m:
            raise ValueError(f"unsupported fq: {e.params['fq']!r}")
        field, lo, hi = m.group(1), float(m.group(2)), float(m.group(3))

        def fil(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            col = t.column(field)
            return t.filter(pc.and_(pc.greater_equal(col, pa.scalar(lo)),
                                    pc.less_equal(col, pa.scalar(hi))))

        ds = ds.map_batches(fil, batch_format="pyarrow")
    if "rows" in e.params:  # bound the stream (CloudSolrStream rows)
        if "sort" in e.params:
            keys, desc = _sort_spec(e.params["sort"])
            ds = ds.sort(keys, descending=desc)
        ds = ds.limit(int(e.params["rows"]))
    return ds


_METRIC = re.compile(r"(sum|count|min|max|avg)\((\*|\w+)\)")


def _eval_rollup(e: Expr, sf_dir: str) -> rd.Dataset:
    src = evaluate(e.args[0], sf_dir)
    over = [c.strip() for c in e.params["over"].split(",")]
    metrics = []
    for a in e.args[1:]:
        if isinstance(a, Expr):  # metrics parse as nested calls
            if a.name not in ("sum", "count", "min", "max", "avg"):
                raise ValueError(f"rollup: bad metric {a.name!r}")
            metrics.append((a.name, a.args[0] if a.args else "*"))
            continue
        m = _METRIC.fullmatch(a) if isinstance(a, str) else None
        if not m:
            raise ValueError(f"rollup: bad metric {a!r}")
        metrics.append((m.group(1), m.group(2)))

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        grouped = g.groupby(over, sort=False)
        cols = {}
        for op, fld in metrics:
            name = f"{op}({fld})"
            if op == "count":
                cols[name] = grouped.size()
            elif op == "sum":
                cols[name] = grouped[fld].sum()
            elif op == "min":
                cols[name] = grouped[fld].min()
            elif op == "max":
                cols[name] = grouped[fld].max()
            else:
                cols[name] = grouped[fld].mean()
        return pd.DataFrame(cols).reset_index()

    # rollup is NOT generally mergeable from partials (avg), so the
    # bucket shuffle co-locates each key and aggregates once per bucket
    return bucketed_group_agg(src, over, agg)


def _primitive(s):
    """StreamFactory.constructPrimitiveObject: 'null' -> None, then
    long, then double, else the string itself."""
    if s == "null":
        return None
    try:
        return int(s)
    except (TypeError, ValueError):
        pass
    try:
        return float(s)
    except (TypeError, ValueError):
        return s


def _select_ops_fn(ops: list[Expr]):
    """Vectorized per-batch application of select() StreamOperations
    (``solr/solrj/.../io/ops/``): ``replace(field, orig,
    withValue=v | withField=f)`` (ReplaceWithValueOperation /
    ReplaceWithFieldOperation null-aware match) and ``concat(
    fields="a,b", as="c", delim="-")`` (ConcatOperation: null renders
    as the string "null")."""
    import pyarrow.compute as pc

    _ARROW_TYPE_ERRS = (pa.lib.ArrowInvalid, pa.lib.ArrowTypeError,
                        pa.lib.ArrowNotImplementedError)

    def _if_else(mask, repl, col):
        try:
            return pc.if_else(mask, repl, col)
        except _ARROW_TYPE_ERRS:
            # promote to a common type: numeric -> float64, else string
            try:
                return pc.if_else(mask, pc.cast(repl, pa.float64()),
                                  pc.cast(col, pa.float64()))
            except _ARROW_TYPE_ERRS:
                return pc.if_else(mask, pc.cast(repl, pa.string()),
                                  pc.cast(col, pa.string()))

    def apply(t: pa.Table) -> pa.Table:
        for op in ops:
            if op.name == "replace":
                field = op.args[0]
                original = _primitive(op.args[1])
                col = t.column(field)
                if original is None:
                    mask = pc.is_null(col)
                else:
                    try:
                        mask = pc.fill_null(
                            pc.equal(col, pa.scalar(original)), False)
                    except _ARROW_TYPE_ERRS:
                        # Java Object.equals across types is false:
                        # a numeric original never matches a string
                        # column (ReplaceWithValueOperation semantics)
                        mask = pa.array(
                            np.zeros(len(t), dtype=bool))
                if not pc.any(pc.fill_null(mask, False)).as_py():
                    continue   # no tuple matches: column unchanged
                if "withField" in op.params:
                    repl = t.column(op.params["withField"])
                else:
                    v = _primitive(op.params["withValue"])
                    try:
                        repl = pa.scalar(v, type=col.type)
                    except (pa.lib.ArrowInvalid, pa.lib.ArrowTypeError):
                        repl = pa.scalar(v)
                t = t.set_column(t.column_names.index(field), field,
                                 _if_else(mask, repl, col))
            elif op.name == "concat":
                fields = [f.strip() for f in op.params["fields"].split(",")]
                delim = op.params.get("delim", "")
                arrs = [pc.fill_null(pc.cast(t.column(f), pa.string()),
                                     "null") for f in fields]
                joined = pc.binary_join_element_wise(*arrs, delim)
                as_name = op.params["as"]
                if as_name in t.column_names:
                    t = t.set_column(t.column_names.index(as_name),
                                     as_name, joined)
                else:
                    t = t.append_column(as_name, joined)
            else:
                raise ValueError(f"select: unknown operation {op.name!r}")
        return t

    return apply


def evaluate(e: Expr | str, sf_dir: str) -> rd.Dataset:
    """Evaluate a stream expression (string or parsed tree) to a Dataset."""
    if isinstance(e, str):
        e = parse_expr(e)
    name = e.name

    if name == "search":
        return _eval_search(e, sf_dir)
    if name == "daemon":
        # daemon(id=.., runInterval=.., <inner>): returns the handle,
        # not a Dataset — each iteration re-evaluates the inner stream
        # (DaemonStream.java:39; start()/stop()/status() on the handle)
        from .daemon import DaemonStream

        (inner,) = [a for a in e.args if isinstance(a, Expr)]
        return DaemonStream(
            e.params.get("id", "daemon"),
            lambda: evaluate(inner, sf_dir),
            run_interval_ms=int(e.params.get("runInterval", 1000)))
    if name == "select":
        src = evaluate(e.args[0], sf_dir)
        cols, renames = [], {}
        ops = [a for a in e.args[1:] if isinstance(a, Expr)]
        rest = [a for a in e.args[1:] if not isinstance(a, Expr)]
        i = 0
        while i < len(rest):  # "field as alias" arrives as 3 tokens
            if i + 2 < len(rest) and rest[i + 1] == "as":
                cols.append(rest[i])
                renames[rest[i]] = rest[i + 2]
                i += 3
            elif i + 2 == len(rest) and rest[i + 1] == "as":
                raise ValueError("select: dangling 'as'")
            else:
                cols.append(rest[i])
                i += 1
        out = src.select_columns(cols)
        if renames:
            out = out.rename_columns(renames)
        if ops:
            # StreamOperations run AFTER projection+rename, in order
            # (SelectStream.java read(): working tuple then operate())
            out = out.map_batches(_select_ops_fn(ops),
                                  batch_format="pyarrow")
        return out
    if name in ("innerJoin", "leftOuterJoin", "hashJoin",
                "outerHashJoin"):
        left = evaluate(e.args[0], sf_dir)
        right = evaluate(e.args[1], sf_dir)
        lk, _, rk = e.params["on"].partition("=")
        jt = ("left_outer" if name in ("leftOuterJoin", "outerHashJoin")
              else "inner")
        return native_join(left, right, on=lk.strip(),
                           right_on=(rk or lk).strip(), join_type=jt)
    if name in ("intersect", "complement"):
        # IntersectStream/ComplementStream semantics, size-gated: the
        # second stream's keys broadcast when small, else the membership
        # test runs as a native hash-shuffle join — the key side is
        # never materialized on the driver (the reference streams both
        # sides sorted and never holds the full key set either)
        left = evaluate(e.args[0], sf_dir)
        right = evaluate(e.args[1], sf_dir)
        lk, _, rk = e.params["on"].partition("=")
        rk = (rk or lk).strip()
        lk = lk.strip()
        from .joins import anti_join_ds, semi_join_ds

        fn = semi_join_ds if name == "intersect" else anti_join_ds
        return fn(left, right, on=lk, right_on=rk)
    if name == "random":
        # RandomStream.java: a pseudo-random sample of `rows` docs.
        # Deterministic re-expression: the `rows` smallest Knuth hashes
        # of the `on` key column — per-batch partial top-k, tiny driver
        # merge (never a global sort or full materialize).
        table = e.args[0]
        cols = None
        if "fl" in e.params:
            cols = [c.strip() for c in e.params["fl"].split(",")]
        src = read(sf_dir, table, cols)
        on = e.params.get("on") or src.schema().names[0]
        rows = int(e.params.get("rows", 10))

        def partial(t: pa.Table) -> pa.Table:
            ids = t.column(on).to_numpy(zero_copy_only=False)
            ids32 = ids.astype(np.uint64) % np.uint64(2 ** 32)
            h = (ids32 * np.uint64(2654435761)) % np.uint64(2 ** 32)
            keep = np.argsort(h, kind="stable")[:rows]
            return t.take(pa.array(np.sort(keep)))

        parts = src.map_batches(partial,
                                batch_format="pyarrow").to_pandas()
        ids = parts[on].to_numpy()
        ids32 = ids.astype(np.uint64) % np.uint64(2 ** 32)
        h = (ids32 * np.uint64(2654435761)) % np.uint64(2 ** 32)
        parts = parts.iloc[np.argsort(h, kind="stable")[:rows]]
        return rd.from_arrow(pa.Table.from_pandas(
            parts.reset_index(drop=True), preserve_index=False))
    if name == "stats":
        # StatsStream.java: bucket-free metrics, one partial+final
        # aggregation pass; avg derives from sum/count
        from ray.data.aggregate import Count, Max, Min, Sum

        src = evaluate(e.args[0], sf_dir) if isinstance(e.args[0], Expr) \
            else read(sf_dir, e.args[0])
        metrics = []
        for a in e.args[1:]:
            if isinstance(a, Expr):
                metrics.append((a.name, a.args[0] if a.args else "*"))
            else:
                m = _METRIC.fullmatch(a)
                if not m:
                    raise ValueError(f"stats: bad metric {a!r}")
                metrics.append((m.group(1), m.group(2)))
        aggs, needs = [], set()
        for op, fld in metrics:
            if op == "count":
                needs.add("count")
            elif op == "avg":
                needs.add("count")
                needs.add(("sum", fld))
            else:
                needs.add((op, fld))
        if "count" in needs:
            aggs.append(Count(alias_name="count(*)"))
        for n2 in needs:
            if n2 == "count":
                continue
            op, fld = n2
            cls = {"sum": Sum, "min": Min, "max": Max}[op]
            aggs.append(cls(fld, alias_name=f"{op}({fld})"))
        row = src.aggregate(*aggs)
        out = {}
        for op, fld in metrics:
            name2 = f"{op}({fld})"
            if op == "count":
                out[name2] = [int(row["count(*)"])]
            elif op == "avg":
                out[name2] = [float(row[f"sum({fld})"])
                              / max(int(row["count(*)"]), 1)]
            else:
                out[name2] = [row[name2]]
        return rd.from_arrow(pa.table(out))
    if name == "update":
        # UpdateStream.java: sink the inner stream, emit the batch count
        from .export import update_stream_to_parquet

        dest = e.params.get("destinationCollection") or e.args[0]
        inner = [a for a in e.args if isinstance(a, Expr)][0]
        update_stream_to_parquet(evaluate(inner, sf_dir), str(dest))
        import pyarrow.dataset as pads

        n = pads.dataset(str(dest), format="parquet").count_rows()
        return rd.from_arrow(pa.table({"batchIndexed": [int(n)]}))
    if name == "merge":
        parts = [evaluate(a, sf_dir) for a in e.args]
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out
    if name == "reduce":
        # reduce(stream, by="k", group(sort="f desc", n=5)) —
        # ReducerStream.java:215-233 with a ReduceOperation per group.
        # The reference reduces consecutive runs of a SORTED stream; the
        # Ray re-expression co-locates each group with one bucketed
        # hash shuffle (order-independent, same output set).
        src = evaluate(e.args[0], sf_dir)
        by = [c.strip() for c in e.params["by"].split(",")]
        ops = [a for a in e.args[1:] if isinstance(a, Expr)]
        if not ops:
            raise ValueError("reduce: requires a ReduceOperation")
        op = ops[0]
        if op.name == "distinct":
            # DistinctOperation keeps the first tuple of the sorted
            # stream; post-shuffle arrival order is not defined here, so
            # the deterministic re-expression keeps each group's
            # lexicographically-smallest tuple (partition-invariant,
            # and identical to the reference when the stream sort is
            # ascending on all columns)
            def first(g: pd.DataFrame) -> pd.DataFrame:
                return (g.sort_values(list(g.columns), kind="mergesort")
                        .drop_duplicates(by))

            return bucketed_group_agg(src, by, first, pre=first)
        if op.name == "group":
            # GroupOperation.java:106-128: per group keep the top-n
            # tuples under the sort comparator; emit the group head's
            # fields plus a "group" list of the tuples, best-first
            keys, desc = _sort_spec(op.params["sort"])
            n = int(op.params.get("n", 10))

            def red(g: pd.DataFrame) -> pd.DataFrame:
                g2 = g.sort_values(keys, ascending=[not d for d in desc],
                                   kind="mergesort")
                top = g2.groupby(by, sort=False).head(n)
                rows = []
                for _, sub in top.groupby(by, sort=False):
                    recs = sub.to_dict("records")
                    head = dict(recs[0])
                    head["group"] = recs
                    rows.append(head)
                return pd.DataFrame(rows)

            return bucketed_group_agg(src, by, red)
        raise ValueError(f"reduce: unknown operation {op.name!r}")
    if name == "unique":
        src = evaluate(e.args[0], sf_dir)
        over = [c.strip() for c in e.params["over"].split(",")]

        def first(g: pd.DataFrame) -> pd.DataFrame:
            return g.drop_duplicates(over)

        return bucketed_group_agg(src, over, first, pre=first)
    if name == "sort":
        src = evaluate(e.args[0], sf_dir)
        keys, desc = _sort_spec(e.params["by"])
        return src.sort(keys, descending=desc)
    if name == "top":
        src = evaluate(e.args[0], sf_dir)
        keys, desc = _sort_spec(e.params["sort"])
        n = int(e.params["n"])
        return src.sort(keys, descending=desc).limit(n)
    if name == "rollup":
        return _eval_rollup(e, sf_dir)
    if name == "having":
        # having(stream, <booleanEvaluator>) — HavingStream.java with the
        # gt/lt/gteq/lteq/eq evaluators; the evaluator arrives as a
        # nested call over a column / constant and runs as one
        # vectorized kernel per batch
        src = evaluate(e.args[0], sf_dir)
        cond = e.args[1]
        _EVAL = {"gt": "gt", "lt": "lt", "gteq": "gte", "lteq": "lte",
                 "eq": "eq", "noteq": "neq"}
        if not isinstance(cond, Expr) or cond.name not in _EVAL:
            raise ValueError(
                f"having: expected gt/lt/gteq/lteq/eq/noteq(...), got "
                f"{cond!r}")
        from ..functions.valuesource import FUNCTIONS

        kernel = FUNCTIONS[_EVAL[cond.name]][1]
        field, const = cond.args[0], float(cond.args[1])
        if isinstance(field, Expr):
            # metric-shaped column names parse as nested calls:
            # gt(count(*), N) refers to the rollup column "count(*)"
            field = f"{field.name}({','.join(map(str, field.args))})"

        import pyarrow.compute as _pc

        def fil(t: pa.Table) -> pa.Table:
            mask = kernel(t.column(field).cast(pa.float64()),
                          pa.scalar(const, type=pa.float64()))
            # the comparison kernels yield 1.0/0.0 floats
            return t.filter(_pc.not_equal(
                mask, pa.scalar(0.0, type=pa.float64())))

        return src.map_batches(fil, batch_format="pyarrow")
    if name == "facet":
        # facet(table, buckets="f1,f2", <metrics...>) — FacetStream.java
        # reduced to the collection surface: one distributed groupby over
        # the bucket fields with the rollup metric set
        rollup_expr = Expr("rollup",
                           [Expr("search", [e.args[0]],
                                 {"fl": ",".join(
                                     [c.strip() for c in
                                      e.params["buckets"].split(",")]
                                     + [a.args[0] for a in e.args[1:]
                                        if isinstance(a, Expr) and a.args
                                        and a.args[0] != "*"])}),
                            *e.args[1:]],
                           {"over": e.params["buckets"]})
        return evaluate(rollup_expr, sf_dir)
    if name == "gatherNodes":
        # gatherNodes(table, root="1,2", walk="from_col->to_col",
        #             depth="2", scatter="leaves|branches")
        # (GatherNodesStream.java:54; first arg is a collection here)
        from .graph import gather_nodes

        table = e.args[0]
        frm, _, to = e.params["walk"].partition("->")
        roots = [int(x) for x in e.params["root"].split(",")]
        edges = read(sf_dir, table, [frm.strip(), to.strip()])
        out = gather_nodes(edges, roots, frm.strip(), to.strip(),
                           depth=int(e.params.get("depth", "1")),
                           scatter=e.params.get("scatter", "leaves"))
        return rd.from_arrow(out)
    if name == "shortestPath":
        # shortestPath(table, from="0", to="99", edge="f=t", maxDepth="6")
        # (ShortestPathStream.java) -> one row per path step
        from .graph import shortest_path

        table = e.args[0]
        frm_col, _, to_col = e.params["edge"].partition("=")
        edges = read(sf_dir, table, [frm_col.strip(), to_col.strip()])
        path = shortest_path(edges, int(e.params["from"]),
                             int(e.params["to"]), frm_col.strip(),
                             to_col.strip(),
                             max_depth=int(e.params.get("maxDepth", "6")))
        steps = path or []
        return rd.from_arrow(pa.table({
            "step": pa.array(range(len(steps)), type=pa.int64()),
            "node": pa.array(steps, type=pa.int64()),
        }))
    raise ValueError(f"unknown stream function {name!r}")


def stream_expr_join_rollup(sf_dir: str):
    """Driver-surface demo: a full streaming expression — join + rollup —
    parsed and evaluated end-to-end (sums rounded for cross-engine float
    comparison)."""
    from .util import round_col

    ds = evaluate(
        'rollup('
        '  innerJoin('
        '    search(lineitem, fl="l_orderkey,l_quantity"),'
        '    search(orders, fl="o_orderkey,o_orderstatus"),'
        '    on="l_orderkey=o_orderkey"),'
        '  over="o_orderstatus", sum(l_quantity), count(*))', sf_dir)

    def finish(t: pa.Table) -> pa.Table:
        t = round_col(t, "sum(l_quantity)", 2)
        idx = t.column_names.index("count(*)")
        return t.set_column(idx, "count(*)",
                            t.column("count(*)").cast(pa.int64()))

    return ds.map_batches(finish, batch_format="pyarrow")
