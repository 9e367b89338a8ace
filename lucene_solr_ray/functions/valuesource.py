"""Composable function-query / ValueSource registry.

Re-expression of the reference's function-query surface
(``lucene/queries/src/java/org/apache/lucene/queries/function/valuesource/``
— SumFloatFunction, ProductFloatFunction, DivFloatFunction, MaxFloatFunction,
MinFloatFunction, PowFloatFunction, LinearFloatFunction, ScaleFloatFunction …
and Solr's function parser ``solr/core/.../search/ValueSourceParser.java``):
a tiny prefix-function grammar ``sum(mul(x,2),log(y))`` parsed into an AST
and evaluated VECTORIZED over an Arrow batch with pyarrow.compute kernels —
the per-document FunctionValues loop of the reference becomes one
column-at-a-time kernel chain, which is the idiomatic Ray Data shape
(``map_batches(lambda t: t.append_column(name, eval_expr(ast, t)))``).

Numeric semantics are float64 throughout (the reference evaluates most
composite functions in float; DuckDB oracles compare at rounded
precision).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# --- AST ----------------------------------------------------------------

@dataclass(frozen=True)
class Field:
    name: str


@dataclass(frozen=True)
class Const:
    value: float


@dataclass(frozen=True)
class Func:
    name: str
    args: tuple


# --- registry: name -> (arity, vectorized kernel) -----------------------

def _variadic(kernel: Callable) -> Callable:
    def fn(*args):
        out = args[0]
        for a in args[1:]:
            out = kernel(out, a)
        return out
    return fn


def _scale(x, lo, hi):
    """ScaleFloatFunction: min-max scale the column into [lo, hi]."""
    mn = pc.min(x).as_py()
    mx = pc.max(x).as_py()
    span = (mx - mn) or 1.0
    return pc.add(pc.multiply(pc.divide(pc.subtract(x, pa.scalar(mn)),
                                        pa.scalar(span)),
                              pc.subtract(hi, lo)), lo)


def _scale_bound(x, lo, hi, mn, mx):
    """scale() with pre-computed GLOBAL bounds (see bind_scale_global)."""
    mnv = mn.as_py() if isinstance(mn, pa.Scalar) else float(mn)
    mxv = mx.as_py() if isinstance(mx, pa.Scalar) else float(mx)
    span = (mxv - mnv) or 1.0
    return pc.add(pc.multiply(pc.divide(pc.subtract(x, pa.scalar(mnv)),
                                        pa.scalar(span)),
                              pc.subtract(hi, lo)), lo)


def _np_kernel(fn: Callable, *args):
    """Run a numpy-vectorized kernel over pyarrow inputs (for formulas
    with no direct pyarrow.compute spelling, e.g. haversine)."""
    def unbox(x):
        if isinstance(x, pa.Scalar):
            return x.as_py()
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        return x.to_numpy(zero_copy_only=False)

    out = fn(*(unbox(a) for a in args))
    if np.ndim(out) == 0:
        return pa.scalar(float(out), type=pa.float64())
    return pa.array(np.asarray(out, dtype=np.float64), type=pa.float64())


def _hsin_rad(radius, x1, y1, x2, y2):
    """Haversine over radian coordinates, scaled by ``radius``."""
    a = (np.sin((x2 - x1) / 2.0) ** 2
         + np.cos(x1) * np.cos(x2) * np.sin((y2 - y1) / 2.0) ** 2)
    return 2.0 * radius * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


FUNCTIONS: dict[str, tuple[Any, Callable]] = {
    # arithmetic (SumFloatFunction etc.)
    "sum": (None, _variadic(pc.add)),
    "sub": (2, pc.subtract),
    "mul": (None, _variadic(pc.multiply)),
    "div": (2, pc.divide),
    "max": (None, _variadic(lambda a, b: pc.max_element_wise(a, b))),
    "min": (None, _variadic(lambda a, b: pc.min_element_wise(a, b))),
    # math (ValueSourceParser registrations)
    "abs": (1, pc.abs),
    "log": (1, lambda x: pc.logb(x, pa.scalar(10.0))),  # Solr log = log10
    "ln": (1, pc.ln),
    "sqrt": (1, pc.sqrt),
    "pow": (2, pc.power),
    "exp": (1, pc.exp),
    "floor": (1, pc.floor),
    "ceil": (1, pc.ceil),
    # linear(x, m, c) = m*x + c (LinearFloatFunction)
    "linear": (3, lambda x, m, c: pc.add(pc.multiply(x, m), c)),
    # recip(x, m, a, b) = a / (m*x + b) (ReciprocalFloatFunction — the
    # boost-by-recency staple)
    "recip": (4, lambda x, m, a, b: pc.divide(a, pc.add(pc.multiply(m, x),
                                                        b))),
    # scale(x, lo, hi) (ScaleFloatFunction; min/max over the TABLE it is
    # evaluated on — use bind_scale_global before evaluating over a
    # multi-block Dataset, matching the reference's index-wide bounds)
    "scale": (3, _scale),
    # internal: scale() after bind_scale_global pinned global bounds
    "scale_bound": (5, _scale_bound),
    # map(x, lo, hi, target) (RangeMapFloatFunction)
    "map": (4, lambda x, lo, hi, t: pc.if_else(
        pc.and_(pc.greater_equal(x, lo), pc.less_equal(x, hi)), t, x)),
    # if(cond, a, b) over a boolean expr encoded as nonzero
    "if": (3, lambda c, a, b: pc.if_else(pc.not_equal(c, pa.scalar(0.0)),
                                         a, b)),
    # expressions-module operator kernels (JavascriptCompiler lowering):
    # comparisons yield 1.0/0.0, % is C-style fmod (truncated division)
    # geo / vector distances (ValueSourceParser: geodist, hsin,
    # sqedist, dist — solr/core/.../search/function/distance/)
    # geodist(lat1,lon1,lat2,lon2): degrees in, great-circle km out
    "geodist": (4, lambda a, b, c, d: _np_kernel(
        lambda w, x, y, z: __import__(
            "lucene_solr_ray.pipelines.geo", fromlist=["haversine_km"])
        .haversine_km(w, x, y, z), a, b, c, d)),
    # hsin(radius, x1,y1,x2,y2): HaversineFunction — RADIANS in,
    # distance out in the radius' unit (the reference's default
    # convertToRadians=false path)
    "hsin": (5, lambda r, x1, y1, x2, y2: _np_kernel(_hsin_rad,
                                                     r, x1, y1, x2, y2)),
    # sqedist/dist: 2-D squared-euclidean / Minkowski-p
    "sqedist": (4, lambda x1, y1, x2, y2: pc.add(
        pc.power(pc.subtract(x1, x2), pa.scalar(2.0)),
        pc.power(pc.subtract(y1, y2), pa.scalar(2.0)))),
    "dist": (5, lambda p, x1, y1, x2, y2: pc.power(
        pc.add(pc.power(pc.abs(pc.subtract(x1, x2)), p),
               pc.power(pc.abs(pc.subtract(y1, y2)), p)),
        pc.divide(pa.scalar(1.0), p))),
    "neg": (1, pc.negate),
    "mod": (2, lambda a, b: pc.subtract(
        a, pc.multiply(pc.trunc(pc.divide(a, b)), b))),
    "gt": (2, lambda a, b: pc.cast(pc.greater(a, b), pa.float64())),
    "gte": (2, lambda a, b: pc.cast(pc.greater_equal(a, b), pa.float64())),
    "lt": (2, lambda a, b: pc.cast(pc.less(a, b), pa.float64())),
    "lte": (2, lambda a, b: pc.cast(pc.less_equal(a, b), pa.float64())),
    "eq": (2, lambda a, b: pc.cast(pc.equal(a, b), pa.float64())),
    "neq": (2, lambda a, b: pc.cast(pc.not_equal(a, b), pa.float64())),
}


def _unbound(name):
    def fn(*_):
        raise ValueError(
            f"{name}() is an index-statistics accessor; bind the "
            "expression with bind_index_stats(ast, stats) before eval "
            "(it has no meaning without a searcher)")
    return fn


# Index-statistics accessors (DocFreqValueSource.java:35,
# NumDocsValueSource, MaxDocValueSource, NormValueSource from
# lucene/queries/.../function/valuesource/): query-time constants /
# per-doc columns resolved against the live index by bind_index_stats,
# so boosts can reference docFreq("term"), corpus size, or the doc's
# encoded field length. norm(field) evaluates to the SmallFloat-DECODED
# field length (the engine's norm byte payload).
FUNCTIONS.update({
    "docfreq": (1, _unbound("docfreq")),
    "numdocs": (0, _unbound("numdocs")),
    "maxdoc": (0, _unbound("maxdoc")),
    "norm": (1, _unbound("norm")),
    # TermFreqValueSource / TotalTermFreqValueSource /
    # SumTotalTermFreqValueSource (same valuesource/ package)
    "termfreq": (1, _unbound("termfreq")),
    "totaltermfreq": (1, _unbound("totaltermfreq")),
    "sumtotaltermfreq": (0, _unbound("sumtotaltermfreq")),
    # Solr ValueSourceParser registrations with index/request context:
    # exists(f) (SimpleBoolFunction over FieldValueSource), def(f,d)
    # (DefFunction), ms() date math (DateValueSourceParser), ord/rord
    # (OrdFieldSource / ReverseOrdFieldSource)
    # IDFValueSource routed through the engine's one similarity (BM25),
    # like the reference routes it through the schema similarity
    "idf": (1, _unbound("idf")),
    "exists": (1, _unbound("exists")),
    "def": (2, _unbound("def")),
    "ms": ((0, 1, 2), _unbound("ms")),
    "ord": (1, _unbound("ord")),
    "rord": (1, _unbound("rord")),
})

#: pseudo-field prefix a bound norm() rewrites to; the evaluating caller
#: supplies this column (per-hit decoded norms)
NORM_PSEUDO_FIELD = "__norm__"
#: pseudo-field prefix termfreq(t) rewrites to (per-hit tf of t)
TF_PSEUDO_PREFIX = "__tf__"
#: pseudo-field prefix exists(f) rewrites to (1.0 where the doc has a
#: value for f, else 0.0)
EXISTS_PSEUDO_PREFIX = "__exists__"
#: pseudo-field prefixes ord(f)/rord(f) rewrite to (1-based rank of the
#: doc's value among the index's sorted distinct values; 0 = missing)
ORD_PSEUDO_PREFIX = "__ord__"
RORD_PSEUDO_PREFIX = "__rord__"


def stats_terms(node) -> set[str]:
    """Terms referenced by the per-term global-statistics accessors
    (docfreq / totaltermfreq) in an AST."""
    if isinstance(node, Func):
        if node.name in ("docfreq", "totaltermfreq", "idf"):
            (arg,) = node.args
            if not isinstance(arg, Field):
                raise ValueError(f"{node.name}() takes a bare term")
            return {arg.name}
        out: set[str] = set()
        for a in node.args:
            out |= stats_terms(a)
        return out
    return set()


def tf_terms(node) -> set[str]:
    """Terms referenced by termfreq() accessors (per-doc columns)."""
    if isinstance(node, Func):
        if node.name == "termfreq":
            (arg,) = node.args
            if not isinstance(arg, Field):
                raise ValueError("termfreq() takes a bare term")
            return {arg.name}
        out: set[str] = set()
        for a in node.args:
            out |= tf_terms(a)
        return out
    return set()


def uses_norm(node) -> bool:
    if isinstance(node, Func):
        if node.name == "norm":
            return True
        return any(uses_norm(a) for a in node.args)
    return False


def ord_fields(node) -> set[str]:
    """Doc-value fields referenced by ord()/rord() — the distributed
    searcher pre-gathers their global sorted distinct values so every
    shard ranks against the same ordinal table."""
    if isinstance(node, Func):
        if node.name in ("ord", "rord"):
            (arg,) = node.args
            if not isinstance(arg, Field):
                raise ValueError(f"{node.name}() takes a bare field name")
            return {arg.name}
        out: set[str] = set()
        for a in node.args:
            out |= ord_fields(a)
        return out
    return set()


def bind_index_stats(node, stats: dict):
    """Rewrite stats accessors to constants / the norm pseudo-field.

    ``stats`` = {"docfreq": {term: df}, "numdocs": n, "maxdoc": m} —
    computed once per query by the searcher (local or driver-side for
    the distributed scatter), so the shipped AST is pure data and the
    per-batch evaluation stays a plain kernel chain."""
    if isinstance(node, Func):
        if node.name == "docfreq":
            (arg,) = node.args
            return Const(float(stats["docfreq"].get(arg.name, 0)))
        if node.name == "totaltermfreq":
            (arg,) = node.args
            return Const(float(stats.get("ttf", {}).get(arg.name, 0)))
        if node.name == "sumtotaltermfreq":
            return Const(float(stats["sumttf"]))
        if node.name == "idf":
            # the engine's similarity is BM25 (bm25.py idf formula),
            # mirroring IDFValueSource's route through the schema sim
            (arg,) = node.args
            from ..search import bm25

            return Const(float(bm25.idf(
                stats["docfreq"].get(arg.name, 0), stats["numdocs"])))
        if node.name == "numdocs":
            return Const(float(stats["numdocs"]))
        if node.name == "maxdoc":
            return Const(float(stats["maxdoc"]))
        if node.name == "norm":
            return Field(NORM_PSEUDO_FIELD)
        if node.name == "termfreq":
            (arg,) = node.args
            return Field(TF_PSEUDO_PREFIX + arg.name)
        if node.name == "exists":
            (arg,) = node.args
            if not isinstance(arg, Field):
                raise ValueError("exists() takes a bare field name")
            return Field(EXISTS_PSEUDO_PREFIX + arg.name)
        if node.name == "def":
            # DefFunction: value if present, else the default — lowered
            # to if(exists(f), f, default) over the exists pseudo-column
            f, d = node.args
            if not isinstance(f, Field):
                raise ValueError("def() takes a bare field name first")
            return Func("if", (Field(EXISTS_PSEUDO_PREFIX + f.name), f,
                               bind_index_stats(d, stats)))
        if node.name == "ms":
            # DateValueSourceParser: ms() = request NOW (epoch millis,
            # one value per request — Solr's single-NOW semantics),
            # ms(a) = a, ms(a,b) = a - b; date doc values are epoch-ms
            # numerics in this engine
            if len(node.args) == 0:
                return Const(float(stats["now_ms"]))
            if len(node.args) == 1:
                return bind_index_stats(node.args[0], stats)
            a, b = node.args
            return Func("sub", (bind_index_stats(a, stats),
                                bind_index_stats(b, stats)))
        if node.name in ("ord", "rord"):
            (arg,) = node.args
            pref = (ORD_PSEUDO_PREFIX if node.name == "ord"
                    else RORD_PSEUDO_PREFIX)
            return Field(pref + arg.name)
        return Func(node.name,
                    tuple(bind_index_stats(a, stats) for a in node.args))
    return node

def scale_subexprs(node) -> list:
    """Distinct first-arg sub-expressions of every scale() node, in
    first-appearance order."""
    out = []

    def walk(n):
        if isinstance(n, Func):
            if n.name == "scale" and n.args[0] not in out:
                out.append(n.args[0])
            for a in n.args:
                walk(a)

    walk(node)
    return out


def bind_scale_global(node, ds):
    """ScaleFloatFunction's real contract scales by the min/max over the
    WHOLE index (``lucene/queries/.../valuesource/ScaleFloatFunction.java:
    35`` createWeightsMap walks every reader), not one batch — evaluating
    an unbound scale() inside map_batches would make results depend on
    block boundaries. This pass runs ONE streaming pre-pass over ``ds``
    per expression (per-batch (min, max) partials, two floats per batch,
    reduced on the driver) and pins the bounds into the AST as constants,
    so the shipped tree stays pure data.

    Returns the rewritten AST (unchanged object if there is no scale())."""
    subs = scale_subexprs(node)
    if not subs:
        return node

    def partial(t: pa.Table) -> pa.Table:
        cols = {}
        for i, sub in enumerate(subs):
            v = eval_expr(sub, t)
            cols[f"mn{i}"] = pa.array([pc.min(v).as_py()],
                                      type=pa.float64())
            cols[f"mx{i}"] = pa.array([pc.max(v).as_py()],
                                      type=pa.float64())
        return pa.table(cols)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    bounds = {sub: (float(parts[f"mn{i}"].min()),
                    float(parts[f"mx{i}"].max()))
              for i, sub in enumerate(subs)}

    def rewrite(n):
        if isinstance(n, Func):
            args = tuple(rewrite(a) for a in n.args)
            if n.name == "scale":
                mn, mx = bounds[n.args[0]]
                return Func("scale_bound",
                            args + (Const(mn), Const(mx)))
            return Func(n.name, args)
        return n

    return rewrite(node)


_TOKEN = re.compile(r"\s*([A-Za-z_][A-Za-z0-9_.]*|[-+]?[0-9]*\.?[0-9]+"
                    r"(?:[eE][-+]?[0-9]+)?|[(),])")


def parse_func(expr: str):
    """Parse ``sum(mul(price,2),log(qty))`` into the AST (the Solr
    function-query prefix grammar, FunctionQParser.parseValueSource)."""
    tokens = []
    i = 0
    while i < len(expr):
        m = _TOKEN.match(expr, i)
        if not m:
            raise ValueError(f"bad function syntax at {expr[i:]!r}")
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

    def atom():
        t = take()
        if re.fullmatch(r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?", t):
            return Const(float(t))
        if peek() == "(":
            take("(")
            args = []
            if peek() != ")":
                args.append(atom())
                while peek() == ",":
                    take(",")
                    args.append(atom())
            take(")")
            if t not in FUNCTIONS:
                raise ValueError(f"unknown function {t!r}")
            arity = FUNCTIONS[t][0]
            if isinstance(arity, tuple):
                if len(args) not in arity:
                    raise ValueError(
                        f"{t} takes {arity} args, got {len(args)}")
            elif arity is not None and len(args) != arity:
                raise ValueError(
                    f"{t} takes {arity} args, got {len(args)}")
            elif arity is None and len(args) < 2:
                raise ValueError(f"{t} takes >=2 args")
            return Func(t, tuple(args))
        return Field(t)

    out = atom()
    if pos != len(tokens):
        raise ValueError(f"trailing tokens: {tokens[pos:]}")
    return out


def eval_expr(node, batch: pa.Table):
    """Vectorized evaluation over an Arrow batch -> float64 array."""
    if isinstance(node, Const):
        return pa.scalar(node.value, type=pa.float64())
    if isinstance(node, Field):
        col = batch.column(node.name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.cast(pa.float64())
    kernel = FUNCTIONS[node.name][1]
    return kernel(*(eval_expr(a, batch) for a in node.args))


_INFIX_TOK = re.compile(r"""\s*(
      [A-Za-z_][A-Za-z0-9_.]*
    | [0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?
    | \*\*|==|!=|<=|>=|[-+*/%<>(),?:]
)""", re.VERBOSE)

_BINOP = {  # token -> (registry function, precedence)
    "?": (None, 1),                       # ternary handled separately
    "==": ("eq", 3), "!=": ("neq", 3),
    "<": ("lt", 4), "<=": ("lte", 4), ">": ("gt", 4), ">=": ("gte", 4),
    "+": ("sum", 5), "-": ("sub", 5),
    "*": ("mul", 6), "/": ("div", 6), "%": ("mod", 6),
    "**": ("pow", 7),
}


def parse_infix(expr: str):
    """Lucene expressions-module syntax (``lucene/expressions/.../js/
    JavascriptCompiler.java``): infix arithmetic ``+ - * / % **``,
    comparisons (1.0/0.0), the ternary ``c ? a : b``, unary minus,
    parentheses, numeric literals, bare identifiers as doc-value fields,
    and calls into the same function registry (``sqrt(x) + popularity``).
    Compiles to the prefix-grammar AST, so evaluation shares the
    vectorized kernel chain."""
    tokens: list[str] = []
    i = 0
    while i < len(expr):
        if expr[i:].strip() == "":
            break
        m = _INFIX_TOK.match(expr, i)
        if not m:
            raise ValueError(f"bad expression at {expr[i:i+20]!r}")
        tokens.append(m.group(1))
        i = m.end()
    pos = [0]

    def peek():
        return tokens[pos[0]] if pos[0] < len(tokens) else None

    def take(expected=None):
        t = peek()
        if t is None or (expected is not None and t != expected):
            raise ValueError(f"expected {expected!r}, got {t!r} in {expr!r}")
        pos[0] += 1
        return t

    def primary():
        t = peek()
        if t is None:
            raise ValueError(f"unexpected end of expression: {expr!r}")
        if t == "-":
            take()
            # unary minus binds LOOSER than '**' (Python semantics:
            # -x ** 2 == -(x**2)); JS itself rejects an unparenthesized
            # unary-minus base, so no valid JS expression changes
            # meaning. Parse the operand at the '**' precedence level so
            # the whole right-assoc exponent chain lands under neg.
            return Func("neg", (binary(7),))
        if t == "(":
            take()
            node = ternary()
            take(")")
            return node
        take()
        if re.fullmatch(r"[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?", t):
            return Const(float(t))
        if peek() == "(":  # function call
            take("(")
            args = []
            if peek() != ")":
                args.append(ternary())
                while peek() == ",":
                    take(",")
                    args.append(ternary())
            take(")")
            if t not in FUNCTIONS:
                raise ValueError(f"unknown function {t!r}")
            arity = FUNCTIONS[t][0]
            if isinstance(arity, tuple):
                if len(args) not in arity:
                    raise ValueError(
                        f"{t} expects {arity} args, got {len(args)}")
            elif arity is not None and len(args) != arity:
                raise ValueError(
                    f"{t} expects {arity} args, got {len(args)}")
            return Func(t, tuple(args))
        return Field(t)

    def binary(min_prec: int):
        left = primary()
        while True:
            t = peek()
            if t not in _BINOP or t == "?":
                return left
            fn, prec = _BINOP[t]
            if prec < min_prec:
                return left
            take()
            right = binary(prec + (0 if t == "**" else 1))  # ** right-assoc
            left = Func(fn, (left, right))

    def ternary():
        cond = binary(2)
        if peek() == "?":
            take("?")
            a = ternary()
            take(":")
            b = ternary()
            return Func("if", (cond, a, b))
        return cond

    node = ternary()
    if pos[0] != len(tokens):
        raise ValueError(f"trailing tokens {tokens[pos[0]:]!r} in {expr!r}")
    return node


def compile_expr(expr: str) -> Callable[[pa.Table], pa.Array]:
    """expr string -> batch function (parse once, evaluate per batch)."""
    ast = parse_func(expr)

    def fn(batch: pa.Table):
        out = eval_expr(ast, batch)
        if isinstance(out, pa.Scalar):  # constant expression
            out = pa.array(np.full(len(batch), out.as_py()),
                           type=pa.float64())
        return out

    return fn
