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
    # scale(x, lo, hi) (ScaleFloatFunction; min/max over the batch)
    "scale": (3, _scale),
    # map(x, lo, hi, target) (RangeMapFloatFunction)
    "map": (4, lambda x, lo, hi, t: pc.if_else(
        pc.and_(pc.greater_equal(x, lo), pc.less_equal(x, hi)), t, x)),
    # if(cond, a, b) over a boolean expr encoded as nonzero
    "if": (3, lambda c, a, b: pc.if_else(pc.not_equal(c, pa.scalar(0.0)),
                                         a, b)),
}

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
            if arity is not None and len(args) != arity:
                raise ValueError(
                    f"{t} takes {arity} args, got {len(args)}")
            if arity is None and len(args) < 2:
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
