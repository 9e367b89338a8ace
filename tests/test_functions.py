"""Function-query / ValueSource registry: parser, kernels, composition."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.functions import compile_expr, parse_func
from lucene_solr_ray.functions.valuesource import Const, Field, Func

T = pa.table({
    "x": pa.array([1.0, 4.0, 9.0, 16.0]),
    "y": pa.array([2, 0, -2, 10], type=pa.int64()),
})


def _vals(expr):
    return compile_expr(expr)(T).to_numpy(zero_copy_only=False)


def test_parse_shapes():
    ast = parse_func("sum(mul(x,2),log(y))")
    assert ast == Func("sum", (Func("mul", (Field("x"), Const(2.0))),
                               Func("log", (Field("y"),))))
    with pytest.raises(ValueError, match="unknown function"):
        parse_func("nope(x)")
    with pytest.raises(ValueError, match="takes"):
        parse_func("div(x)")
    with pytest.raises(ValueError, match="trailing"):
        parse_func("x y")


def test_arithmetic_kernels():
    assert _vals("sum(x,y,1)").tolist() == [4.0, 5.0, 8.0, 27.0]
    assert _vals("mul(x,y)").tolist() == [2.0, 0.0, -18.0, 160.0]
    assert _vals("sub(x,y)").tolist() == [-1.0, 4.0, 11.0, 6.0]
    assert _vals("div(x,2)").tolist() == [0.5, 2.0, 4.5, 8.0]
    assert _vals("max(x,y)").tolist() == [2.0, 4.0, 9.0, 16.0]
    assert _vals("min(x,y)").tolist() == [1.0, 0.0, -2.0, 10.0]


def test_math_kernels():
    assert _vals("sqrt(x)").tolist() == [1.0, 2.0, 3.0, 4.0]
    np.testing.assert_allclose(_vals("log(x)"), np.log10([1, 4, 9, 16]))
    np.testing.assert_allclose(_vals("ln(x)"), np.log([1, 4, 9, 16]))
    assert _vals("abs(y)").tolist() == [2.0, 0.0, 2.0, 10.0]
    assert _vals("pow(x,2)").tolist() == [1.0, 16.0, 81.0, 256.0]


def test_reference_composites():
    # linear(x, m, c) = m*x + c
    assert _vals("linear(x,2,1)").tolist() == [3.0, 9.0, 19.0, 33.0]
    # recip(x, m, a, b) = a / (m*x + b) — the recency-boost staple
    np.testing.assert_allclose(_vals("recip(x,1,10,10)"),
                               10.0 / (np.array([1, 4, 9, 16.0]) + 10))
    # scale to [0, 1]
    np.testing.assert_allclose(_vals("scale(x,0,1)"),
                               (np.array([1, 4, 9, 16.0]) - 1) / 15)
    # map values in [0,4] to 0, others pass through
    assert _vals("map(x,0,4,0)").tolist() == [0.0, 0.0, 9.0, 16.0]
    # if(cond, a, b)
    assert _vals("if(sub(x,4),1,2)").tolist() == [1.0, 2.0, 1.0, 1.0]


def test_constant_expression_broadcasts():
    assert _vals("mul(2,3)").tolist() == [6.0] * 4


def test_deep_composition():
    got = _vals("sum(mul(x,sub(1,div(y,10))),recip(x,1,10,10))")
    x = np.array([1, 4, 9, 16.0])
    y = np.array([2, 0, -2, 10.0])
    np.testing.assert_allclose(got, x * (1 - y / 10) + 10 / (x + 10))


# --- fuzz: the parser never crashes unexpectedly ---

from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_parse_func_total(text):
    """parse_func either returns an AST or raises ValueError — never
    crashes with anything else."""
    try:
        parse_func(text)
    except ValueError:
        pass


@given(st.recursive(
    st.sampled_from(["x", "y", "1", "2.5"]),
    lambda inner: st.tuples(
        st.sampled_from(["sum", "mul", "max", "min"]),
        st.lists(inner, min_size=2, max_size=3)).map(
        lambda t: f"{t[0]}({','.join(t[1])})"),
    max_leaves=8))
@settings(max_examples=150, deadline=None)
def test_generated_expressions_evaluate(expr):
    out = compile_expr(expr)(T)
    assert len(out) == len(T)


def test_parse_infix_precedence_and_ternary():
    import numpy as np
    import pyarrow as pa

    from lucene_solr_ray.functions.valuesource import eval_expr, parse_infix

    t = pa.table({"x": pa.array([1.0, 4.0, 30.0]),
                  "y": pa.array([2.0, 3.0, 5.0])})
    x = np.array([1.0, 4.0, 30.0])
    y = np.array([2.0, 3.0, 5.0])

    cases = {
        "x + y * 2": x + y * 2,
        "(x + y) * 2": (x + y) * 2,
        "-x + y": -x + y,
        "x % 7": x - np.trunc(x / 7) * 7,
        "x ** 2 + 1": x ** 2 + 1,
        "x > 3 ? y : x": np.where(x > 3, y, x),
        "x >= 4 ? x : 0": np.where(x >= 4, x, 0),
        "sqrt(x) + min(x, y)": np.sqrt(x) + np.minimum(x, y),
        "x == 4": (x == 4).astype(float),
        "x != 4": (x != 4).astype(float),
        "x > 2 ? (y < 4 ? 1 : 2) : 3": np.where(x > 2,
                                                np.where(y < 4, 1, 2), 3),
    }
    for expr, want in cases.items():
        got = eval_expr(parse_infix(expr), t)
        got = got.to_numpy(zero_copy_only=False) if hasattr(got, "to_numpy") \
            else np.full(3, got.as_py())
        assert np.allclose(got, want), expr


def test_parse_infix_errors():
    import pytest

    from lucene_solr_ray.functions.valuesource import parse_infix

    for bad in ["x +", "(x", "x ? y", "nosuchfn(x)", "x @ y", "? : x",
                "pow(x)"]:
        with pytest.raises(ValueError):
            parse_infix(bad)


def test_parse_infix_totality_fuzz():
    """Random token soup: parse_infix either returns an AST or raises
    ValueError — no other exception class escapes."""
    import numpy as np

    from lucene_solr_ray.functions.valuesource import parse_infix

    rng = np.random.default_rng(29)
    pieces = ["x", "y", "1", "2.5", "+", "-", "*", "/", "%", "**", "(",
              ")", "?", ":", ">", ">=", "==", "!=", "sqrt", "min", ",",
              "", " ", "@", "1e3"]
    for _ in range(400):
        n = int(rng.integers(1, 9))
        s = " ".join(pieces[int(rng.integers(0, len(pieces)))]
                     for _ in range(n))
        try:
            parse_infix(s)
        except ValueError:
            pass


def test_unary_minus_binds_looser_than_pow():
    """ADVICE r3: -x ** 2 must be -(x**2) (Python semantics; JS rejects
    the unparenthesized form, so no valid JS expression disagrees)."""
    import pyarrow as pa

    from lucene_solr_ray.functions.valuesource import eval_expr, parse_infix

    t = pa.table({"x": pa.array([3.0, -2.0])})
    for expr, want in [
        ("-x ** 2", [-9.0, -4.0]),
        ("(-x) ** 2", [9.0, 4.0]),
        ("-2 ** 2", [-4.0, -4.0]),
        ("-x ** 2 + 1", [-8.0, -3.0]),     # neg consumes only the pow chain
        ("2 ** -x", [0.125, 4.0]),         # unary minus in the exponent
        ("- - x", [3.0, -2.0]),
    ]:
        got = eval_expr(parse_infix(expr), t)
        vals = [got.as_py()] * 2 if isinstance(got, pa.Scalar) else \
            got.to_pylist()
        assert vals == want, expr


def test_distance_kernels():
    """geodist/hsin/sqedist/dist (solr/core/.../search/function/distance/
    HaversineFunction.java, SquaredEuclideanFunction, VectorDistanceFunction):
    vectorized over Arrow columns, scalar-broadcast constants."""
    import numpy as np
    import pyarrow as pa

    from lucene_solr_ray.functions.valuesource import eval_expr, parse_func
    from lucene_solr_ray.pipelines.geo import haversine_km

    t = pa.table({"lat": pa.array([0.0, 48.8566, -33.8688]),
                  "lon": pa.array([0.0, 2.3522, 151.2093]),
                  "x": pa.array([1.0, 2.0, 3.0]),
                  "y": pa.array([4.0, 6.0, 8.0])})
    # geodist == the geo module's haversine (degrees in, km out)
    got = eval_expr(parse_func("geodist(lat,lon,40.7128,-74.0060)"), t)
    want = haversine_km(np.array([0.0, 48.8566, -33.8688]),
                        np.array([0.0, 2.3522, 151.2093]),
                        40.7128, -74.0060)
    assert np.allclose(got.to_numpy(), want)
    # hsin on radian coords with unit radius
    got = eval_expr(parse_func("hsin(1.0,0.0,0.0,0.0,1.5707963)"), t)
    assert abs(float(got.as_py()) - 1.5707963) < 1e-5
    # sqedist / dist: Minkowski p=2 == sqrt of sqedist
    sq = eval_expr(parse_func("sqedist(x,y,0,0)"), t).to_numpy()
    d2 = eval_expr(parse_func("dist(2,x,y,0,0)"), t).to_numpy()
    assert np.allclose(np.sqrt(sq), d2)
    d1 = eval_expr(parse_func("dist(1,x,y,0,0)"), t).to_numpy()
    assert np.allclose(d1, [5.0, 8.0, 11.0])


def test_bind_scale_global_block_independent(ray_session):
    """scale() bound via the global pre-pass must not depend on block
    boundaries (ScaleFloatFunction.java:35 walks every reader)."""
    import ray.data as rd

    from lucene_solr_ray.functions.valuesource import (
        bind_scale_global,
        eval_expr,
        parse_func,
    )

    vals = np.arange(100, dtype=np.float64)
    rng = np.random.default_rng(7)
    rng.shuffle(vals)
    ast = parse_func("scale(x,0,10)")

    outs = []
    for nblocks in (1, 7):
        ds = rd.from_arrow(pa.table({"x": vals})).repartition(nblocks)
        bound = bind_scale_global(ast, ds)
        got = (ds.map_batches(
            lambda t: pa.table({"x": t.column("x"),
                                "s": eval_expr(bound, t)}),
            batch_format="pyarrow").to_pandas().sort_values("x"))
        outs.append(got["s"].to_numpy())
    assert np.allclose(outs[0], outs[1])
    # exact min-max semantics: min -> 0, max -> 10
    assert outs[0].min() == 0.0 and outs[0].max() == 10.0
    # an unbound scale() inside map_batches WOULD differ across blocks:
    # the bound AST is constant-folded, so no per-batch min/max remains
    from lucene_solr_ray.functions.valuesource import Func

    bound = bind_scale_global(ast, rd.from_arrow(pa.table({"x": vals})))
    assert isinstance(bound, Func) and bound.name == "scale_bound"
