"""Analytics component (solr/contrib/analytics ExpressionFactory):
expression reductions over facet buckets, partial-aggregate pushdown."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from lucene_solr_ray.pipelines.analytics import (
    expr_fields,
    facet_analytics,
    parse_spec,
)


def test_parse_spec():
    red, ast = parse_spec("sum:mul(a,b)")
    assert red == "sum"
    assert expr_fields(ast) == {"a", "b"}
    with pytest.raises(ValueError):
        parse_spec("median:x")


def test_facet_analytics_all_reductions(ray_session):
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "x": rng.uniform(0, 100, n),
        "y": rng.uniform(0, 10, n),
    })
    ds = rd.from_pandas(df).repartition(8)
    out = facet_analytics(ds, ["k"], {
        "s": "sum:mul(x,y)",
        "m": "avg:x",
        "lo": "min:sub(x,y)",
        "hi": "max:x",
        "n": "count:x",
    }).to_pandas().sort_values("k").reset_index(drop=True)
    want = (df.assign(xy=df.x * df.y, xmy=df.x - df.y)
            .groupby("k")
            .agg(s=("xy", "sum"), m=("x", "mean"), lo=("xmy", "min"),
                 hi=("x", "max"), n=("x", "count"))
            .reset_index())
    assert list(out.k) == list(want.k)
    for col in ("s", "m", "lo", "hi"):
        np.testing.assert_allclose(out[col], want[col], rtol=1e-9)
    assert list(out.n) == list(want.n)


def test_facet_analytics_constant_expr(ray_session):
    # a constant expression broadcast per row still reduces per bucket
    df = pd.DataFrame({"k": ["a"] * 3 + ["b"] * 5, "x": range(8)})
    ds = rd.from_pandas(df)
    out = (facet_analytics(ds, ["k"], {"c": "sum:2"})
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(out.c) == [6.0, 10.0]
