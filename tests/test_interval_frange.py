"""Interval facets (IntervalFacets.java) + {!frange} function range."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from lucene_solr_ray.pipelines.relational import (
    _parse_interval,
    frange,
    interval_facet,
)


def test_parse_interval_forms():
    assert _parse_interval("[1,10)") == (1.0, True, 10.0, False)
    assert _parse_interval("(1,10]") == (1.0, False, 10.0, True)
    assert _parse_interval("[*,5]") == (-np.inf, False, 5.0, True)
    assert _parse_interval("(0,*]") == (0.0, False, np.inf, False)
    assert _parse_interval(" [ 2 , 3 ] ") == (2.0, True, 3.0, True)


@pytest.mark.parametrize("bad", ["1,10", "[1,10", "[,10)", "[1,)",
                                 "[10,1]", "[1;10]", "x"])
def test_parse_interval_rejects(bad):
    with pytest.raises(ValueError):
        _parse_interval(bad)


def test_interval_facet_counts_equal_range_queries(ray_session):
    """IntervalFacets.java:58-61 contract: each interval count equals the
    equivalent range query's count; overlapping intervals each count."""
    rng = np.random.default_rng(7)
    v = rng.uniform(-10, 30, size=500)
    ds = rd.from_arrow(pa.table({"value": v})).repartition(7)
    specs = ["[*,0)", "[0,10)", "(5,15]", "[10,20]", "(20,*]", "[100,200)"]
    out = {r["bucket"]: r["cnt"]
           for r in interval_facet(ds, "value", specs).take_all()}
    assert out["[*,0)"] == int((v < 0).sum())
    assert out["[0,10)"] == int(((v >= 0) & (v < 10)).sum())
    assert out["(5,15]"] == int(((v > 5) & (v <= 15)).sum())
    assert out["[10,20]"] == int(((v >= 10) & (v <= 20)).sum())
    assert out["(20,*]"] == int((v > 20).sum())
    assert out["[100,200)"] == 0  # empty interval still emitted
    # overlap: totals exceed N because (5,15] overlaps two neighbours
    assert sum(out.values()) > len(v)


def test_frange_bounds_and_inclusivity(ray_session):
    t = pa.table({"a": [1.0, 2.0, 3.0, 4.0], "b": [1.0, 1.0, 1.0, 1.0]})
    ds = rd.from_arrow(t)
    got = frange(ds, "div(a,b)", l=2.0, u=4.0, incl=True,
                 incu=False).to_pandas()
    assert sorted(got["a"]) == [2.0, 3.0]
    got = frange(ds, "div(a,b)", l=2.0, u=4.0, incl=False,
                 incu=True).to_pandas()
    assert sorted(got["a"]) == [3.0, 4.0]
    got = frange(ds, "div(a,b)", u=2.0).to_pandas()
    assert sorted(got["a"]) == [1.0, 2.0]
    got = frange(ds, "div(a,b)").to_pandas()  # unbounded = match all
    assert len(got) == 4
