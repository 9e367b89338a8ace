"""Taxonomy facets (lucene/facet): getTopChildren over hierarchical
component columns, pinned to the SimpleFacetsExample corpus."""

import pyarrow as pa

import ray.data as rd

from lucene_solr_ray.pipelines.relational import taxonomy_facet

# lucene/demo/.../facet/SimpleFacetsExample.java:68-88 Publish Date docs
DATES = [("2010", "10", "15"), ("2010", "10", "20"),
         ("2012", "1", "1"), ("2012", "1", "7"), ("1999", "5", "5")]


def _ds():
    return rd.from_arrow(pa.table({
        "year": [d[0] for d in DATES],
        "month": [d[1] for d in DATES],
        "day": [d[2] for d in DATES],
    }))


def test_top_children_root(ray_session):
    out = taxonomy_facet(_ds(), ["year", "month", "day"], path=(),
                         topn=10).to_pandas()
    rows = dict(zip(out["label"], out["cnt"]))
    # demo prints: Publish Date (5) -> 2010 (2), 2012 (2), 1999 (1)
    assert rows == {"2010": 2, "2012": 2, "1999": 1, "__total__": 5}
    assert out["child_count"].unique().tolist() == [3]
    # count desc, label asc tie-break; total row last
    assert out["label"].tolist() == ["2010", "2012", "1999", "__total__"]


def test_top_children_under_path(ray_session):
    out = taxonomy_facet(_ds(), ["year", "month", "day"],
                         path=("2010",), topn=10).to_pandas()
    rows = dict(zip(out["label"], out["cnt"]))
    assert rows == {"10": 2, "__total__": 2}


def test_topn_truncates_but_total_is_full(ray_session):
    out = taxonomy_facet(_ds(), ["year", "month", "day"], path=(),
                         topn=1).to_pandas()
    assert out["label"].tolist() == ["2010", "__total__"]
    assert out["cnt"].tolist() == [2, 5]
    assert out["child_count"].tolist() == [3, 3]


def test_sampled_facet_empty_string_label(ray_session):
    """'' is a legitimate facet value — it must count as a label, not
    be folded into the batch-total sentinel."""
    import numpy as np
    import pyarrow as pa

    from lucene_solr_ray.pipelines.relational import sampled_facet

    n = 64
    t = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "event_type": pa.array(["" if i % 2 else "x" for i in range(n)]),
    })
    out = sampled_facet(rd.from_arrow(t), "event_type", "event_id",
                        rate_denom=2).to_pandas()
    rows = dict(zip(out["label"], out["sample_cnt"]))
    assert "" in rows and rows[""] > 0
    # the total row equals the full input count clamp, not total+''
    total = out[out["label"] == "__total__"]
    assert int(total["sample_cnt"].iloc[0]) == \
        int(out[out["label"] != "__total__"]["sample_cnt"].sum())
