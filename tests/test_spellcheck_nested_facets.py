"""Spellcheck (did-you-mean) and nested JSON facet buckets."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.data.transcripts import transcripts_path
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def searcher(ray_session, tmp_path_factory):
    src = transcripts_path("tiny")
    out = tmp_path_factory.mktemp("spell") / "idx"
    build_index(src, str(out), num_shards=3)
    return IndexSearcher(str(out))


def test_spellcheck_finds_close_terms(searcher):
    # "dta" is 1 edit from "data" (a frequent term in the corpus)
    out = searcher.spellcheck("dta", k=5)
    assert out and out[0][0] == "data"
    # distances rank before frequency: an exact-1-edit term beats a
    # more frequent 2-edit term
    from lucene_solr_ray.search.query import levenshtein_within

    dists = [1 if levenshtein_within("dta", t, 1) else 2 for t, _ in out]
    assert dists == sorted(dists)


def test_spellcheck_excludes_exact_and_ranks_by_df(searcher):
    out = searcher.spellcheck("data", k=10)
    assert all(t != "data" for t, _ in out)
    # df values aggregated across shards are positive
    assert all(df > 0 for _, df in out)


def test_spellcheck_no_matches(searcher):
    assert searcher.spellcheck("qqqqqqqqqq", k=5) == []


def test_nested_facet_matches_pandas(ray_session):
    from lucene_solr_ray.pipelines.relational import (
        json_facet,
        nested_facet_source_lang,
    )
    from lucene_solr_ray.pipelines.util import read

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["source", "lang"]).to_pandas()
    tree = json_facet(read(sf, "documents", ["source", "lang"]),
                      ["source", "lang"], [2, 2])
    top_sources = (docs.groupby("source").size()
                   .reset_index(name="n")
                   .sort_values(["n", "source"], ascending=[False, True])
                   .head(2))
    got_sources = [(b["val"], b["count"]) for b in tree["buckets"]]
    want_sources = list(zip(top_sources["source"], top_sources["n"]))
    assert got_sources == want_sources
    for b in tree["buckets"]:
        sub = docs[docs["source"] == b["val"]]
        want = (sub.groupby("lang").size().reset_index(name="n")
                .sort_values(["n", "lang"], ascending=[False, True]).head(2))
        got = [(s["val"], s["count"]) for s in b["buckets"]]
        assert got == list(zip(want["lang"], want["n"])), b["val"]
    # flat driver-surface variant has one row per (top source, top lang)
    flat = nested_facet_source_lang(sf).to_pandas()
    assert len(flat) == sum(len(b["buckets"]) for b in tree["buckets"])


def test_facet_option_trio_with_nulls(ray_session):
    """missing / allBuckets / numBuckets (FacetFieldProcessor's
    SpecialSlotAcc trio) against a hand-computed corpus with nulls at
    both nesting levels."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_solr_ray.pipelines.relational import json_facet

    src = ["a", "a", "a", "b", "b", "c", None, None]
    lng = ["en", "en", None, "fr", "en", "fr", "en", None]
    ds = rd.from_arrow(pa.table({"source": src, "lang": lng}))
    node = json_facet(ds, ["source", "lang"], [2, 1], missing=True,
                      all_buckets=True, num_buckets=True)
    # top level: a(3) b(2) c(1), 2 missing; limit 2 -> a, b
    assert node["numBuckets"] == 3
    assert node["allBuckets"] == {"count": 6}
    assert node["missing"] == {"count": 2}
    assert [(b["val"], b["count"]) for b in node["buckets"]] \
        == [("a", 3), ("b", 2)]
    a, b = node["buckets"]
    # within a: en(2), 1 missing lang; limit 1 -> en
    assert a["numBuckets"] == 1 and a["missing"] == {"count": 1}
    assert a["allBuckets"] == {"count": 2}
    assert [(x["val"], x["count"]) for x in a["buckets"]] == [("en", 2)]
    # within b: en(1), fr(1) -> tie breaks value-asc; no missing
    assert b["numBuckets"] == 2 and b["missing"] == {"count": 0}
    assert [(x["val"], x["count"]) for x in b["buckets"]] == [("en", 1)]


def test_facet_options_off_by_default(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from lucene_solr_ray.pipelines.relational import json_facet

    ds = rd.from_arrow(pa.table({"source": ["a", "b", "a"]}))
    node = json_facet(ds, ["source"], [5])
    assert set(node) == {"buckets"}
    assert [(b["val"], b["count"]) for b in node["buckets"]] \
        == [("a", 2), ("b", 1)]


def test_drill_sideways_hand_corpus(ray_session):
    """DrillSideways.java:63: each dimension's counts drop its own
    filter, keep the others'; extra facet fields see the full drill-down."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_solr_ray.pipelines.relational import drill_sideways

    t = pa.table({
        "color": ["red", "red", "red", "blue", "blue", "green"],
        "size":  ["s",   "m",  "s",   "s",    "m",    "s"],
        "brand": ["a",   "a",  "b",   "a",    "b",    "a"],
    })
    got = {(r.dim, r.val): r.cnt for r in
           drill_sideways(rd.from_arrow(t).repartition(3),
                          {"color": "red", "size": "s"},
                          facet_fields=["brand"])
           .to_pandas().itertuples()}
    # color counts: size=s only -> red 2, blue 1, green 1
    assert got[("color", "red")] == 2
    assert got[("color", "blue")] == 1
    assert got[("color", "green")] == 1
    # size counts: color=red only -> s 2, m 1
    assert got[("size", "s")] == 2
    assert got[("size", "m")] == 1
    # brand under the FULL drill-down (red+s): rows 0,2 -> a 1, b 1
    assert got[("brand", "a")] == 1
    assert got[("brand", "b")] == 1
    assert got[("__hits__", "")] == 2
