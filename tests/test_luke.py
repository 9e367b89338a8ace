"""luke() index introspection (LukeRequestHandler.java:109): exact global
top terms by df vs a from-the-corpus brute force, field info, stats."""

from collections import Counter

import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.analysis import StandardAnalyzer
from lucene_solr_ray.data.transcripts import generate_transcripts
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.check import luke


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("luke")
    t = generate_transcripts(200, seed=31)
    pq.write_table(t, d / "in.parquet")
    build_index(str(d / "in.parquet"), str(d / "idx"), num_shards=3)
    return d, t


def test_top_terms_match_brute_force(built):
    d, t = built
    out = luke(str(d / "idx"), top_n=15)
    an = StandardAnalyzer()
    df, ttf = Counter(), Counter()
    for text in t.column("text").to_pylist():
        terms = an.analyze_terms(text)
        ttf.update(terms)
        df.update(set(terms))
    want = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = [(r["term"], r["df"]) for r in out["top_terms"]]
    assert got == want
    for r in out["top_terms"]:
        assert r["ttf"] == ttf[r["term"]]


def test_index_and_field_info(built):
    d, t = built
    out = luke(str(d / "idx"), top_n=3)
    assert out["index"]["num_docs"] == t.num_rows
    assert out["index"]["num_shards"] == 3
    assert out["index"]["postings_codec"] == "varint"
    assert out["fields"]["text"]["indexed"] is True
    # docvalue fields from the transcripts schema are introspected
    for f in ("conv_id", "turn_idx", "role", "tool", "ts"):
        assert out["fields"][f]["docValues"] is True, f
    assert len(out["top_terms"]) == 3
