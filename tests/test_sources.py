"""Loader round-trips: json/csv/text -> index -> search."""

import json

import pytest

from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.searcher import IndexSearcher
from lucene_solr_ray.sources import load_csv_docs, load_json_docs, load_text_lines
from lucene_solr_ray.sources.loaders import to_transcript_schema

DOCS = [
    ("d-000", "ray data engine"),
    ("d-001", "lucene index merge"),
    ("d-002", "ray scales out"),
]


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    root = tmp_path_factory.mktemp("src")
    with open(root / "docs.jsonl", "w") as f:
        for i, t in DOCS:
            f.write(json.dumps({"id": i, "text": t}) + "\n")
    with open(root / "docs.csv", "w") as f:
        f.write("id,text\n")
        for i, t in DOCS:
            f.write(f"{i},{t}\n")
    with open(root / "docs.txt", "w") as f:
        for i, t in DOCS:
            f.write(f"title{i}|2026-01-01|{t}\n")
    return root


def _index_and_search(ds, tmp_path, name):
    out = tmp_path / name
    build_index(to_transcript_schema(ds), str(out), num_shards=2,
                assume_sorted=False)
    s = IndexSearcher(str(out))
    hits = s.search("ray", k=10)
    assert [d for d, _ in hits] == sorted(d for d, _ in hits) or len(hits) == 2
    return {d for d, _ in hits}


def test_json_loader(ray_session, files, tmp_path):
    ds = load_json_docs(str(files / "docs.jsonl"))
    assert _index_and_search(ds, tmp_path, "jidx") == {0, 2}


def test_csv_loader(ray_session, files, tmp_path):
    ds = load_csv_docs(str(files / "docs.csv"))
    assert _index_and_search(ds, tmp_path, "cidx") == {0, 2}


def test_text_loader(ray_session, files, tmp_path):
    ds = load_text_lines(str(files / "docs.txt"))
    rows = sorted(r["text"] for r in ds.take_all())
    assert rows == sorted(t for _, t in DOCS)
