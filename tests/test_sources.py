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


# --- round 2: TREC / Reuters corpus readers ---

def test_trec_reader(ray_session, tmp_path):
    from lucene_solr_ray.sources.loaders import load_trec_docs

    (tmp_path / "f1.sgml").write_text(
        "<DOC>\n<DOCNO> FBIS-1 </DOCNO>\n<HEADER>skip me</HEADER>\n"
        "<TEXT>\nAlpha beta <P>gamma</P> delta.\n</TEXT>\n</DOC>\n"
        "<DOC>\n<DOCNO>FBIS-2</DOCNO>\n<TEXT>second doc</TEXT>"
        "<TEXT>more text</TEXT>\n</DOC>\n")
    out = load_trec_docs(str(tmp_path / "f1.sgml")).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert out["id"].tolist() == ["FBIS-1", "FBIS-2"]
    assert out["text"][0] == "Alpha beta gamma delta."
    assert out["text"][1] == "second doc more text"


def test_reuters_reader(ray_session, tmp_path):
    from lucene_solr_ray.sources.loaders import load_reuters_docs

    (tmp_path / "reut.sgm").write_text(
        '<REUTERS TOPICS="YES" NEWID="42">\n<DATE>1-MAR-1987</DATE>\n'
        "<TEXT>\n<TITLE>GRAIN PRICES UP</TITLE>\n"
        "<BODY>Wheat rose sharply today.\nReuter\n</BODY></TEXT>\n"
        "</REUTERS>\n"
        '<REUTERS NEWID="43"><TEXT><TITLE>NO BODY HERE</TITLE></TEXT>'
        "</REUTERS>\n")
    out = load_reuters_docs(str(tmp_path / "reut.sgm")).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert out["id"].tolist() == ["42", "43"]
    assert out["text"][0] == "GRAIN PRICES UP Wheat rose sharply today. Reuter"
    assert out["text"][1] == "NO BODY HERE"


def test_trec_corpus_indexes_end_to_end(ray_session, tmp_path):
    """Reader output feeds build_index through the transcript adapter."""
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.searcher import IndexSearcher
    from lucene_solr_ray.sources.loaders import load_trec_docs

    blocks = "".join(
        f"<DOC><DOCNO>D{i:03d}</DOCNO><TEXT>document number {i} about "
        f"{'ray data' if i % 2 else 'index merge'}</TEXT></DOC>\n"
        for i in range(40))
    (tmp_path / "c.sgml").write_text(blocks)
    docs = load_trec_docs(str(tmp_path / "c.sgml"))

    import pyarrow as pa

    def to_schema(t: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": t.column("id"),
            "turn_idx": pa.array([0] * len(t), type=pa.int32()),
            "text": t.column("text"),
        })

    ds = docs.map_batches(to_schema, batch_format="pyarrow")
    idx = tmp_path / "idx"
    build_index(ds, str(idx), num_shards=2, assume_sorted=False)
    s = IndexSearcher(str(idx))
    hits = s.search("ray AND data", k=5)
    assert hits
    rows = s.resolve_hits(hits)
    assert all(r["conv_id"].startswith("D") for r in rows)


def test_load_xml_docs(ray_session, tmp_path):
    from lucene_solr_ray.sources.loaders import load_xml_docs

    (tmp_path / "a.xml").write_text(
        '<add><doc><field name="id">1</field>'
        '<field name="text">hello xml world</field></doc>'
        '<doc><field name="id">2</field>'
        '<field name="body">body fallback</field>'
        '<field name="body">second value</field></doc></add>')
    out = load_xml_docs(str(tmp_path / "a.xml")).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert out["id"].tolist() == ["1", "2"]
    assert out["text"][0] == "hello xml world"
    assert out["text"][1] == "body fallback second value"


def test_load_dir_docs_and_index(ray_session, tmp_path):
    from lucene_solr_ray.sources.loaders import load_dir_docs, to_transcript_schema
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.searcher import IndexSearcher

    d = tmp_path / "corpus"
    (d / "sub").mkdir(parents=True)
    (d / "one.txt").write_text("alpha document about zebras")
    (d / "sub" / "two.txt").write_text("beta document about yaks")
    ds = load_dir_docs(str(d))
    out = ds.to_pandas()
    assert len(out) == 2
    assert {t.split()[0] for t in out["text"]} == {"alpha", "beta"}
    # end to end into the index
    idx = tmp_path / "idx"
    build_index(to_transcript_schema(ds), str(idx), num_shards=2)
    s = IndexSearcher(str(idx))
    assert len(s.search("zebras", k=5)) == 1


def test_load_enwiki_docs(ray_session, tmp_path):
    from lucene_solr_ray.sources.loaders import load_enwiki_docs

    (tmp_path / "dump.xml").write_text(
        "<mediawiki><page><title>Alpha</title><id>10</id>"
        "<revision><id>99</id><text xml:space=\"preserve\">alpha body"
        " text</text></revision></page>"
        "<page><title>Beta</title><id>20</id>"
        "<revision><text>beta body</text></revision></page></mediawiki>")
    out = (load_enwiki_docs(str(tmp_path / "dump.xml")).to_pandas()
           .sort_values("id").reset_index(drop=True))
    assert out["id"].tolist() == ["10", "20"]
    assert out["title"].tolist() == ["Alpha", "Beta"]
    assert out["text"][0] == "alpha body text"


def test_load_rich_docs_html(ray_session, tmp_path):
    """Tika-analog extraction: HTML visible text + title, script/style
    stripped, entities decoded; .txt passthrough; unknown formats raise
    the declared stub error."""
    import pytest

    from lucene_solr_ray.sources.loaders import load_rich_docs

    (tmp_path / "a.html").write_text(
        "<html><head><title>Doc &amp; Title</title>"
        "<style>body{color:red}</style></head>"
        "<body><h1>Hello</h1><script>var x=1;</script>"
        "<p>world &lt;tag&gt; text</p></body></html>")
    (tmp_path / "b.txt").write_text("plain text body")
    rows = {r["id"].rsplit("/", 1)[-1]: r
            for r in load_rich_docs(str(tmp_path)).take_all()}
    assert rows["a.html"]["title"] == "Doc & Title"
    assert rows["a.html"]["text"] == "Hello world <tag> text"
    assert rows["b.txt"]["text"] == "plain text body"

    (tmp_path / "c.pdf").write_bytes(b"%PDF-1.4 fake")
    with pytest.raises(Exception) as ei:
        load_rich_docs(str(tmp_path)).take_all()
    assert "no parser" in str(ei.value)


def test_rich_docs_markdown(ray_session, tmp_path):
    from lucene_solr_ray.sources.loaders import load_rich_docs

    md = """# Getting Started

Some **bold** and *emph* and `inline code` text.

- item one
- item two

> a quote line

```python
def f():
    return 1
```

See [the docs](https://example.com/x) and ![alt text](img.png).
"""
    (tmp_path / "doc.md").write_text(md)
    out = load_rich_docs(str(tmp_path)).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["title"] == "Getting Started"
    t = row["text"]
    for want in ("bold", "emph", "inline code", "item one",
                 "a quote line", "def f():", "the docs", "alt text"):
        assert want in t, want
    for gone in ("**", "```", "](", "# Getting"):
        assert gone not in t, gone
