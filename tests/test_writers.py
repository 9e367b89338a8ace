"""Response writers: JSON/CSV/XML/python/jsonl round-trips and escaping."""

import csv
import io
import json
import xml.etree.ElementTree as ET

import pyarrow as pa
import pytest

from lucene_solr_ray.sources import writers

T = pa.table({
    "doc_id": pa.array([1, 2], type=pa.int64()),
    "score": pa.array([1.5, 0.25], type=pa.float64()),
    "title": pa.array(['he said "<hi> & bye"', None]),
    "tags": pa.array([["a", "b"], []]),
})


def test_json_shape_and_roundtrip():
    out = json.loads(writers.write_json(T, qtime_ms=7, num_found=42))
    assert out["responseHeader"]["QTime"] == 7
    assert out["response"]["numFound"] == 42
    assert out["response"]["docs"][0]["doc_id"] == 1
    assert out["response"]["docs"][1]["title"] is None


def test_jsonl():
    lines = writers.write_jsonl(T).splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["tags"] == ["a", "b"]


def test_csv_roundtrip():
    out = writers.write_csv(T)
    rows = list(csv.reader(io.StringIO(out)))
    assert rows[0] == ["doc_id", "score", "title", "tags"]
    assert rows[1][3] == "a|b"  # multivalue separator
    assert rows[2][2] == ""     # null -> empty


def test_xml_parses_and_escapes():
    out = writers.write_xml(T, qtime_ms=3)
    root = ET.fromstring(out)
    result = root.find("result")
    assert result.get("numFound") == "2"
    docs = result.findall("doc")
    assert len(docs) == 2
    title = docs[0].find("str[@name='title']")
    assert title.text == 'he said "<hi> & bye"'
    assert docs[1].find("null[@name='title']") is not None


def test_python_writer_is_eval_able():
    out = writers.write_python(T)
    d = eval(out, {"__builtins__": {}}, {"None": None, "True": True,
                                         "False": False})
    assert d["response"]["docs"][0]["doc_id"] == 1


def test_raw_writer_concats():
    t = pa.table({"blob": pa.array([b"ab", None, b"cd"],
                                   type=pa.binary())})
    assert writers.write_raw(t, "blob") == b"abcd"


def test_dispatch_unknown_format():
    with pytest.raises(ValueError, match="unknown response format"):
        writers.write_response(T, "avro")
