"""Response writers: serialize a result table + header into the wire
formats a reference user consumes.

Re-expressions of the Solr response-writer registry
(``solr/core/src/java/org/apache/solr/response/`` — JSONResponseWriter,
CSVResponseWriter.java, XMLWriter.java, PythonResponseWriter,
RawResponseWriter; the reference registers ~27 writers, most of which are
format variants of these four families). Each writer takes an Arrow table
(the engine's native result batch) plus the response header and returns
``str``/``bytes``; none of them touch Ray — serialization happens on the
already-small final result.
"""

from __future__ import annotations

import csv
import io
import json
from typing import Any

import pyarrow as pa


def _rows(table: pa.Table) -> list[dict[str, Any]]:
    return table.to_pylist()


def _header(qtime_ms: int = 0, status: int = 0,
            params: dict | None = None) -> dict:
    h = {"status": status, "QTime": int(qtime_ms)}
    if params:
        h["params"] = params
    return h


def write_json(table: pa.Table, *, num_found: int | None = None,
               start: int = 0, qtime_ms: int = 0,
               params: dict | None = None, indent: int | None = None) -> str:
    """Solr JSON wt=json shape: responseHeader + response{numFound,
    start, docs} (JSONResponseWriter.java)."""
    docs = _rows(table)
    payload = {
        "responseHeader": _header(qtime_ms, params=params),
        "response": {
            "numFound": len(docs) if num_found is None else int(num_found),
            "start": int(start),
            "docs": docs,
        },
    }
    return json.dumps(payload, indent=indent, default=str)


def write_jsonl(table: pa.Table) -> str:
    """One JSON object per row (the streaming-expression tuple stream
    shape, minus the EOF tuple)."""
    return "\n".join(json.dumps(r, default=str) for r in _rows(table))


def write_csv(table: pa.Table, *, separator: str = ",",
              header: bool = True) -> str:
    """wt=csv (CSVResponseWriter.java): header row + one line per doc;
    list values joined with '|' like the reference's mv separator."""
    buf = io.StringIO()
    w = csv.writer(buf, delimiter=separator, lineterminator="\n")
    names = table.column_names
    if header:
        w.writerow(names)
    for r in _rows(table):
        w.writerow(["|".join(str(x) for x in v) if isinstance(v, list)
                    else ("" if v is None else v) for v in
                    (r[n] for n in names)])
    return buf.getvalue()


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def _xml_field(name: str, value: Any, indent: str) -> str:
    n = _xml_escape(str(name))
    if value is None:
        return f'{indent}<null name="{n}"/>'
    if isinstance(value, bool):
        return f'{indent}<bool name="{n}">{str(value).lower()}</bool>'
    if isinstance(value, int):
        return f'{indent}<long name="{n}">{value}</long>'
    if isinstance(value, float):
        return f'{indent}<double name="{n}">{value}</double>'
    if isinstance(value, list):
        inner = "".join(_xml_field("item", v, "") for v in value)
        return f'{indent}<arr name="{n}">{inner}</arr>'
    return f'{indent}<str name="{n}">{_xml_escape(str(value))}</str>'


def write_xml(table: pa.Table, *, num_found: int | None = None,
              start: int = 0, qtime_ms: int = 0) -> str:
    """wt=xml (XMLWriter.java): <response><lst name="responseHeader">…
    <result name="response" numFound=… ><doc>…</doc></result>."""
    docs = _rows(table)
    nf = len(docs) if num_found is None else int(num_found)
    out = ['<?xml version="1.0" encoding="UTF-8"?>', "<response>",
           '<lst name="responseHeader">',
           '<int name="status">0</int>',
           f'<int name="QTime">{int(qtime_ms)}</int>', "</lst>",
           f'<result name="response" numFound="{nf}" start="{int(start)}">']
    for r in docs:
        out.append("<doc>")
        for k, v in r.items():
            out.append(_xml_field(k, v, ""))
        out.append("</doc>")
    out.append("</result>")
    out.append("</response>")
    return "\n".join(out)


def write_python(table: pa.Table, **kw) -> str:
    """wt=python (PythonResponseWriter.java): repr of the JSON payload."""
    return repr(json.loads(write_json(table, **kw)))


def write_raw(table: pa.Table, column: str) -> bytes:
    """RawResponseWriter analog: concatenate one binary/str column."""
    parts = []
    for v in table.column(column).to_pylist():
        if v is None:
            continue
        parts.append(v if isinstance(v, bytes) else str(v).encode("utf-8"))
    return b"".join(parts)


WRITERS = {
    "json": write_json,
    "jsonl": write_jsonl,
    "csv": write_csv,
    "xml": write_xml,
    "python": write_python,
}


def write_response(table: pa.Table, fmt: str, **kw):
    """Dispatch by wt= name (writer registry analog). Only the registry
    lookup is guarded — a KeyError raised INSIDE a writer is a real bug
    and must not be misreported as an unknown format."""
    try:
        writer = WRITERS[fmt]
    except KeyError:
        raise ValueError(f"unknown response format {fmt!r}; "
                         f"known: {sorted(WRITERS)}") from None
    return writer(table, **kw)
