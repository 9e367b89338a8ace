"""Payload analysis + payload-scored queries.

Re-expression of the reference payload surface:

- ``delimited_payload_tokens``: DelimitedPayloadTokenFilter
  (``lucene/analysis/common/.../payloads/DelimitedPayloadTokenFilter.java``)
  — ``term|1.5`` tokens split into (term, position, float payload).
- ``build_payload_sidecar`` / ``PayloadIndex``: where Lucene interleaves
  payload bytes into the positions stream (.pos, Lucene50PostingsWriter),
  this engine stores them Ray-Data-first: a parquet sidecar of
  (term, doc_id, position, payload) rows hash-bucketed by term next to
  the index — the partitioning assumption is the same one the postings
  shuffle already relies on (term-hash co-location), and a query reads
  only its term's bucket (column-pruned, partition-pruned).
- ``payload_score``: PayloadScoreQuery + PayloadFunction
  (``lucene/queries/src/java/org/apache/lucene/queries/payloads/
  PayloadScoreQuery.java:50``, ``MaxPayloadFunction`` /
  ``MinPayloadFunction`` / ``AveragePayloadFunction`` /
  ``SumPayloadFunction``): per matching doc, score = fn(payloads at the
  term's positions), optionally multiplied by the BM25 span score
  (``includeSpanScore``).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def delimited_payload_tokens(text: str, delimiter: str = "|",
                             analyzer_name: str = "standard"):
    """(terms, positions, payloads) with ``term|payload`` splitting BEFORE
    analysis (the filter sees the raw token, like the reference chain
    tokenizer -> delimited-payload); tokens without a payload get 0.0
    (the encoder's empty default)."""
    from ..analysis import get_analyzer

    analyzer = get_analyzer(analyzer_name)
    terms: list[str] = []
    positions: list[int] = []
    payloads: list[float] = []
    pos = 0
    for raw in text.split():
        body, _, pay = raw.partition(delimiter)
        sub_terms, sub_pos = analyzer.analyze(body)
        val = float(pay) if pay else 0.0
        for t, p in zip(sub_terms, sub_pos):
            terms.append(t)
            positions.append(pos + p)
            payloads.append(val)
        # advance by the analyzed width (stopword holes preserved)
        pos += (sub_pos[-1] + 1) if sub_pos else 1
    return terms, positions, payloads


_N_BUCKETS = 32


def _term_bucket(terms: np.ndarray) -> np.ndarray:
    import pandas as pd

    return (pd.util.hash_array(terms.astype(object))
            % np.uint64(_N_BUCKETS)).astype(np.int64)


def build_payload_sidecar(source, out_dir: str, text_col: str = "text",
                          id_col: str = "doc_id",
                          delimiter: str = "|") -> str:
    """Distributed sidecar build: one map_batches over the corpus emits
    (term, doc_id, position, payload) rows, written hash-bucketed by
    term (hive-partitioned parquet -> per-term partition pruning at
    query time)."""
    import pandas as pd

    ds = source if isinstance(source, rd.Dataset) else \
        rd.read_parquet(source, columns=[id_col, text_col])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        terms, docs, poss, pays = [], [], [], []
        for did, text in zip(batch[id_col], batch[text_col]):
            ts, ps, ys = delimited_payload_tokens(text, delimiter)
            terms.extend(ts)
            docs.extend([int(did)] * len(ts))
            poss.extend(ps)
            pays.extend(ys)
        out = pd.DataFrame({
            "term": pd.array(terms, dtype="string"),
            "doc_id": pd.array(docs, dtype="int64"),
            "position": pd.array(poss, dtype="int64"),
            "payload": pd.array(pays, dtype="float64"),
        })
        out["bucket"] = _term_bucket(out["term"].to_numpy())
        return out

    (ds.map_batches(explode, batch_format="pandas")
     .write_parquet(out_dir, partition_cols=["bucket"]))
    meta = Path(out_dir) / "_payload_meta.json"
    meta.write_text(json.dumps({"n_buckets": _N_BUCKETS,
                                "delimiter": delimiter}))
    return out_dir


_PAYLOAD_FNS = {
    "max": lambda v: float(np.max(v)),
    "min": lambda v: float(np.min(v)),
    "average": lambda v: float(np.mean(v)),
    "sum": lambda v: float(np.sum(v)),
}


class PayloadIndex:
    """Query-side payload reader over the sidecar."""

    def __init__(self, sidecar_dir: str):
        self.dir = str(sidecar_dir)

    def _term_rows(self, term: str):
        import pandas as pd
        import pyarrow.dataset as pads

        bucket = int(_term_bucket(np.array([term], dtype=object))[0])
        part = Path(self.dir) / f"bucket={bucket}"
        if not part.exists():
            return None
        t = pads.dataset(str(part), format="parquet").to_table(
            columns=["term", "doc_id", "position", "payload"],
            filter=pads.field("term") == term)
        return t if t.num_rows else None

    def payloads_by_doc(self, term: str) -> dict[int, np.ndarray]:
        t = self._term_rows(term)
        if t is None:
            return {}
        df = t.to_pandas().sort_values(["doc_id", "position"])
        return {int(d): g["payload"].to_numpy()
                for d, g in df.groupby("doc_id", sort=False)}

    def payload_score(self, term: str, fn: str = "max", k: int = 10,
                      searcher=None, include_span_score: bool = False):
        """PayloadScoreQuery top-k: (doc_id, score) by fn over the term's
        payloads per doc; with ``include_span_score`` the payload value
        multiplies the BM25 term score (PayloadScoreQuery's
        includeSpanScore=true composition)."""
        if fn not in _PAYLOAD_FNS:
            raise ValueError(f"unknown payload function {fn!r}; "
                             f"known: {sorted(_PAYLOAD_FNS)}")
        agg = _PAYLOAD_FNS[fn]
        by_doc = self.payloads_by_doc(term)
        scores = {d: agg(v) for d, v in by_doc.items()}
        if include_span_score:
            if searcher is None:
                raise ValueError("include_span_score needs a searcher")
            bm = dict(searcher.search(term, k=max(k, len(scores)) + 16))
            scores = {d: s * float(bm.get(d, 0.0))
                      for d, s in scores.items()}
        out = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(int(d), float(s)) for d, s in out[:k]]


def payload_avg_docs(sf_dir: str, term: str = "data"):
    """Driver-surface PayloadScoreQuery over deterministic synthetic
    payloads: every whitespace token of documents.text is annotated
    ``token|len(token)``, the term-bucketed sidecar is built (cached
    under /tmp keyed by a source content signature), and docs rank by
    the AVERAGE payload of ``term`` (AveragePayloadFunction; score desc,
    doc asc). SQL-oracled via a two-level unnest."""
    import hashlib

    import pandas as pd

    from ..pipelines.util import read, round_col

    st = os.stat(f"{sf_dir}/documents.parquet")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}"
        .encode()).hexdigest()[:12]
    out_dir = f"/tmp/lsr_payloads/{tag}"
    if not (Path(out_dir) / "_payload_meta.json").exists():
        ds = read(sf_dir, "documents", ["doc_id", "text"])

        def annotate(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": batch["doc_id"],
                "text": [" ".join(f"{w}|{len(w)}" for w in t.split())
                         for t in batch["text"]],
            })

        build_payload_sidecar(
            ds.map_batches(annotate, batch_format="pandas"), out_dir)
    idx = PayloadIndex(out_dir)
    hits = idx.payload_score(term, "average", k=1 << 30)
    t = pa.table({
        "doc_id": pa.array([d for d, _ in hits], type=pa.int64()),
        "avg_payload": pa.array([s for _, s in hits], type=pa.float64()),
    })
    return round_col(t, "avg_payload", 4)
