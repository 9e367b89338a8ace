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

    # Build into a staging dir and rename atomically (the update.py
    # partition-swap pattern): a crashed build leaves only a staging
    # dir, never partial parquet inside out_dir for a rebuild to append
    # duplicate rows next to.
    import shutil

    out = Path(out_dir)
    staging = out.parent / f"{out.name}.staging.{os.getpid()}"
    if staging.exists():
        shutil.rmtree(staging)
    (ds.map_batches(explode, batch_format="pandas")
     .write_parquet(str(staging), partition_cols=["bucket"]))
    (staging / "_payload_meta.json").write_text(
        json.dumps({"n_buckets": _N_BUCKETS, "delimiter": delimiter}))
    if out.exists():  # a previous partial/complete build — replace whole
        shutil.rmtree(out)
    os.rename(staging, out)
    return out_dir


_PAYLOAD_FNS = {
    "max": lambda v: float(np.max(v)),
    "min": lambda v: float(np.min(v)),
    "average": lambda v: float(np.mean(v)),
    "sum": lambda v: float(np.sum(v)),
}


class PayloadIndex:
    """Query-side payload reader over the sidecar.

    The scoring path streams per-batch partial aggregates over the
    term's pruned bucket partition — max/min/sum/average are all
    decomposable into (count, sum, min, max), so no task ever holds the
    term's full (doc, position, payload) rows (PayloadScoreQuery.java:50
    semantics; the reference likewise folds payloads into the score one
    position at a time). Peak state is one parquet batch plus the
    per-doc 4-float accumulator; terms hotter than
    ``distributed_threshold`` rows go through a Ray Data
    map_batches-partial -> groupby pipeline instead so the accumulator
    itself is sharded."""

    def __init__(self, sidecar_dir: str,
                 distributed_threshold: int = 5_000_000):
        self.dir = str(sidecar_dir)
        self.distributed_threshold = distributed_threshold

    def _term_part(self, term: str) -> Path | None:
        bucket = int(_term_bucket(np.array([term], dtype=object))[0])
        part = Path(self.dir) / f"bucket={bucket}"
        return part if part.exists() else None

    def _iter_term_batches(self, term: str, batch_size: int = 65_536):
        """Stream (doc_id, payload) record batches for one term —
        partition-pruned to the term's bucket, row-filtered, column-
        pruned; never materializes the whole postings of the term."""
        import pyarrow.dataset as pads

        part = self._term_part(term)
        if part is None:
            return
        scanner = pads.dataset(str(part), format="parquet").scanner(
            columns=["doc_id", "payload"],
            filter=pads.field("term") == term,
            batch_size=batch_size)
        for b in scanner.to_batches():
            if b.num_rows:
                yield b

    def _bucket_rows(self, part: Path) -> int:
        """Row count of a bucket partition from parquet footers only."""
        total = 0
        for f in part.rglob("*.parquet"):
            total += pq.ParquetFile(f).metadata.num_rows
        return total

    def doc_aggregates(self, term: str, batch_size: int = 65_536):
        """Per-doc decomposable payload aggregates for one term:
        (doc_ids, count, sum, min, max) as sorted numpy arrays, built by
        merging per-batch partials (np.unique + bincount / ufunc.at)."""
        docs = np.empty(0, dtype=np.int64)
        cnt = np.empty(0, dtype=np.int64)
        sm = np.empty(0, dtype=np.float64)
        mn = np.empty(0, dtype=np.float64)
        mx = np.empty(0, dtype=np.float64)
        for b in self._iter_term_batches(term, batch_size):
            d = b.column("doc_id").to_numpy(zero_copy_only=False)
            p = b.column("payload").to_numpy(zero_copy_only=False)
            u, inv = np.unique(d, return_inverse=True)
            bc = np.bincount(inv, minlength=len(u)).astype(np.int64)
            bs = np.bincount(inv, weights=p, minlength=len(u))
            bmn = np.full(len(u), np.inf)
            np.minimum.at(bmn, inv, p)
            bmx = np.full(len(u), -np.inf)
            np.maximum.at(bmx, inv, p)
            # merge the batch partial into the running accumulator
            docs2, inv2 = np.unique(np.concatenate([docs, u]),
                                    return_inverse=True)
            n = len(docs2)
            cnt2 = np.zeros(n, dtype=np.int64)
            np.add.at(cnt2, inv2, np.concatenate([cnt, bc]))
            sm2 = np.zeros(n)
            np.add.at(sm2, inv2, np.concatenate([sm, bs]))
            mn2 = np.full(n, np.inf)
            np.minimum.at(mn2, inv2, np.concatenate([mn, bmn]))
            mx2 = np.full(n, -np.inf)
            np.maximum.at(mx2, inv2, np.concatenate([mx, bmx]))
            docs, cnt, sm, mn, mx = docs2, cnt2, sm2, mn2, mx2
        return docs, cnt, sm, mn, mx

    def doc_aggregates_distributed(self, term: str):
        """Hot-term path: the same decomposable partials, but as a Ray
        Data pipeline (map_batches partial -> groupby sum/min/max) so
        the per-doc accumulator is sharded across the cluster instead of
        living in one process."""
        import pyarrow.dataset as pads

        part = self._term_part(term)
        if part is None:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0), np.empty(0), np.empty(0))

        def partial(t: pa.Table) -> pa.Table:
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            p = t.column("payload").to_numpy(zero_copy_only=False)
            u, inv = np.unique(d, return_inverse=True)
            bc = np.bincount(inv, minlength=len(u)).astype(np.int64)
            bs = np.bincount(inv, weights=p, minlength=len(u))
            bmn = np.full(len(u), np.inf)
            np.minimum.at(bmn, inv, p)
            bmx = np.full(len(u), -np.inf)
            np.maximum.at(bmx, inv, p)
            return pa.table({"doc_id": pa.array(u),
                             "cnt": pa.array(bc),
                             "sm": pa.array(bs),
                             "mn": pa.array(bmn),
                             "mx": pa.array(bmx)})

        ds = (rd.read_parquet(str(part),
                              columns=["term", "doc_id", "payload"],
                              filter=pads.field("term") == term)
              .map_batches(lambda t: partial(t.drop_columns(["term"])),
                           batch_format="pyarrow")
              .groupby("doc_id")
              .aggregate(rd.aggregate.Sum("cnt", alias_name="cnt"),
                         rd.aggregate.Sum("sm", alias_name="sm"),
                         rd.aggregate.Min("mn", alias_name="mn"),
                         rd.aggregate.Max("mx", alias_name="mx")))
        t = pa.concat_tables(
            ds.iter_batches(batch_format="pyarrow", batch_size=None))
        docs = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(docs)
        return (docs[order].astype(np.int64),
                t.column("cnt").to_numpy(zero_copy_only=False)[order],
                t.column("sm").to_numpy(zero_copy_only=False)[order],
                t.column("mn").to_numpy(zero_copy_only=False)[order],
                t.column("mx").to_numpy(zero_copy_only=False)[order])

    def payloads_by_doc(self, term: str) -> dict[int, np.ndarray]:
        """Full per-doc payload vectors in position order (debug/feature
        API — the scoring path does NOT use this; it streams
        decomposable aggregates)."""
        import pyarrow.dataset as pads

        part = self._term_part(term)
        if part is None:
            return {}
        t = pads.dataset(str(part), format="parquet").to_table(
            columns=["doc_id", "position", "payload"],
            filter=pads.field("term") == term)
        if not t.num_rows:
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
        part = self._term_part(term)
        hot = (part is not None
               and self._bucket_rows(part) > self.distributed_threshold)
        docs, cnt, sm, mn, mx = (self.doc_aggregates_distributed(term)
                                 if hot else self.doc_aggregates(term))
        if len(docs) == 0:
            return []
        vals = {"max": mx, "min": mn, "sum": sm,
                "average": sm / np.maximum(cnt, 1)}[fn]
        if include_span_score:
            if searcher is None:
                raise ValueError("include_span_score needs a searcher")
            bm = dict(searcher.search(term, k=len(docs) + 16))
            vals = vals * np.asarray(
                [float(bm.get(int(d), 0.0)) for d in docs])
        order = np.lexsort((docs, -vals))[:k]
        return [(int(docs[i]), float(vals[i])) for i in order]


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
