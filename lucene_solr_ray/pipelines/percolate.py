"""Percolation: match a set of SAVED QUERIES against a document stream
(the MemoryIndex use case — ``lucene/memory/src/java/org/apache/lucene/
index/memory/MemoryIndex.java:78`` javadoc: a single-document in-memory
index "to search a query against one document", the pattern behind
percolator/alerting/topic-routing systems).

Ray-native inversion: instead of one MemoryIndex per document, the saved
queries are parsed once, broadcast via ``ray.put``, and each Arrow batch
is matched VECTORIZED:

- Term / boolean-of-terms / multi-term queries evaluate as document
  bitmasks from one exploded (doc, term) pass per batch — no per-doc
  work at all; multi-term (prefix/wildcard/fuzzy/regexp) expansion runs
  against the batch's distinct vocabulary.
- Positional or otherwise complex queries (phrases, spans) evaluate on
  the FEW candidate docs surviving a vectorized required-term prefilter,
  each through the shared oracle kernel (``search/oracle.py`` — the same
  control implementation every distributed query is diffed against),
  which accepts any Query the parser produces.

Output: one (id, query name) row per match — a routing table a training
pipeline can join/partition on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..search.query import (
    BooleanQuery,
    MatchNoDocs,
    MultiTermQuery,
    PhraseQuery,
    Query,
    TermQuery,
    expand_multi_term,
    parse_query,
)


def _mask_for(q: Query, term_docs: "pd.Series", n: int,
              vocab: list[str]) -> np.ndarray | None:
    """Vectorized match mask for the batch, or None when ``q`` needs the
    per-doc fallback (positional / unsupported shapes)."""
    if isinstance(q, TermQuery):
        mask = np.zeros(n, dtype=bool)
        docs = term_docs.get(q.term)
        if docs is not None:
            mask[docs] = True
        return mask
    if isinstance(q, MultiTermQuery):
        mask = np.zeros(n, dtype=bool)
        for t in expand_multi_term(q, vocab):
            docs = term_docs.get(t)
            if docs is not None:
                mask[docs] = True
        return mask
    if isinstance(q, BooleanQuery):
        parts_must, parts_should, parts_not = [], [], []
        for sub, bucket in ([(s, parts_must) for s in q.must]
                            + [(s, parts_should) for s in q.should]
                            + [(s, parts_not) for s in q.must_not]):
            m = _mask_for(sub, term_docs, n, vocab)
            if m is None:
                return None
            bucket.append(m)
        mask = np.ones(n, dtype=bool)
        for m in parts_must:
            mask &= m
        if parts_should:
            should_count = np.sum(parts_should, axis=0)
            needed = max(q.min_should_match, 0 if parts_must else 1)
            mask &= should_count >= needed
        for m in parts_not:
            mask &= ~m
        return mask
    if isinstance(q, MatchNoDocs):
        return np.zeros(n, dtype=bool)
    return None       # PhraseQuery / spans / anything positional


def _required_terms(q: Query) -> set[str] | None:
    """Terms every matching doc MUST contain (for the fallback
    prefilter), or None when no positive requirement can be derived."""
    if isinstance(q, TermQuery):
        return {q.term}
    if isinstance(q, PhraseQuery):
        return set(q.terms)
    if isinstance(q, BooleanQuery):
        req: set[str] = set()
        any_known = False
        for sub in q.must:
            r = _required_terms(sub)
            if r is not None:
                req |= r
                any_known = True
        if q.must:
            return req if any_known else None
        # pure-SHOULD: a doc needs >=1 should clause; the union of their
        # terms is required only if EVERY should clause yields terms
        opts: set[str] = set()
        for sub in q.should:
            r = _required_terms(sub)
            if r is None or not r:
                return None
            opts |= r
        return opts if opts else None
    return None


class _Percolator:
    """Actor: queries parsed once per worker from the broadcast set."""

    def __init__(self, queries_ref, text_field: str, id_field: str,
                 analyzer: str, scores: bool = False):
        import ray

        self.text_field = text_field
        self.id_field = id_field
        self.analyzer_name = analyzer
        self.scores = scores
        self.queries: dict[str, Query] = {
            name: parse_query(qs) for name, qs in
            ray.get(queries_ref).items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..search.oracle import OracleIndex
        from .textstats import _explode_terms

        n = len(t)
        # per-batch (doc, term) explode with the SAME analyzer semantics
        # the oracle uses (analyze() lowercases/stops identically for the
        # configured chain; _explode_terms is the simple chain)
        if self.analyzer_name == "simple":
            doc_idx, terms = _explode_terms(
                pa.table({"text": t.column(self.text_field)}))
        else:
            from ..analysis import get_analyzer
            an = get_analyzer(self.analyzer_name)
            di, tl = [], []
            for i, txt in enumerate(t.column(self.text_field).to_pylist()):
                for tok in an.analyze_terms(txt or ""):
                    di.append(i)
                    tl.append(tok)
            doc_idx = np.asarray(di, dtype=np.int64)
            terms = np.asarray(tl, dtype=object)
        pairs = pd.DataFrame({"doc": doc_idx, "term": terms})
        pairs = pairs.drop_duplicates()
        term_docs = pairs.groupby("term")["doc"].apply(
            lambda s: s.to_numpy())
        vocab = sorted(term_docs.index)

        ids = t.column(self.id_field)
        out_ids, out_names = [], []
        oracle_cache: dict[int, OracleIndex] = {}

        def one_doc_index(d: int) -> OracleIndex:
            if d not in oracle_cache:
                oi = OracleIndex(self.analyzer_name)
                oi.add(0, t.column(self.text_field)[d].as_py() or "")
                oracle_cache[d] = oi
            return oracle_cache[d]

        out_scores: list[float] = []
        for name, q in self.queries.items():
            mask = _mask_for(q, term_docs, n, vocab)
            if mask is None:
                req = _required_terms(q)
                if req is None:
                    cand = np.arange(n)
                else:
                    cm = np.ones(n, dtype=bool)
                    for rt in req:
                        m = np.zeros(n, dtype=bool)
                        docs = term_docs.get(rt)
                        if docs is not None:
                            m[docs] = True
                        cm &= m
                    cand = np.nonzero(cm)[0]
                mask = np.zeros(n, dtype=bool)
                for d in cand:
                    if one_doc_index(int(d)).search(q, k=1):
                        mask[d] = True
            hit = np.nonzero(mask)[0]
            out_ids.append(hit)
            out_names.extend([name] * len(hit))
            if self.scores:
                # MemoryIndex.java:91 semantics: each matched saved
                # query is scored against the ONE-DOC index built from
                # the matching document alone (N=1, df=1, avgdl=dl) —
                # the same BM25 kernel every searcher path pins to
                for d in hit:
                    res = one_doc_index(int(d)).search(q, k=1)
                    out_scores.append(float(res[0][1]) if res else 0.0)
        idx = (np.concatenate(out_ids) if out_ids
               else np.empty(0, dtype=np.int64))
        cols = {
            self.id_field: ids.take(pa.array(idx, type=pa.int64())),
            "query_name": pa.array(out_names, type=pa.string()),
        }
        if self.scores:
            cols["score"] = pa.array(out_scores, type=pa.float64())
        return pa.table(cols)


def percolate(ds: rd.Dataset, queries: dict[str, str], *,
              text_field: str = "text", id_field: str = "doc_id",
              analyzer: str = "standard",
              scores: bool = False) -> rd.Dataset:
    """Match every saved query against every document; returns the
    (id, query_name) routing table — plus a per-match BM25 score column
    when ``scores=True`` (MemoryIndex.java:91: the query scored against
    the one-document index, so N=1, df=1 and avgdl is the doc's own
    length). Queries broadcast once (ray.put), parsed once per actor;
    scoring cost is per MATCH, not per (doc x query)."""
    import ray

    queries_ref = ray.put(dict(queries))
    return ds.map_batches(
        _Percolator,
        fn_constructor_args=(queries_ref, text_field, id_field, analyzer,
                             scores),
        batch_format="pyarrow", concurrency=(1, 8), num_cpus=1)


SAVED_QUERIES = {
    "batch_and_filter": "batch AND filter",
    "scan_or_stream": "scan OR stream",
    "customer_not_slow": "customer -slow",
    "phrase_batch_filter": '"batch filter"',
}


def percolate_docs(sf_dir: str) -> rd.Dataset:
    """Driver query: route documents through four saved queries (term,
    AND, OR-with-exclusion, exact phrase) with the simple analyzer so a
    token-list SQL oracle is exact."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return percolate(ds, SAVED_QUERIES, analyzer="simple")


def percolate_scored_docs(sf_dir: str) -> rd.Dataset:
    """Driver query: the scored percolation routing table — one
    (doc_id, query_name, score) row per match, score = BM25 of the
    saved query against that document's one-doc index (MemoryIndex
    semantics; pinned bit-exact to the real searcher on a one-doc
    index in tests/test_percolate.py)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = percolate(ds, SAVED_QUERIES, analyzer="simple", scores=True)

    def rnd(t: pa.Table) -> pa.Table:
        from .util import round_col

        return round_col(t, "score", 6)

    return out.map_batches(rnd, batch_format="pyarrow")
