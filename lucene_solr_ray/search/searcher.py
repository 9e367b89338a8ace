"""Query engine over the sharded segment layout.

- ``ShardSearcher``: in-process search over one doc-shard (terms table +
  norms loaded once, term -> row dict — the stand-in for the FST term
  dictionary, BlockTreeTermsWriter.java:174-189). Scoring is vectorized
  float32 BM25 (SURVEY.md §3.2) using *global* term statistics supplied by
  the coordinator (Solr ExactStatsCache analog — required for
  rank-identity with a single-node index).
- ``IndexSearcher``: drives N shards (in-process or via a Ray actor pool,
  see actors.py), two-phase: (1) gather per-shard docFreq for the query's
  terms, sum to global stats; (2) scatter scoring, k-way merge of per-shard
  top-k by (score desc, doc_id asc) — equivalent to TopDocs.merge's
  (score, shardIndex, hit index) tie-break because shards own ascending
  disjoint doc_id ranges (TopDocs.java:199-215).

Boolean semantics: BooleanWeight sum-of-clause scores, MUST intersection
(ConjunctionDISI leapfrog -> vectorized sorted-array intersection), SHOULD
union (exhaustive scored disjunction — the reference snapshot has no WAND),
MUST_NOT exclusion (ReqExclScorer -> sorted-array difference). Clause
scores accumulate in clause order in float32, matching the oracle.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..index import segment
from . import bm25
from .query import (
    BooleanQuery,
    MatchNoDocs,
    MultiTermQuery,
    PhraseQuery,
    Query,
    TermQuery,
    expand_multi_term,
    parse_query,
)


class _Rev:
    """Descending-order wrapper for non-numeric sort keys. Compares
    smaller-than the missing-value sentinel (missing sorts last in either
    direction)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        if isinstance(other, _MissingLast):
            return True
        return other.v < self.v

    def __eq__(self, other):
        return isinstance(other, _Rev) and self.v == other.v


class _MissingLast:
    """Sentinel for docs without the sort field: sorts after every real
    value in either direction (TopFieldCollector missingValue, pinned to
    sort-missing-last)."""

    __slots__ = ()

    def __lt__(self, other):
        return False

    def __gt__(self, other):
        return not isinstance(other, _MissingLast)

    def __eq__(self, other):
        return isinstance(other, _MissingLast)


_MISSING_LAST = _MissingLast()


def _merge_sort_key(hit, sort):
    """Driver-side merge key for field-sorted shard hits
    (TopFieldCollector merge: field values, tie -> lower doc_id).
    Docs missing the field sort last in either direction."""
    doc_id, _, keys = hit
    out = []
    for (fld, desc), v in zip(sort, keys):
        if v is None:
            out.append(_MISSING_LAST)
        elif desc:
            out.append(-v if isinstance(v, (int, float, np.integer,
                                            np.floating)) else _Rev(v))
        else:
            out.append(v)
    out.append(doc_id)
    return tuple(out)


def collect_terms(q: Query) -> set[str]:
    from .query import (ConstantScoreQuery, DisMaxQuery, SpanFirstQuery,
                        SynonymQuery)

    if isinstance(q, TermQuery):
        return {q.term}
    if isinstance(q, SynonymQuery):
        return set(q.terms)
    from .query import MultiPhraseQuery

    if isinstance(q, MultiPhraseQuery):
        return {t for alts in q.slots for t in alts}
    from .query import BoostingQuery

    if isinstance(q, BoostingQuery):
        return collect_terms(q.match) | collect_terms(q.context)
    if isinstance(q, SpanFirstQuery):
        from .query import span_terms

        return span_terms(q)
    if isinstance(q, PhraseQuery):
        return set(q.terms)
    if isinstance(q, BooleanQuery):
        out: set[str] = set()
        for c in q.clauses():
            out |= collect_terms(c)
        return out
    if isinstance(q, DisMaxQuery):
        out = set()
        for c in q.clauses:
            out |= collect_terms(c)
        return out
    if isinstance(q, ConstantScoreQuery):
        return collect_terms(q.query)
    from .query import (SpanNearQuery, SpanNotQuery, SpanOrQuery,
                        SpanTermQuery, span_terms)

    if isinstance(q, (SpanTermQuery, SpanNearQuery, SpanOrQuery,
                      SpanNotQuery)):
        return span_terms(q)
    from .query import CommonTermsQuery

    if isinstance(q, CommonTermsQuery):
        return set(q.terms)
    from .query import ComplexPhraseQuery

    if isinstance(q, ComplexPhraseQuery):
        # plain-term phrase elements only: multi-term expansions are
        # per-shard (rewrite time), their stats resolve shard-locally
        out = set()
        for _, c in q.clauses:
            out |= collect_terms(c)
        return out
    return set()


class _TermDict:
    """Sorted term dictionary over the Arrow term column (SURVEY §7.6):
    lookups against the (almost zero-copy) string array instead of a
    Python dict of interned strings — an order of magnitude less
    resident memory per shard at 10^7-term vocabularies, identical API
    surface (get / in / [] / iteration in sorted order / items).

    Lookup is a vectorized ``np.searchsorted`` over an 8-byte big-endian
    prefix key per term (one uint64 each, built once from the Arrow
    buffers) followed by at most a short bytes-level bisect among terms
    sharing the prefix — no per-probe ``pa.Scalar``/``as_py`` boxing
    (r3 verdict, What's wrong #4)."""

    __slots__ = ("_arr", "_n", "_pfx", "_offs", "_data")

    def __init__(self, arr):
        self._arr = arr  # pa.StringArray, ascending
        self._n = n = len(arr)
        if n == 0:
            self._pfx = np.empty(0, dtype=np.uint64)
            self._offs = np.zeros(1, dtype=np.int64)
            self._data = memoryview(b"")
            return
        raw_offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)
        offs = raw_offs[arr.offset:arr.offset + n + 1].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        self._offs = offs
        self._data = data
        lens = np.diff(offs)
        pfx = np.zeros((n, 8), dtype=np.uint8)
        starts = offs[:-1]
        for k in range(8):
            m = lens > k
            pfx[m, k] = data[starts[m] + k]
        self._pfx = pfx.reshape(-1).view(">u8").astype(np.uint64).ravel()

    def _term_bytes(self, i: int) -> bytes:
        return self._data[self._offs[i]:self._offs[i + 1]].tobytes()

    def get(self, term, default=None):
        if self._n == 0:
            return default
        tb = term.encode() if isinstance(term, str) else bytes(term)
        key = int.from_bytes(tb[:8].ljust(8, b"\0"), "big")
        lo = int(np.searchsorted(self._pfx, key, side="left"))
        hi = int(np.searchsorted(self._pfx, key, side="right"))
        while lo < hi:  # bisect among same-prefix terms (usually 0-2)
            mid = (lo + hi) // 2
            if self._term_bytes(mid) < tb:
                lo = mid + 1
            else:
                hi = mid
        if lo < self._n and self._term_bytes(lo) == tb:
            return lo
        return default

    def __contains__(self, term):
        return self.get(term) is not None

    def __getitem__(self, term):
        i = self.get(term)
        if i is None:
            raise KeyError(term)
        return i

    def __iter__(self):
        for i in range(self._n):
            yield self._arr[i].as_py()

    def __len__(self):
        return self._n

    def items(self):
        for i in range(self._n):
            yield self._arr[i].as_py(), i

    def seq(self):
        """Index-addressed view (sequence protocol) for bisect-based
        expansion without materializing the vocabulary."""
        return _TermSeq(self._arr, self._n)


class _TermSeq:
    __slots__ = ("_arr", "_n")

    def __init__(self, arr, n):
        self._arr = arr
        self._n = n

    def __len__(self):
        return self._n

    def __getitem__(self, i):
        return self._arr[i].as_py()


class ShardSearcher:
    """Search over one shard; all postings/norms held in memory."""

    def __init__(self, index_dir: str, shard_id: int,
                 manifest: dict | None = None, similarity: str = "bm25"):
        index_path = Path(index_dir)
        if manifest is None:
            manifest = json.loads((index_path / "manifest.json").read_text())
        self.shard_id = shard_id
        self.index_dir = str(index_dir)
        params = manifest["params"]
        stats = manifest["stats"]
        self.docs_per_shard = params["docs_per_shard"]
        self._codec = params.get("postings_codec", "varint")
        self.base = shard_id * self.docs_per_shard
        self.doc_count = stats["doc_count"]
        self.num_docs_total = stats["num_docs"]
        self.avgdl = np.float32(stats["avgdl"])
        self.cache = bm25.norm_cache(self.avgdl)
        # query-time pluggable scoring (Similarity SPI: IndexSearcher.
        # setSimilarity); the MaxScore pruning path stays BM25-only.
        # A callable acts as a factory (avgdl -> sim) for similarities
        # with custom parameters (e.g. SweetSpotSim settings).
        self.sim = similarity(self.avgdl) if callable(similarity) \
            else bm25.make_similarity(similarity, self.avgdl)

        terms_file = index_path / "shards" / f"shard={shard_id:05d}" / "terms.parquet"
        if terms_file.exists():
            t = pq.read_table(terms_file)
            self._terms = _TermDict(t.column("term").combine_chunks())
            self._df = t.column("df").to_numpy(zero_copy_only=False)
            self._ttf = t.column("ttf").to_numpy(zero_copy_only=False)
            self._doc_enc = t.column("doc_ids_enc").to_pylist()
            self._freq_enc = t.column("freqs_enc").to_pylist()
            self._pos_enc = t.column("positions_enc").to_pylist()
            self._skip_last = t.column("skip_last_docs").to_pylist()
            self._skip_offs = t.column("skip_doc_offs").to_pylist()
            self._skip_foffs = t.column("skip_freq_offs").to_pylist()
            self._bmaxf = t.column("block_max_freq").to_pylist()
            self._bminnt = t.column("block_min_nt").to_pylist()
        else:  # empty shard
            self._terms = _TermDict(pa.array([], type=pa.string()))
            self._df = np.empty(0, dtype=np.int64)
            self._ttf = np.empty(0, dtype=np.int64)
            self._doc_enc = []
            self._freq_enc = []
            self._pos_enc = []
            self._skip_last = []
            self._skip_offs = []
            self._skip_foffs = []
            self._bmaxf = []
            self._bminnt = []

        # live-docs mask (tombstones from delete/overwrite-by-id;
        # IndexWriter.deleteDocuments analog — deleted docs are masked out
        # of every query, stats keep counting them until a merge)
        self._deleted: np.ndarray | None = None
        deletes_file = index_path / "_DELETES.json"
        if deletes_file.exists():
            dels = np.asarray(json.loads(deletes_file.read_text())["doc_ids"],
                              dtype=np.int64)
            local = dels[(dels >= self.base)
                         & (dels < self.base + self.docs_per_shard)]
            if len(local):
                self._deleted = np.zeros(self.docs_per_shard, dtype=bool)
                self._deleted[local - self.base] = True

        self._decode_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        # Heal a crashed atomic-update partition swap BEFORE loading
        # norms: a .dvold-* aside with a missing live partition would
        # otherwise read as all-zero norms / all-None docvalues and
        # silently corrupt BM25 scores, sorts, facets and stats.
        segment.recover_norms_partitions(index_path)
        norms_part = index_path / "norms" / f"doc_shard={shard_id}"
        self.norms = np.zeros(self.docs_per_shard, dtype=np.uint8)
        if terms_file.exists() and not norms_part.exists():
            raise FileNotFoundError(
                f"norms partition missing for doc_shard={shard_id} "
                f"(postings present) — index corrupt beyond .dvold "
                f"recovery: {norms_part}")
        if norms_part.exists():
            nt = pq.read_table(norms_part, columns=["doc_id", "norm_byte"])
            ids = nt.column("doc_id").to_numpy(zero_copy_only=False)
            vals = nt.column("norm_byte").to_numpy(zero_copy_only=False)
            self.norms[ids - self.base] = vals

    def explain(self, q: Query, doc_id: int,
                df_map: dict[str, int]) -> dict | None:
        """Score explanation tree (Explanation.java / Solr debugQuery):
        {value, description, details}. None when the doc doesn't match.
        Leaf terms break the BM25 product into boost/idf/tf components
        (BM25Similarity.explainScore); composite nodes explain as the
        sum/max structure their scorer uses. Non-decomposable scorers
        (phrases, spans, rewrites) report their computed value with a
        one-line description."""
        docs, scores = self._score_clause(q, df_map)
        i = int(np.searchsorted(docs, doc_id))
        if i >= len(docs) or docs[i] != doc_id:
            return None
        value = float(scores[i])
        from .query import (BoostingQuery, ConstantScoreQuery,
                            DisMaxQuery, SynonymQuery)

        if isinstance(q, TermQuery):
            df = df_map.get(q.term, 0)
            idf_v = float(self.sim.idf(df, self.doc_count))
            p = self._postings(q.term)
            j = int(np.searchsorted(p[0], doc_id))
            freq = int(p[1][j])
            norm_byte = int(self.norms[doc_id - self.base])
            return {
                "value": value,
                "description": f"weight(text:{q.term} in {doc_id}) "
                               f"[{type(self.sim).__name__}], product of:",
                "details": [
                    {"value": float(q.boost), "description": "boost"},
                    {"value": idf_v,
                     "description": f"idf(docFreq={df}, "
                                    f"docCount={self.doc_count})"},
                    {"value": value / (float(q.boost) * idf_v)
                     if q.boost and idf_v else 0.0,
                     "description": f"tf(freq={freq}), norm_byte="
                                    f"{norm_byte}"},
                ],
            }
        if isinstance(q, SynonymQuery):
            return {"value": value,
                    "description": f"SynonymQuery({','.join(q.terms)}): "
                                   "blended max-df, summed freq",
                    "details": []}
        if isinstance(q, BooleanQuery):
            details = []
            for c in q.must + q.should:
                sub = self.explain(c, doc_id, df_map)
                if sub is not None:
                    details.append(sub)
            return {"value": value, "description": "sum of:",
                    "details": details}
        if isinstance(q, DisMaxQuery):
            details = [s for c in q.clauses
                       if (s := self.explain(c, doc_id, df_map))]
            return {"value": value,
                    "description": f"max plus {q.tie_breaker} times "
                                   "others of:",
                    "details": details}
        if isinstance(q, ConstantScoreQuery):
            return {"value": value,
                    "description": f"ConstantScore({q.boost})",
                    "details": []}
        return {"value": value,
                "description": f"{type(q).__name__} score",
                "details": []}

    def docvalues_local(self, field: str, docs: np.ndarray) -> np.ndarray:
        """Shard-local doc-value lookup for the given doc_ids."""
        if not hasattr(self, "_dv_cols"):
            self._dv_cols: dict[str, np.ndarray] = {}
        if field not in self._dv_cols:
            part = Path(self.index_dir) / "norms" / f"doc_shard={self.shard_id}"
            arr = np.empty(self.docs_per_shard, dtype=object)
            first = next(part.glob("*.parquet"), None) \
                if part.exists() else None
            if first is not None and field in pq.read_schema(first).names:
                t = pq.read_table(part, columns=["doc_id", field])
                ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                arr[ids - self.base] = np.asarray(
                    t.column(field).to_pylist(), dtype=object)
            # unknown field: all-None column (exists()=0 semantics)
            self._dv_cols[field] = arr
        return self._dv_cols[field][docs - self.base]

    def boundary_convs(self) -> list[str]:
        """conv_id of this shard's first and last doc — the only
        conversations that can straddle a shard edge. doc_id is rank
        under the stable (conv_id, turn_idx) sort (BASELINE.json
        input_hint), so each conversation is doc-contiguous and at most
        these two can have turns in a neighbouring shard. Used by the
        bounded conv/collapse partials (actors.py) to ship split
        conversations unconditionally."""
        arr = self.docvalues_local(
            "conv_id", np.arange(self.base, self.base + self.docs_per_shard))
        present = np.flatnonzero(arr != None)  # noqa: E711
        if len(present) == 0:
            return []
        return [str(arr[present[0]]), str(arr[present[-1]])]

    # --- phase 1: local term stats ---
    def local_df(self, terms: list[str]) -> dict[str, int]:
        return {t: int(self._df[self._terms[t]]) for t in terms if t in self._terms}

    def local_ttf(self, terms: list[str]) -> dict[str, int]:
        """Per-term total term frequency on this shard
        (TotalTermFreqValueSource's per-segment contribution)."""
        return {t: int(self._ttf[self._terms[t]])
                for t in terms if t in self._terms}

    def local_termfreq(self, term: str, docs: np.ndarray) -> np.ndarray:
        """tf of ``term`` in each of ``docs`` (global ids on this shard),
        0 where absent (TermFreqValueSource semantics)."""
        out = np.zeros(len(docs), dtype=np.float64)
        p = self._postings(term)
        if p is None or len(docs) == 0:
            return out
        pdocs, freqs = p[0], p[1]
        j = np.searchsorted(pdocs, docs)
        jc = np.minimum(j, len(pdocs) - 1)
        ok = (j < len(pdocs)) & (pdocs[jc] == docs)
        out[ok] = freqs[jc[ok]]
        return out

    def term_vector(self, doc_id: int) -> list[tuple[str, int, list[int]]]:
        """Per-doc (term, freq, positions) vector
        (``solr/core/.../handler/component/TermVectorComponent.java:79``).

        The index is postings-only (no forward term-vector file, unlike
        Lucene's optional .tvd), so this inverts the shard's term
        dictionary for one doc: terms are pruned by their last-doc skip
        metadata, then binary-searched in the decoded doc list. O(vocab)
        per call — a debugging/feature API; a production variant at
        10^12 docs would persist a forward vector file at build time.
        """
        if self._deleted is not None and self._deleted[doc_id - self.base]:
            return []
        out = []
        for term, i in self._terms.items():
            last = segment.decode_skip_last_docs(self._skip_last[i])
            if len(last) and int(last[-1]) < doc_id:
                continue
            p = self._postings(term)
            docs, freqs = p[0], p[1]
            j = int(np.searchsorted(docs, doc_id))
            if j >= len(docs) or docs[j] != doc_id:
                continue
            flat, offs = segment.decode_positions(self._pos_enc[i], freqs, self._codec)
            out.append((term, int(freqs[j]),
                        [int(x) for x in flat[offs[j]:offs[j + 1]]]))
        out.sort()
        return out

    def positions_of(self, term: str, doc_id: int) -> list[int]:
        """Positions of one TERM in one DOC (a single term-dict probe +
        postings decode — candidate-scale, unlike term_vector's
        O(vocab) inversion). The offsets-based highlighter maps these
        through the build-time offsets sidecar to char spans without
        re-analyzing the text (PostingsHighlighter.java:100)."""
        if self._deleted is not None and self._deleted[doc_id - self.base]:
            return []
        i = self._terms.get(term)
        if i is None:
            return []
        p = self._postings(term)
        if p is None:
            return []
        docs, freqs = p[0], p[1]
        j = int(np.searchsorted(docs, doc_id))
        if j >= len(docs) or docs[j] != doc_id:
            return []
        flat, offs = segment.decode_positions(self._pos_enc[i], freqs,
                                              self._codec)
        return [int(x) for x in flat[offs[j]:offs[j + 1]]]

    # --- postings access (decode results cached: LRUQueryCache analog,
    # search/LRUQueryCache.java) ---
    _CACHE_MAX = 1024

    def _postings(self, term: str):
        i = self._terms.get(term)
        if i is None:
            return None
        cached = self._decode_cache.get(term)
        if cached is None:
            docs = segment.decode_doc_ids(self._doc_enc[i], self.base,
                                         self._codec)
            freqs = segment.decode_freqs(self._freq_enc[i], self._codec)
            if len(self._decode_cache) >= self._CACHE_MAX:
                self._decode_cache.pop(next(iter(self._decode_cache)))
            cached = (docs, freqs)
            self._decode_cache[term] = cached
        return cached[0], cached[1], i

    def _live(self, docs: np.ndarray, scores: np.ndarray):
        """Drop tombstoned docs (liveDocs mask)."""
        if self._deleted is None or len(docs) == 0:
            return docs, scores
        keep = ~self._deleted[docs - self.base]
        return docs[keep], scores[keep]

    # --- phase 2: scoring with global stats ---
    def _score_term(self, q: TermQuery, df_map: dict[str, int]):
        p = self._postings(q.term)
        if p is None:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        docs, freqs, _ = p
        w = self.sim.weight(
            self.sim.idf(df_map.get(q.term, 0), self.doc_count), q.boost)
        scores = self.sim.score(freqs, self.norms[docs - self.base], w)
        return self._live(docs, scores)

    def _score_phrase(self, q: PhraseQuery, df_map: dict[str, int]):
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        plists = []
        for t in q.terms:
            p = self._postings(t)
            if p is None:
                return empty
            plists.append(p)
        # conjunction over doc ids, tracking row indices per term
        docs = plists[0][0]
        idxs = [np.arange(len(docs))]
        for d2, _, _ in plists[1:]:
            docs, ia, ib = np.intersect1d(docs, d2, assume_unique=True,
                                          return_indices=True)
            idxs = [ix[ia] for ix in idxs]
            idxs.append(ib)
        if len(docs) == 0:
            return empty
        rel = q.positions
        if q.slop > 0:
            return self._finish_sloppy_phrase(q, df_map, docs, idxs, plists)
        # vectorized exact-phrase counting across ALL candidate docs at once
        # (ExactPhraseScorer semantics): composite (local_doc << 32 | pos)
        # keys make per-doc position membership a single global searchsorted.
        flat0, offs0 = segment.decode_positions(
            self._pos_enc[plists[0][2]], plists[0][1], self._codec)
        ix0 = idxs[0]
        starts, ends = offs0[ix0], offs0[ix0 + 1]
        lens = (ends - starts).astype(np.int64)
        total = int(lens.sum())
        seg_offs = np.concatenate(([0], np.cumsum(lens)))
        gather = (np.repeat(starts, lens)
                  + (np.arange(total) - np.repeat(seg_offs[:-1], lens)))
        p0 = flat0[gather].astype(np.int64)
        local0 = np.repeat(docs - self.base, lens).astype(np.int64)
        mask = np.ones(total, dtype=bool)
        for t_i in range(1, len(plists)):
            d_i, f_i, row_i = plists[t_i]
            flat_i, _ = segment.decode_positions(self._pos_enc[row_i], f_i,
                                                    self._codec)
            doc_of_pi = np.repeat(d_i - self.base, f_i).astype(np.int64)
            keys_i = (doc_of_pi << 32) | flat_i.astype(np.int64)
            tpos = p0 - rel[0] + rel[t_i]
            target = (local0 << 32) | np.maximum(tpos, 0)
            loc = np.searchsorted(keys_i, target)
            ok = (loc < len(keys_i)) & (tpos >= 0)
            ok[ok] = keys_i[loc[ok]] == target[ok]
            mask &= ok
            if not mask.any():
                return empty
        phrase_freqs = np.add.reduceat(mask.astype(np.int64), seg_offs[:-1])
        keep = phrase_freqs > 0
        docs = docs[keep]
        pf = phrase_freqs[keep]
        w = self._phrase_weight(q, df_map)
        scores = self.sim.score(pf, self.norms[docs - self.base], w)
        return self._live(docs, scores)

    def _phrase_weight(self, q: PhraseQuery, df_map: dict[str, int]):
        sum_idf = np.float32(0.0)
        for t in q.terms:
            sum_idf = np.float32(
                sum_idf + self.sim.idf(df_map.get(t, 0), self.doc_count))
        return self.sim.weight(sum_idf, q.boost)

    def _finish_sloppy_phrase(self, q: PhraseQuery, df_map: dict[str, int],
                              docs: np.ndarray, idxs: list, plists: list):
        """SloppyPhraseScorer path: conjunction candidates from the exact
        machinery, per-doc phraseFreq via the shared pq kernel
        (query.sloppy_phrase_freq — identical code runs in the oracle)."""
        from .query import sloppy_phrase_freq

        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        decoded = []
        for t_i, (d_i, f_i, row_i) in enumerate(plists):
            flat_i, offs_i = segment.decode_positions(
                self._pos_enc[row_i], f_i, self._codec)
            decoded.append((flat_i, offs_i))
        rel = list(q.positions)
        pf = np.zeros(len(docs), dtype=np.float64)
        for j in range(len(docs)):
            pls = []
            for t_i in range(len(plists)):
                ix = int(idxs[t_i][j])
                flat_i, offs_i = decoded[t_i]
                pls.append(flat_i[offs_i[ix]:offs_i[ix + 1]])
            pf[j] = sloppy_phrase_freq(pls, rel, q.slop)
        keep = pf > 0
        if not keep.any():
            return empty
        docs = docs[keep]
        w = self._phrase_weight(q, df_map)
        scores = self.sim.score(pf[keep], self.norms[docs - self.base], w)
        return self._live(docs, scores)

    def _score_multi_phrase(self, q, df_map: dict[str, int]):
        """MultiPhraseQuery scorer (MultiPhraseQuery.java:47 /
        UnionPostingsEnum): per slot, union the alternatives' decoded
        positions; candidates = docs where EVERY slot has some
        alternative; freq = exact alignment count (slop=0) or
        sloppy_phrase_freq; weight sums idf over all terms in slot
        order (same float32 accumulation as the oracle)."""
        from .query import sloppy_phrase_freq

        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        cands = None
        slot_entries = []
        for alts in q.slots:
            entries = []
            docs_union = []
            for t in alts:
                p = self._postings(t)
                if p is None:
                    continue
                d_i, f_i, row_i = p
                flat, offs = segment.decode_positions(
                    self._pos_enc[row_i], f_i, self._codec)
                entries.append((d_i, flat, offs))
                docs_union.append(d_i)
            if not entries:
                return empty
            u = docs_union[0] if len(docs_union) == 1 else \
                np.unique(np.concatenate(docs_union))
            cands = u if cands is None else \
                np.intersect1d(cands, u, assume_unique=True)
            if len(cands) == 0:
                return empty
            slot_entries.append(entries)
        rel = list(q.positions)
        pf = np.zeros(len(cands), dtype=np.float64)
        for j, d in enumerate(cands):
            pls = []
            for entries in slot_entries:
                pos = []
                for d_i, flat, offs in entries:
                    i = int(np.searchsorted(d_i, d))
                    if i < len(d_i) and d_i[i] == d:
                        pos.append(flat[offs[i]:offs[i + 1]])
                merged = pos[0] if len(pos) == 1 else \
                    np.unique(np.concatenate(pos))
                pls.append(np.asarray(merged, dtype=np.int64))
            if q.slop == 0:
                starts = pls[0] - rel[0]
                for k in range(1, len(pls)):
                    starts = starts[np.isin(starts + rel[k], pls[k])]
                    if len(starts) == 0:
                        break
                pf[j] = float(len(starts))
            else:
                pf[j] = sloppy_phrase_freq(pls, rel, q.slop)
        keep = pf > 0
        if not keep.any():
            return empty
        docs, f = cands[keep], pf[keep]
        sum_idf = np.float32(0.0)
        for alts in q.slots:
            for t in alts:
                sum_idf = np.float32(
                    sum_idf + self.sim.idf(df_map.get(t, 0),
                                           self.doc_count))
        w = self.sim.weight(sum_idf, q.boost)
        scores = self.sim.score(f, self.norms[docs - self.base], w)
        return self._live(docs, scores)

    def _score_synonym(self, q, df_map: dict[str, int]):
        """SynonymQuery scorer (SynonymQuery.java:228-249): one pseudo-
        term — weight from max df over the synonyms, per-doc freq = sum
        of the synonyms' freqs."""
        plists = [p for p in (self._postings(t) for t in q.terms)
                  if p is not None]
        if not plists:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float32))
        all_docs = plists[0][0] if len(plists) == 1 else \
            np.unique(np.concatenate([d for d, _, _ in plists]))
        freq = np.zeros(len(all_docs), dtype=np.int64)
        for d_i, f_i, _ in plists:
            idx = np.searchsorted(all_docs, d_i)
            freq[idx] += f_i
        max_df = max(df_map.get(t, 0) for t in q.terms)
        w = self.sim.weight(self.sim.idf(max_df, self.doc_count), q.boost)
        scores = self.sim.score(freq, self.norms[all_docs - self.base], w)
        return self._live(all_docs, scores)

    def _score_multi_term(self, q: MultiTermQuery):
        """CONSTANT_SCORE_REWRITE over the shard's term dictionary: union
        of matching terms' postings, every doc scored with the boost."""
        terms = expand_multi_term(q, self._terms.seq())
        if not terms:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float32))
        doc_sets = [self._postings(t)[0] for t in terms]
        docs = doc_sets[0] if len(doc_sets) == 1 else \
            np.unique(np.concatenate(doc_sets))
        return self._live(
            docs, np.full(len(docs), np.float32(q.boost), dtype=np.float32))

    def _score_clause(self, q: Query, df_map: dict[str, int]):
        if isinstance(q, TermQuery):
            return self._score_term(q, df_map)
        from .query import BoostingQuery, MultiPhraseQuery, SynonymQuery

        if isinstance(q, SynonymQuery):
            return self._score_synonym(q, df_map)
        if isinstance(q, MultiPhraseQuery):
            return self._score_multi_phrase(q, df_map)
        if isinstance(q, BoostingQuery):
            # BoostingQuery.java:106-130: match set unchanged, context
            # matches get score *= negative_boost
            docs, scores = self._score_clause(q.match, df_map)
            if len(docs):
                ctx_docs, _ = self._score_clause(q.context, df_map)
                demote = np.isin(docs, ctx_docs, assume_unique=True)
                scores = np.where(
                    demote,
                    (scores.astype(np.float32)
                     * np.float32(q.negative_boost)).astype(np.float32),
                    scores).astype(np.float32)
            return docs, scores
        if isinstance(q, PhraseQuery):
            return self._score_phrase(q, df_map)
        if isinstance(q, MultiTermQuery):
            return self._score_multi_term(q)
        if isinstance(q, BooleanQuery):
            return self._score_boolean(q, df_map)
        if isinstance(q, MatchNoDocs):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        from .query import MatchAllDocsQuery

        if isinstance(q, MatchAllDocsQuery):
            # norms is padded to docs_per_shard; clamp to real docs
            n = min(len(self.norms),
                    max(0, self.num_docs_total - self.base))
            docs = self.base + np.arange(n, dtype=np.int64)
            return self._live(docs, np.full(len(docs), np.float32(q.boost),
                                            dtype=np.float32))
        from .query import (ConstantScoreQuery, DisMaxQuery, SpanFirstQuery,
                            SpanNearQuery, SpanNotQuery, SpanOrQuery,
                            SpanTermQuery)

        if isinstance(q, SpanFirstQuery):
            if q.query is not None:  # wraps a composite span query
                return self._score_span(q, df_map)
            return self._score_span_first(q, df_map)
        if isinstance(q, (SpanTermQuery, SpanNearQuery, SpanOrQuery,
                          SpanNotQuery)):
            return self._score_span(q, df_map)
        if isinstance(q, ConstantScoreQuery):
            docs, _ = self._score_clause(q.query, df_map)
            return docs, np.full(len(docs), np.float32(q.boost),
                                 dtype=np.float32)
        if isinstance(q, DisMaxQuery):
            return self._score_dismax(q, df_map)
        from .query import ComplexPhraseQuery, rewrite_complex_phrase

        if isinstance(q, ComplexPhraseQuery):
            # ComplexPhraseQuery.rewrite against THIS shard's term dict
            # (the reference rewrites per IndexReader the same way)
            return self._score_clause(
                rewrite_complex_phrase(q, self._terms.seq()), df_map)
        raise TypeError(f"unsupported query node: {type(q)}")

    def _span_candidates(self, q) -> np.ndarray:
        """Docs that can possibly match a span query (conjunction for
        near, union for or, include side for not) — the per-doc kernel
        only ever runs on these."""
        from .query import (SpanFirstQuery, SpanNearQuery, SpanNotQuery,
                            SpanOrQuery, SpanTermQuery)

        if isinstance(q, SpanFirstQuery) and q.query is not None:
            return self._span_candidates(q.query)
        if isinstance(q, (SpanTermQuery, SpanFirstQuery)):
            p = self._postings(q.term)
            return p[0] if p is not None else np.empty(0, dtype=np.int64)
        if isinstance(q, SpanNearQuery):
            docs = self._span_candidates(q.clauses[0])
            for c in q.clauses[1:]:
                docs = np.intersect1d(docs, self._span_candidates(c),
                                      assume_unique=True)
            return docs
        if isinstance(q, SpanOrQuery):
            sets = [self._span_candidates(c) for c in q.clauses]
            return (np.unique(np.concatenate(sets)) if sets
                    else np.empty(0, dtype=np.int64))
        if isinstance(q, SpanNotQuery):
            return self._span_candidates(q.include)
        raise TypeError(type(q))

    def _score_span(self, q, df_map: dict[str, int]):
        """SpanScorer over the shared span kernel (query.span_spans):
        freq = sum of 1/(1+width) per match (computeSlopFactor), weight =
        summed idf of the query's term contexts
        (SpanWeight.buildSimWeight)."""
        from .query import (rewrite_span_multiterms, span_freq,
                            span_has_multiterm, span_terms)

        if span_has_multiterm(q):
            # SpanMultiTermQueryWrapper rewrite against THIS shard's
            # term dictionary (surround truncations)
            q = rewrite_span_multiterms(q, self._terms.seq())
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        docs = self._span_candidates(q)
        if len(docs) == 0:
            return empty
        # per-term decoded position lookups for the candidate docs
        leaf: dict[str, tuple] = {}
        for t in span_terms(q):
            p = self._postings(t)
            if p is None:
                leaf[t] = None
                continue
            d_i, f_i, row_i = p
            flat, offs = segment.decode_positions(self._pos_enc[row_i], f_i,
                                                    self._codec)
            leaf[t] = (d_i, flat, offs)
        freqs = np.zeros(len(docs), dtype=np.float64)
        for j, d in enumerate(docs):
            def pos_of(term, _d=d):
                ent = leaf.get(term)
                if ent is None:
                    return None
                d_i, flat, offs = ent
                i = int(np.searchsorted(d_i, _d))
                if i >= len(d_i) or d_i[i] != _d:
                    return None
                return flat[offs[i]:offs[i + 1]]

            freqs[j] = span_freq(q, pos_of)
        keep = freqs > 0
        if not keep.any():
            return empty
        docs, f = docs[keep], freqs[keep]
        sum_idf = np.float32(0.0)
        for t in sorted(span_terms(q)):
            df = df_map.get(t)
            if df is None:
                # term came from a rewrite-time expansion (complex
                # phrase): resolve its stats shard-locally
                p = self._postings(t)
                df = len(p[0]) if p is not None else 0
            sum_idf = np.float32(
                sum_idf + self.sim.idf(df, self.doc_count))
        w = self.sim.weight(sum_idf, q.boost)
        scores = self.sim.score(f, self.norms[docs - self.base], w)
        return self._live(docs, scores)

    def _score_span_first(self, q, df_map: dict[str, int]):
        """SpanFirstQuery: freq = positions < end, vectorized via the
        decoded position stream + reduceat over posting boundaries."""
        p = self._postings(q.term)
        if p is None:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        docs, freqs, row = p
        flat, offs = segment.decode_positions(self._pos_enc[row], freqs,
                                                self._codec)
        hits = (flat < q.end).astype(np.int64)
        f = np.add.reduceat(hits, offs[:-1]) if len(flat) else \
            np.zeros(len(docs), dtype=np.int64)
        keep = f > 0
        docs, f = docs[keep], f[keep]
        w = self.sim.weight(
            self.sim.idf(df_map.get(q.term, 0), self.doc_count), q.boost)
        scores = self.sim.score(f, self.norms[docs - self.base], w)
        return self._live(docs, scores)

    def _score_dismax(self, q, df_map: dict[str, int]):
        """DisjunctionMaxScorer: float32 max + float64 sum per doc, final
        (float)(max + (sum - max) * tieBreaker)."""
        per = [self._score_clause(c, df_map) for c in q.clauses]
        per = [(d, s) for d, s in per if len(d)]
        if not per:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        all_docs = np.unique(np.concatenate([d for d, _ in per]))
        smax = np.zeros(len(all_docs), dtype=np.float32)
        ssum = np.zeros(len(all_docs), dtype=np.float64)
        for d2, s2 in per:
            idx = np.searchsorted(all_docs, d2)
            ssum[idx] += s2.astype(np.float64)
            np.maximum.at(smax, idx, s2)
        scores = (smax.astype(np.float64)
                  + (ssum - smax.astype(np.float64)) * q.tie_breaker
                  ).astype(np.float32)
        return all_docs, scores

    def _score_boolean(self, q: BooleanQuery, df_map: dict[str, int]):
        must = [self._score_clause(c, df_map) for c in q.must]
        should = [self._score_clause(c, df_map) for c in q.should]
        msm = getattr(q, "min_should_match", 0)
        if must:
            docs, scores = must[0]
            scores = scores.copy()
            for d2, s2 in must[1:]:
                docs, ia, ib = np.intersect1d(docs, d2, assume_unique=True,
                                              return_indices=True)
                scores = (scores[ia] + s2[ib]).astype(np.float32)
            n_should_hits = np.zeros(len(docs), dtype=np.int64)
            for d2, s2 in should:
                pos = np.searchsorted(d2, docs)
                pos_ok = pos < len(d2)
                hit = np.zeros(len(docs), dtype=bool)
                hit[pos_ok] = d2[pos[pos_ok]] == docs[pos_ok]
                add = np.zeros(len(docs), dtype=np.float32)
                add[hit] = s2[pos[hit]]
                scores = (scores + add).astype(np.float32)
                n_should_hits += hit
            if msm > 0:  # MinShouldMatchSumScorer: >= msm SHOULD clauses
                keep = n_should_hits >= msm
                docs, scores = docs[keep], scores[keep]
        else:
            all_docs = np.unique(np.concatenate([d for d, _ in should])) \
                if should else np.empty(0, dtype=np.int64)
            scores = np.zeros(len(all_docs), dtype=np.float32)
            n_should_hits = np.zeros(len(all_docs), dtype=np.int64)
            for d2, s2 in should:
                idx = np.searchsorted(all_docs, d2)
                scores[idx] = (scores[idx] + s2).astype(np.float32)
                n_should_hits[idx] += 1
            docs = all_docs
            if msm > 1:  # pure-should already requires >= 1 match
                keep = n_should_hits >= msm
                docs, scores = docs[keep], scores[keep]
        for c in q.must_not:
            d2, _ = self._score_clause(c, df_map)
            if len(d2):
                keep = ~np.isin(docs, d2, assume_unique=True)
                docs, scores = docs[keep], scores[keep]
        return docs, scores

    # --- Block-Max / MaxScore disjunction path -------------------------
    # Rank-preserving pruning for pure term disjunctions (SURVEY.md §7.6:
    # "Block-Max WAND added as a rank-preserving optimization with exact
    # fallback asserted in tests"). MaxScore variant: terms are processed
    # in decreasing score-upper-bound order; once the suffix bound falls
    # strictly below a safe lower estimate of the running k-th score, the
    # remaining terms stop contributing NEW candidate docs, and their
    # contributions to existing candidates are read via block-selective
    # decode (skip data). A final pass rescores candidates in ORIGINAL
    # clause order in float32, so results are bit-identical to the
    # exhaustive scorer.

    def _term_upper_bound(self, row: int, w64: float) -> float:
        from ..util import varint as _vi

        maxf = float(_vi.decode(self._bmaxf[row]).max())
        min_nt = float(np.frombuffer(self._bminnt[row], dtype=np.float32).min())
        k1, b = float(bm25.K1), float(bm25.B)
        cache_min = k1 * ((1 - b) + b * min_nt / float(self.avgdl))
        return w64 * maxf / (maxf + cache_min) * (1 + 1e-6)

    def _freqs_for_docs(self, term: str, docs: np.ndarray):
        """(sub_docs, sub_freqs) covering every hit of ``term`` among
        ``docs``, decoding only the 128-doc blocks that can contain them."""
        row = self._terms[term]
        last = segment.decode_skip_last_docs(self._skip_last[row])
        nblocks = len(last)
        if nblocks <= 2:
            d, f, _ = self._postings(term)
            return d, f
        need = np.unique(np.searchsorted(last, docs))
        need = need[need < nblocks]
        if len(need) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        doffs = segment.decode_skip_doc_offs(self._skip_offs[row])
        foffs = segment.decode_skip_doc_offs(self._skip_foffs[row])
        df = int(self._df[row])
        parts_d, parts_f = [], []
        for bi in need:
            prev = int(last[bi - 1]) if bi > 0 else self.base
            bd, bf = segment.decode_block(
                self._doc_enc[row], self._freq_enc[row],
                doffs, foffs, int(bi), nblocks, df, prev,
                self._codec)
            parts_d.append(bd)
            parts_f.append(bf)
        return np.concatenate(parts_d), np.concatenate(parts_f)

    @staticmethod
    def _is_pure_term_disjunction(query: Query) -> bool:
        return (isinstance(query, BooleanQuery) and not query.must
                and not query.must_not and len(query.should) >= 2
                and getattr(query, "min_should_match", 0) <= 1
                and all(isinstance(c, TermQuery) for c in query.should))

    def _score_disjunction_maxscore(self, query: BooleanQuery,
                                    df_map: dict[str, int], k: int):
        should = [q for q in query.should if q.term in self._terms]
        if not should:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        w32 = [bm25.weight_value(
            bm25.idf(df_map.get(q.term, 0), self.doc_count), q.boost)
            for q in should]
        ubs = np.array([
            self._term_upper_bound(self._terms[q.term], float(w))
            for q, w in zip(should, w32)])
        order = np.argsort(-ubs)
        suffix = np.concatenate((np.cumsum(ubs[order][::-1])[::-1], [0.0]))

        cand = np.empty(0, dtype=np.int64)
        approx = np.empty(0, dtype=np.float64)
        essential: set[int] = set()
        theta = -np.inf
        for pos, ti in enumerate(order):
            if len(cand) >= k and suffix[pos] < theta:
                break
            essential.add(int(ti))
            d, s = self._score_term(should[ti], df_map)
            merged = np.union1d(cand, d)
            new_approx = np.zeros(len(merged), dtype=np.float64)
            new_approx[np.searchsorted(merged, cand)] = approx
            new_approx[np.searchsorted(merged, d)] += s.astype(np.float64)
            cand, approx = merged, new_approx
            if len(cand) >= k:
                kth = np.partition(approx, len(approx) - k)[len(approx) - k]
                theta = kth * (1 - 1e-5)  # safe lower estimate

        # exact float32 rescore of candidates in ORIGINAL clause order
        acc = np.zeros(len(cand), dtype=np.float32)
        for ti, q in enumerate(should):
            w = w32[ti]
            if ti in essential:
                d, s = self._score_term(q, df_map)
            else:
                sub_d, sub_f = self._freqs_for_docs(q.term, cand)
                d = sub_d
                s = bm25.score_freqs(sub_f, self.norms[d - self.base],
                                     self.cache, w) if len(d) else \
                    np.empty(0, dtype=np.float32)
            pos_idx = np.searchsorted(cand, d)
            ok = pos_idx < len(cand)
            hit = np.zeros(len(d), dtype=bool)
            hit[ok] = cand[pos_idx[ok]] == d[ok]
            add = np.zeros(len(cand), dtype=np.float32)
            add[pos_idx[hit]] = s[hit]
            acc = (acc + add).astype(np.float32)
        return cand, acc

    @staticmethod
    def _range_mask(vals: np.ndarray, lo, hi) -> np.ndarray:
        """Inclusive-range membership over a doc-value array (None = open
        bound; docs missing the field never match — PointRangeQuery
        semantics over docvalues)."""
        try:
            v = vals.astype(np.float64)
            mask = ~np.isnan(v)
            if lo is not None:
                mask &= v >= lo
            if hi is not None:
                mask &= v <= hi
            return mask
        except (TypeError, ValueError):
            out = np.ones(len(vals), dtype=bool)
            for i, v in enumerate(vals):
                if v is None or (lo is not None and v < lo) \
                        or (hi is not None and v > hi):
                    out[i] = False
            return out

    def _apply_filter(self, docs, scores, filter_range):
        for fld, (lo, hi) in filter_range.items():
            if len(docs) == 0:
                break
            vals = self.docvalues_local(fld, docs)
            keep = self._range_mask(vals, lo, hi)
            docs, scores = docs[keep], scores[keep]
        return docs, scores

    def search(self, query: Query, df_map: dict[str, int], k: int = 10,
               use_maxscore: bool = True, sort=None, filter_range=None,
               after: tuple[float, int] | None = None):
        """Top-k for this shard: (doc_id, score) ranked by score, or
        (doc_id, score, sort_key_tuple) ranked by ``sort`` — a list of
        (docvalue_field, descending) pairs (TopFieldCollector.java:1), tie
        -> lower doc_id. ``filter_range`` = {field: (lo, hi)} intersects
        the hit set with inclusive docvalue ranges (IntPoint /
        PointRangeQuery analog) BEFORE ranking."""
        if (use_maxscore and sort is None and not filter_range
                and after is None and self.sim.name == "bm25"
                and self._is_pure_term_disjunction(query)):
            docs, scores = self._score_disjunction_maxscore(query, df_map, k)
        else:
            docs, scores = self._score_clause(query, df_map)
        if filter_range:
            docs, scores = self._apply_filter(docs, scores, filter_range)
        if after is not None:
            # searchAfter (IndexSearcher.searchAfter / cursorMark over the
            # default score-desc, doc-asc sort): keep hits strictly after
            # the cursor in rank order
            if sort is not None:
                raise ValueError("after paging is defined on the score "
                                 "ranking; combine field sort with "
                                 "filter_range paging instead")
            a_score = np.float32(after[0])
            a_doc = np.int64(after[1])
            s32 = scores.astype(np.float32)
            keep = (s32 < a_score) | ((s32 == a_score) & (docs > a_doc))
            docs, scores = docs[keep], scores[keep]
        if len(docs) == 0:
            return []
        if sort:
            val_arrays = [self.docvalues_local(fld, docs)
                          for fld, _ in sort]
            lex_keys = []
            for (fld, desc), vals in zip(sort, val_arrays):
                missing = vals == None  # noqa: E711 — elementwise object cmp
                filled = vals.copy()
                filled[missing] = 0.0
                try:
                    key = filled.astype(np.float64)
                except (TypeError, ValueError):
                    _, inv = np.unique(filled.astype(str),
                                       return_inverse=True)
                    key = inv.astype(np.float64)
                key = -key if desc else key
                # missing docvalues sort last in either direction
                # (pinned missingValue semantics, matching _merge_sort_key)
                key[missing] = np.inf
                lex_keys.append(key)
            order = np.lexsort(tuple([docs] + lex_keys[::-1]))[:k]
            return [(int(docs[i]), np.float32(scores[i]),
                     tuple(v[i] for v in val_arrays)) for i in order]
        if len(docs) > k:
            # partial selection; keep every doc tied with the k-th score so
            # the lower-doc_id tie-break stays exact, then sort the slice
            kth = scores[np.argpartition(-scores, k - 1)[k - 1]]
            cand = scores >= kth
            docs, scores = docs[cand], scores[cand]
        order = np.lexsort((docs, -scores.astype(np.float32)))[:k]
        return [(int(docs[i]), np.float32(scores[i])) for i in order]


class IndexSearcher:
    """Single-process searcher over all shards (tests / small indexes)."""

    def __init__(self, index_dir: str, similarity: str = "bm25"):
        self.index_dir = str(index_dir)
        self._offsets_files: dict = {}  # parquet handle cache (metadata)
        self.manifest = json.loads(
            (Path(index_dir) / "manifest.json").read_text())
        shard_ids = [s["shard_id"] for s in self.manifest["shards"]]
        self.similarity = similarity
        self.shards = [
            ShardSearcher(self.index_dir, sid, self.manifest,
                          similarity=similarity)
            for sid in sorted(shard_ids)
        ]
        self.analyzer_name = self.manifest["params"]["analyzer"]

    def parse(self, text: str) -> Query:
        from ..analysis import get_analyzer

        return parse_query(text, get_analyzer(self.analyzer_name))

    def parse_complex(self, text: str) -> Query:
        """ComplexPhraseQueryParser surface: phrases may embed
        wildcards / fuzzy / ranges / OR groups / negation."""
        from ..analysis import get_analyzer
        from .query import parse_complex_phrase

        return parse_complex_phrase(text, get_analyzer(self.analyzer_name))

    _docmap_cache: np.ndarray | None = None
    _docvalue_cache: dict | None = None

    def docvalues(self, field: str) -> np.ndarray | None:
        """Per-doc metadata column indexed by doc_id (doc-values analog);
        None if the field was not present at index time."""
        if self._docvalue_cache is None:
            self._docvalue_cache = {}
        if field not in self._docvalue_cache:
            import pyarrow.dataset as pads

            dset = pads.dataset(str(Path(self.index_dir) / "norms"),
                                format="parquet", partitioning="hive")
            if field not in dset.schema.names:
                self._docvalue_cache[field] = None
            else:
                t = dset.to_table(columns=["doc_id", field])
                ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                arr = np.empty(self.manifest["stats"]["num_docs"], dtype=object)
                arr[ids] = np.asarray(t.column(field).to_pylist(), dtype=object)
                self._docvalue_cache[field] = arr
        return self._docvalue_cache[field]

    def facet(self, query: Query | str, field: str,
              limit: int | None = None,
              prefix: str = "") -> list[tuple[str, int]]:
        """Field facet counts over the query's FULL result set
        (SimpleFacets.java:102-417 semantics: count desc, then value asc,
        optional limit; ``prefix`` = facet.prefix value filtering)."""
        from .features import _all_hits

        values = self.docvalues(field)
        if values is None:
            raise KeyError(f"field {field!r} was not indexed as a doc value")
        docs, _ = _all_hits(self, query)
        if len(docs) == 0:
            return []
        vals = values[docs]
        # docs without the field are omitted, not counted as a 'None'
        # bucket (SimpleFacets missing-value semantics)
        vals = vals[vals != None]  # noqa: E711 — elementwise object compare
        if len(vals) == 0:
            return []
        uniq, counts = np.unique(vals.astype(str), return_counts=True)
        if prefix:
            keep = np.char.startswith(uniq.astype(str), prefix)
            uniq, counts = uniq[keep], counts[keep]
            if len(uniq) == 0:
                return []
        order = np.lexsort((uniq, -counts))
        out = [(str(uniq[i]), int(counts[i])) for i in order]
        return out[:limit] if limit else out

    def term_offsets(self, doc_ids: list[int]
                     ) -> dict[int, tuple[list[int], list[int]]]:
        """Per-doc raw-token char spans from the build-time offsets
        sidecar (``store_offsets=True`` builds; PostingsHighlighter's
        stored-offsets analog, doc-major). Pushdown read — only row
        groups containing the requested page of hits decompress."""
        import pyarrow.dataset as pads

        p = Path(self.index_dir) / "offsets"
        if not p.exists():
            return {}
        # prune at the directory level first (doc ranges map to shard
        # dirs), then let doc_id row-group stats prune inside the files
        dps = int(self.manifest["params"]["docs_per_shard"])
        want = sorted({int(d) for d in doc_ids})
        dirs = sorted({p / f"shard={d // dps:05d}" for d in want})
        files = sorted(str(f) for d in dirs if d.exists()
                       for f in d.glob("*.parquet"))
        if not files:
            return {}
        # manual row-group pruning (doc_id min/max stats): the generic
        # dataset filter path decodes far more than the hit page needs
        # on wide list columns; offsets files are written with 32-row
        # groups so each hit costs one small row-group decode
        want_arr = np.asarray(want, dtype=np.int64)
        out: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        import pyarrow.parquet as _pq

        for f in files:
            pf = self._offsets_files.get(f)
            if pf is None:
                pf = self._offsets_files[f] = _pq.ParquetFile(f)
            md = pf.metadata
            idx_col = pf.schema_arrow.get_field_index("doc_id")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx_col).statistics
                if st is not None and not (
                        (want_arr >= st.min) & (want_arr <= st.max)).any():
                    continue
                t = pf.read_row_group(rg)
                ids = t.column("doc_id").to_numpy()
                sel = np.nonzero(np.isin(ids, want_arr))[0]
                for i in sel:
                    spans = np.frombuffer(
                        t.column("spans")[i].as_buffer(), dtype="<i4")
                    half = len(spans) // 2
                    out[int(ids[i])] = (spans[:half], spans[half:])
        return out

    def term_vectors(self, doc_ids: list[int]
                     ) -> dict[int, list[tuple[str, int, list[int]]]]:
        """TermVectorComponent: (term, freq, positions) per requested doc
        (typically the current page of hits)."""
        by_id = {sh.shard_id: sh for sh in self.shards}
        out: dict[int, list] = {}
        for d in doc_ids:
            sh = by_id.get(int(d) // self.shards[0].docs_per_shard)
            out[int(d)] = sh.term_vector(int(d)) if sh is not None else []
        return out

    def spellcheck(self, term: str, k: int = 5,
                   max_edits: int = 2) -> list[tuple[str, int]]:
        """Did-you-mean suggestions (SpellCheckComponent /
        DirectSpellChecker analog, ``solr/core/.../handler/component/
        SpellCheckComponent.java``, ``lucene/suggest/.../DirectSpellChecker``):
        index terms within Damerau-OSA edit distance <= max_edits of the
        input, ranked by (distance asc, global docFreq desc, term asc).
        The input term itself is excluded."""
        from .query import FuzzyQuery, expand_multi_term, levenshtein_within

        agg: dict[str, int] = {}
        for sh in self.shards:
            for t in expand_multi_term(
                    FuzzyQuery(term=term, max_edits=max_edits),
                    sh._terms.seq()):
                if t == term:
                    continue
                agg[t] = agg.get(t, 0) + int(sh._df[sh._terms[t]])

        def dist(t: str) -> int:
            for d in range(1, max_edits + 1):
                if levenshtein_within(term, t, d):
                    return d
            return max_edits

        ranked = sorted(agg.items(), key=lambda kv: (dist(kv[0]), -kv[1],
                                                     kv[0]))
        return ranked[:k]

    def spellcheck_collate(self, query_text: str, max_tries: int = 5,
                           k_sugg: int = 3) -> dict | None:
        """Collation (``solr/core/src/java/org/apache/solr/spelling/
        SpellCheckCollator.java:69`` collate(), the ``collate=true``
        response): substitute suggestions for the query's zero-docFreq
        words, re-run the rewritten query, and return the first
        collation that yields hits — ``{"collation", "hits", "tries"}``
        — or None after ``max_tries`` rewrites."""
        from .features import _all_hits

        return collate_walk(
            self, query_text, max_tries, k_sugg,
            lambda q: int(len(_all_hits(self, q)[0])))



    def terms(self, prefix: str = "", regex: str | None = None,
              limit: int = 10, sort: str = "count") -> list[tuple[str, int]]:
        """TermsComponent (``solr/core/.../handler/component/
        TermsComponent.java``): enumerate index terms with global docFreq,
        filtered by prefix and/or regex, sorted by count desc (value asc
        ties) or by value ('index' order)."""
        import re as _re

        rx = _re.compile(regex) if regex else None
        agg: dict[str, int] = {}
        for sh in self.shards:
            for t, i in sh._terms.items():
                if prefix and not t.startswith(prefix):
                    continue
                if rx is not None and not rx.fullmatch(t):
                    continue
                agg[t] = agg.get(t, 0) + int(sh._df[i])
        if sort == "index":
            ranked = sorted(agg.items())
        else:
            ranked = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:limit]

    def suggest(self, prefix: str, k: int = 5) -> list[tuple[str, int]]:
        """Prefix suggestions ranked by global docFreq (TermsComponent /
        suggester analog over the term dictionary)."""
        from .query import PrefixQuery, expand_multi_term

        agg: dict[str, int] = {}
        for sh in self.shards:
            for t in expand_multi_term(PrefixQuery(prefix=prefix),
                                       sh._terms.seq()):
                agg[t] = agg.get(t, 0) + int(sh._df[sh._terms[t]])
        ranked = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def docmap(self) -> np.ndarray:
        """conv_id per doc_id (lazy; used by block-join / result display)."""
        if self._docmap_cache is None:
            import pyarrow.dataset as pads

            t = pads.dataset(str(Path(self.index_dir) / "norms"),
                             format="parquet", partitioning="hive").to_table(
                columns=["doc_id", "conv_id"])
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            arr = np.empty(self.manifest["stats"]["num_docs"], dtype=object)
            arr[ids] = np.asarray(t.column("conv_id").to_pylist(), dtype=object)
            self._docmap_cache = arr
        return self._docmap_cache

    def global_df(self, query: Query) -> dict[str, int]:
        terms = sorted(collect_terms(query))
        df: dict[str, int] = {}
        for sh in self.shards:
            for t, d in sh.local_df(terms).items():
                df[t] = df.get(t, 0) + d
        return df

    def search(self, query: Query | str, k: int = 10, sort=None,
               filter_range=None, after=None):
        """Top-k across shards. ``sort``: [(docvalue_field, descending)]
        replaces score ranking (TopFieldCollector / Sort); ``filter_range``:
        {field: (lo, hi)} inclusive docvalue ranges composed with the query
        (numeric point/range filtering); ``after``: (score, doc_id) cursor
        for deep paging (IndexSearcher.searchAfter). Returns
        (doc_id, score) pairs."""
        if isinstance(query, str):
            query = self.parse(query)
        df_map = self.global_df(query)
        from .query import CommonTermsQuery, rewrite_common_terms

        if isinstance(query, CommonTermsQuery):
            # df split needs GLOBAL stats, so rewrite on the driver
            query = rewrite_common_terms(
                query, df_map, self.manifest["stats"]["num_docs"])
        hits = []
        for sh in self.shards:
            hits.extend(sh.search(query, df_map, k, sort=sort,
                                  filter_range=filter_range, after=after))
        if sort:
            hits.sort(key=lambda h: _merge_sort_key(h, sort))
            return [(d, s) for d, s, _ in hits[:k]]
        hits.sort(key=lambda h: (-float(h[1]), h[0]))
        return hits[:k]

    def explain(self, query: Query | str, doc_id: int) -> dict | None:
        """Explanation tree for one document's score (IndexSearcher.
        explain / Solr debugQuery): routed to the shard owning the doc
        (doc-range sharding makes it derivable), scored with the same
        GLOBAL stats the search path uses, so the explained value equals
        the served score bit-for-bit. None if the doc doesn't match."""
        if isinstance(query, str):
            query = self.parse(query)
        df_map = self.global_df(query)
        from .query import CommonTermsQuery, rewrite_common_terms

        if isinstance(query, CommonTermsQuery):
            query = rewrite_common_terms(
                query, df_map, self.manifest["stats"]["num_docs"])
        sid = int(doc_id) // self.shards[0].docs_per_shard
        if sid >= len(self.shards):
            return None
        return self.shards[sid].explain(query, int(doc_id), df_map)

    def search_after(self, query: Query | str, k: int = 10, cursor=None):
        """cursorMark-style page fetch: returns (hits, next_cursor);
        next_cursor is None when the result set is exhausted. Unlike
        offset paging, each page costs one (pruned) search — no
        re-collection of the skipped prefix on the shards."""
        hits = self.search(query, k=k, after=cursor)
        if not hits:
            return [], None
        last = hits[-1]
        nxt = (float(last[1]), int(last[0])) if len(hits) == k else None
        return hits, nxt

    def resolve_hits(self, hits):
        """(doc_id, score) list -> rows with the docmap identity columns
        (the stored-fields fetch phase, PURPOSE_GET_FIELDS analog —
        QueryComponent.java:748,766; full stored fields live in the source
        Parquet, addressable by (conv_id, turn_idx))."""
        import pyarrow.dataset as pads

        ids = [d for d, _ in hits]
        if not ids:
            return []
        t = pads.dataset(str(Path(self.index_dir) / "norms"),
                         format="parquet", partitioning="hive").to_table(
            columns=["doc_id", "conv_id", "turn_idx"],
            filter=pads.field("doc_id").isin(ids))
        lookup = {r["doc_id"]: (r["conv_id"], r["turn_idx"])
                  for r in t.to_pylist()}
        return [
            {"doc_id": d, "score": float(s),
             "conv_id": lookup[d][0], "turn_idx": lookup[d][1]}
            for d, s in hits
        ]


def collate_walk(searcher, query_text: str, max_tries: int,
                 k_sugg: int, count_hits) -> dict | None:
    """The SpellCheckCollator walk shared by the in-process and
    distributed searchers: find zero-df words, substitute ranked
    suggestions (best everywhere first, then one word at a time moves
    to its next-ranked alternative), return the first rewrite whose
    ``count_hits(collation)`` is positive."""
    from ..analysis import get_analyzer

    analyzer = get_analyzer(searcher.analyzer_name)
    chunks = query_text.split()
    misspelled: list[tuple[int, str, list[str]]] = []
    for i, ch in enumerate(chunks):
        if ch.upper() in ("AND", "OR", "NOT") or not ch.isalnum():
            continue
        terms, _ = analyzer.analyze(ch)
        if len(terms) != 1:
            continue
        if searcher.global_df(TermQuery(terms[0])).get(terms[0], 0) == 0:
            sugg = [t for t, _ in searcher.spellcheck(terms[0],
                                                      k=k_sugg)]
            if not sugg:
                return None  # unfixable word: no collation possible
            misspelled.append((i, terms[0], sugg))
    if not misspelled:
        return None  # nothing to collate (SpellCheckCollator no-op)

    def candidates():
        yield [0] * len(misspelled)
        for depth in range(1, k_sugg):
            for which in range(len(misspelled)):
                if depth < len(misspelled[which][2]):
                    pick = [0] * len(misspelled)
                    pick[which] = depth
                    yield pick

    tries = 0
    for pick in candidates():
        if tries >= max_tries:
            break
        tries += 1
        new_chunks = list(chunks)
        for (i, _, sugg), j in zip(misspelled, pick):
            new_chunks[i] = sugg[j]
        collation = " ".join(new_chunks)
        hits = count_hits(collation)
        if hits > 0:
            return {"collation": collation, "hits": int(hits),
                    "tries": tries}
    return None


class MultiIndexSearcher:
    """MultiReader analog (``lucene/core/src/java/org/apache/lucene/index/
    MultiReader.java:43`` + BaseCompositeReader's docBase arithmetic):
    search several standalone indexes as ONE logical index without
    merging — sub-index i's documents appear at
    ``[base_i, base_i + num_docs_i)`` where ``base_i`` is the sum of the
    preceding indexes' maxDocs, exactly the reference's sub-reader doc
    base. Query-time statistics (docFreq, docCount,
    sumTotalTermFreq → avgdl) are the COMBINED values, so scores are
    bit-equal to an ``add_indexes``-merged index (asserted in tests);
    each sub-index keeps its own ``num_docs`` for layout (MatchAllDocs
    clamping). Analyzers must match — the same compatible-schema rule
    ``add_indexes`` enforces. The federation is the query side of
    ``split_index``: split a hot index, keep serving both halves as one.
    """

    def __init__(self, index_dirs, similarity: str = "bm25"):
        if not index_dirs:
            raise ValueError("MultiIndexSearcher needs >= 1 index")
        self.manifests = [
            json.loads((Path(d) / "manifest.json").read_text())
            for d in index_dirs]
        analyzers = {m["params"]["analyzer"] for m in self.manifests}
        if len(analyzers) != 1:
            raise ValueError(
                f"sub-index analyzers must match, got {sorted(analyzers)}")
        self.analyzer_name = analyzers.pop()
        num = sum(m["stats"]["num_docs"] for m in self.manifests)
        dc = sum(m["stats"]["doc_count"] for m in self.manifests)
        ttf = sum(m["stats"]["sum_total_term_freq"] for m in self.manifests)
        avgdl = float(bm25.avg_field_length(ttf, max(dc, 1)))
        self.manifest = {"params": self.manifests[0]["params"],
                         "stats": {"num_docs": num, "doc_count": dc,
                                   "sum_total_term_freq": ttf,
                                   "avgdl": avgdl}}
        self.subs = []
        base = 0
        for d, m in zip(index_dirs, self.manifests):
            patched = {**m, "stats": {**m["stats"], "doc_count": dc,
                                      "sum_total_term_freq": ttf,
                                      "avgdl": avgdl}}
            shards = [ShardSearcher(str(d), sid, patched,
                                    similarity=similarity)
                      for sid in sorted(s["shard_id"]
                                        for s in m["shards"])]
            self.subs.append((str(d), base, m, shards))
            base += int(m["stats"]["num_docs"])

    def parse(self, text: str) -> Query:
        from ..analysis import get_analyzer

        return parse_query(text, get_analyzer(self.analyzer_name))

    def parse_complex(self, text: str) -> Query:
        from ..analysis import get_analyzer
        from .query import parse_complex_phrase

        return parse_complex_phrase(text, get_analyzer(self.analyzer_name))

    def global_df(self, query: Query) -> dict[str, int]:
        terms = sorted(collect_terms(query))
        df: dict[str, int] = {}
        for _, _, _, shards in self.subs:
            for sh in shards:
                for t, d in sh.local_df(terms).items():
                    df[t] = df.get(t, 0) + d
        return df

    def search(self, query: Query | str, k: int = 10, sort=None,
               filter_range=None, after=None):
        if isinstance(query, str):
            query = self.parse(query)
        df_map = self.global_df(query)
        from .query import CommonTermsQuery, rewrite_common_terms

        if isinstance(query, CommonTermsQuery):
            query = rewrite_common_terms(
                query, df_map, self.manifest["stats"]["num_docs"])
        hits = []
        for _, base, _, shards in self.subs:
            sub_after = ((after[0], int(after[1]) - base)
                         if after is not None else None)
            for sh in shards:
                for h in sh.search(query, df_map, k, sort=sort,
                                   filter_range=filter_range,
                                   after=sub_after):
                    hits.append((h[0] + base,) + tuple(h[1:]))
        if sort:
            hits.sort(key=lambda h: _merge_sort_key(h, sort))
            return [(d, s) for d, s, _ in hits[:k]]
        hits.sort(key=lambda h: (-float(h[1]), h[0]))
        return hits[:k]

    def explain(self, query: Query | str, doc_id: int) -> dict | None:
        if isinstance(query, str):
            query = self.parse(query)
        df_map = self.global_df(query)
        from .query import CommonTermsQuery, rewrite_common_terms

        if isinstance(query, CommonTermsQuery):
            query = rewrite_common_terms(
                query, df_map, self.manifest["stats"]["num_docs"])
        doc_id = int(doc_id)
        for _, base, m, shards in self.subs:
            if base <= doc_id < base + int(m["stats"]["num_docs"]):
                local = doc_id - base
                sid = local // shards[0].docs_per_shard
                if sid >= len(shards):
                    return None
                return shards[sid].explain(query, local, df_map)
        return None

    def search_after(self, query: Query | str, k: int = 10, cursor=None):
        hits = self.search(query, k=k, after=cursor)
        if not hits:
            return [], None
        last = hits[-1]
        nxt = (float(last[1]), int(last[0])) if len(hits) == k else None
        return hits, nxt

    def resolve_hits(self, hits):
        import pyarrow.dataset as pads

        out = {}
        for d, base, m, _ in self.subs:
            lo, hi = base, base + int(m["stats"]["num_docs"])
            ids = [h - base for h, _ in hits if lo <= h < hi]
            if not ids:
                continue
            t = pads.dataset(str(Path(d) / "norms"), format="parquet",
                             partitioning="hive").to_table(
                columns=["doc_id", "conv_id", "turn_idx"],
                filter=pads.field("doc_id").isin(ids))
            for r in t.to_pylist():
                out[r["doc_id"] + base] = (r["conv_id"], r["turn_idx"])
        return [{"doc_id": d, "score": float(s),
                 "conv_id": out[d][0], "turn_idx": out[d][1]}
                for d, s in hits]
