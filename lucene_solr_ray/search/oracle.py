"""Single-process oracle: the control implementation of analyze -> postings
-> stats -> BM25 top-k that every distributed build/query is diffed against.

Mirrors the reference's control-instance testing pattern
(``solr/test-framework/src/java/org/apache/solr/BaseDistributedSearchTestCase.java:91``):
obviously-correct Python dicts, no Ray, same float32 scoring as the engine.

Scoring semantics reproduced (see SURVEY.md §3.2):

- term:   score = idf*boost*(k1+1) * f / (f + cache[norm])
- boolean: sum of matching positive-clause scores in clause order
  (BooleanWeight; coord == 1 for BM25, Similarity.java:122); MUST clauses
  are required, pure-SHOULD requires >=1 match, MUST_NOT excludes
  (ReqExclScorer semantics).
- phrase: exact phrase freq via position intersection
  (ExactPhraseScorer.java:122), weight = sum of term idfs
  (BM25Similarity.idfExplain(termStats[]), :199-214).
- top-k:  score desc, tie -> lower doc_id (TopScoreDocCollector.java:63-79).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..analysis import get_analyzer
from ..util.smallfloat import encode_norm
from . import bm25
from .query import (
    BooleanQuery,
    MatchNoDocs,
    MultiTermQuery,
    PhraseQuery,
    Query,
    TermQuery,
    expand_multi_term,
)


class OracleIndex:
    """Dict-based inverted index over (doc_id, text) rows."""

    def __init__(self, analyzer_name: str = "standard"):
        self.analyzer = get_analyzer(analyzer_name)
        # term -> list of (doc_id, freq, positions tuple), doc_id-ascending
        self.postings: dict[str, list[tuple[int, int, tuple[int, ...]]]] = defaultdict(list)
        self.norms: dict[int, int] = {}
        self.doc_lengths: dict[int, int] = {}
        self.doc_count = 0          # docs with >=1 token (Terms.getDocCount)
        self.sum_total_term_freq = 0
        self._cache: np.ndarray | None = None

    def add(self, doc_id: int, text: str) -> None:
        terms, positions = self.analyzer.analyze(text)
        self.doc_lengths[doc_id] = len(terms)
        self.norms[doc_id] = int(encode_norm(max(len(terms), 1)))
        if not terms:
            return
        self.doc_count += 1
        self.sum_total_term_freq += len(terms)
        per_term: dict[str, list[int]] = defaultdict(list)
        for t, p in zip(terms, positions):
            per_term[t].append(p)
        for t, plist in per_term.items():
            self.postings[t].append((doc_id, len(plist), tuple(plist)))
        self._cache = None

    def add_all(self, rows) -> None:
        for doc_id, text in rows:
            self.add(doc_id, text)

    # --- stats ---
    @property
    def avgdl(self) -> np.float32:
        return bm25.avg_field_length(self.sum_total_term_freq, self.doc_count)

    def _norm_cache(self) -> np.ndarray:
        if self._cache is None:
            self._cache = bm25.norm_cache(self.avgdl)
        return self._cache

    def doc_freq(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def total_term_freq(self, term: str) -> int:
        return sum(f for _, f, _ in self.postings.get(term, ()))

    # --- scoring ---
    def _score_term(self, q: TermQuery) -> dict[int, np.float32]:
        plist = self.postings.get(q.term)
        if not plist:
            return {}
        w = bm25.weight_value(bm25.idf(len(plist), self.doc_count), q.boost)
        cache = self._norm_cache()
        out: dict[int, np.float32] = {}
        for doc_id, freq, _ in plist:
            f = np.float32(freq)
            norm = cache[self.norms[doc_id]]
            out[doc_id] = np.float32(np.float32(w) * f / (f + norm))
        return out

    def _score_phrase(self, q: PhraseQuery) -> dict[int, np.float32]:
        lists = [self.postings.get(t) for t in q.terms]
        if any(pl is None for pl in lists):
            return {}
        sum_idf = np.float32(0.0)
        for t in q.terms:
            sum_idf = np.float32(
                sum_idf + bm25.idf(self.doc_freq(t), self.doc_count))
        w = bm25.weight_value(sum_idf, q.boost)
        cache = self._norm_cache()
        # doc -> positions per term
        maps = [{d: pos for d, _, pos in pl} for pl in lists]
        candidates = set(maps[0])
        for m in maps[1:]:
            candidates &= set(m)
        out: dict[int, np.float32] = {}
        for doc_id in candidates:
            rel = q.positions
            if q.slop > 0:
                from .query import sloppy_phrase_freq

                phrase_freq = sloppy_phrase_freq(
                    [maps[i][doc_id] for i in range(len(maps))],
                    list(rel), q.slop)
            else:
                phrase_freq = 0
                for p0 in maps[0][doc_id]:
                    if all((p0 - rel[0] + rel[i]) in maps[i][doc_id]
                           for i in range(1, len(maps))):
                        phrase_freq += 1
            if phrase_freq:
                f = np.float32(phrase_freq)
                norm = cache[self.norms[doc_id]]
                out[doc_id] = np.float32(np.float32(w) * f / (f + norm))
        return out

    def _score_multi_term(self, q: MultiTermQuery) -> dict[int, np.float32]:
        """CONSTANT_SCORE_REWRITE: every matching doc scores the boost."""
        terms = expand_multi_term(q, sorted(self.postings))
        out: dict[int, np.float32] = {}
        for t in terms:
            for doc_id, _, _ in self.postings[t]:
                out[doc_id] = np.float32(q.boost)
        return out

    def _score_synonym(self, q) -> dict[int, np.float32]:
        """SynonymQuery (SynonymQuery.java:228-249): max df, summed freq,
        one BM25 pseudo-term."""
        freqs: dict[int, int] = {}
        max_df = 0
        for t in q.terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            max_df = max(max_df, len(plist))
            for doc_id, f, _ in plist:
                freqs[doc_id] = freqs.get(doc_id, 0) + f
        if not freqs:
            return {}
        w = bm25.weight_value(bm25.idf(max_df, self.doc_count), q.boost)
        cache = self._norm_cache()
        out: dict[int, np.float32] = {}
        for doc_id, freq in freqs.items():
            f = np.float32(freq)
            norm = cache[self.norms[doc_id]]
            out[doc_id] = np.float32(np.float32(w) * f / (f + norm))
        return out

    def _score_multi_phrase(self, q) -> dict[int, np.float32]:
        """MultiPhraseQuery: per-slot union of alternative positions,
        exact/sloppy alignment, weight sums idf over all terms in slot
        order (mirrors ShardSearcher._score_multi_phrase)."""
        from .query import sloppy_phrase_freq

        slot_maps = []
        for alts in q.slots:
            per_doc: dict[int, list] = {}
            for t in alts:
                for d, _, pos in self.postings.get(t, ()):
                    per_doc.setdefault(d, []).append(np.asarray(pos))
            if not per_doc:
                return {}
            slot_maps.append({d: np.unique(np.concatenate(ps))
                              for d, ps in per_doc.items()})
        cands = set(slot_maps[0])
        for m in slot_maps[1:]:
            cands &= set(m)
        rel = list(q.positions)
        sum_idf = np.float32(0.0)
        for alts in q.slots:
            for t in alts:
                sum_idf = np.float32(
                    sum_idf + bm25.idf(self.doc_freq(t), self.doc_count))
        w = bm25.weight_value(sum_idf, q.boost)
        cache = self._norm_cache()
        out: dict[int, np.float32] = {}
        for d in cands:
            pls = [m[d].astype(np.int64) for m in slot_maps]
            if q.slop == 0:
                starts = pls[0] - rel[0]
                for k in range(1, len(pls)):
                    starts = starts[np.isin(starts + rel[k], pls[k])]
                    if len(starts) == 0:
                        break
                pf = float(len(starts))
            else:
                pf = sloppy_phrase_freq(pls, rel, q.slop)
            if pf > 0:
                f = np.float32(pf)
                norm = cache[self.norms[d]]
                out[d] = np.float32(np.float32(w) * f / (f + norm))
        return out

    def _score_clause(self, q: Query) -> dict[int, np.float32]:
        if isinstance(q, TermQuery):
            return self._score_term(q)
        from .query import MultiPhraseQuery, SynonymQuery

        if isinstance(q, SynonymQuery):
            return self._score_synonym(q)
        if isinstance(q, MultiPhraseQuery):
            return self._score_multi_phrase(q)
        if isinstance(q, PhraseQuery):
            return self._score_phrase(q)
        if isinstance(q, MultiTermQuery):
            return self._score_multi_term(q)
        if isinstance(q, BooleanQuery):
            return self._score_boolean(q)
        if isinstance(q, MatchNoDocs):
            return {}
        from .query import ConstantScoreQuery, DisMaxQuery, SpanFirstQuery

        if isinstance(q, SpanFirstQuery) and q.query is None:
            plist = self.postings.get(q.term)
            if not plist:
                return {}
            w = bm25.weight_value(
                bm25.idf(len(plist), self.doc_count), q.boost)
            cache = self._norm_cache()
            out = {}
            for doc_id, _, pos in plist:
                f = sum(1 for p in pos if p < q.end)
                if f:
                    fv = np.float32(f)
                    norm = cache[self.norms[doc_id]]
                    out[doc_id] = np.float32(np.float32(w) * fv / (fv + norm))
            return out
        from .query import (SpanNearQuery, SpanNotQuery, SpanOrQuery,
                            SpanTermQuery, span_freq, span_terms)

        if isinstance(q, (SpanTermQuery, SpanNearQuery, SpanOrQuery,
                          SpanNotQuery, SpanFirstQuery)):
            terms = sorted(span_terms(q))
            maps = {t: {d: pos for d, _, pos in self.postings.get(t, [])}
                    for t in terms}
            sum_idf = np.float32(0.0)
            for t in terms:
                sum_idf = np.float32(
                    sum_idf + bm25.idf(self.doc_freq(t), self.doc_count))
            w = bm25.weight_value(sum_idf, q.boost)
            cache = self._norm_cache()
            candidates = set().union(*(set(m) for m in maps.values())) \
                if maps else set()
            out = {}
            for doc_id in candidates:
                f = span_freq(
                    q, lambda t, _d=doc_id: maps.get(t, {}).get(_d))
                if f > 0:
                    fv = np.float32(f)
                    norm = cache[self.norms[doc_id]]
                    out[doc_id] = np.float32(np.float32(w) * fv / (fv + norm))
            return out
        if isinstance(q, ConstantScoreQuery):
            return {d: np.float32(q.boost)
                    for d in self._score_clause(q.query)}
        if isinstance(q, DisMaxQuery):
            # DisjunctionMaxScorer.score(): float max + double sum, then
            # (float)(max + (sum - max) * tieBreaker)
            per = [self._score_clause(c) for c in q.clauses]
            out: dict[int, np.float32] = {}
            for d in set().union(*[set(m) for m in per]) if per else set():
                vals = [m[d] for m in per if d in m]
                mx = max(vals)
                ssum = float(np.sum([float(v) for v in vals]))
                out[d] = np.float32(
                    float(mx) + (ssum - float(mx)) * q.tie_breaker)
            return out
        raise TypeError(f"unsupported query node: {type(q)}")

    def _score_boolean(self, q: BooleanQuery) -> dict[int, np.float32]:
        must_scores = [self._score_clause(c) for c in q.must]
        should_scores = [self._score_clause(c) for c in q.should]
        if must_scores:
            docs = set(must_scores[0])
            for m in must_scores[1:]:
                docs &= set(m)
        else:
            docs = set()
            for m in should_scores:
                docs |= set(m)
        msm = getattr(q, "min_should_match", 0)
        if msm > 0:  # MinShouldMatchSumScorer semantics
            docs = {d for d in docs
                    if sum(1 for m in should_scores if d in m) >= msm}
        for c in q.must_not:
            docs -= set(self._score_clause(c))
        out: dict[int, np.float32] = {}
        for d in sorted(docs):
            s = np.float32(0.0)
            for m in must_scores + should_scores:
                if d in m:
                    s = np.float32(s + m[d])
            out[d] = s
        return out

    def search(self, query: Query | str, k: int = 10) -> list[tuple[int, np.float32]]:
        """Top-k (doc_id, float32 score); ties -> lower doc_id."""
        if isinstance(query, str):
            from .query import parse_query

            query = parse_query(query, self.analyzer)
        scores = self._score_clause(query)
        ranked = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return ranked[:k]
