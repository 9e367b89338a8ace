"""Distributed query serving: shard searchers held by a Ray actor pool.

The serving analog of SolrCloud's scatter/gather (SURVEY.md §3.3,
QueryComponent.distributedProcess): each actor pins a subset of shards in
memory (postings + norms, loaded once in ``__init__``); a query does
(1) a stats round — per-shard docFreq for the query's terms, summed to
global stats (PURPOSE_GET_TOP_IDS scatter analog) — and (2) a scoring
round returning per-shard top-k, k-way merged on the driver by
(score desc, doc_id asc) (TopDocs.merge, TopDocs.java:199-215).

Queries are batched through both rounds: one actor round-trip per phase
regardless of the number of queries.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import ray

from .query import Query, parse_query
from .searcher import ShardSearcher, collect_terms


@ray.remote
class SearchActor:
    def __init__(self, index_dir: str, shard_ids: list[int], manifest: dict,
                 similarity="bm25"):
        self.searchers = [
            ShardSearcher(index_dir, sid, manifest, similarity=similarity)
            for sid in shard_ids
        ]

    def local_df(self, terms: list[str]) -> dict[str, int]:
        out: dict[str, int] = {}
        for sh in self.searchers:
            for t, d in sh.local_df(terms).items():
                out[t] = out.get(t, 0) + d
        return out

    def local_unique_docvalues(self, fields: list[str]) -> dict[str, list]:
        """Per-actor distinct non-null doc values — partials the driver
        merges into the global ordinal table for ord()/rord()."""
        import numpy as np

        out: dict[str, set] = {f: set() for f in fields}
        for sh in self.searchers:
            all_docs = np.arange(sh.base, sh.base + sh.docs_per_shard)
            for f in fields:
                vals = sh.docvalues_local(f, all_docs)
                out[f].update(x for x in vals if x is not None)
        return {f: sorted(v) for f, v in out.items()}

    def local_term_stats(self, terms: list[str]
                         ) -> tuple[dict[str, int], dict[str, int]]:
        """(df, ttf) partials for the index-statistics ValueSources
        (DocFreqValueSource / TotalTermFreqValueSource) in one trip."""
        df: dict[str, int] = {}
        ttf: dict[str, int] = {}
        for sh in self.searchers:
            for t, d in sh.local_df(terms).items():
                df[t] = df.get(t, 0) + d
            for t, d in sh.local_ttf(terms).items():
                ttf[t] = ttf.get(t, 0) + d
        return df, ttf

    def count_partial(self, query: Query, df_map: dict[str, int]) -> int:
        """Hit count over this actor's shards (collation verification)."""
        n = 0
        for sh in self.searchers:
            docs, _ = sh._score_clause(query, df_map)
            n += int(len(docs))
        return n

    def facet_partial(self, query: Query, df_map: dict[str, int],
                      field: str):
        """Per-actor facet counts over the query's full result set.
        Returns (uniq:str-array, counts:int64-array) — all merging is
        np.unique over concatenated per-shard arrays (same discipline as
        ``_conv_agg_local``), never a per-value Python dict loop, so a
        high-cardinality facet field stays vectorized end to end."""
        import numpy as np

        vals_parts = []
        for sh in self.searchers:
            docs, _ = sh._score_clause(query, df_map)
            if len(docs) == 0:
                continue
            vals = sh.docvalues_local(field, docs)
            vals = vals[vals != None]  # noqa: E711 — drop missing-field docs
            if len(vals):
                vals_parts.append(vals.astype(str))
        if not vals_parts:
            return (np.empty(0, dtype=object),
                    np.empty(0, dtype=np.int64))
        uniq, counts = np.unique(np.concatenate(vals_parts),
                                 return_counts=True)
        return uniq, counts.astype(np.int64)

    def _conv_agg_local(self, query: Query, df_map: dict[str, int],
                        score_mode: str):
        """Vectorized per-conversation aggregate over this actor's shards:
        returns (conv_ids:str-array, agg:float64-array). All merging is
        numpy (np.unique + ufunc.at) — no per-entry Python dict loops."""
        keys, vals = [], []
        for sh in self.searchers:
            docs, scores = sh._score_clause(query, df_map)
            if len(docs) == 0:
                continue
            keys.append(sh.docvalues_local("conv_id", docs).astype(str))
            vals.append(scores.astype(np.float32).astype(np.float64))
        if not keys:
            return (np.empty(0, dtype=object), np.empty(0, dtype=np.float64))
        convs = np.concatenate(keys)
        scores = np.concatenate(vals)
        uniq, inv = np.unique(convs, return_inverse=True)
        if score_mode == "max":
            agg = np.full(len(uniq), -np.inf)
            np.maximum.at(agg, inv, scores)
        elif score_mode == "total":
            agg = np.zeros(len(uniq))
            np.add.at(agg, inv, scores)
        else:
            raise ValueError(score_mode)
        return uniq, agg

    def _boundary_convs(self) -> np.ndarray:
        """First/last conversation of every shard this actor holds — the
        only conversations whose local aggregate can differ from the
        global one (conversations are doc-contiguous)."""
        out: set[str] = set()
        for sh in self.searchers:
            out.update(sh.boundary_convs())
        return np.asarray(sorted(out), dtype=object)

    def conv_partial(self, query: Query, df_map: dict[str, int],
                     score_mode: str, limit: int | None = None
                     ) -> dict[str, float]:
        """Per-conversation aggregated turn scores over this actor's
        shards' FULL hit sets. With ``limit`` the partial shipped to the
        driver is bounded: the local top-``limit`` conversations
        (tie-inclusive at the cut score) plus every shard-boundary
        conversation. This is exact for the global top-k merge: BM25
        scores are positive, so global agg >= any local agg; a
        non-boundary conversation lives entirely in one actor (local agg
        == global agg), and if it belongs to the global top-k then fewer
        than k conversations in its own actor can locally outrank it —
        so it is inside the local top-k cut. Split (boundary)
        conversations ship unconditionally and merge exactly.
        Mirrors QueryComponent.java:746-766's bounded scatter/gather."""
        uniq, agg = self._conv_agg_local(query, df_map, score_mode)
        if limit is not None and len(uniq) > limit:
            kth = np.partition(agg, -limit)[-limit]
            keep = agg >= kth  # tie-inclusive at the cut
            boundary = self._boundary_convs()
            if len(boundary):
                keep |= np.isin(uniq, boundary)
            uniq, agg = uniq[keep], agg[keep]
        return dict(zip(uniq.tolist(), agg.tolist()))

    def collapse_partial(self, query: Query, df_map: dict[str, int],
                         limit: int | None = None
                         ) -> dict[str, tuple[float, int]]:
        """Per-conversation best (score, doc) head, lower doc on ties.
        With ``limit``: local top-``limit`` heads by (score desc, doc
        asc), score-tie-inclusive at the cut, plus shard-boundary
        conversations — exact for the global top-k merge by the same
        argument as conv_partial (head merge is a max)."""
        keys, dvals, svals = [], [], []
        for sh in self.searchers:
            docs, scores = sh._score_clause(query, df_map)
            if len(docs) == 0:
                continue
            keys.append(sh.docvalues_local("conv_id", docs).astype(str))
            dvals.append(docs)
            svals.append(scores.astype(np.float32))
        if not keys:
            return {}
        convs = np.concatenate(keys)
        docs = np.concatenate(dvals)
        scores = np.concatenate(svals)
        order = np.lexsort((docs, -scores, convs))
        convs_s = convs[order]
        head = np.concatenate(([True], convs_s[1:] != convs_s[:-1]))
        hidx = order[head]  # one best (score desc, doc asc) row per conv
        h_conv, h_doc, h_score = convs[hidx], docs[hidx], scores[hidx]
        if limit is not None and len(hidx) > limit:
            kth = np.partition(h_score, -limit)[-limit]
            keep = h_score >= kth
            boundary = self._boundary_convs()
            if len(boundary):
                keep |= np.isin(h_conv, boundary)
            h_conv, h_doc, h_score = h_conv[keep], h_doc[keep], h_score[keep]
        return {c: (float(s), int(d))
                for c, s, d in zip(h_conv, h_score, h_doc)}

    def expand_partial(self, query: Query, df_map: dict[str, int],
                       conv_ids: list[str], exclude_docs: list[int],
                       per_group: int) -> dict[str, list]:
        """ExpandComponent partial: per requested conversation, this
        actor's top ``per_group`` other matching docs — bounded by
        |convs| * per_group, never the hit set."""
        wanted = set(conv_ids)
        excl = set(exclude_docs)
        out: dict[str, list] = {}
        for sh in self.searchers:
            docs, scores = sh._score_clause(query, df_map)
            if len(docs) == 0:
                continue
            convs = sh.docvalues_local("conv_id", docs).astype(str)
            for conv in wanted:
                mask = convs == conv
                if not mask.any():
                    continue
                g_docs, g_scores = docs[mask], scores[mask]
                order = np.lexsort((g_docs, -g_scores.astype(np.float32)))
                rows = [(int(g_docs[i]), float(np.float32(g_scores[i])))
                        for i in order if int(g_docs[i]) not in excl]
                out.setdefault(conv, []).extend(rows[:per_group])
        return out

    def stats_partial(self, query: Query, df_map: dict[str, int],
                      field: str) -> tuple:
        """(count, min, max, sum, sumsq, missing) of a docvalue over the
        full hit set (StatsValuesFactory accumulator shape)."""
        count, sum_, sumsq, missing, mn, mx = 0, 0.0, 0.0, 0, None, None
        for sh in self.searchers:
            docs, _ = sh._score_clause(query, df_map)
            if len(docs) == 0:
                continue
            vals = sh.docvalues_local(field, docs)
            v = np.asarray([x for x in vals if x is not None],
                           dtype=np.float64)
            missing += len(vals) - len(v)
            if len(v) == 0:
                continue
            count += len(v)
            sum_ += float(v.sum())
            sumsq += float((v * v).sum())
            mn = float(v.min()) if mn is None else min(mn, float(v.min()))
            mx = float(v.max()) if mx is None else max(mx, float(v.max()))
        return count, mn, mx, sum_, sumsq, missing

    def query_counts(self, queries: list[Query],
                     df_maps: list[dict[str, int]]) -> list[int]:
        """facet.query partials: hit count per sub-query."""
        out = []
        for q, df_map in zip(queries, df_maps):
            n = 0
            for sh in self.searchers:
                docs, _ = sh._score_clause(q, df_map)
                n += len(docs)
            out.append(n)
        return out

    def scores_for_docs(self, query: Query, df_map: dict[str, int],
                        doc_ids: list[int]) -> dict[int, float]:
        """Scores of the given docs under `query` (rerank second pass):
        only the requested top-N intersection ships to the driver."""
        wanted = np.asarray(doc_ids, dtype=np.int64)
        out: dict[int, float] = {}
        for sh in self.searchers:
            docs, scores = sh._score_clause(query, df_map)
            if len(docs) == 0:
                continue
            mask = np.isin(docs, wanted)
            for d, s in zip(docs[mask], scores[mask]):
                out[int(d)] = float(s)
        return out

    def boosted_partial(self, query: Query, df_map: dict[str, int],
                        boost_expr: str, k: int,
                        stats: dict | None = None
                        ) -> list[tuple[int, float]]:
        """Per-actor top-k of BM25 * f(docvalues). The boost is per-doc,
        so per-actor pruning to k is exact under the global merge.
        ``stats`` (driver-computed global index statistics) binds the
        docfreq/numdocs/maxdoc/norm accessors; norm() resolves
        shard-locally from the pinned norm bytes."""
        import pyarrow as pa

        from ..functions import parse_func
        from ..functions.valuesource import (EXISTS_PSEUDO_PREFIX,
                                             NORM_PSEUDO_FIELD,
                                             ORD_PSEUDO_PREFIX,
                                             RORD_PSEUDO_PREFIX,
                                             TF_PSEUDO_PREFIX, Field,
                                             Func, bind_index_stats,
                                             eval_expr)

        ast = parse_func(boost_expr)
        if stats is not None:
            ast = bind_index_stats(ast, stats)

        def fields_of(node) -> set[str]:
            if isinstance(node, Field):
                return {node.name}
            if isinstance(node, Func):
                out: set[str] = set()
                for a in node.args:
                    out |= fields_of(a)
                return out
            return set()

        hits: list[tuple[int, float]] = []
        for sh in self.searchers:
            docs, scores = sh._score_clause(query, df_map)
            if len(docs) == 0:
                continue
            cols = {}
            for f in sorted(fields_of(ast)):
                if f == NORM_PSEUDO_FIELD:
                    from ..util.smallfloat import NORM_TABLE

                    cols[f] = pa.array(
                        NORM_TABLE[sh.norms[docs - sh.base]]
                        .astype(np.float64), type=pa.float64())
                    continue
                if f.startswith(TF_PSEUDO_PREFIX):
                    # termfreq(t): per-hit tf, resolved shard-locally
                    cols[f] = pa.array(
                        sh.local_termfreq(f[len(TF_PSEUDO_PREFIX):], docs),
                        type=pa.float64())
                    continue
                if f.startswith(EXISTS_PSEUDO_PREFIX):
                    vals = sh.docvalues_local(
                        f[len(EXISTS_PSEUDO_PREFIX):], docs)
                    cols[f] = pa.array(np.asarray(
                        [0.0 if x is None else 1.0 for x in vals]),
                        type=pa.float64())
                    continue
                if f.startswith(ORD_PSEUDO_PREFIX) or \
                        f.startswith(RORD_PSEUDO_PREFIX):
                    from .features import picked_ordinals

                    rev = f.startswith(RORD_PSEUDO_PREFIX)
                    pref = (RORD_PSEUDO_PREFIX if rev
                            else ORD_PSEUDO_PREFIX)
                    fname = f[len(pref):]
                    uniq = (stats or {}).get("ord_uniques", {}) \
                        .get(fname, [])
                    vals = sh.docvalues_local(fname, docs)
                    cols[f] = pa.array(picked_ordinals(vals, uniq, rev),
                                       type=pa.float64())
                    continue
                vals = sh.docvalues_local(f, docs)
                # missing doc values evaluate as 0 (FunctionScoreQuery)
                vals = np.asarray(
                    [0.0 if x is None else x for x in vals], dtype=np.float64)
                cols[f] = pa.array(vals, type=pa.float64())
            boost = eval_expr(ast, pa.table(
                cols or {"__d": pa.array(np.zeros(len(docs)))}))
            if isinstance(boost, pa.Scalar):
                boost_np = np.full(len(docs), boost.as_py())
            else:
                boost_np = boost.to_numpy(zero_copy_only=False)
            final = scores.astype(np.float64) * boost_np
            order = np.lexsort((docs, -final))[:k]
            hits.extend((int(docs[i]), float(final[i])) for i in order)
        hits.sort(key=lambda h: (-h[1], h[0]))
        return hits[:k]

    def terms_partial(self, prefix: str, regex: str | None,
                      limit: int | None = None, sort: str = "count"
                      ) -> dict[str, int]:
        """Matching terms with local docFreq (TermsComponent shard
        response). The prefix slice is a bisect range over the sorted
        term dict (vectorized take, no per-term Python loop); an
        unfiltered enumeration ships at most ``limit`` terms per shard
        — lexicographic first-N for sort=index (exact: a term in the
        global first-N precedes fewer than N terms, so it is inside
        every holding shard's first-N), local top-N-by-df for
        sort=count (the driver refines candidate counts to exact with a
        local_df round; like Solr's distributed TermsComponent, a term
        below every shard's overfetched cut can be missed)."""
        import re as _re
        from bisect import bisect_left

        rx = _re.compile(regex) if regex else None
        out: dict[str, int] = {}
        for sh in self.searchers:
            arr = sh._terms._arr
            dfs = sh._df
            if prefix:
                seq = sh._terms.seq()
                lo = bisect_left(seq, prefix)
                hi = bisect_left(seq, prefix + chr(0x10FFFF))
                terms = arr.slice(lo, hi - lo).to_pylist()
                local = dfs[lo:hi]
            elif rx is None and limit is not None and len(arr) > limit:
                if sort == "index":
                    sel = np.arange(limit)
                else:
                    sel = np.argpartition(-dfs, limit - 1)[:limit]
                terms = arr.take(sel).to_pylist()
                local = dfs[sel]
            else:
                terms = arr.to_pylist()
                local = dfs
            for t, d in zip(terms, local):
                if rx is not None and not rx.fullmatch(t):
                    continue
                out[t] = out.get(t, 0) + int(d)
        return out

    def spellcheck_partial(self, term: str, max_edits: int
                           ) -> dict[str, int]:
        """Fuzzy-expanded candidates with local docFreq (the distributed
        SpellCheckComponent shard response)."""
        from .query import FuzzyQuery, expand_multi_term

        out: dict[str, int] = {}
        for sh in self.searchers:
            for t in expand_multi_term(
                    FuzzyQuery(term=term, max_edits=max_edits),
                    sh._terms.seq()):
                if t == term:
                    continue
                out[t] = out.get(t, 0) + int(sh._df[sh._terms[t]])
        return out

    def suggest_partial(self, prefix: str) -> dict[str, int]:
        from .query import PrefixQuery, expand_multi_term

        out: dict[str, int] = {}
        for sh in self.searchers:
            for t in expand_multi_term(PrefixQuery(prefix=prefix),
                                       sh._terms.seq()):
                out[t] = out.get(t, 0) + int(sh._df[sh._terms[t]])
        return out

    def range_facet_partial(self, query: Query, df_map: dict[str, int],
                            field: str, start: float, end: float,
                            gap: float, hardend: bool) -> list[int]:
        """Range-facet bucket counts over this actor's full hit set
        (one bincount per shard; layout matches pipelines.relational.
        range_facet: n buckets then before/after/between)."""
        n_buckets = int(np.ceil((end - start) / gap))
        actual_end = end if hardend else start + n_buckets * gap
        counts = np.zeros(n_buckets + 3, dtype=np.int64)
        for sh in self.searchers:
            docs, _ = sh._score_clause(query, df_map)
            if len(docs) == 0:
                continue
            vals = sh.docvalues_local(field, docs)
            v = np.asarray([x for x in vals if x is not None],
                           dtype=np.float64)
            if len(v) == 0:
                continue
            below = v < start
            above = v >= actual_end
            mid = ~(below | above)
            idx = np.floor((v[mid] - start) / gap).astype(np.int64)
            np.clip(idx, 0, n_buckets - 1, out=idx)
            counts[:n_buckets] += np.bincount(idx, minlength=n_buckets)
            counts[n_buckets] += int(below.sum())
            counts[n_buckets + 1] += int(above.sum())
            counts[n_buckets + 2] += int(mid.sum())
        return [int(c) for c in counts]

    def search_batch(self, queries: list[Query], df_maps: list[dict[str, int]],
                     k: int, sort=None, filter_range=None, after=None
                     ) -> list[list[tuple]]:
        results = []
        for q, df_map in zip(queries, df_maps):
            hits: list[tuple] = []
            for sh in self.searchers:
                shard_hits = sh.search(q, df_map, k, sort=sort,
                                       filter_range=filter_range,
                                       after=after)
                if sort:
                    hits.extend((d, float(s), keys)
                                for d, s, keys in shard_hits)
                else:
                    hits.extend((d, float(s)) for d, s in shard_hits)
            if sort:
                from .searcher import _merge_sort_key

                hits.sort(key=lambda h: _merge_sort_key(h, sort))
            else:
                hits.sort(key=lambda h: (-h[1], h[0]))
            results.append(hits[:k])
        return results


def _bloom_prunable(q: Query) -> bool:
    """True iff every doc matching ``q`` must contain at least one of
    ``collect_terms(q)`` — the condition under which union-semantics
    bloom pruning is exact. Conservative whitelist: term-enumerable
    leaves and positive boolean composition. MultiTermQuery expansions
    (wildcard/fuzzy/range/regexp), MatchAllDocs, span wrappers and any
    unknown node disable pruning."""
    from .query import (
        BooleanQuery,
        CommonTermsQuery,
        DisMaxQuery,
        MultiPhraseQuery,
        PhraseQuery,
        SynonymQuery,
        TermQuery,
    )

    if isinstance(q, (TermQuery, PhraseQuery, SynonymQuery,
                      MultiPhraseQuery, CommonTermsQuery)):
        return True
    if isinstance(q, DisMaxQuery):
        return bool(q.clauses) and all(_bloom_prunable(c)
                                       for c in q.clauses)
    if isinstance(q, BooleanQuery):
        pos = list(q.must) + list(q.should)
        # must_not clauses never make a doc match; only the positive
        # clauses decide whether a shard can contribute
        return bool(pos) and all(_bloom_prunable(c) for c in pos)
    return False


class DistributedSearcher:
    """Driver-side coordinator over a SearchActor pool."""

    def __init__(self, index_dir: str, num_actors: int = 4,
                 similarity="bm25", use_blooms: bool = True):
        self.index_dir = str(index_dir)
        self.manifest = json.loads(
            (Path(index_dir) / "manifest.json").read_text())
        self.analyzer_name = self.manifest["params"]["analyzer"]
        shard_ids = sorted(s["shard_id"] for s in self.manifest["shards"])
        num_actors = max(1, min(num_actors, len(shard_ids)))
        assignment: list[list[int]] = [[] for _ in range(num_actors)]
        for i, sid in enumerate(shard_ids):
            assignment[i % num_actors].append(sid)
        # similarity ships to the actors (a name string, or a cloudpickled
        # factory callable for parameterized similarities)
        self.actor_shards = [sids for sids in assignment if sids]
        self.actors = [
            SearchActor.remote(self.index_dir, sids, self.manifest,
                               similarity)
            for sids in self.actor_shards
        ]
        # per-shard term blooms (BloomFilteringPostingsFormat analog,
        # index/bloom.py): when the sidecar exists, term-only queries
        # scatter only to actors owning candidate shards
        self.blooms = None
        if use_blooms:
            from ..index.bloom import TermBloomSet

            self.blooms = TermBloomSet.load(self.index_dir)
        self.last_fanout: int | None = None

    def _candidate_actors(self, parsed: list[Query],
                          all_terms: list[str]) -> list:
        """Bloom-pruned actor subset for a query batch. Exactness: a
        pruned actor's shards contain NONE of the batch's terms (bloom
        false negatives are impossible), so its df partials are all 0
        and no whitelisted query can match a doc there."""
        self.last_fanout = len(self.actors)
        if (self.blooms is None or not parsed or not all_terms
                or not all(_bloom_prunable(q) for q in parsed)):
            return self.actors
        cand = self.blooms.shards_maybe(all_terms)
        picked = [a for a, sids in zip(self.actors, self.actor_shards)
                  if any(s in cand for s in sids)]
        self.last_fanout = len(picked)
        return picked

    def parse(self, text: str) -> Query:
        from ..analysis import get_analyzer

        return parse_query(text, get_analyzer(self.analyzer_name))

    def search_batch(self, queries: list[Query | str], k: int = 10,
                     sort=None, filter_range=None, after=None
                     ) -> list[list[tuple[int, float]]]:
        parsed = [self.parse(q) if isinstance(q, str) else q for q in queries]
        all_terms = sorted(set().union(*[collect_terms(q) for q in parsed])
                           if parsed else set())
        actors = self._candidate_actors(parsed, all_terms)
        if not actors:
            return [[] for _ in parsed]
        # phase 1: global stats (one round trip for the whole batch)
        partials = ray.get([a.local_df.remote(all_terms) for a in actors])
        global_df: dict[str, int] = {}
        for p in partials:
            for t, d in p.items():
                global_df[t] = global_df.get(t, 0) + d
        from .query import CommonTermsQuery, rewrite_common_terms

        max_doc = self.manifest["stats"]["num_docs"]
        parsed = [rewrite_common_terms(q, global_df, max_doc)
                  if isinstance(q, CommonTermsQuery) else q
                  for q in parsed]
        df_maps = [
            {t: global_df.get(t, 0) for t in collect_terms(q)} for q in parsed
        ]
        # phase 2: scatter scoring, gather + merge (bloom-pruned set)
        futures = [a.search_batch.remote(parsed, df_maps, k, sort,
                                         filter_range, after)
                   for a in actors]
        per_actor = ray.get(futures)
        results = []
        for qi in range(len(parsed)):
            hits = [h for actor_hits in per_actor for h in actor_hits[qi]]
            if sort:
                from .searcher import _merge_sort_key

                hits.sort(key=lambda h: _merge_sort_key(h, sort))
                results.append([(d, np.float32(s))
                                for d, s, _ in hits[:k]])
            else:
                hits.sort(key=lambda h: (-h[1], h[0]))
                results.append([(d, np.float32(s)) for d, s in hits[:k]])
        return results

    def search(self, query: Query | str, k: int = 10, sort=None,
               filter_range=None, after=None):
        return self.search_batch([query], k, sort=sort,
                                 filter_range=filter_range, after=after)[0]

    def search_after(self, query: Query | str, k: int = 10, cursor=None):
        """cursorMark page fetch: (hits, next_cursor); each page is one
        scatter/gather with the cursor pruned on the shards."""
        hits = self.search(query, k=k, after=cursor)
        if not hits:
            return [], None
        last = hits[-1]
        nxt = (float(last[1]), int(last[0])) if len(hits) == k else None
        return hits, nxt

    def global_df(self, query: Query) -> dict[str, int]:
        """IndexSearcher-compatible global docFreq (lets the feature
        helpers — e.g. more_like_this — run against either searcher)."""
        return self._stats_phase(query)

    def hit_count(self, query: Query | str) -> int:
        """Total matching docs: per-actor count partials, one scatter."""
        q = self.parse(query) if isinstance(query, str) else query
        df_map = self._stats_phase(q)
        return sum(ray.get([a.count_partial.remote(q, df_map)
                            for a in self.actors]))

    def spellcheck_collate(self, query_text: str, max_tries: int = 5,
                           k_sugg: int = 3) -> dict | None:
        """Distributed SpellCheckCollator.java:69: the same collation
        walk as IndexSearcher.spellcheck_collate, with df / suggestions
        / hit verification each one scatter round (counts are ints per
        actor — no hit sets ship to the driver)."""
        from .searcher import collate_walk

        return collate_walk(self, query_text, max_tries, k_sugg,
                            self.hit_count)

    def global_term_stats(self, terms: list[str]
                          ) -> tuple[dict[str, int], dict[str, int]]:
        """Global (df, ttf) for the index-statistics ValueSources —
        one scatter round over all actors for the whole term set."""
        partials = ray.get([a.local_term_stats.remote(terms)
                            for a in self.actors])
        df: dict[str, int] = {}
        ttf: dict[str, int] = {}
        for pdf, pttf in partials:
            for t, d in pdf.items():
                df[t] = df.get(t, 0) + d
            for t, d in pttf.items():
                ttf[t] = ttf.get(t, 0) + d
        return df, ttf

    def _stats_phase(self, parsed: Query) -> dict[str, int]:
        """Phase-1 global docFreq for one query (one actor round trip)."""
        all_terms = sorted(collect_terms(parsed))
        partials = ray.get([a.local_df.remote(all_terms) for a in self.actors])
        df: dict[str, int] = {}
        for p in partials:
            for t, d in p.items():
                df[t] = df.get(t, 0) + d
        return df

    def search_conversations(self, query: Query | str, k: int = 10,
                             score_mode: str = "max"):
        """Distributed block join (parent/child): per-actor per-conv
        aggregates over the full hit sets, merged by max/sum on the
        driver — the driver never sees per-turn hits, and each actor ships
        at most its top-k conversations plus shard-boundary ones."""
        parsed = self.parse(query) if isinstance(query, str) else query
        df = self._stats_phase(parsed)
        partials = ray.get([a.conv_partial.remote(parsed, df, score_mode, k)
                            for a in self.actors])
        agg: dict[str, float] = {}
        for p in partials:
            for c, s in p.items():
                if score_mode == "max":
                    agg[c] = max(agg.get(c, -np.inf), s)
                else:
                    agg[c] = agg.get(c, 0.0) + s
        out = sorted(agg.items(), key=lambda kv: (-np.float32(kv[1]), kv[0]))
        return [(c, np.float32(s)) for c, s in out[:k]]

    def collapse(self, query: Query | str, k: int = 10):
        """Distributed field collapse on conversation: per-actor heads
        merged by (score desc, doc asc) per conversation; each actor ships
        at most its top-k heads plus shard-boundary conversations."""
        parsed = self.parse(query) if isinstance(query, str) else query
        df = self._stats_phase(parsed)
        partials = ray.get([a.collapse_partial.remote(parsed, df, k)
                            for a in self.actors])
        best: dict[str, tuple[float, int]] = {}
        for p in partials:
            for c, cand in p.items():
                cur = best.get(c)
                if cur is None or (-cand[0], cand[1]) < (-cur[0], cur[1]):
                    best[c] = cand
        heads = [(doc, np.float32(score), conv)
                 for conv, (score, doc) in best.items()]
        heads.sort(key=lambda h: (-h[1], h[0]))
        return heads[:k]

    def expand(self, query: Query | str, heads: list, per_group: int = 5):
        """Distributed ExpandComponent: per-actor per-conv top lists for
        the collapsed heads' conversations, merged (score desc, doc asc)
        and trimmed on the driver."""
        if not heads:
            return {}
        parsed = self.parse(query) if isinstance(query, str) else query
        df = self._stats_phase(parsed)
        conv_ids = [str(c) for _, _, c in heads]
        excl = [int(d) for d, _, _ in heads]
        partials = ray.get([
            a.expand_partial.remote(parsed, df, conv_ids, excl, per_group)
            for a in self.actors])
        out: dict[str, list] = {c: [] for c in conv_ids}
        for p in partials:
            for c, rows in p.items():
                out[c].extend(rows)
        for c in out:
            out[c].sort(key=lambda h: (-h[1], h[0]))
            out[c] = out[c][:per_group]
        return out

    def field_stats(self, query: Query | str, field: str):
        """Distributed StatsComponent over the full hit set: per-actor
        (count, min, max, sum) partials, merged on the driver."""
        parsed = self.parse(query) if isinstance(query, str) else query
        df = self._stats_phase(parsed)
        partials = ray.get([a.stats_partial.remote(parsed, df, field)
                            for a in self.actors])
        count, sum_, sumsq, missing, mn, mx = 0, 0.0, 0.0, 0, None, None
        for c, pmn, pmx, ps, psq, pmiss in partials:
            count += c
            sum_ += ps
            sumsq += psq
            missing += pmiss
            if pmn is not None:
                mn = pmn if mn is None else min(mn, pmn)
            if pmx is not None:
                mx = pmx if mx is None else max(mx, pmx)
        if count == 0:
            return {"count": 0, "min": None, "max": None, "sum": 0.0,
                    "mean": None, "sumOfSquares": 0.0, "stddev": None,
                    "missing": missing}
        mean = sum_ / count
        # StatsValuesFactory stddev: sample stddev from (sum, sumsq, n)
        var = (sumsq - count * mean * mean) / (count - 1) if count > 1 \
            else 0.0
        return {"count": count, "min": mn, "max": mx, "sum": sum_,
                "mean": mean, "sumOfSquares": sumsq,
                "stddev": float(np.sqrt(max(var, 0.0))),
                "missing": missing}

    def facet_query(self, queries: list[Query | str]) -> dict[str, int]:
        """facet.query: hit count per arbitrary sub-query — ONE stats
        round trip over the union of all sub-queries' terms (the
        search_batch batching pattern), then one counting round trip."""
        parsed = [self.parse(q) if isinstance(q, str) else q
                  for q in queries]
        all_terms = sorted(set().union(*[collect_terms(q) for q in parsed])
                           if parsed else set())
        dfs = ray.get([a.local_df.remote(all_terms) for a in self.actors])
        global_df: dict[str, int] = {}
        for p in dfs:
            for t, d in p.items():
                global_df[t] = global_df.get(t, 0) + d
        df_maps = [{t: global_df.get(t, 0) for t in collect_terms(q)}
                   for q in parsed]
        partials = ray.get([a.query_counts.remote(parsed, df_maps)
                            for a in self.actors])
        totals = np.sum(np.asarray(partials, dtype=np.int64), axis=0)
        return {str(q): int(n) for q, n in zip(queries, totals)}

    def rerank(self, query: Query | str, rerank_query: Query | str,
               k: int = 10, top_n: int = 50, weight: float = 2.0):
        """Distributed QueryRescorer: first-pass top-N via the normal
        scatter/gather, second pass fetches ONLY the top-N docs' rerank
        scores (never the rerank query's full hit set)."""
        first = self.search(query, k=top_n)
        if not first:
            return []
        parsed_r = (self.parse(rerank_query)
                    if isinstance(rerank_query, str) else rerank_query)
        df = self._stats_phase(parsed_r)
        doc_ids = [int(d) for d, _ in first]
        partials = ray.get([a.scores_for_docs.remote(parsed_r, df, doc_ids)
                            for a in self.actors])
        rmap: dict[int, float] = {}
        for p in partials:
            rmap.update(p)
        out = []
        for doc_id, score in first:
            extra = rmap.get(int(doc_id), 0.0)
            combined = np.float32(
                score + np.float32(weight) * np.float32(extra))
            out.append((int(doc_id), combined))
        out.sort(key=lambda h: (-float(h[1]), h[0]))
        return out[:k]

    def terms(self, prefix: str = "", regex: str | None = None,
              limit: int = 10, sort: str = "count") -> list[tuple[str, int]]:
        """Distributed TermsComponent. Filtered (prefix/regex) slices
        ship whole, so counts are exact. Unfiltered enumeration is
        bounded: each actor ships per-shard first-N (sort=index — exact,
        see terms_partial) or overfetched top-N-by-df candidates
        (sort=count), whose counts the driver refines to exact global
        docFreq with a local_df round before ranking — the driver never
        receives an actor's entire vocabulary."""
        bounded = not prefix and regex is None
        shard_limit = (limit if sort == "index" else limit * 4 + 16) \
            if bounded else None
        partials = ray.get([
            a.terms_partial.remote(prefix, regex, shard_limit, sort)
            for a in self.actors])
        agg: dict[str, int] = {}
        for p in partials:
            for t, d in p.items():
                agg[t] = agg.get(t, 0) + d
        if bounded and sort == "count" and agg:
            # refinement round: exact df for every candidate (a shard's
            # cut may have excluded a candidate another shard surfaced)
            cands = sorted(agg)
            dfs = ray.get([a.local_df.remote(cands) for a in self.actors])
            agg = {}
            for p in dfs:
                for t, d in p.items():
                    agg[t] = agg.get(t, 0) + d
        if sort == "index":
            ranked = sorted(agg.items())
        else:
            ranked = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:limit]

    def spellcheck(self, term: str, k: int = 5,
                   max_edits: int = 2) -> list[tuple[str, int]]:
        """Distributed SpellCheckComponent: per-actor fuzzy expansion,
        global (distance asc, df desc, term asc) rank on the driver."""
        from .query import levenshtein_within

        partials = ray.get([a.spellcheck_partial.remote(term, max_edits)
                            for a in self.actors])
        agg: dict[str, int] = {}
        for p in partials:
            for t, d in p.items():
                agg[t] = agg.get(t, 0) + d

        def dist(t: str) -> int:
            for d in range(1, max_edits + 1):
                if levenshtein_within(term, t, d):
                    return d
            return max_edits

        ranked = sorted(agg.items(), key=lambda kv: (dist(kv[0]), -kv[1],
                                                     kv[0]))
        return ranked[:k]

    def suggest(self, prefix: str, k: int = 5) -> list[tuple[str, int]]:
        partials = ray.get([a.suggest_partial.remote(prefix)
                            for a in self.actors])
        agg: dict[str, int] = {}
        for p in partials:
            for t, d in p.items():
                agg[t] = agg.get(t, 0) + d
        return sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def range_facet(self, query: Query | str, field: str, start: float,
                    end: float, gap: float, hardend: bool = False
                    ) -> list[tuple[str, int]]:
        """Distributed facet.range over the query's full hit set:
        per-actor bincount partials summed on the driver (bucket labels
        match pipelines.relational.range_facet)."""
        parsed = self.parse(query) if isinstance(query, str) else query
        df = self._stats_phase(parsed)
        partials = ray.get([
            a.range_facet_partial.remote(parsed, df, field, start, end,
                                         gap, hardend)
            for a in self.actors])
        total = np.sum(np.asarray(partials, dtype=np.int64), axis=0)
        n_buckets = len(total) - 3
        out = []
        for i in range(n_buckets):
            lo = start + i * gap
            label = str(int(lo)) if float(lo).is_integer() else str(float(lo))
            out.append((label, int(total[i])))
        out.append(("before", int(total[n_buckets])))
        out.append(("after", int(total[n_buckets + 1])))
        out.append(("between", int(total[n_buckets + 2])))
        return out

    def boosted_search(self, query: Query | str, boost_expr: str,
                       k: int = 10):
        """Distributed FunctionScoreQuery: the boost is per-doc, so
        per-actor top-k partials merge exactly. Index-statistics
        accessors in the boost are bound driver-side (global df) and
        shipped as constants; norm() resolves on the shards."""
        from ..functions import parse_func
        from ..functions.valuesource import ord_fields, stats_terms
        from .features import index_stats

        parsed = self.parse(query) if isinstance(query, str) else query
        df = self._stats_phase(parsed)
        ast = parse_func(boost_expr)
        stats = index_stats(self, stats_terms(ast))
        ofields = sorted(ord_fields(ast))
        if ofields:
            # ord()/rord(): merge per-actor distinct-value partials into
            # one global ordinal table, shipped with the stats
            per = ray.get([a.local_unique_docvalues.remote(ofields)
                           for a in self.actors])
            stats["ord_uniques"] = {
                f: sorted(set().union(*[set(p[f]) for p in per]))
                for f in ofields}
        partials = ray.get([a.boosted_partial.remote(parsed, df, boost_expr,
                                                     k, stats)
                            for a in self.actors])
        hits = [h for p in partials for h in p]
        hits.sort(key=lambda h: (-h[1], h[0]))
        return [(d, float(s)) for d, s in hits[:k]]

    def facet(self, query: Query | str, field: str,
              limit: int | None = None,
              prefix: str = "") -> list[tuple[str, int]]:
        """Distributed field facet: per-actor partial counts, merged on the
        driver (FacetComponent distributed merge — exact by construction,
        no refinement phase needed)."""
        parsed = self.parse(query) if isinstance(query, str) else query
        all_terms = sorted(collect_terms(parsed))
        partials = ray.get([a.local_df.remote(all_terms) for a in self.actors])
        df: dict[str, int] = {}
        for p in partials:
            for t, d in p.items():
                df[t] = df.get(t, 0) + d
        partial_arrays = ray.get([a.facet_partial.remote(parsed, df, field)
                                  for a in self.actors])
        nonempty = [(u, c) for u, c in partial_arrays if len(u)]
        if not nonempty:
            return []
        # vectorized merge: concat per-actor (uniq, counts), re-unique,
        # sum counts per label via np.add.at — label-scale, no dict loop
        allu = np.concatenate([u for u, _ in nonempty])
        allc = np.concatenate([c for _, c in nonempty])
        uniq, inv = np.unique(allu, return_inverse=True)
        summed = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(summed, inv, allc)
        if prefix:
            keep = np.char.startswith(uniq.astype(str), prefix)
            uniq, summed = uniq[keep], summed[keep]
        order = np.lexsort((uniq, -summed))
        out = [(str(uniq[i]), int(summed[i])) for i in order]
        return out[:limit] if limit else out

    def close(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
