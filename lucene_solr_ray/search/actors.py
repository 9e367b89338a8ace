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
    def __init__(self, index_dir: str, shard_ids: list[int], manifest: dict):
        self.searchers = [
            ShardSearcher(index_dir, sid, manifest) for sid in shard_ids
        ]

    def local_df(self, terms: list[str]) -> dict[str, int]:
        out: dict[str, int] = {}
        for sh in self.searchers:
            for t, d in sh.local_df(terms).items():
                out[t] = out.get(t, 0) + d
        return out

    def facet_partial(self, query: Query, df_map: dict[str, int],
                      field: str) -> dict[str, int]:
        """Per-actor facet counts over the query's full result set."""
        import numpy as np

        out: dict[str, int] = {}
        for sh in self.searchers:
            docs, _ = sh._score_clause(query, df_map)
            if len(docs) == 0:
                continue
            vals = sh.docvalues_local(field, docs)
            vals = vals[vals != None]  # noqa: E711 — drop missing-field docs
            if len(vals) == 0:
                continue
            uniq, counts = np.unique(vals.astype(str), return_counts=True)
            for v, c in zip(uniq, counts):
                out[str(v)] = out.get(str(v), 0) + int(c)
        return out

    def search_batch(self, queries: list[Query], df_maps: list[dict[str, int]],
                     k: int, sort=None, filter_range=None
                     ) -> list[list[tuple]]:
        results = []
        for q, df_map in zip(queries, df_maps):
            hits: list[tuple] = []
            for sh in self.searchers:
                shard_hits = sh.search(q, df_map, k, sort=sort,
                                       filter_range=filter_range)
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


class DistributedSearcher:
    """Driver-side coordinator over a SearchActor pool."""

    def __init__(self, index_dir: str, num_actors: int = 4):
        self.index_dir = str(index_dir)
        self.manifest = json.loads(
            (Path(index_dir) / "manifest.json").read_text())
        self.analyzer_name = self.manifest["params"]["analyzer"]
        shard_ids = sorted(s["shard_id"] for s in self.manifest["shards"])
        num_actors = max(1, min(num_actors, len(shard_ids)))
        assignment: list[list[int]] = [[] for _ in range(num_actors)]
        for i, sid in enumerate(shard_ids):
            assignment[i % num_actors].append(sid)
        self.actors = [
            SearchActor.remote(self.index_dir, sids, self.manifest)
            for sids in assignment if sids
        ]

    def parse(self, text: str) -> Query:
        from ..analysis import get_analyzer

        return parse_query(text, get_analyzer(self.analyzer_name))

    def search_batch(self, queries: list[Query | str], k: int = 10,
                     sort=None, filter_range=None
                     ) -> list[list[tuple[int, float]]]:
        parsed = [self.parse(q) if isinstance(q, str) else q for q in queries]
        all_terms = sorted(set().union(*[collect_terms(q) for q in parsed])
                           if parsed else set())
        # phase 1: global stats (one round trip for the whole batch)
        partials = ray.get([a.local_df.remote(all_terms) for a in self.actors])
        global_df: dict[str, int] = {}
        for p in partials:
            for t, d in p.items():
                global_df[t] = global_df.get(t, 0) + d
        df_maps = [
            {t: global_df.get(t, 0) for t in collect_terms(q)} for q in parsed
        ]
        # phase 2: scatter scoring, gather + merge
        futures = [a.search_batch.remote(parsed, df_maps, k, sort,
                                         filter_range) for a in self.actors]
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
               filter_range=None):
        return self.search_batch([query], k, sort=sort,
                                 filter_range=filter_range)[0]

    def facet(self, query: Query | str, field: str,
              limit: int | None = None) -> list[tuple[str, int]]:
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
        counts = ray.get([a.facet_partial.remote(parsed, df, field)
                          for a in self.actors])
        agg: dict[str, int] = {}
        for c in counts:
            for v, n in c.items():
                agg[v] = agg.get(v, 0) + n
        out = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
        return out[:limit] if limit else out

    def close(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
