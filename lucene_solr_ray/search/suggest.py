"""Analyzing / Fuzzy / Infix suggesters (``lucene/suggest`` analog).

Reference semantics:

- ``AnalyzingSuggester`` (``lucene/suggest/src/java/org/apache/lucene/
  search/suggest/analyzing/AnalyzingSuggester.java:69-117``): the surface
  form is analyzed and the ANALYZED form becomes the lookup key (tokens
  joined with SEP_LABEL 0x1f when preserveSep, ``:167,300-302``);
  suggestions are the stored SURFACE forms. Lookup analyzes the query the
  same way and matches entries whose analyzed key has the analyzed query
  as a prefix. Results rank by weight desc, ties by analyzed form asc
  (class javadoc: "tie-broken by the analyzed form"); with ``exactFirst``
  (the default), entries whose analyzed form equals the query exactly are
  returned before all prefix-only matches. At most
  ``maxSurfaceFormsPerAnalyzedForm`` (default 256, ``:251-254,540-541``)
  surfaces are kept per analyzed form (highest weights win). Empty-string
  lookups return no results.

- ``FuzzySuggester`` (``.../analyzing/FuzzySuggester.java:44-109``): like
  AnalyzingSuggester but the analyzed query is matched with up to
  ``maxEdits`` (default 1) Damerau-Levenshtein edits (``transpositions``
  default true), the first ``nonFuzzyPrefix`` (default 1) characters must
  match exactly, and no edits are allowed at all when the analyzed query
  is shorter than ``minFuzzyLength`` (default 3). An entry matches when
  SOME PREFIX of its analyzed key is within ``maxEdits`` of the analyzed
  query (the Levenshtein automaton is intersected with the FST's prefix
  paths, ``FSTUtil.java:intersectPrefixPaths``).

- ``AnalyzingInfixSuggester`` (``.../analyzing/AnalyzingInfixSuggester.java``
  javadoc + ``lookup()``): query tokens may match ANYWHERE in the analyzed
  text, all fully-typed tokens must match exactly (allTermsRequired
  default true), the final token matches as a prefix, results rank by
  weight desc, and matched regions can be highlighted with ``<b>..</b>``.

The FST itself is a Java memory optimization; the Ray-native equivalent
is the same sorted-key-array + binary-search layout the term dictionary
uses (``searcher.py:_TermDict``): prefix lookup = one ``bisect`` range
probe, weights ranked with numpy. The BUILD is distributed — analysis
runs as ``map_batches`` over Arrow batches and the (key, surface) →
max-weight dedup is a bucketed vectorized shuffle — while the finished
dictionary (distinct surface forms, term-dictionary scale, orders of
magnitude smaller than the corpus) is held locally; at cluster scale one
suggester per index shard merged like ``DistributedSearcher.suggest`` is
the same pattern.
"""

from __future__ import annotations

import bisect

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..analysis.analyzer import get_analyzer

# TokenStreamToAutomaton remaps token separators to SEP_LABEL 0x1f when
# preserveSep (AnalyzingSuggester.java:167,300-302).
SEP_LABEL = "\x1f"

DEFAULT_MAX_SURFACE_FORMS = 256   # AnalyzingSuggester.java:207
DEFAULT_MAX_EDITS = 1             # FuzzySuggester.java:104
DEFAULT_TRANSPOSITIONS = True     # FuzzySuggester.java:109
DEFAULT_NON_FUZZY_PREFIX = 1      # FuzzySuggester.java:98
DEFAULT_MIN_FUZZY_LENGTH = 3      # FuzzySuggester.java:93


def _analyzed_key(analyzer, text: str, preserve_sep: bool) -> str:
    toks = analyzer.analyze_terms(text)
    return (SEP_LABEL if preserve_sep else "").join(toks)


def _sorted_prefix_range(keys, prefix: str) -> tuple[int, int]:
    """[lo, hi) index range of ``prefix``-prefixed entries in a sorted
    string sequence (one shared implementation of the sentinel-bounded
    bisect probe; caveat: a key containing U+10FFFF at the boundary
    sorts past the sentinel and is excluded)."""
    lo = bisect.bisect_left(keys, prefix)
    hi = bisect.bisect_left(keys, prefix + "\U0010ffff")
    return lo, hi


def build_entries(
    ds: rd.Dataset,
    text_field: str,
    weight_field: str | None = None,
    *,
    analyzer: str = "standard",
    preserve_sep: bool = True,
    max_surface_forms: int = DEFAULT_MAX_SURFACE_FORMS,
) -> pa.Table:
    """Distributed suggester dictionary build.

    Analysis is a vectorized-per-batch ``map_batches`` stage; the
    (key, surface) → max(weight) dedup is a per-batch partial combine +
    one bucketed shuffle (``bucketed_group_agg``), mirroring
    DocumentDictionary (``suggest/DocumentDictionary.java``: weight read
    from a field per doc) + the maxSurfaceFormsPerAnalyzedForm cap
    (``AnalyzingSuggester.java:540-541``, highest weights kept).

    Returns an Arrow table (key, surface, weight) sorted by key.
    """
    import pandas as pd

    from ..pipelines.util import bucketed_group_agg, materialize_typed

    aname = analyzer

    class _Analyze:
        def __init__(self):
            self.analyzer = get_analyzer(aname)

        def __call__(self, batch: pa.Table) -> pa.Table:
            surfaces = batch.column(text_field).to_pylist()
            if weight_field is not None:
                weights = batch.column(weight_field).to_numpy(
                    zero_copy_only=False).astype(np.int64)
            else:
                weights = np.ones(len(surfaces), dtype=np.int64)
            keys = [_analyzed_key(self.analyzer, s or "", preserve_sep)
                    for s in surfaces]
            return pa.table({
                "key": pa.array(keys, type=pa.string()),
                "surface": pa.array(surfaces, type=pa.string()),
                "weight": pa.array(weights, type=pa.int64()),
            })

    analyzed = ds.map_batches(_Analyze, batch_format="pyarrow",
                              concurrency=(1, 8), num_cpus=1)

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["key", "surface"], as_index=False)["weight"]
                .max())

    schema = pa.schema([("key", pa.string()), ("surface", pa.string()),
                        ("weight", pa.int64())])
    deduped = materialize_typed(
        bucketed_group_agg(analyzed, ["key", "surface"], dedup, pre=dedup),
        schema)
    # dictionary-scale result (distinct surface forms) — local finish:
    # sort by key, cap surfaces per analyzed form keeping highest weights.
    df = deduped.to_pandas()
    df = df[df["key"] != ""]
    df = df.sort_values(["key", "weight", "surface"],
                        ascending=[True, False, True], kind="mergesort")
    df = df.groupby("key", as_index=False, sort=False).head(
        max_surface_forms)
    df = df.sort_values("key", kind="mergesort").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False).cast(schema)


class AnalyzingSuggester:
    """Sorted-array suggester over analyzed forms (AnalyzingSuggester)."""

    def __init__(self, entries: pa.Table, *, analyzer: str = "standard",
                 preserve_sep: bool = True, exact_first: bool = True):
        self.analyzer = get_analyzer(analyzer)
        self.preserve_sep = preserve_sep
        self.exact_first = exact_first
        self._keys: list[str] = entries.column("key").to_pylist()
        self._surfaces = np.asarray(entries.column("surface").to_pylist(),
                                    dtype=object)
        self._weights = entries.column("weight").to_numpy(
            zero_copy_only=False).astype(np.int64)

    @classmethod
    def build(cls, ds: rd.Dataset, text_field: str,
              weight_field: str | None = None, *,
              analyzer: str = "standard", preserve_sep: bool = True,
              exact_first: bool = True,
              max_surface_forms: int = DEFAULT_MAX_SURFACE_FORMS):
        entries = build_entries(
            ds, text_field, weight_field, analyzer=analyzer,
            preserve_sep=preserve_sep, max_surface_forms=max_surface_forms)
        return cls(entries, analyzer=analyzer, preserve_sep=preserve_sep,
                   exact_first=exact_first)

    def _query_key(self, query: str) -> str:
        return _analyzed_key(self.analyzer, query, self.preserve_sep)

    def _prefix_range(self, prefix: str) -> tuple[int, int]:
        return _sorted_prefix_range(self._keys, prefix)

    def _rank(self, idx: np.ndarray, qkey: str, num: int):
        """weight desc, analyzed key asc, surface asc; exactFirst pulls
        key == qkey entries ahead (AnalyzingSuggester.java:146,class doc)."""
        if len(idx) == 0:
            return []
        keys = np.asarray([self._keys[i] for i in idx], dtype=object)
        order = sorted(
            range(len(idx)),
            key=lambda j: (
                0 if (self.exact_first and keys[j] == qkey) else 1,
                -int(self._weights[idx[j]]),
                keys[j],
                self._surfaces[idx[j]],
            ))
        picked = order[:num]
        return [(str(self._surfaces[idx[j]]), int(self._weights[idx[j]]))
                for j in picked]

    def lookup(self, query: str, num: int = 5) -> list[tuple[str, int]]:
        qkey = self._query_key(query)
        if not qkey:
            return []   # empty-string lookups return no results (class doc)
        lo, hi = self._prefix_range(qkey)
        return self._rank(np.arange(lo, hi), qkey, num)


def _min_prefix_edit_distance(query: str, key: str, max_edits: int,
                              transpositions: bool) -> int:
    """min over prefixes p of ``key`` of DL(query, p), early-cut at
    ``max_edits`` (the FuzzySuggester automaton-∩-FST-prefix-paths
    equivalence). Only the first len(query)+max_edits key chars matter.

    Each DP row is vectorized over the query: deletion/substitution
    candidates are one shifted minimum, the transposition term one
    masked minimum, and the left-to-right insertion chain
    ``cur[j] = min(cand[j], cur[j-1]+1)`` resolves in closed form as
    ``cummin(cand - j) + j`` — no per-cell Python."""
    n = len(query)
    if n == 0:
        return 0
    q = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32)
    k = np.frombuffer(key[: n + max_edits].encode("utf-32-le"),
                      dtype=np.uint32)
    idx = np.arange(n + 1, dtype=np.int64)
    prev2 = None
    prev = idx.copy()                      # row for the empty key prefix
    best = n                               # p = "" prefix
    kc_prev = None
    for i in range(1, len(k) + 1):
        kc = k[i - 1]
        cost = (q != kc).astype(np.int64)
        cand = np.minimum(prev[1:] + 1, prev[:-1] + cost)   # j = 1..n
        if transpositions and i > 1 and n > 1:
            tmask = (q[1:] == kc_prev) & (q[:-1] == kc)     # j = 2..n
            cand[1:] = np.where(tmask,
                                np.minimum(cand[1:], prev2[:n - 1] + 1),
                                cand[1:])
        tmp = np.concatenate(([i], cand)) - idx
        cur = np.minimum.accumulate(tmp) + idx
        best = min(best, int(cur[n]))
        if best == 0:
            break
        # row mins can dip once more via the two-rows-back transposition
        # term, so require BOTH trailing rows above the cap before cutting
        if int(cur.min()) > max_edits and int(prev.min()) > max_edits:
            break
        prev2, prev, kc_prev = prev, cur, kc
    return best


class FuzzySuggester(AnalyzingSuggester):
    """AnalyzingSuggester with Damerau-Levenshtein-tolerant lookup
    (FuzzySuggester.java:44-109 defaults)."""

    def __init__(self, entries: pa.Table, *, analyzer: str = "standard",
                 preserve_sep: bool = True, exact_first: bool = True,
                 max_edits: int = DEFAULT_MAX_EDITS,
                 transpositions: bool = DEFAULT_TRANSPOSITIONS,
                 non_fuzzy_prefix: int = DEFAULT_NON_FUZZY_PREFIX,
                 min_fuzzy_length: int = DEFAULT_MIN_FUZZY_LENGTH):
        super().__init__(entries, analyzer=analyzer,
                         preserve_sep=preserve_sep, exact_first=exact_first)
        self.max_edits = max_edits
        self.transpositions = transpositions
        self.non_fuzzy_prefix = non_fuzzy_prefix
        self.min_fuzzy_length = min_fuzzy_length

    @classmethod
    def build(cls, ds: rd.Dataset, text_field: str,
              weight_field: str | None = None, *,
              analyzer: str = "standard", preserve_sep: bool = True,
              max_surface_forms: int = DEFAULT_MAX_SURFACE_FORMS,
              **fuzzy_opts):
        entries = build_entries(
            ds, text_field, weight_field, analyzer=analyzer,
            preserve_sep=preserve_sep, max_surface_forms=max_surface_forms)
        return cls(entries, analyzer=analyzer, preserve_sep=preserve_sep,
                   **fuzzy_opts)

    def lookup(self, query: str, num: int = 5) -> list[tuple[str, int]]:
        qkey = self._query_key(query)
        if not qkey:
            return []
        # no edits below minFuzzyLength (FuzzySuggester.java:93)
        edits = self.max_edits if len(qkey) >= self.min_fuzzy_length else 0
        if edits == 0:
            return super().lookup(query, num)
        nfp = min(self.non_fuzzy_prefix, len(qkey))
        lo, hi = self._prefix_range(qkey[:nfp])
        qtail = qkey[nfp:]
        hits = [i for i in range(lo, hi)
                if _min_prefix_edit_distance(
                    qtail, self._keys[i][nfp:], edits,
                    self.transpositions) <= edits]
        return self._rank(np.asarray(hits, dtype=np.int64), qkey, num)


def _write_json_atomic(path, obj) -> None:
    import json as _json
    import os as _os

    tmp = str(path) + ".tmp"
    with open(tmp, "w") as f:
        f.write(_json.dumps(obj))
    _os.replace(tmp, str(path))


class _SuggesterPersistence:
    """Lookup.store()/load() analog (``suggest/Lookup.java``): the
    dictionary parquet + a meta json, written atomically."""

    _META = "_suggester_meta.json"
    _DATA = "entries.parquet"

    @classmethod
    def _save(cls, out_dir: str, table: pa.Table, meta: dict) -> None:
        import pyarrow.parquet as pq
        from pathlib import Path as _P

        out = _P(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        pq.write_table(table, out / (cls._DATA + ".tmp"))
        import os as _os
        _os.replace(out / (cls._DATA + ".tmp"), out / cls._DATA)
        _write_json_atomic(out / cls._META, meta)

    @classmethod
    def _load(cls, in_dir: str) -> tuple[pa.Table, dict]:
        import json as _json
        import pyarrow.parquet as pq
        from pathlib import Path as _P

        p = _P(in_dir)
        meta = _json.loads((p / cls._META).read_text())
        return pq.read_table(p / cls._DATA), meta


def save_suggester(sugg, out_dir: str) -> None:
    """Persist a suggester's dictionary (entries or n-gram counts) so a
    serving process can load without re-scanning the corpus."""
    if isinstance(sugg, FreeTextSuggester):
        table = pa.table({
            "gram": pa.array(list(sugg._counts.keys()), type=pa.string()),
            "cnt": pa.array(list(sugg._counts.values()), type=pa.int64())})
        meta = {"kind": "freetext", "grams": sugg.grams}
        _SuggesterPersistence._save(out_dir, table, meta)
        return
    table = pa.table({
        "key": pa.array(sugg._keys if hasattr(sugg, "_keys") else
                        [None] * len(sugg._surfaces), type=pa.string()),
        "surface": pa.array(list(sugg._surfaces), type=pa.string()),
        "weight": pa.array(sugg._weights, type=pa.int64())})
    meta = {"kind": type(sugg).__name__}
    _SuggesterPersistence._save(out_dir, table, meta)


def load_suggester(in_dir: str, **opts):
    """Reconstruct a saved suggester; ``opts`` override lookup-time
    parameters (analyzer must match the build)."""
    table, meta = _SuggesterPersistence._load(in_dir)
    kind = meta["kind"]
    if kind == "freetext":
        counts = dict(zip(table.column("gram").to_pylist(),
                          (int(c) for c in
                           table.column("cnt").to_pylist())))
        return FreeTextSuggester(counts, grams=meta["grams"], **opts)
    cls = {"AnalyzingSuggester": AnalyzingSuggester,
           "FuzzySuggester": FuzzySuggester,
           "AnalyzingInfixSuggester": AnalyzingInfixSuggester,
           "BlendedInfixSuggester": BlendedInfixSuggester}[kind]
    return cls(table, **opts)


class FreeTextSuggester:
    """Stupid-backoff n-gram language model over the corpus text
    (``.../analyzing/FreeTextSuggester.java:83-131,551-715``): shingles of
    order 1..grams (default 2, ``DEFAULT_GRAMS``) are counted; lookup
    predicts completions of the last (possibly partial) token from the
    highest-order model that saw the context, stepping down with
    ALPHA=0.4 per model and deduping completions by last token across
    models (``seen`` set, :557). Scores are backoff * count(gram) /
    count(context) in [0,1] (the reference fixed-points this by
    Long.MAX_VALUE; we keep the float). A trailing separator in the query
    "upgrades" the context so ``"foo "`` predicts words AFTER foo rather
    than words starting with foo (:528-543).

    The count table is built distributed (per-batch shingle Counters →
    bucketed sum shuffle); the finished model is n-gram-vocabulary
    scale."""

    ALPHA = 0.4                      # FreeTextSuggester.java:131
    NGRAM_SEP = "\x1e"               # DEFAULT_SEPARATOR (0x1e)

    def __init__(self, counts: dict[str, int], *, grams: int = 2,
                 analyzer: str = "standard"):
        self.grams = grams
        self.analyzer = get_analyzer(analyzer)
        self._counts = counts
        # per-order sorted key lists for prefix range scans
        self._by_order: dict[int, list[str]] = {}
        for g in sorted({k.count(self.NGRAM_SEP) + 1 for k in counts}):
            self._by_order[g] = sorted(
                k for k in counts if k.count(self.NGRAM_SEP) + 1 == g)
        self.tot_tokens = sum(v for k, v in counts.items()
                              if self.NGRAM_SEP not in k)

    @classmethod
    def build(cls, ds: rd.Dataset, text_field: str, *, grams: int = 2,
              analyzer: str = "standard"):
        import pandas as pd

        from ..pipelines.util import bucketed_group_agg, materialize_typed

        sep, aname = cls.NGRAM_SEP, analyzer

        class _Shingle:
            def __init__(self):
                self.analyzer = get_analyzer(aname)

            def __call__(self, batch: pa.Table) -> pa.Table:
                from collections import Counter
                c: Counter = Counter()
                for text in batch.column(text_field).to_pylist():
                    toks = self.analyzer.analyze_terms(text or "")
                    for order in range(1, grams + 1):
                        for i in range(len(toks) - order + 1):
                            c[sep.join(toks[i:i + order])] += 1
                return pa.table({
                    "gram": pa.array(list(c.keys()), type=pa.string()),
                    "cnt": pa.array(list(c.values()), type=pa.int64())})

        def total(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("gram", as_index=False)["cnt"].sum()

        schema = pa.schema([("gram", pa.string()), ("cnt", pa.int64())])
        shingled = ds.map_batches(_Shingle, batch_format="pyarrow",
                                  concurrency=(1, 8), num_cpus=1)
        table = materialize_typed(
            bucketed_group_agg(shingled, ["gram"], total, pre=total),
            schema)
        df = table.to_pandas()
        return cls(dict(zip(df["gram"], df["cnt"].astype(int))),
                   grams=grams, analyzer=analyzer)

    def _prefix_grams(self, order: int, prefix: str) -> list[str]:
        """Stored grams of ``order`` starting with ``prefix`` whose
        remainder stays inside the model (no separator in the suffix —
        the addIfCompetitive separator-arc rejection, :648)."""
        keys = self._by_order.get(order, [])
        lo, hi = _sorted_prefix_range(keys, prefix)
        return [k for k in keys[lo:hi]
                if self.NGRAM_SEP not in k[len(prefix):]]

    def lookup(self, key: str, num: int = 5) -> list[tuple[str, float]]:
        sep = self.NGRAM_SEP
        toks = self.analyzer.analyze_terms(key)
        if not toks:
            return []
        # trailing non-token chars mean the last token ended (:525)
        last_ended = bool(key) and not key[-1].isalnum()
        last_tokens: list[str | None] = [None] * self.grams
        for g in range(self.grams):
            if len(toks) >= g + 1:
                last_tokens[g] = sep.join(toks[-(g + 1):])
        if last_ended:
            for g in range(self.grams - 1, 0, -1):
                if last_tokens[g - 1] is not None:
                    last_tokens[g] = last_tokens[g - 1] + sep
            last_tokens[0] = ""

        backoff = 1.0
        seen: set[str] = set()
        results: list[tuple[str, float]] = []
        for gram in range(self.grams - 1, -1, -1):
            token = last_tokens[gram]
            if token is None or (token == "" and key):
                continue
            cands = self._prefix_grams(gram + 1, token)
            if not cands:
                backoff *= self.ALPHA
                continue
            if sep in token:
                context = token.rsplit(sep, 1)[0]
                context_count = self._counts.get(context, 0)
            else:
                context_count = self.tot_tokens
            if context_count <= 0:
                backoff *= self.ALPHA
                continue
            for cand in cands:
                last_tok = cand.rsplit(sep, 1)[-1]
                if last_tok in seen:
                    continue
                seen.add(last_tok)
                results.append(
                    (cand, backoff * self._counts[cand] / context_count))
            backoff *= self.ALPHA
        results.sort(key=lambda r: (-r[1], r[0]))
        return results[:num]


def suggest_docs_source(sf_dir: str) -> pa.Table:
    """Driver query: AnalyzingSuggester over ``documents.source``
    (single-token surfaces) weighted by max ``n_chars``; lookup("src1")
    top-5 with exactFirst. SQL-expressible because the analyzed key of a
    lowercase single-token surface is the surface itself."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "n_chars"])
    sugg = AnalyzingSuggester.build(ds, "source", "n_chars")
    hits = sugg.lookup("src1", num=5)
    return pa.table({
        "surface": pa.array([s for s, _ in hits], type=pa.string()),
        "weight": pa.array([w for _, w in hits], type=pa.int64()),
    })


class AnalyzingInfixSuggester:
    """Token-postings suggester: exact inner tokens + prefix last token,
    ranked by weight desc (AnalyzingInfixSuggester javadoc/lookup)."""

    def __init__(self, entries: pa.Table, *, analyzer: str = "standard",
                 all_terms_required: bool = True):
        self.analyzer = get_analyzer(analyzer)
        self.all_terms_required = all_terms_required
        self._surfaces = np.asarray(entries.column("surface").to_pylist(),
                                    dtype=object)
        self._weights = entries.column("weight").to_numpy(
            zero_copy_only=False).astype(np.int64)
        # token -> sorted entry-id postings; sorted token list for prefixes
        postings: dict[str, set[int]] = {}
        for eid, surf in enumerate(self._surfaces):
            for tok in set(self.analyzer.analyze_terms(surf or "")):
                postings.setdefault(tok, set()).add(eid)
        self._postings = {t: np.asarray(sorted(s), dtype=np.int64)
                          for t, s in postings.items()}
        self._tokens = sorted(self._postings)

    @classmethod
    def build(cls, ds: rd.Dataset, text_field: str,
              weight_field: str | None = None, *,
              analyzer: str = "standard", all_terms_required: bool = True,
              max_surface_forms: int = DEFAULT_MAX_SURFACE_FORMS):
        # infix keys on the surface itself; dedup identical surfaces to
        # max weight (preserve_sep irrelevant — postings are per token)
        entries = build_entries(
            ds, text_field, weight_field, analyzer=analyzer,
            preserve_sep=True, max_surface_forms=max_surface_forms)
        return cls(entries, analyzer=analyzer,
                   all_terms_required=all_terms_required)

    def _prefix_postings(self, prefix: str) -> np.ndarray:
        lo, hi = _sorted_prefix_range(self._tokens, prefix)
        if lo == hi:
            return np.empty(0, dtype=np.int64)
        arrs = [self._postings[self._tokens[i]] for i in range(lo, hi)]
        return np.unique(np.concatenate(arrs))

    def lookup(self, query: str, num: int = 5, *,
               highlight: bool = False) -> list[tuple]:
        toks = self.analyzer.analyze_terms(query)
        if not toks:
            return []
        exact, last = toks[:-1], toks[-1]
        sets = [self._postings.get(t, np.empty(0, dtype=np.int64))
                for t in exact]
        sets.append(self._prefix_postings(last))
        if self.all_terms_required:
            cand = sets[0]
            for s in sets[1:]:
                cand = np.intersect1d(cand, s, assume_unique=True)
        else:
            cand = np.unique(np.concatenate(sets))
        if len(cand) == 0:
            return []
        order = sorted(cand.tolist(),
                       key=lambda e: (-int(self._weights[e]),
                                      str(self._surfaces[e])))[:num]
        out = []
        for e in order:
            surf = str(self._surfaces[e])
            w = int(self._weights[e])
            if highlight:
                out.append((surf, w, self._highlight(surf, exact, last)))
            else:
                out.append((surf, w))
        return out

    def _highlight(self, surface: str, exact: list[str], last: str) -> str:
        """Wrap matched tokens in <b>..</b> (reference default markup);
        prefix matches highlight only the typed prefix region + remainder
        like the reference's addPrefixMatch."""
        import re

        exact_set = set(exact)
        parts = []
        pos = 0
        for m in re.finditer(r"\w+", surface, re.UNICODE):
            tok_lc = m.group(0).lower()
            parts.append(surface[pos:m.start()])
            if tok_lc in exact_set:
                parts.append(f"<b>{m.group(0)}</b>")
            elif last and tok_lc.startswith(last):
                cut = m.start() + len(last)
                parts.append(f"<b>{surface[m.start():cut]}</b>"
                             f"{surface[cut:m.end()]}")
            else:
                parts.append(m.group(0))
            pos = m.end()
        parts.append(surface[pos:])
        return "".join(parts)


class BlendedInfixSuggester(AnalyzingInfixSuggester):
    """Infix suggester whose scores blend the stored weight with the
    POSITION of the first matched token
    (``.../analyzing/BlendedInfixSuggester.java:88-92,196-321``):
    coefficient = 1 when the text starts with the query, else
    ``position_linear`` 1 - 0.10*p (default), ``position_reciprocal``
    1/(p+1), or ``position_exponential_reciprocal`` 1/(p+1)^exponent;
    blended score = weight * coefficient. Internally over-fetches
    num*num_factor candidates before re-ranking (:170,199)."""

    LINEAR_COEF = 0.10          # BlendedInfixSuggester.java:62
    DEFAULT_NUM_FACTOR = 10     # :70

    def __init__(self, entries: pa.Table, *, analyzer: str = "standard",
                 all_terms_required: bool = True,
                 blender_type: str = "position_linear",
                 num_factor: int = DEFAULT_NUM_FACTOR,
                 exponent: float = 2.0):
        super().__init__(entries, analyzer=analyzer,
                         all_terms_required=all_terms_required)
        self.blender_type = blender_type
        self.num_factor = num_factor
        self.exponent = exponent
        # first occurrence position of each token per entry (the term
        # vector walk in createCoefficient:268-289)
        self._first_pos: list[dict[str, int]] = []
        for surf in self._surfaces:
            fp: dict[str, int] = {}
            for p, tok in enumerate(self.analyzer.analyze_terms(surf or "")):
                fp.setdefault(tok, p)
            self._first_pos.append(fp)

    @classmethod
    def build(cls, ds: rd.Dataset, text_field: str,
              weight_field: str | None = None, *,
              analyzer: str = "standard", all_terms_required: bool = True,
              max_surface_forms: int = DEFAULT_MAX_SURFACE_FORMS,
              **blend_opts):
        entries = build_entries(
            ds, text_field, weight_field, analyzer=analyzer,
            preserve_sep=True, max_surface_forms=max_surface_forms)
        return cls(entries, analyzer=analyzer,
                   all_terms_required=all_terms_required, **blend_opts)

    def _coefficient(self, position: int) -> float:
        if self.blender_type == "position_linear":
            return 1.0 - self.LINEAR_COEF * position
        if self.blender_type == "position_reciprocal":
            return 1.0 / (position + 1)
        if self.blender_type == "position_exponential_reciprocal":
            return 1.0 / (position + 1.0) ** self.exponent
        return 1.0

    def lookup(self, query: str, num: int = 5, *,
               highlight: bool = False) -> list[tuple]:
        base = super().lookup(query, num * self.num_factor,
                              highlight=highlight)
        if not base:
            return []
        toks = self.analyzer.analyze_terms(query)
        exact, last = set(toks[:-1]), toks[-1]
        by_surface = {str(self._surfaces[e]): e
                      for e in range(len(self._surfaces))}
        blended = []
        for row in base:
            surf, weight = row[0], row[1]
            if surf.startswith(query):
                coeff = 1.0   # hit starts with the key: score unchanged
            else:
                fp = self._first_pos[by_surface[surf]]
                pos = min((p for t, p in fp.items()
                           if t in exact or t.startswith(last)),
                          default=0)
                coeff = self._coefficient(pos)
            score = weight * coeff
            blended.append((*row, score))
        blended.sort(key=lambda r: (-r[-1], r[0]))
        return blended[:num]

