"""Higher-level search features over the core engine.

- ``search_conversations``: parent/child block join (SURVEY.md §2.5,
  ``lucene/join/`` ToParentBlockJoinQuery): turn-level hits aggregate to
  conversation-level scores (ScoreMode.Max / Total); children are
  doc_id-contiguous within a conversation by construction (the
  addDocuments block invariant, IndexWriter.java:1327).
- ``rerank``: QueryRescorer / ReRankQParserPlugin semantics
  (``search/QueryRescorer.java``): rescore the first-pass top-N with a
  second query, combined score = first + weight * second (only for docs
  matching the rerank query).
- ``more_like_this``: MoreLikeThis term selection (``lucene/queries/.../
  mlt/MoreLikeThis.java``): top tf*idf terms of the seed text become an
  OR query.
- ``highlight``: simple unified-highlighter analog using the analyzer's
  token offsets.
"""

from __future__ import annotations

import numpy as np

from ..analysis import get_analyzer
from . import bm25
from .query import BooleanQuery, Query, TermQuery
from .searcher import IndexSearcher, collect_terms


def _all_hits(searcher: IndexSearcher, query: Query | str):
    """(doc_ids, scores) over every matching doc, all shards."""
    if isinstance(query, str):
        query = searcher.parse(query)
    df_map = searcher.global_df(query)
    docs_all, scores_all = [], []
    for sh in searcher.shards:
        d, s = sh._score_clause(query, df_map)
        docs_all.append(d)
        scores_all.append(s)
    return np.concatenate(docs_all), np.concatenate(scores_all)


def search_conversations(searcher: IndexSearcher, query: Query | str,
                         k: int = 10, score_mode: str = "max"):
    """Top-k conversations by aggregated turn scores (block join)."""
    docs, scores = _all_hits(searcher, query)
    if len(docs) == 0:
        return []
    docmap = searcher.docmap()
    convs = docmap[docs]  # conv_id per hit doc
    order = np.argsort(convs, kind="stable")
    convs_s, scores_s = convs[order], scores[order]
    starts = np.concatenate(([True], convs_s[1:] != convs_s[:-1]))
    idx = np.nonzero(starts)[0]
    groups = convs_s[idx]
    if score_mode == "max":
        agg = np.maximum.reduceat(scores_s, idx)
    elif score_mode == "total":
        agg = np.add.reduceat(scores_s.astype(np.float32), idx)
    else:
        raise ValueError(score_mode)
    top = np.lexsort((groups, -agg.astype(np.float32)))[:k]
    return [(str(groups[i]), np.float32(agg[i])) for i in top]


def collapse_search(searcher: IndexSearcher, query: Query | str,
                    k: int = 10):
    """Field collapse on conversation: the single best-scoring turn per
    conversation, top-k conversations (CollapsingQParserPlugin semantics:
    group head = max score, tie -> lower doc_id)."""
    docs, scores = _all_hits(searcher, query)
    if len(docs) == 0:
        return []
    dm = searcher.docmap()
    convs = dm[docs]
    # per conversation: argmax score with lower-doc tie-break
    order = np.lexsort((docs, -scores.astype(np.float32), convs))
    convs_s = convs[order]
    heads = np.concatenate(([True], convs_s[1:] != convs_s[:-1]))
    head_idx = order[heads]
    hd, hs = docs[head_idx], scores[head_idx]
    top = np.lexsort((hd, -hs.astype(np.float32)))[:k]
    return [(int(hd[i]), np.float32(hs[i]), str(dm[hd[i]])) for i in top]


def expand_groups(searcher: IndexSearcher, query: Query | str,
                  heads: list, per_group: int = 5):
    """ExpandComponent (``solr/core/src/java/org/apache/solr/handler/
    component/ExpandComponent.java``): for each collapsed head, the other
    matching docs of its conversation, ranked (score desc, doc asc),
    ``per_group`` each. ``heads``: collapse_search output
    [(doc_id, score, conv_id)]. Returns {conv_id: [(doc_id, score)]}."""
    if not heads:
        return {}
    docs, scores = _all_hits(searcher, query)
    if len(docs) == 0:
        return {c: [] for _, _, c in heads}
    dm = searcher.docmap()
    convs = dm[docs]
    head_docs = {int(d) for d, _, _ in heads}
    out: dict[str, list] = {}
    for _, _, conv in heads:
        mask = convs == conv
        g_docs, g_scores = docs[mask], scores[mask]
        order = np.lexsort((g_docs, -g_scores.astype(np.float32)))
        rows = [(int(g_docs[i]), float(np.float32(g_scores[i])))
                for i in order if int(g_docs[i]) not in head_docs]
        out[str(conv)] = rows[:per_group]
    return out


def rerank(searcher: IndexSearcher, query: Query | str,
           rerank_query: Query | str, k: int = 10, top_n: int = 50,
           weight: float = 2.0):
    """First-pass top-N, rescored: final = first + weight * rerank_score."""
    first = searcher.search(query, k=top_n)
    if not first:
        return []
    if isinstance(rerank_query, str):
        rerank_query = searcher.parse(rerank_query)
    r_docs, r_scores = _all_hits(searcher, rerank_query)
    rmap = dict(zip(r_docs.tolist(), r_scores.tolist()))
    out = []
    for doc_id, score in first:
        extra = rmap.get(doc_id, 0.0)
        combined = np.float32(score + np.float32(weight) * np.float32(extra))
        out.append((doc_id, combined))
    out.sort(key=lambda h: (-float(h[1]), h[0]))
    return out[:k]


def _mlt_scored_terms(searcher: IndexSearcher, text: str,
                      max_query_terms: int, min_doc_freq: int):
    """The seed text's top (tf*idf, term) pairs, score-descending."""
    analyzer = get_analyzer(searcher.analyzer_name)
    terms, _ = analyzer.analyze(text)
    if not terms:
        return []
    uniq, counts = np.unique(np.array(terms, dtype=object), return_counts=True)
    probe = BooleanQuery(should=[TermQuery(str(t)) for t in uniq])
    df_map = searcher.global_df(probe)
    doc_count = searcher.manifest["stats"]["doc_count"]
    scored = []
    for t, tf in zip(uniq, counts):
        df = df_map.get(str(t), 0)
        if df < min_doc_freq:
            continue
        scored.append((float(tf) * float(bm25.idf(df, doc_count)), str(t)))
    scored.sort(reverse=True)
    return scored[:max_query_terms]


def more_like_this(searcher: IndexSearcher, text: str, k: int = 10,
                   max_query_terms: int = 25, min_doc_freq: int = 2):
    """Build an OR query from the seed text's top tf*idf terms, search it."""
    chosen = [TermQuery(t) for _, t in
              _mlt_scored_terms(searcher, text, max_query_terms,
                                min_doc_freq)]
    if not chosen:
        return []
    return searcher.search(BooleanQuery(should=chosen), k=k)


def interesting_terms(searcher: IndexSearcher, text: str,
                      max_query_terms: int = 25, min_doc_freq: int = 2,
                      boost: bool = True) -> list[tuple[str, float]]:
    """MoreLikeThisHandler ``interestingTerms=details``
    (``solr/core/src/java/org/apache/solr/handler/
    MoreLikeThisHandler.java:212-226`` response assembly, :454-474
    fillInterestingTermsFromMLTQuery): the MLT query's chosen terms
    with their clause boosts — MoreLikeThis normalizes each term's
    tf*idf by the best score when boosting (best term reads 1.0);
    without boost every term carries 1f."""
    scored = _mlt_scored_terms(searcher, text, max_query_terms,
                               min_doc_freq)
    if not scored:
        return []
    if not boost:
        return [(t, 1.0) for _, t in scored]
    best = scored[0][0] or 1.0
    return [(t, s / best) for s, t in scored]


def highlight(text: str, query: Query | str, analyzer_name: str = "standard",
              window: int = 40, pre: str = "<b>", post: str = "</b>") -> str:
    """Snippet around the first query-term match, matches wrapped."""
    analyzer = get_analyzer(analyzer_name)
    if isinstance(query, str):
        from .query import parse_query

        query = parse_query(query, analyzer)
    wanted = collect_terms(query)
    from ..analysis.analyzer import java_lowercase

    tokens = analyzer.tokenizer.tokenize_full(text)
    matches = [t for t in tokens if java_lowercase(t.text) in wanted]
    if not matches:
        return text[: 2 * window]
    first = matches[0]
    lo = max(0, first.start - window)
    hi = min(len(text), first.end + window)
    spans = [(t.start, t.end) for t in matches if lo <= t.start and t.end <= hi]
    out, cur = [], lo
    for s, e in spans:
        out.append(text[cur:s])
        out.append(pre + text[s:e] + post)
        cur = e
    out.append(text[cur:hi])
    return ("..." if lo > 0 else "") + "".join(out) + \
        ("..." if hi < len(text) else "")


def best_fragments(text: str, query: Query | str,
                   analyzer_name: str = "standard",
                   fragment_size: int = 100, max_fragments: int = 3,
                   pre: str = "<b>", post: str = "</b>",
                   merge_contiguous: bool = True,
                   weights: dict[str, float] | None = None,
                   ) -> list[tuple[str, float]]:
    """Scored multi-fragment highlighting (``lucene/highlighter/src/java/
    org/apache/lucene/search/highlight/Highlighter.java:60``
    getBestFragments with QueryScorer + SimpleFragmenter semantics):

    - the text is fragmented at token boundaries every ``fragment_size``
      chars (SimpleFragmenter.isNewFragment);
    - each fragment scores the sum of weights of the DISTINCT query
      terms it contains (QueryScorer counts a term once per fragment;
      default weight 1.0, or pass per-term weights, e.g. idf);
    - contiguous scoring fragments merge (mergeContiguousFragments);
    - the top ``max_fragments`` come back ordered by descending score,
      ties in document order, matches wrapped in ``pre``/``post``.
    """
    analyzer = get_analyzer(analyzer_name)
    if isinstance(query, str):
        from .query import parse_query

        query = parse_query(query, analyzer)
    wanted = collect_terms(query)
    from ..analysis.analyzer import java_lowercase

    tokens = analyzer.tokenizer.tokenize_full(text)
    # fragment boundaries: first token whose end crosses the next
    # fragment_size multiple starts a new fragment
    frags: list[dict] = []
    cur = {"start": 0, "tokens": [], "idx": 0}
    boundary = fragment_size
    for t in tokens:
        if t.end > boundary and cur["tokens"]:
            cur["end"] = cur["tokens"][-1].end
            frags.append(cur)
            cur = {"start": cur["end"], "tokens": [], "idx": len(frags)}
            while boundary < t.end:
                boundary += fragment_size
        cur["tokens"].append(t)
    if cur["tokens"]:
        cur["end"] = len(text)
        frags.append(cur)
    if not frags:
        return []
    frags[-1]["end"] = len(text)

    def score_of(frag) -> tuple[float, list]:
        seen: set[str] = set()
        s = 0.0
        matched = []
        for t in frag["tokens"]:
            term = java_lowercase(t.text)
            if term in wanted:
                matched.append(t)
                if term not in seen:
                    seen.add(term)
                    s += (weights or {}).get(term, 1.0)
        return s, matched

    scored = []
    for f in frags:
        s, matched = score_of(f)
        if s > 0:
            scored.append({**f, "score": s, "matched": matched})
    if merge_contiguous and scored:
        merged = [scored[0]]
        for f in scored[1:]:
            prev = merged[-1]
            if f["idx"] == prev["idx"] + 1:
                # re-score the union so shared terms still count once
                u = {**prev, "end": f["end"], "idx": f["idx"],
                     "tokens": prev["tokens"] + f["tokens"]}
                u["score"], u["matched"] = score_of(u)
                merged[-1] = u
            else:
                merged.append(f)
        scored = merged
    scored.sort(key=lambda f: (-f["score"], f["start"]))
    out = []
    for f in scored[:max_fragments]:
        pieces, cpos = [], f["start"]
        for t in f["matched"]:
            pieces.append(text[cpos:t.start])
            pieces.append(pre + text[t.start:t.end] + post)
            cpos = t.end
        pieces.append(text[cpos:f["end"]])
        out.append(("".join(pieces).strip(), f["score"]))
    return out


def highlight_hits(searcher, query: Query | str, rows: list[dict],
                   source_path: str, **hl_kw) -> list[dict]:
    """Attach highlight snippets to resolved hit rows (the stored-fields
    + highlighting phase of a Solr request): texts are fetched from the
    SOURCE parquet by (conv_id, turn_idx) key with a pushed-down filter —
    only the page of hits is ever read — and each row gains a
    ``snippet``."""
    import pyarrow.dataset as pads

    if not rows:
        return rows
    want = {(str(r["conv_id"]), int(r["turn_idx"])) for r in rows}
    t = pads.dataset(source_path, format="parquet").to_table(
        columns=["conv_id", "turn_idx", "text"],
        filter=pads.field("conv_id").isin(sorted({c for c, _ in want})))
    texts = {(str(c), int(i)): x
             for c, i, x in zip(t.column("conv_id").to_pylist(),
                                t.column("turn_idx").to_pylist(),
                                t.column("text").to_pylist())
             if (str(c), int(i)) in want}
    n_frags = hl_kw.pop("fragments", 0)
    out = []
    for r in rows:
        text = texts.get((str(r["conv_id"]), int(r["turn_idx"])), "")
        if n_frags > 0:  # hl.snippets > 1: scored multi-fragment path
            fr = best_fragments(text, query, max_fragments=n_frags,
                                analyzer_name=searcher.analyzer_name,
                                **hl_kw)
            snip = " ... ".join(s for s, _ in fr) or text[:80]
        else:
            snip = highlight(text, query,
                             analyzer_name=searcher.analyzer_name, **hl_kw)
        out.append({**r, "snippet": snip})
    return out


def index_stats(searcher, terms: set[str]) -> dict:
    """Index statistics for the ValueSource accessors
    (DocFreqValueSource.java:35 et al.): maxdoc = every assigned doc id
    (deleted included, IndexReader.maxDoc), numdocs = maxdoc minus
    tombstones (IndexReader.numDocs), docfreq = global df per term."""
    from ..index.update import read_deletes

    stats = searcher.manifest["stats"]
    n_del = len(read_deletes(searcher.index_dir))
    df: dict[str, int] = {}
    ttf: dict[str, int] = {}
    if terms:
        if hasattr(searcher, "shards"):  # in-process IndexSearcher
            for sh in searcher.shards:
                for t, d in sh.local_df(sorted(terms)).items():
                    df[t] = df.get(t, 0) + d
                for t, d in sh.local_ttf(sorted(terms)).items():
                    ttf[t] = ttf.get(t, 0) + d
        else:  # DistributedSearcher: one term-stats scatter round
            df, ttf = searcher.global_term_stats(sorted(terms))
    import time

    return {"docfreq": df, "ttf": ttf,
            "numdocs": stats["num_docs"] - n_del,
            "maxdoc": stats["num_docs"],
            "sumttf": stats["sum_total_term_freq"],
            # ms(): one NOW per request (Solr's DateMathParser NOW
            # pinning), computed driver-side so every shard agrees
            "now_ms": time.time() * 1000.0}


def global_uniques(vals) -> list:
    """Sorted distinct non-null values of a doc-value column — the
    ordinal table ord()/rord() rank against (OrdFieldSource semantics:
    rank in index value order)."""
    if vals is None:
        return []
    return sorted({x for x in vals if x is not None})


def picked_ordinals(picked, uniq: list, reverse: bool) -> "np.ndarray":
    """ord()/rord() for already-picked per-hit values: 1-based rank of
    each value in ``uniq`` (0 = missing); rord = n_uniq + 1 - ord
    (OrdFieldSource / ReverseOrdFieldSource semantics)."""
    import numpy as np

    out = np.zeros(len(picked), dtype=np.float64)
    if not uniq:
        return out
    lookup = {v: i + 1 for i, v in enumerate(uniq)}
    n = len(uniq)
    for i, x in enumerate(picked):
        o = lookup.get(x, 0)
        if o:
            out[i] = (n + 1 - o) if reverse else o
    return out


def ordinal_column(vals, docs, uniq: list, reverse: bool) -> "np.ndarray":
    """Per-hit ord()/rord() over a full doc-value column."""
    import numpy as np

    if vals is None:
        return np.zeros(len(docs), dtype=np.float64)
    return picked_ordinals(vals[docs], uniq, reverse)


def decoded_norms(searcher, docs):
    """Per-hit decoded field length (NORM_TABLE[norm_byte]) — the
    NormValueSource column for norm(field)."""
    import numpy as np

    from ..util.smallfloat import NORM_TABLE

    all_norms = np.concatenate([sh.norms for sh in searcher.shards])
    return NORM_TABLE[all_norms[np.asarray(docs, dtype=np.int64)]] \
        .astype(np.float64)


def boosted_search(searcher: IndexSearcher, query: Query | str,
                   boost_expr: str, k: int = 10,
                   mode: str = "multiply"):
    """FunctionScoreQuery / Solr ``{!boost b=f(...)}``
    (``lucene/queries/.../function/FunctionScoreQuery.java``): final
    score = BM25 score * f(docvalues), with f a function-registry
    expression (``functions.valuesource``) over docvalue fields —
    e.g. ``recip(turn_idx,1,10,10)`` for a recency-style boost.
    ``mode="add"`` is the dismax ``bf`` boost-function semantics
    (``solr/core/.../search/DisMaxQParser.java`` addBoostFunctions:
    each bf clause joins the main query as SHOULD, so its function
    value ADDS to the score)."""
    import numpy as np
    import pyarrow as pa

    from ..functions import parse_func
    from ..functions.valuesource import (EXISTS_PSEUDO_PREFIX,
                                         NORM_PSEUDO_FIELD,
                                         ORD_PSEUDO_PREFIX,
                                         RORD_PSEUDO_PREFIX,
                                         TF_PSEUDO_PREFIX, Field, Func,
                                         bind_index_stats, eval_expr,
                                         stats_terms, uses_norm)

    ast = parse_func(boost_expr)
    # bind index-statistics accessors (docfreq/numdocs/maxdoc/norm) to
    # this searcher before the per-doc evaluation
    ast = bind_index_stats(ast, index_stats(searcher, stats_terms(ast)))

    def fields_of(node) -> set[str]:
        if isinstance(node, Field):
            return {node.name}
        if isinstance(node, Func):
            out: set[str] = set()
            for a in node.args:
                out |= fields_of(a)
            return out
        return set()

    docs, scores = _all_hits(searcher, query)
    if len(docs) == 0:
        return []
    fields = fields_of(ast)
    cols = {}
    for f in sorted(fields):
        if f == NORM_PSEUDO_FIELD:
            cols[f] = pa.array(decoded_norms(searcher, docs),
                               type=pa.float64())
            continue
        if f.startswith(TF_PSEUDO_PREFIX):
            # termfreq(t): per-hit tf, each shard fills its doc range
            term = f[len(TF_PSEUDO_PREFIX):]
            tf = np.zeros(len(docs), dtype=np.float64)
            for sh in searcher.shards:
                m = (docs >= sh.base) & (docs < sh.base + sh.docs_per_shard)
                if m.any():
                    tf[m] = sh.local_termfreq(term, docs[m])
            cols[f] = pa.array(tf, type=pa.float64())
            continue
        if f.startswith(EXISTS_PSEUDO_PREFIX):
            fname = f[len(EXISTS_PSEUDO_PREFIX):]
            vals = searcher.docvalues(fname)
            ex = (np.zeros(len(docs)) if vals is None else np.asarray(
                [0.0 if x is None else 1.0 for x in vals[docs]]))
            cols[f] = pa.array(ex, type=pa.float64())
            continue
        if f.startswith(ORD_PSEUDO_PREFIX) or \
                f.startswith(RORD_PSEUDO_PREFIX):
            rev = f.startswith(RORD_PSEUDO_PREFIX)
            pref = RORD_PSEUDO_PREFIX if rev else ORD_PSEUDO_PREFIX
            fname = f[len(pref):]
            vals = searcher.docvalues(fname)
            cols[f] = pa.array(
                ordinal_column(vals, docs, global_uniques(vals), rev),
                type=pa.float64())
            continue
        vals = searcher.docvalues(f)
        if vals is None:
            # def(f, d) lowers to if(exists(f), f, d): an unindexed f
            # evaluates as 0 under exists()=0, not an error
            if EXISTS_PSEUDO_PREFIX + f in fields:
                cols[f] = pa.array(np.zeros(len(docs)), type=pa.float64())
                continue
            raise KeyError(f"field {f!r} was not indexed as a doc value")
        # missing doc values evaluate as 0 (FunctionScoreQuery semantics),
        # not TypeError from a None in the float64 cast
        picked = np.asarray(
            [0.0 if x is None else x for x in vals[docs]], dtype=np.float64)
        cols[f] = pa.array(picked, type=pa.float64())
    boost = eval_expr(ast, pa.table(cols or {"__d": pa.array(
        np.zeros(len(docs)))}))
    if isinstance(boost, pa.Scalar):
        boost_np = np.full(len(docs), boost.as_py())
    else:
        boost_np = boost.to_numpy(zero_copy_only=False)
    if mode == "add":
        final = scores.astype(np.float64) + boost_np
    else:
        final = scores.astype(np.float64) * boost_np
    order = np.lexsort((docs, -final))[:k]
    return [(int(docs[i]), float(final[i])) for i in order]


def field_stats(searcher: IndexSearcher, query: Query | str, field: str):
    """StatsComponent over the query's FULL hit set
    (``solr/core/.../handler/component/StatsComponent.java``):
    count/min/max/sum/mean of a numeric docvalue."""
    import numpy as np

    docs, _ = _all_hits(searcher, query)
    vals = searcher.docvalues(field)
    if vals is None:
        raise KeyError(f"field {field!r} was not indexed as a doc value")
    v = np.asarray([x for x in vals[docs] if x is not None],
                   dtype=np.float64)
    if len(v) == 0:
        return {"count": 0, "min": None, "max": None, "sum": 0.0,
                "mean": None}
    return {"count": int(len(v)), "min": float(v.min()),
            "max": float(v.max()), "sum": float(v.sum()),
            "mean": float(v.mean())}


def elevate(searcher: IndexSearcher, query: Query | str,
            elevated_ids: list[int], k: int = 10,
            exclude_ids: list[int] | None = None):
    """QueryElevationComponent (``solr/core/.../handler/component/
    QueryElevationComponent.java``): pin the configured doc_ids to the top
    (in the given order) regardless of score, optionally exclude others;
    the rest rank by BM25 below the elevated set."""
    excl = set(exclude_ids or [])
    elev = [d for d in elevated_ids if d not in excl]
    hits = searcher.search(query, k=k + len(elev) + len(excl))
    scores = {d: s for d, s in hits}
    out = [(d, float(scores.get(d, 0.0))) for d in elev]
    seen = set(elev) | excl
    for d, s in hits:
        if d in seen:
            continue
        out.append((d, float(s)))
        if len(out) >= k:
            break
    return out[:k]


# --- offsets-based highlighting (PostingsHighlighter.java:100) ----------

def best_fragments_from_offsets(text: str, starts, ends,
                                matched_pos: dict[int, str],
                                fragment_size: int = 100,
                                max_fragments: int = 3,
                                pre: str = "<b>", post: str = "</b>",
                                merge_contiguous: bool = True,
                                weights: dict[str, float] | None = None,
                                ) -> list[tuple[str, float]]:
    """``best_fragments`` computed from STORED token offsets instead of
    re-analysis (PostingsHighlighter semantics): ``starts``/``ends`` are
    the doc's raw-token char spans from the build-time offsets sidecar,
    ``matched_pos`` maps raw token position -> matched query term (from
    one postings probe per query term). Fragmentation, distinct-term
    scoring, contiguous merge and ordering replicate ``best_fragments``
    exactly — pinned by parity goldens in tests/test_highlight_offsets.py
    — without tokenizing the text."""
    import numpy as np

    n = len(starts)
    if n == 0:
        return []
    ends_arr = np.asarray(ends, dtype=np.int64)
    # fragment boundaries computed per FRAGMENT (searchsorted over the
    # monotone token ends), not per token — a 24k-char doc has ~40x
    # fewer fragments than tokens, and this loop was the offsets-path
    # hot spot. Semantics identical to the per-token walk: a fragment
    # is the maximal token run with end <= boundary; the token that
    # crosses starts the next fragment and pushes the boundary to the
    # next fragment_size multiple at or past its end.
    frags: list[dict] = []
    i = 0
    boundary = fragment_size
    frag_start_char = 0
    while i < n:
        # fragment = tokens [i, j): j is the first LATER token whose end
        # crosses the boundary (a fragment always takes at least one
        # token, exactly like the per-token walk's empty-cur rule)
        j = max(i + 1,
                int(np.searchsorted(ends_arr, boundary, side="right")))
        end_char = int(ends_arr[j - 1])
        frags.append({"start": frag_start_char, "toks": list(range(i, j)),
                      "idx": len(frags), "end": end_char})
        frag_start_char = end_char
        i = j
        if j < n:
            # the trigger token starts the next fragment; the boundary
            # chain advances to the next multiple at or past ITS end
            e = int(ends_arr[j])
            while boundary < e:
                boundary += fragment_size
    frags[-1]["end"] = len(text)

    def score_of(frag) -> tuple[float, list[int]]:
        seen: set[str] = set()
        sc = 0.0
        matched = []
        for i in frag["toks"]:
            term = matched_pos.get(i)
            if term is not None:
                matched.append(i)
                if term not in seen:
                    seen.add(term)
                    sc += (weights or {}).get(term, 1.0)
        return sc, matched

    scored = []
    for f in frags:
        sc, matched = score_of(f)
        if sc > 0:
            scored.append({**f, "score": sc, "matched": matched})
    if merge_contiguous and scored:
        merged = [scored[0]]
        for f in scored[1:]:
            prev = merged[-1]
            if f["idx"] == prev["idx"] + 1:
                u = {**prev, "end": f["end"], "idx": f["idx"],
                     "toks": prev["toks"] + f["toks"]}
                u["score"], u["matched"] = score_of(u)
                merged[-1] = u
            else:
                merged.append(f)
        scored = merged
    scored.sort(key=lambda f: (-f["score"], f["start"]))
    out = []
    for f in scored[:max_fragments]:
        pieces, cpos = [], f["start"]
        for i in f["matched"]:
            s, e = int(starts[i]), int(ends[i])
            pieces.append(text[cpos:s])
            pieces.append(pre + text[s:e] + post)
            cpos = e
        pieces.append(text[cpos:f["end"]])
        out.append(("".join(pieces).strip(), f["score"]))
    return out


def postings_highlight_hits(searcher, query: Query | str, rows: list[dict],
                            source_path: str, fragments: int = 3,
                            **hl_kw) -> list[dict]:
    """Offsets-based highlighting for a page of hits: texts come from
    the source parquet (pushdown read, hit-page-scale), matched token
    positions come from ONE postings probe per (query term, doc) and
    map to char spans through the index's offsets sidecar — the hit
    docs are never re-tokenized (PostingsHighlighter.java:100; the
    re-analysis fragmenter re-tokenizes every hit doc, which dominates
    highlight cost on long documents). Requires the index built with
    ``store_offsets=True``; each row gains ``snippets``."""
    import pyarrow.dataset as pads

    if not rows:
        return rows
    parsed = searcher.parse(query) if isinstance(query, str) else query
    wanted = sorted(collect_terms(parsed))
    want = {(str(r["conv_id"]), int(r["turn_idx"])) for r in rows}
    t = pads.dataset(source_path, format="parquet").to_table(
        columns=["conv_id", "turn_idx", "text"],
        filter=pads.field("conv_id").isin(sorted({c for c, _ in want})))
    texts = {(str(c), int(i)): x
             for c, i, x in zip(t.column("conv_id").to_pylist(),
                                t.column("turn_idx").to_pylist(),
                                t.column("text").to_pylist())
             if (str(c), int(i)) in want}
    offsets = searcher.term_offsets([int(r["doc_id"]) for r in rows])
    by_shard = {sh.shard_id: sh for sh in searcher.shards}
    dps = searcher.shards[0].docs_per_shard
    out = []
    for r in rows:
        d = int(r["doc_id"])
        text = texts.get((str(r["conv_id"]), int(r["turn_idx"])), "")
        sh = by_shard.get(d // dps)
        row_off = offsets.get(d)
        if sh is None or row_off is None:
            out.append({**r, "snippets": []})
            continue
        starts, ends = row_off
        matched_pos: dict[int, str] = {}
        for term in wanted:
            for p in sh.positions_of(term, d):
                matched_pos[int(p)] = term
        fr = best_fragments_from_offsets(
            text, starts, ends, matched_pos,
            max_fragments=fragments, **hl_kw)
        out.append({**r, "snippets": [s for s, _ in fr]})
    return out
