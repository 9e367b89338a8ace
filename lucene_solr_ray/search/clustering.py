"""Search-result clustering (``solr/contrib/clustering/src/java/org/
apache/solr/handler/clustering/ClusteringComponent.java`` — Solr
delegates to Carrot2; this is a from-scratch TF-IDF + spherical
k-means re-expression with Lingo-style centroid-term labels).

Scale note: like the reference, clustering applies to ONE result page
(top-N hits, N ~ 10^2), so the vector math is a small driver-side numpy
problem by design — the distributed part is the search that produced
the page. For corpus-scale clustering use the dedup/knn pipelines."""

from __future__ import annotations

import numpy as np

from .searcher import IndexSearcher


def _tfidf_matrix(tvs: dict[int, list], exclude: set[str],
                  min_df: int = 2, max_vocab: int = 500):
    """Rows = docs, cols = result-set vocabulary, tf-idf, L2-normalized."""
    df: dict[str, int] = {}
    for terms in tvs.values():
        for t, _, _ in terms:
            if t not in exclude:
                df[t] = df.get(t, 0) + 1
    n_docs = len(tvs)
    vocab = sorted((t for t, d in df.items() if min_df <= d < n_docs),
                   key=lambda t: (-df[t], t))[:max_vocab]
    col = {t: i for i, t in enumerate(vocab)}
    m = np.zeros((n_docs, len(vocab)), dtype=np.float64)
    doc_ids = sorted(tvs)
    idf = np.array([np.log(1.0 + n_docs / df[t]) for t in vocab])
    for r, d in enumerate(doc_ids):
        for t, f, _ in tvs[d]:
            c = col.get(t)
            if c is not None:
                m[r, c] = f
    m *= idf
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms, doc_ids, vocab


def _spherical_kmeans(m: np.ndarray, k: int, seed: int = 0,
                      iters: int = 25) -> np.ndarray:
    """Cosine k-means with k-means++-style seeded init; deterministic."""
    n = m.shape[0]
    rng = np.random.default_rng(seed)
    centers = [m[int(rng.integers(n))]]
    for _ in range(1, k):
        sim = np.max(np.stack([m @ c for c in centers]), axis=0)
        d2 = np.maximum(1.0 - sim, 0.0) ** 2
        if d2.sum() <= 0:
            centers.append(m[int(rng.integers(n))])
            continue
        centers.append(m[int(rng.choice(n, p=d2 / d2.sum()))])
    C = np.stack(centers)
    assign = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        new = np.argmax(m @ C.T, axis=1)
        if np.array_equal(new, assign) and _ > 0:
            break
        assign = new
        for j in range(k):
            members = m[assign == j]
            if len(members):
                c = members.sum(axis=0)
                nrm = np.linalg.norm(c)
                C[j] = c / nrm if nrm > 0 else C[j]
    return assign


def cluster_results(searcher: IndexSearcher, query, top_n: int = 100,
                    n_clusters: int = 5, label_terms: int = 3,
                    seed: int = 0, min_df: int = 2) -> list[dict]:
    """Cluster the top-N hits of ``query`` into labeled groups.

    Returns ``[{"label": "term, term", "docs": [(doc_id, score), ...],
    "score": mean_cohesion}, ...]`` ordered by cluster size desc; docs
    within a cluster keep their search ranking. Labels are the cluster
    centroid's heaviest tf-idf terms (Lingo's label-from-centroid idea);
    query terms are excluded from vocabulary (they appear in every hit,
    so they separate nothing)."""
    from .searcher import collect_terms

    parsed = searcher.parse(query) if isinstance(query, str) else query
    hits = searcher.search(parsed, k=top_n)
    if not hits:
        return []
    score_of = dict(hits)
    rank_of = {d: i for i, (d, _) in enumerate(hits)}
    tvs = searcher.term_vectors([d for d, _ in hits])
    exclude = set(collect_terms(parsed))
    m, doc_ids, vocab = _tfidf_matrix(tvs, exclude, min_df=min_df)
    k = min(n_clusters, len(doc_ids))
    if not vocab or k < 2:
        return [{"label": "", "score": 1.0,
                 "docs": [(d, float(s)) for d, s in hits]}]
    assign = _spherical_kmeans(m, k, seed=seed)
    centroids = np.zeros((k, m.shape[1]))
    out = []
    for j in range(k):
        idx = np.flatnonzero(assign == j)
        if not len(idx):
            continue
        c = m[idx].sum(axis=0)
        nrm = np.linalg.norm(c)
        c = c / nrm if nrm > 0 else c
        centroids[j] = c
        top = np.argsort(-c)[:label_terms]
        label = ", ".join(vocab[t] for t in top if c[t] > 0)
        docs = sorted((doc_ids[i] for i in idx), key=rank_of.__getitem__)
        out.append({
            "label": label,
            "score": float(np.mean(m[idx] @ c)) if nrm > 0 else 0.0,
            "docs": [(int(d), float(score_of[d])) for d in docs],
        })
    out.sort(key=lambda cl: (-len(cl["docs"]), cl["label"]))
    return out
