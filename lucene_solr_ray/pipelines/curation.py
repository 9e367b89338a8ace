"""Training-data curation stages beyond the reference surface:
deterministic domain-mix sampling, context-window sequence packing, and
a composed C4-style cleaning pipeline.

These are the knobs every large-scale LLM data pipeline turns after
dedup/quality (the pipelines described in the C4, Gopher and LLaMA
papers): re-weighting the domain mixture, packing variable-length
documents into fixed token-budget training sequences, and the
filter-then-dedup cleaning stack.

Sampling and packing are single-pass ``map_batches`` transforms — no
shuffle, no driver-side state; the cleaning pipeline's only all-to-all
is the dedup groupby over a thin (sig, doc_id, source) projection.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .util import read

_KNUTH = np.uint64(2654435761)
_TWO32 = np.float64(4294967296.0)


def domain_mix(ds, key_col: str, rates: dict[str, float],
               id_col: str = "doc_id", default_rate: float = 1.0):
    """Deterministic weighted down-sampling per domain: keep a row iff
    ``hash(id) / 2^32 < rate[domain]``.

    The Knuth multiplicative hash on the stable id makes the decision a
    pure function of the row — re-runs, retries and different
    partitionings all keep the identical sample (the property Solr's
    RandomStream gets from its seeded hash, applied per-domain). One
    vectorized mask per batch; the rate table rides inside the closure
    (broadcast once with the function object, not per batch).
    """
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate out of [0,1] for {k!r}: {r}")

    def flt(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        ids32 = ids.astype(np.uint64) % np.uint64(2 ** 32)
        u = ((ids32 * _KNUTH) % np.uint64(2 ** 32)
             ).astype(np.float64) / _TWO32
        keys = t.column(key_col).to_pylist()
        rate = np.fromiter((rates.get(k, default_rate) for k in keys),
                           dtype=np.float64, count=len(keys))
        return t.filter(pa.array(u < rate))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def domain_mix_docs(sf_dir: str):
    """Re-weight the documents mixture by language: en kept fully,
    fr/es halved, zh/de at 25% — counts per lang after sampling."""
    from ray.data.aggregate import Count

    ds = domain_mix(read(sf_dir, "documents", ["doc_id", "lang"]),
                    "lang", {"en": 1.0, "fr": 0.5, "es": 0.5,
                             "zh": 0.25, "de": 0.25})
    return ds.groupby("lang").aggregate(Count(alias_name="cnt"))


def pack_sequences(ds, text_col: str = "text", id_col: str = "doc_id",
                   budget: int = 512, truncate: bool = True):
    """Greedy sequential packing of documents into fixed token-budget
    training sequences (context windows).

    Within each streaming batch, documents are packed first-come: a doc
    joins the open sequence while the token sum stays <= ``budget``,
    else a new sequence opens. A doc longer than the budget is truncated
    to it (``truncate=True``) or kept whole in its own oversized
    sequence. Sequences never cross batch boundaries — packing is a
    per-partition operation by design (global packing would serialize
    the stream for zero training benefit; the only cost is one
    under-filled sequence per block). ``seq_id`` is the first doc id in
    the sequence, so ids are deterministic under any partitioning.

    Token counts use the whitespace tokenizer (swap in textstats'
    BPE-ish counter upstream by providing an ``n_tokens`` column).
    Output: (seq_id, doc_id, n_tokens, offset) — offset is the token
    position of the doc inside its sequence.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")

    def pack(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if "n_tokens" in t.column_names:
            ntok = t.column("n_tokens").to_numpy(zero_copy_only=False)
            ntok = ntok.astype(np.int64)
        else:
            counted = pc.count_substring_regex(
                t.column(text_col), pattern=r"\S+")
            ntok = counted.to_numpy(zero_copy_only=False).astype(np.int64)
        if truncate:
            ntok = np.minimum(ntok, budget)
        n = len(ids)
        seq_id = np.empty(n, dtype=np.int64)
        offset = np.empty(n, dtype=np.int64)
        cur_seq = -1
        cur_sum = budget + 1  # force a new sequence at the first doc
        for i in range(n):
            if cur_sum + ntok[i] > budget:
                cur_seq = ids[i]
                cur_sum = 0
            seq_id[i] = cur_seq
            offset[i] = cur_sum
            cur_sum += ntok[i]
        return pa.table({
            "seq_id": pa.array(seq_id),
            "doc_id": pa.array(ids.astype(np.int64)),
            "n_tokens": pa.array(ntok),
            "offset": pa.array(offset),
        })

    return ds.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)


def pack_sequences_docs(sf_dir: str, budget: int = 256):
    """Pack the documents table into 256-token training sequences."""
    return pack_sequences(read(sf_dir, "documents", ["doc_id", "text"]),
                          budget=budget)


def c4_clean_docs(sf_dir: str, min_tokens: int = 20,
                  max_tokens: int = 10_000,
                  min_stop_ratio: float = 0.05):
    """Composed C4-style cleaning over the documents table (the filter
    stack of Raffel et al.'s C4 pipeline, re-expressed on this engine's
    kernels): keep docs that are (1) English per the lang column,
    (2) within a token-count band, (3) language-like (stopword ratio
    above a floor), then (4) exact-dedup on text keeping the lowest
    doc_id. Result: surviving-doc count per source.

    Shape: one streaming map_batches computes all three quality masks
    (the textstats vectorized explode), the dedup is a partial-min +
    bucketed groupby on the md5 signature — a single all-to-all on the
    (tiny) (sig, doc_id, source) projection, never on the text."""
    import hashlib

    import pandas as pd
    import pyarrow.compute as pc

    from .textstats import ENGLISH_STOP_WORDS, _explode_terms
    from .util import bucketed_group_agg

    ds = read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    stop = pd.Index(sorted(ENGLISH_STOP_WORDS))

    def quality_filter(t: pa.Table) -> pa.Table:
        n = len(t)
        doc_idx, terms = _explode_terms(t)
        n_tokens = np.bincount(doc_idx, minlength=n).astype(np.int64)
        is_stop = pd.Series(terms).isin(stop).to_numpy()
        n_stop = np.bincount(doc_idx[is_stop], minlength=n).astype(np.int64)
        ratio = n_stop / np.maximum(n_tokens, 1)
        mask = ((np.asarray(t.column("lang").to_pylist()) == "en")
                & (n_tokens >= min_tokens) & (n_tokens <= max_tokens)
                & (ratio >= min_stop_ratio))
        kept = t.filter(pa.array(mask))
        sigs = [hashlib.md5(x.encode("utf-8")).hexdigest()
                for x in kept.column("text").to_pylist()]
        return pa.table({
            "sig": pa.array(sigs, type=pa.string()),
            "doc_id": kept.column("doc_id"),
            "source": kept.column("source"),
        })

    sigged = ds.map_batches(quality_filter, batch_format="pyarrow")

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        return g.drop_duplicates("sig", keep="first")[
            ["sig", "doc_id", "source"]]

    survivors = bucketed_group_agg(sigged, ["sig"], keep_first,
                                   pre=keep_first)
    from ray.data.aggregate import Count

    return survivors.groupby("source").aggregate(Count(alias_name="cnt"))


def lm_score(ds, text_col: str = "text", id_col: str = "doc_id",
             grams: int = 2, prune_below: int = 1):
    """CCNet-style language-model quality scoring: each document gets
    the mean log-probability of its tokens under a stupid-backoff
    bigram LM trained on the corpus itself (the FreeTextSuggester count
    table — FreeTextSuggester.java:83-131 — reused as the model):

        log p(tok_i | tok_{i-1}) = log(count(bigram) / count(prev))
        backoff:  log(ALPHA * count(tok) / tot_tokens)
        OOV:      log(ALPHA / (tot_tokens + 1))

    Train once distributed (per-batch shingle counters -> bucketed sum),
    broadcast the table with ``ray.put`` (read per actor, never
    re-shipped per batch), then score as one vectorized pass per batch:
    tokens explode through the shared Arrow kernel, probabilities come
    from two hash-map gathers (pandas map), per-doc means via bincount.
    Output: (doc_id, n_tokens, mean_logp)."""
    import math

    import pandas as pd
    import ray

    from ..search.suggest import FreeTextSuggester
    from .textstats import _explode_terms
    from .util import round_col

    sugg = FreeTextSuggester.build(ds, text_col, grams=grams,
                                   analyzer="simple")
    counts = sugg._counts
    if prune_below > 1:
        # 100-TB scale guard: singleton/rare n-grams dominate the table
        # but contribute only backoff-floor probabilities — prune them
        # before broadcasting (kenlm-style count cutoff)
        counts = {k: v for k, v in counts.items() if v >= prune_below}
    counts_ref = ray.put(counts)
    sep = FreeTextSuggester.NGRAM_SEP
    alpha = FreeTextSuggester.ALPHA
    tot = max(sugg.tot_tokens, 1)

    class _Score:
        def __init__(self):
            self.counts = ray.get(counts_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            n = len(t)
            doc_idx, terms = _explode_terms(t)
            logp = np.full(len(terms), math.log(alpha / (tot + 1)))
            term_s = pd.Series(terms)
            uni = term_s.map(self.counts).to_numpy(dtype=np.float64,
                                                   na_value=0.0)
            seen = uni > 0
            logp[seen] = np.log(alpha * uni[seen] / tot)
            if len(terms) > 1:
                prev_same = doc_idx[1:] == doc_idx[:-1]
                big = pd.Series(
                    np.char.add(np.char.add(
                        terms[:-1].astype(str), sep),
                        terms[1:].astype(str)))
                bcnt = big.map(self.counts).to_numpy(dtype=np.float64,
                                                     na_value=0.0)
                pcnt = pd.Series(terms[:-1]).map(self.counts).to_numpy(
                    dtype=np.float64, na_value=0.0)
                ok = prev_same & (bcnt > 0) & (pcnt > 0)
                tgt = np.zeros(len(terms), dtype=bool)
                tgt[1:] = ok
                logp[tgt] = np.log(bcnt[ok] / pcnt[ok])
            n_tokens = np.bincount(doc_idx, minlength=n).astype(np.int64)
            sums = np.bincount(doc_idx, weights=logp, minlength=n)
            mean = np.where(n_tokens > 0, sums / np.maximum(n_tokens, 1),
                            0.0)
            out = pa.table({
                "doc_id": t.column(id_col),
                "n_tokens": pa.array(n_tokens),
                "mean_logp": pa.array(mean, type=pa.float64()),
            })
            return round_col(out, "mean_logp", 6)

    return ds.map_batches(_Score, batch_format="pyarrow", concurrency=2)


def lm_score_docs(sf_dir: str):
    """LM quality scores over the documents table (rows-only: the
    backoff LM is pytest-oracled on hand-computable corpora)."""
    return lm_score(read(sf_dir, "documents", ["doc_id", "text"]))


def canonical_docs(sf_dir: str):
    """Canonical-document selection per group key (the RefinedWeb /
    CCNet-style URL-dedup step where one representative survives per
    normalized key): per ``source``, keep the doc with the most content
    (max n_chars, tie -> lowest doc_id).

    Per-batch partial argmax shrinks the shuffle to one row per (batch,
    source); a bucketed vectorized merge finishes — the same
    partial+final shape as exact_dedup, never a full-corpus sort."""
    import pandas as pd

    from .util import bucketed_group_agg, read

    ds = read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True], kind="stable")
        out = g.drop_duplicates("source", keep="first")
        return out[["source", "doc_id", "n_chars"]]

    return bucketed_group_agg(ds, ["source"], best, pre=best)
