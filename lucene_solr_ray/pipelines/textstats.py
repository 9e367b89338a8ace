"""Text analysis operators over the documents table.

Index-build aggregations (SURVEY.md §2.6 bottom row: per-term
docFreq/totalTermFreq, Terms.java:97-119) in their SQL-checkable form
(SimpleAnalyzer), plus training-data-pipeline text metrics: token counts,
quality scores, n-gram language id, rolling-hash fingerprints.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Sum

from ..analysis import ENGLISH_STOP_WORDS
from .util import read, round_col

_SPLIT = re.compile(r"[^a-z0-9]+")


def _tokens(text: str) -> list[str]:
    return [t for t in _SPLIT.split(text.lower()) if t]


def term_df_simple(sf_dir: str):
    """term -> docFreq, totalTermFreq over documents (SimpleAnalyzer).

    The distributed form of the index-build statistics aggregation:
    per-batch partial (term, doc) dedup + counts, then one term shuffle.
    """
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows_term, rows_tf = [], []
        for text in batch["text"]:
            toks = _tokens(text)
            vc = pd.Series(toks).value_counts() if toks else pd.Series(dtype=int)
            rows_term.append(vc.index.to_numpy())
            rows_tf.append(vc.to_numpy())
        n = [len(r) for r in rows_term]
        return pd.DataFrame({
            "term": np.concatenate(rows_term) if n else [],
            "tf": np.concatenate(rows_tf).astype(np.int64) if n else [],
        })

    per_doc_terms = ds.map_batches(explode, batch_format="pandas")
    return (per_doc_terms.groupby("term")
            .aggregate(Count(alias_name="df"), Sum("tf", alias_name="ttf")))


def doc_token_counts(sf_dir: str):
    """doc_id -> token count (SimpleAnalyzer), docs with >=1 token."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        counts = np.array([len(_tokens(t)) for t in batch["text"]], dtype=np.int64)
        out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), "n_tokens": counts})
        return out[out["n_tokens"] > 0]

    return ds.map_batches(fn, batch_format="pandas")


def quality_scores(sf_dir: str):
    """Per-doc quality metrics: n_chars, n_tokens, stopword count,
    mean token length (rounded)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pa.Table:
        n_chars, n_tokens, n_stop, mean_len = [], [], [], []
        for t in batch["text"]:
            toks = _tokens(t)
            n_chars.append(len(t))
            n_tokens.append(len(toks))
            n_stop.append(sum(1 for w in toks if w in ENGLISH_STOP_WORDS))
            mean_len.append(
                float(np.sum([len(w) for w in toks])) / len(toks) if toks else 0.0)
        out = pa.table({
            "doc_id": pa.array(batch["doc_id"].to_numpy(), type=pa.int64()),
            "n_chars": pa.array(n_chars, type=pa.int64()),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "n_stopwords": pa.array(n_stop, type=pa.int64()),
            "mean_token_len": pa.array(mean_len, type=pa.float64()),
        })
        return round_col(out, "mean_token_len", 4)

    return ds.map_batches(fn, batch_format="pandas")


# --- language id (LangId contrib analog, n-gram heuristic) -------------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "a"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "pas", "un", "une", "dans"},
    "es": {"el", "la", "los", "las", "es", "no", "un", "una", "por"},
}


class LangIdStage:
    """Actor-pool stage: marker sets built once per actor."""

    def __init__(self):
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        langs = []
        for t in batch["text"]:
            toks = set(_tokens(t))
            best, best_n = "unknown", 0
            for lang, mk in self.markers.items():
                n = len(toks & mk)
                if n > best_n:
                    best, best_n = lang, n
            langs.append(best)
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "lang_pred": langs,
        })


def lang_id(sf_dir: str):
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(LangIdStage, batch_format="pandas", concurrency=2)


# --- document fingerprint (rolling hash) -------------------------------

def fingerprints(sf_dir: str):
    """Karp-Rabin-style rolling-hash fingerprint per doc (winnowing seed)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    B, M = 257, (1 << 31) - 1

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        fps = []
        for t in batch["text"]:
            h = 0
            for ch in t.lower()[:512]:
                h = (h * B + ord(ch)) % M
            fps.append(h)
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "fingerprint": np.array(fps, dtype=np.int64),
        })

    return ds.map_batches(fn, batch_format="pandas")
