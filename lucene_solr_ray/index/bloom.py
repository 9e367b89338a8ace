"""Per-shard term Bloom filters (``lucene/codecs/src/java/org/apache/
lucene/codecs/bloom/BloomFilteringPostingsFormat.java:60`` /
``FuzzySet.java:45-160`` analog).

The reference wraps a postings format with a per-segment "fuzzy set"
over the term dictionary — sized for ~10% bit saturation
(``DefaultBloomFilterFactory.java:30``, ``BloomFilterFactory.java:48``),
probed once per term lookup so ~90% of misses skip the term dictionary
entirely; false positives cost only the lookup they would have done
anyway, false negatives are impossible. Its headline use case is
primary-key fields: lookups of absent keys dominate.

Ray-native mapping: the shard term dictionaries live in query actors,
so the win at cluster scale is DRIVER-side — a per-shard bloom lets the
coordinator answer "term definitely absent from shard S" without any
actor round trip and scatter a term query only to the actors owning
candidate shards. Blooms are term-count-scale (10 bits/term ≈ 1.25 MB
per 10^6-term shard), built one Ray task per shard, published with the
usual tmp+rename atomic sidecar protocol.

Hashing: one probe per term (the reference FuzzySet contract,
``FuzzySet.java:114-147`` single-hash design) using pandas'
deterministic C string hash (stable across processes; the reference's
MurmurHash2 choice is an implementation detail, not a format contract
we share)."""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

BLOOM_FILE = "term_blooms.parquet"
BLOOM_META = "_term_blooms_meta.json"
_TARGET_SATURATION = 0.10


def _bloom_bits(n_terms: int) -> int:
    """Smallest power-of-two bit count with <= 10% saturation
    (FuzzySet.getNearestSetSize + DefaultBloomFilterFactory)."""
    bits = 1 << 10
    while n_terms / bits > _TARGET_SATURATION and bits < (1 << 34):
        bits <<= 1
    return bits


def _hash_terms(terms: np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash per term, vectorized in C."""
    return pd.util.hash_array(np.asarray(terms, dtype=object))


def _build_one(shard_dir: str, shard_id: int) -> dict:
    terms = pq.read_table(os.path.join(shard_dir, "terms.parquet"),
                          columns=["term"]).column("term")
    t = terms.to_numpy(zero_copy_only=False)
    bits = _bloom_bits(max(1, len(t)))
    idx = _hash_terms(t) & np.uint64(bits - 1)
    packed = np.zeros(bits // 64, dtype=np.uint64)
    np.bitwise_or.at(packed, (idx >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (idx & np.uint64(63)))
    return {"shard_id": int(shard_id), "bits": int(bits),
            "n_terms": int(len(t)), "bitset": packed.tobytes()}


_build_one_task = ray.remote(num_cpus=1)(_build_one)


def build_term_blooms(index_dir: str) -> str:
    """One Ray task per shard; atomic parquet + meta publish. A build
    already matching the manifest's shard census is a no-op."""
    index_path = Path(index_dir)
    manifest = json.loads((index_path / "manifest.json").read_text())
    shard_ids = sorted(s["shard_id"] for s in manifest["shards"])
    meta_path = index_path / BLOOM_META
    if meta_path.exists() and (index_path / BLOOM_FILE).exists():
        meta = json.loads(meta_path.read_text())
        if meta.get("shard_ids") == shard_ids and \
                meta.get("version") == manifest.get("version"):
            return str(index_path / BLOOM_FILE)
    rows = ray.get([
        _build_one_task.remote(
            str(index_path / "shards" / f"shard={sid:05d}"), sid)
        for sid in shard_ids])
    t = pa.table({
        "shard_id": pa.array([r["shard_id"] for r in rows],
                             type=pa.int32()),
        "bits": pa.array([r["bits"] for r in rows], type=pa.int64()),
        "n_terms": pa.array([r["n_terms"] for r in rows],
                            type=pa.int64()),
        "bitset": pa.array([r["bitset"] for r in rows],
                           type=pa.large_binary()),
    })
    tmp = index_path / (BLOOM_FILE + ".tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, index_path / BLOOM_FILE)
    meta_tmp = index_path / (BLOOM_META + ".tmp")
    meta_tmp.write_text(json.dumps({
        "shard_ids": shard_ids, "version": manifest.get("version"),
        "saturation_target": _TARGET_SATURATION}))
    os.replace(meta_tmp, meta_path)
    return str(index_path / BLOOM_FILE)


class TermBloomSet:
    """Driver-resident per-shard blooms: ``shards_maybe(terms)`` returns
    the shard ids that may contain AT LEAST ONE of the terms (union
    semantics — safe for every query shape: a shard with zero query
    terms can contribute no scoring clause)."""

    def __init__(self, shard_ids: np.ndarray, bits: np.ndarray,
                 bitsets: list[np.ndarray]):
        self.shard_ids = shard_ids
        self.bits = bits
        self.bitsets = bitsets

    @classmethod
    def load(cls, index_dir: str) -> "TermBloomSet | None":
        """Load ONLY when the sidecar matches the live manifest's
        version and shard census — any index mutation (update, delete,
        addIndexes, split) bumps the manifest version, and pruning with
        stale blooms would silently drop matching docs (bloom exactness
        relies on no-false-negatives, which staleness breaks). A stale
        sidecar disables pruning until `build_term_blooms` reruns."""
        p = Path(index_dir) / BLOOM_FILE
        meta_path = Path(index_dir) / BLOOM_META
        if not p.exists() or not meta_path.exists():
            return None
        try:
            meta = json.loads(meta_path.read_text())
            manifest = json.loads(
                (Path(index_dir) / "manifest.json").read_text())
        except (OSError, json.JSONDecodeError):
            return None
        shard_ids = sorted(s["shard_id"] for s in manifest["shards"])
        if meta.get("shard_ids") != shard_ids or \
                meta.get("version") != manifest.get("version"):
            return None
        t = pq.read_table(p)
        return cls(
            t.column("shard_id").to_numpy(),
            t.column("bits").to_numpy(),
            [np.frombuffer(b.as_py(), dtype=np.uint64)
             for b in t.column("bitset")])

    def maybe_in_shard(self, row: int, hashes: np.ndarray) -> np.ndarray:
        idx = hashes & np.uint64(self.bits[row] - 1)
        word = self.bitsets[row][(idx >> np.uint64(6)).astype(np.int64)]
        return (word >> (idx & np.uint64(63))) & np.uint64(1) != 0

    def shards_maybe(self, terms: list[str]) -> set[int]:
        if not terms:
            return set(int(s) for s in self.shard_ids)
        hashes = _hash_terms(np.asarray(terms, dtype=object))
        out: set[int] = set()
        for row, sid in enumerate(self.shard_ids):
            if self.maybe_in_shard(row, hashes).any():
                out.add(int(sid))
        return out
