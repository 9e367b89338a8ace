"""Deduplication operators over the documents table.

- ``exact_dedup``: SignatureUpdateProcessor with MD5Signature semantics
  (``solr/core/.../update/processor/SignatureUpdateProcessorFactory.java``,
  ``MD5Signature.java``): content-hash each doc in a ``map_batches``,
  hash-partition on the signature, keep the lowest doc_id per signature
  group (UniqueStream keep-first analog).
- ``minhash_neardup``: MinHash + LSH banding (the TextProfileSignature
  near-dup idea scaled out, ``update/processor/TextProfileSignature.java``):
  shingle -> 64 minhashes -> 16 bands; band buckets become groupby keys;
  candidate pairs are verified by exact shingle-Jaccard computed INSIDE the
  cluster — candidates are hash-shuffle-joined back to per-doc shingle
  sets and verified per batch (no driver-side materialization anywhere on
  the path; the driver only ever sees the final verified pairs).
- ``minhash_dedup_keep``: connected-component clustering of the verified
  pairs by distributed iterated min-label propagation (label[d] = min over
  d and its neighbors each round; converges in O(cluster diameter) rounds),
  entirely as Dataset joins/groupbys — no driver-side union-find.
- ``simhash_fingerprints``: 64-bit SimHash over word 3-grams, vectorized
  (crc32 word hashes combined with numpy mixing; no per-gram digests).

All hash kernels are numpy uint64 (splitmix64 finishing); per-batch work
is vectorized per document with no per-character/per-gram Python loops.
"""

from __future__ import annotations

import functools
import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Min

from .util import bucketed_group_agg, materialize_typed, native_join, read

_PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
_VERIFIED_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                              ("jaccard", pa.float64())])
_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])

# -- exact --------------------------------------------------------------

def exact_dedup(sf_dir: str):
    """(sig, doc_id): lowest doc_id per md5(text) signature."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def sig(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["sig"] = [hashlib.md5(t.encode("utf-8")).hexdigest()
                        for t in batch["text"]]
        return batch[["sig", "doc_id"]]

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("sig", sort=False)["doc_id"].min().reset_index())

    # partial min inside the batch shrinks the shuffle; bucketed vectorized
    # final agg avoids per-group Python accumulators on |unique docs| groups
    return bucketed_group_agg(ds.map_batches(sig, batch_format="pandas"),
                              ["sig"], keep_first, pre=keep_first)


# -- vectorized hash kernels --------------------------------------------

_N_HASHES = 60
_N_BANDS = 12  # 5 rows per band: LSH threshold (1/12)^(1/5) ~= 0.61,
# matched to the default verify threshold 0.6 (4-row bands make half of
# all sim~0.45 pairs candidates, which explodes the verify join on
# self-similar corpora)
_MERSENNE = (1 << 61) - 1
_SHINGLE_K = 5

_FNV = np.uint64(1099511628211)
_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain PRNG mixing step)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * _SM_C1
    x = (x ^ (x >> np.uint64(27))) * _SM_C2
    return x ^ (x >> np.uint64(31))


def _char_shingle_hashes(text: str, k: int = _SHINGLE_K) -> np.ndarray:
    """32-bit hashes of all k-char shingles of lower(text), NOT deduped.

    Rolling polynomial over unicode code points (utf-32 view: one uint32
    per character, fully vectorized), splitmix64-finished, masked to 32
    bits so downstream (a*x + b) % p math stays inside int64.
    """
    codes = np.frombuffer(text.lower().encode("utf-32-le"),
                          dtype=np.uint32).astype(np.uint64)
    n = len(codes) - k + 1
    if n < 1:  # short doc: one shingle over the whole text
        acc = np.zeros(1, dtype=np.uint64)
        for j in range(len(codes)):
            acc = acc * _FNV + codes[j]
    else:
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(k):
            acc = acc * _FNV + codes[j:j + n]
    return (_splitmix64(acc) & np.uint64(0xFFFFFFFF)).astype(np.int64)


def _shingle_set(text: str, k: int = _SHINGLE_K) -> np.ndarray:
    """Sorted unique shingle hashes (the Jaccard set representation).
    int32 — the hashes are 32-bit, and the verify join ships these blobs."""
    return np.unique(_char_shingle_hashes(text, k).astype(np.int32))


@functools.lru_cache(maxsize=8)
def _minhash_params(n_hashes: int, seed: int):
    """(a, b) per hash function; a < 2^29 keeps a*x32 + b < 2^62 (int64)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 29, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return a, b


def _minhash_signatures(texts: list[str], n_hashes: int = _N_HASHES,
                        seed: int = 7) -> np.ndarray:
    """(n_docs, n_hashes) int64 signature matrix for a batch — one
    vectorized (a*x+b) % p + segmented-min (reduceat) pass per hash fn."""
    sets = [_char_shingle_hashes(t) for t in texts]
    lens = np.fromiter((len(s) for s in sets), dtype=np.int64, count=len(sets))
    offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
    flat = np.concatenate(sets) if sets else np.empty(0, dtype=np.int64)
    a, b = _minhash_params(n_hashes, seed)
    sigs = np.empty((len(texts), n_hashes), dtype=np.int64)
    for h in range(n_hashes):
        row = (a[h] * flat + b[h]) % _MERSENNE
        sigs[:, h] = np.minimum.reduceat(row, offs)
    return sigs


def _band_hashes(sigs: np.ndarray, n_bands: int = _N_BANDS) -> np.ndarray:
    """(n_docs, n_bands) int64 band-bucket keys (rows-per-band chained
    through splitmix64)."""
    r = sigs.shape[1] // n_bands
    out = np.empty((sigs.shape[0], n_bands), dtype=np.int64)
    for band in range(n_bands):
        h = np.zeros(sigs.shape[0], dtype=np.uint64)
        for c in range(r):
            h = _splitmix64(h ^ sigs[:, band * r + c].astype(np.uint64))
        out[:, band] = (h >> np.uint64(1)).astype(np.int64)
    return out


def _minhash_band_batch(batch: pd.DataFrame) -> pd.DataFrame:
    sigs = _minhash_signatures(batch["text"].tolist())
    bh = _band_hashes(sigs)
    n, n_bands = bh.shape
    return pd.DataFrame({
        "band": np.tile(np.arange(n_bands, dtype=np.int64), n),
        "band_hash": bh.ravel(),
        "doc_id": np.repeat(batch["doc_id"].to_numpy(), n_bands),
    })


# -- minhash candidates + distributed verify ----------------------------

def minhash_candidates(sf_dir: str, max_bucket_pairing: int = 2048):
    """Candidate near-dup pairs from LSH band buckets (doc_a < doc_b).

    Buckets larger than ``max_bucket_pairing`` switch from all-pairs to
    chain pairing (consecutive doc_ids after sort): a bucket of m docs
    otherwise emits C(m,2) pairs — quadratic blowup on a hot bucket —
    while the chain keeps every bucket member connected for clustering.
    """
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    bands = ds.map_batches(_minhash_band_batch, batch_format="pandas")

    # ONE hash-bucket shuffle with a vectorized per-bucket kernel instead
    # of groupby(band, band_hash).map_groups — Ray pays ~1ms of Python
    # per distinct group (util.py), and there are O(bands * corpus)
    # buckets; inside a bucket only multi-member groups loop.
    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        df = (bucket.drop_duplicates(["band", "band_hash", "doc_id"])
              .sort_values(["band", "band_hash", "doc_id"]))
        b = df["band"].to_numpy()
        h = df["band_hash"].to_numpy()
        ids = df["doc_id"].to_numpy()
        n = len(df)
        if n == 0:
            return pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                                 "doc_b": pd.Series(dtype=np.int64)})
        starts = np.concatenate(
            ([True], (b[1:] != b[:-1]) | (h[1:] != h[:-1])))
        start_idx = np.nonzero(starts)[0]
        sizes = np.diff(np.concatenate((start_idx, [n])))
        out_a, out_b = [], []
        for s, m in zip(start_idx[sizes >= 2], sizes[sizes >= 2]):
            grp = ids[s:s + m]
            if m > max_bucket_pairing:
                out_a.append(grp[:-1])
                out_b.append(grp[1:])
            else:
                ia, ib = np.triu_indices(m, k=1)
                out_a.append(grp[ia])
                out_b.append(grp[ib])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                                 "doc_b": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(out_a),
                             "doc_b": np.concatenate(out_b)})

    cand = bucketed_group_agg(bands, ["band", "band_hash"], pairs)

    # dedup pairs found in multiple bands (vectorized per hash bucket; a
    # plain groupby().aggregate() here pays per-group Python overhead on
    # |candidate pairs| groups)
    def count_bands(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["doc_a", "doc_b"], sort=False).size()
               .reset_index(name="n_bands"))
        return out

    def merge_bands(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["doc_a", "doc_b"], sort=False)["n_bands"].sum()
                .reset_index())

    return bucketed_group_agg(cand, ["doc_a", "doc_b"], merge_bands,
                              pre=count_bands)


def _shingle_blob_batch(batch: pd.DataFrame) -> pa.Table:
    """Per-doc sorted-unique shingle sets as large_binary (Arrow joins
    don't ship list columns; a zero-copy int64 buffer does the job)."""
    blobs = [_shingle_set(t).tobytes() for t in batch["text"]]
    return pa.table({
        "doc_id": pa.array(batch["doc_id"].to_numpy(), type=pa.int64()),
        "shingles": pa.array(blobs, type=pa.large_binary()),
    })


def _verified_pairs_ds(sf_dir: str, threshold: float) -> rd.Dataset:
    """Distributed verify: candidates x shingle sets via two hash-shuffle
    joins, exact Jaccard inside map_batches. Streams end-to-end."""
    # materialize the candidate pairs (bounded by the near-dup rate, far
    # smaller than the corpus; blocks stay in the distributed object
    # store) so the band-bucket shuffle and the verify joins don't
    # contend for executor resources inside one streaming DAG.
    # materialize_typed also purges the zero-column empty blocks that
    # groupby emits for empty hash partitions — those crash the join's
    # build side at high partition counts (see util.materialize_typed).
    cand = materialize_typed(minhash_candidates(sf_dir), _PAIR_SCHEMA)
    if cand.count() == 0:
        return rd.from_arrow(_VERIFIED_SCHEMA.empty_table())
    docs = read(sf_dir, "documents", ["doc_id", "text"])
    sh = docs.map_batches(_shingle_blob_batch, batch_format="pandas")
    j1 = native_join(cand, sh, on="doc_a", right_on="doc_id")
    j1 = j1.rename_columns({"shingles": "sh_a"})
    j2 = native_join(j1, sh, on="doc_b", right_on="doc_id")
    j2 = j2.rename_columns({"shingles": "sh_b"})

    def jac(batch: pd.DataFrame) -> pd.DataFrame:
        keep_a, keep_b, keep_j = [], [], []
        for a_id, b_id, ba, bb in zip(batch["doc_a"], batch["doc_b"],
                                      batch["sh_a"], batch["sh_b"]):
            a = np.frombuffer(ba, dtype=np.int32)
            b = np.frombuffer(bb, dtype=np.int32)
            inter = np.intersect1d(a, b, assume_unique=True).size
            j = inter / max(1, len(a) + len(b) - inter)
            if j >= threshold:
                keep_a.append(a_id)
                keep_b.append(b_id)
                keep_j.append(j)
        return pd.DataFrame({
            "doc_a": np.array(keep_a, dtype=np.int64),
            "doc_b": np.array(keep_b, dtype=np.int64),
            "jaccard": np.array(keep_j, dtype=np.float64),
        })

    return j2.map_batches(jac, batch_format="pandas")


def minhash_neardup(sf_dir: str, threshold: float = 0.6):
    """Verified near-duplicate pairs: exact shingle Jaccard >= threshold.

    Returns a schema-stable Arrow table (the verified-pair set — the
    query's final, small result; everything upstream streams)."""
    out = _verified_pairs_ds(sf_dir, threshold).to_pandas()
    if len(out) == 0:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})
    out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# -- near-dup cluster dedup (distributed label propagation) -------------

def _local_drop_set(pairs_df: pd.DataFrame) -> np.ndarray:
    """Union-find over a small verified-pair table: doc_ids to drop
    (everything but each cluster's min)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {int(x) for x in pairs_df["doc_a"]} | \
            {int(x) for x in pairs_df["doc_b"]}
    return np.array(sorted(n for n in nodes if find(n) != n),
                    dtype=np.int64)


# pair sets under this size solve locally (a pair is 24 bytes; the cap is
# ~100 MB of driver memory). The distributed rounds exist for the regime
# where the near-dup graph itself exceeds one machine.
_LOCAL_CLUSTER_PAIRS = 4_000_000


def minhash_dedup_keep(sf_dir: str, threshold: float = 0.6,
                       max_rounds: int = 50,
                       local_pairs_cap: int = _LOCAL_CLUSTER_PAIRS):
    """Near-dup dataset dedup: keep one doc per near-duplicate cluster.

    Clusters = connected components over the verified near-dup pairs via
    distributed iterated min-label propagation: each round computes
    label[d] = min(label[d], min over neighbors' labels) as an edge x label
    join + groupby-min, materializing only the (node, label) table (bounded
    by the number of near-dup docs, never the corpus). Convergence is
    detected by the monotone label sum. The kept representative is the
    cluster's lowest doc_id; docs in no cluster are kept via a left-outer
    join against the (small) drop set — the corpus itself only streams.

    Returns (doc_id, keep) for every document.
    """
    docs = read(sf_dir, "documents", ["doc_id"])
    pairs = materialize_typed(_verified_pairs_ds(sf_dir, threshold),
                              _VERIFIED_SCHEMA)

    def all_keep(t: pa.Table) -> pa.Table:
        return t.append_column("keep", pa.array(np.ones(len(t), dtype=bool)))

    n_pairs = pairs.count()
    if n_pairs == 0:
        return docs.map_batches(all_keep, batch_format="pyarrow")

    if n_pairs <= local_pairs_cap:
        # the verified-pair graph fits comfortably in one process: a
        # local union-find beats rounds of distributed joins (each round
        # is a shuffle of fixed overhead). The CORPUS still streams —
        # only the drop SET (bounded by near-dup docs) broadcasts.
        import ray

        drop_ref = ray.put(_local_drop_set(pairs.to_pandas()))

        def mark(t: pa.Table) -> pa.Table:
            drop_arr = ray.get(drop_ref)
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(drop_arr, ids)
            pos_ok = pos < len(drop_arr)
            dropped = np.zeros(len(ids), dtype=bool)
            dropped[pos_ok] = drop_arr[pos[pos_ok]] == ids[pos_ok]
            return pa.table({"doc_id": t.column("doc_id"),
                             "keep": pa.array(~dropped)})

        return docs.map_batches(mark, batch_format="pyarrow",
                                zero_copy_batch=True)

    def as_edges(a: str, b: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({"src": t.column(a), "dst": t.column(b)})
        return fn

    # every dataset that feeds a hash-shuffle join/groupby goes through
    # materialize_typed: map-level normalizers cannot repair the
    # zero-column empty blocks groupby emits for empty partitions
    # (map_batches skips empty blocks), and one such block on a join's
    # build side is an ArrowInvalid crash at production parallelism.
    edges = materialize_typed(
        pairs.map_batches(as_edges("doc_a", "doc_b"), batch_format="pyarrow")
        .union(pairs.map_batches(as_edges("doc_b", "doc_a"),
                                 batch_format="pyarrow")),
        pa.schema([("src", pa.int64()), ("dst", pa.int64())]))

    def init_labels(t: pa.Table) -> pa.Table:
        ids = np.unique(t.column("src").to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(ids, type=pa.int64()),
                         "label": pa.array(ids, type=pa.int64())})

    labels = materialize_typed(
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node").aggregate(Min("label", alias_name="label")),
        _LABEL_SCHEMA)
    prev_sum = labels.sum("label")

    def as_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("dst"), "label": t.column("label")})

    for _ in range(max_rounds):
        msgs = native_join(edges, labels, on="src", right_on="node",
                           partitions_cap=8)
        incoming = msgs.map_batches(as_labels, batch_format="pyarrow")
        labels = materialize_typed(
            incoming.union(labels)
            .groupby("node").aggregate(Min("label", alias_name="label")),
            _LABEL_SCHEMA)
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    def only_dropped(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["label"] < batch["node"]]

    # purge the 0-row blocks the filter leaves behind: Ray's hash shuffle
    # broadcasts the schema to otherwise-empty partitions only from the
    # FIRST shuffle task, and an empty input block returns early without
    # broadcasting — so a small, mostly-empty-blocked side can leave join
    # partitions schema-less (the 32-CPU ArrowInvalid crash).
    drop = materialize_typed(
        labels.map_batches(only_dropped, batch_format="pandas"),
        _LABEL_SCHEMA)
    joined = native_join(docs, drop, on="doc_id", right_on="node",
                         join_type="left_outer")

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "doc_id": t.column("doc_id"),
            "keep": pc.is_null(t.column("label")),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


# -- simhash ------------------------------------------------------------

_SIMHASH_SHIFTS = np.arange(64, dtype=np.uint64)
_G1 = np.uint64(0x9E3779B1)
_G2 = np.uint64(0x85EBCA77)
_G3 = np.uint64(0xC2B2AE3D)


def _simhash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """64-bit SimHash over word 3-grams: crc32 per word (C speed), 3-gram
    hashes by vectorized mixing, bit votes via one (n_grams, 64) matrix."""
    fps = np.empty(len(batch), dtype=np.uint64)
    for i, text in enumerate(batch["text"]):
        words = text.lower().split()
        n = len(words)
        if n == 0:
            fps[i] = 0
            continue
        wh = np.fromiter((zlib.crc32(w.encode("utf-8")) for w in words),
                         dtype=np.uint64, count=n)
        if n >= 3:
            g = _splitmix64((wh[:n - 2] * _G1) ^ (wh[1:n - 1] * _G2)
                            ^ (wh[2:] * _G3))
        else:  # short doc: one gram over all words
            acc = np.uint64(0)
            for w in wh:
                acc = _splitmix64(acc ^ w)
            g = np.array([acc], dtype=np.uint64)
        bits = ((g[:, None] >> _SIMHASH_SHIFTS) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        fps[i] = ((votes > 0).astype(np.uint64) << _SIMHASH_SHIFTS).sum(
            dtype=np.uint64)
    return pd.DataFrame({
        "doc_id": batch["doc_id"].to_numpy(),
        "simhash": fps.astype(np.int64),
    })


def simhash_fingerprints(sf_dir: str):
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(_simhash_batch, batch_format="pandas")


def simhash_neardup(sf_dir: str, max_hamming: int = 3,
                    max_bucket_pairing: int = 2048, window: int = 64):
    """Near-dup pairs by SimHash Hamming distance <= max_hamming, found
    via LSH over the four 16-bit fingerprint chunks (two fingerprints
    within Hamming 3 of each other must agree exactly on >= 1 chunk —
    pigeonhole over 4 chunks and <= 3 differing bits).

    Buckets up to ``max_bucket_pairing`` members are paired exhaustively
    (the radius-3 guarantee holds exactly). A hotter bucket — a single
    (chunk, value) shared by >> 10^3 docs at corpus scale — would emit
    C(m, 2) pairs, so it switches to Manku-style sorted-neighborhood
    pairing ("Detecting Near-Duplicates for Web Crawling", WWW'07):
    rotate each fingerprint so the shared chunk occupies the top bits,
    sort, and pair each member with its next ``window`` neighbors —
    O(m * window) pairs, and Hamming-close fingerprints (whose differing
    bits are low-order after the rotation) stay adjacent in sort order.
    """
    fps = simhash_fingerprints(sf_dir)

    def chunked(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy().astype(np.uint64)
        frames = []
        for c in range(4):
            frames.append(pd.DataFrame({
                "chunk": c,
                "chunk_val": ((h >> np.uint64(16 * c))
                              & np.uint64(0xFFFF)).astype(np.int64),
                "doc_id": batch["doc_id"].to_numpy(),
                "simhash": batch["simhash"].to_numpy(),
            }))
        return pd.concat(frames, ignore_index=True)

    empty = pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                          "doc_b": pd.Series(dtype=np.int64),
                          "hamming": pd.Series(dtype=np.int64)})

    def _group_pairs(c: int, ids: np.ndarray, h: np.ndarray):
        m = len(ids)
        if m <= max_bucket_pairing:
            ia, ib = np.triu_indices(m, k=1)
        else:
            # hot bucket: rotate the shared chunk to the top bits, sort,
            # pair each fingerprint with its next `window` sort-neighbors
            k = np.uint64((48 - 16 * c) % 64)
            rot = h if k == 0 else ((h << k) | (h >> (np.uint64(64) - k)))
            order = np.argsort(rot, kind="stable")
            ia = np.concatenate([order[:-d] for d in range(1, window + 1)
                                 if d < m])
            ib = np.concatenate([order[d:] for d in range(1, window + 1)
                                 if d < m])
        x = h[ia] ^ h[ib]
        dist = np.zeros(len(x), dtype=np.int64)
        while x.any():
            dist += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
        keep = dist <= np.int64(max_hamming)
        return ia[keep], ib[keep], dist[keep]

    # one bucket shuffle + per-bucket group loop (only multi-member
    # (chunk, value) groups pay anything; groupby().map_groups would pay
    # Ray's per-group overhead on every distinct fingerprint chunk)
    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        df = (bucket.drop_duplicates(["chunk", "chunk_val", "doc_id"])
              .sort_values(["chunk", "chunk_val", "doc_id"]))
        n = len(df)
        if n == 0:
            return empty
        ck = df["chunk"].to_numpy()
        cv = df["chunk_val"].to_numpy()
        ids = df["doc_id"].to_numpy()
        hs = df["simhash"].to_numpy().astype(np.uint64)
        starts = np.concatenate(
            ([True], (ck[1:] != ck[:-1]) | (cv[1:] != cv[:-1])))
        start_idx = np.nonzero(starts)[0]
        sizes = np.diff(np.concatenate((start_idx, [n])))
        out_a, out_b, out_d = [], [], []
        for s, m in zip(start_idx[sizes >= 2], sizes[sizes >= 2]):
            gi, gh = ids[s:s + m], hs[s:s + m]
            ia, ib, dist = _group_pairs(int(ck[s]), gi, gh)
            if len(ia):
                a, b = gi[ia], gi[ib]
                out_a.append(np.minimum(a, b))
                out_b.append(np.maximum(a, b))
                out_d.append(dist)
        if not out_a:
            return empty
        return pd.DataFrame({"doc_a": np.concatenate(out_a),
                             "doc_b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_d)})

    found = bucketed_group_agg(
        fps.map_batches(chunked, batch_format="pandas"),
        ["chunk", "chunk_val"], pairs)
    def min_ham(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["doc_a", "doc_b"], sort=False)["hamming"].min()
                .reset_index())

    out = bucketed_group_agg(found, ["doc_a", "doc_b"], min_ham,
                             pre=min_ham).to_pandas()
    if "doc_a" not in out.columns:  # schema-stable empty result
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "hamming": pa.array([], type=pa.int64())})
    out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


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


# -- benchmark decontamination (test-set n-gram overlap) ----------------

def _token_ngrams(t: pa.Table, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, gram-string) arrays for all n-token grams of the batch:
    one vectorized explode + one Arrow join kernel, no per-row Python."""
    import pyarrow.compute as pc

    from .textstats import _explode_terms

    doc_idx, terms = _explode_terms(t)
    m = len(terms) - (n - 1)
    if m <= 0:
        return (np.empty(0, dtype=np.int64),
                np.empty(0, dtype=object))
    # a gram is valid only when it doesn't straddle a doc boundary
    valid = doc_idx[:m] == doc_idx[n - 1:]
    parts = [pa.array(terms[j:m + j]) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    return (doc_idx[:m][valid].astype(np.int64),
            grams.to_numpy(zero_copy_only=False)[valid])


def decontaminate(ds: rd.Dataset, benchmark_grams: np.ndarray,
                  n: int = 8) -> rd.Dataset:
    """Training-data decontamination: flag documents sharing any n-token
    gram with a benchmark/eval set (the standard 8-13-gram overlap test
    used by large-scale LM data pipelines). The benchmark gram set is the
    SMALL side: broadcast once via ray.put and probed per batch with one
    searchsorted — no shuffle touches the corpus.

    Returns (doc_id, n_hits, contaminated) for every input doc, where
    n_hits counts contaminated gram OCCURRENCES (positions)."""
    import ray

    bench_ref = ray.put(np.sort(np.unique(benchmark_grams)))

    class _Probe:
        def __init__(self):
            self.bench = ray.get(bench_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            doc_idx, grams = _token_ngrams(t, n)
            nb = len(self.bench)
            if len(grams) and nb:
                pos = np.searchsorted(self.bench, grams)
                hit = (pos < nb) & (
                    self.bench[np.minimum(pos, nb - 1)] == grams)
                hits = np.bincount(doc_idx[hit], minlength=len(t))
            else:
                hits = np.zeros(len(t), dtype=np.int64)
            hits = hits.astype(np.int64)
            return pa.table({
                "doc_id": t.column("doc_id"),
                "n_hits": pa.array(hits, type=pa.int64()),
                "contaminated": pa.array(hits > 0, type=pa.bool_()),
            })

    return ds.map_batches(_Probe, batch_format="pyarrow",
                          concurrency=(1, 8), num_cpus=1)


def decontaminate_docs(sf_dir: str, n: int = 8,
                       benchmark_max_doc_id: int = 10):
    """Driver query: docs with doc_id < benchmark_max_doc_id act as the
    'benchmark set'; every document is flagged if it shares any n-gram
    with them (the benchmark docs flag themselves, deterministically)."""
    import pyarrow.dataset as pads

    bench_t = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"],
        filter=pads.field("doc_id") < benchmark_max_doc_id)
    _, bench_grams = _token_ngrams(bench_t, n)
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    return decontaminate(ds, bench_grams, n=n)


# -- exact substring dedup (suffix-window variant) -----------------------

_H2_KEY = "fedcba9876543210"  # second independent siphash key (128-bit id)
_TOKEN_SPLIT_RE = None  # compiled lazily from textstats._TOKEN_SPLIT


def _token_split_re():
    global _TOKEN_SPLIT_RE
    if _TOKEN_SPLIT_RE is None:
        import re

        from .textstats import _TOKEN_SPLIT

        _TOKEN_SPLIT_RE = re.compile(_TOKEN_SPLIT)
    return _TOKEN_SPLIT_RE


def _rolling_window_hashes(th: np.ndarray, window: int) -> np.ndarray:
    """Position-shift-invariant rolling hash: XOR of per-token hashes
    rotated by their offset within the window. Equal token windows get
    equal hashes wherever they start; W vectorized passes, no per-token
    Python."""
    m = len(th) - (window - 1)
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(window):
        k = (window - 1 - j) % 64
        x = th[j:m + j]
        if k:
            kk = np.uint64(k)
            acc ^= (x << kk) | (x >> (np.uint64(64) - kk))
        else:
            acc ^= x
    return acc


def _window_positions(t: pa.Table, window: int):
    """All ``window``-token windows of a batch that do not straddle a doc
    boundary. Returns (flat_start, window_doc_index, pos_in_doc, h1, h2,
    doc_idx, terms); h1/h2 are two independent 64-bit rolling hashes whose
    pair is the (collision-negligible) 128-bit identity of the window's
    token content."""
    from .textstats import _explode_terms

    doc_idx, terms = _explode_terms(t)
    T = len(terms)
    m = T - (window - 1)
    e_i = np.empty(0, dtype=np.int64)
    e_u = np.empty(0, dtype=np.uint64)
    if m <= 0:
        return e_i, e_i, e_i, e_u, e_u, doc_idx, terms
    h1 = _rolling_window_hashes(pd.util.hash_array(terms), window)
    h2 = _rolling_window_hashes(
        pd.util.hash_array(terms, hash_key=_H2_KEY), window)
    valid = doc_idx[:m] == doc_idx[window - 1:]
    starts = np.flatnonzero(valid)
    wdoc = doc_idx[starts].astype(np.int64)
    doc_first = np.searchsorted(doc_idx, np.arange(len(t)), side="left")
    pos = starts - doc_first[wdoc]
    return (starts.astype(np.int64), wdoc, pos.astype(np.int64),
            h1[starts], h2[starts], doc_idx, terms)


def _dup_window_hashes(ds: rd.Dataset, window: int) -> rd.Dataset:
    """Pass A of exact-substring dedup: the set of h1 window hashes seen
    >= 2 times corpus-wide. Per-batch ``np.unique`` partials shrink the
    shuffle to (hash, count) pairs; one bucketed merge finishes."""

    def partial(t: pa.Table) -> pa.Table:
        _, _, _, h1, _, _, _ = _window_positions(t, window)
        u, c = np.unique(h1, return_counts=True)
        return pa.table({
            "win_hash": pa.array(u.view(np.int64), type=pa.int64()),
            "cnt": pa.array(c, type=pa.int64()),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("win_hash", sort=False)["cnt"].sum()
               .reset_index())
        out = out[out["cnt"] >= 2][["win_hash"]]
        out["win_hash"] = out["win_hash"].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_agg(partials, ["win_hash"], merge)


_OCC_SCHEMA = pa.schema([("h1", pa.int64()), ("h2", pa.int64()),
                         ("doc_id", pa.int64()), ("pos", pa.int64())])
_FLAG_SCHEMA = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64()),
                          ("keep", pa.bool_())])


def exactsubstr_dedup(sf_dir: str, window: int = 12,
                      broadcast_cap: int = 5_000_000,
                      _force_join: bool = False) -> rd.Dataset:
    """Exact duplicated-substring removal (the ExactSubstr dedup of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models Better"),
    re-expressed as streaming Ray Data passes instead of a monolithic
    suffix array:

    1. **Discover** (pass A): every ``window``-token window gets a rolling
       64-bit hash; per-batch ``np.unique`` partials + one bucketed
       (hash, count) shuffle yield the hashes seen >= 2 times. The shuffle
       carries 16-byte pairs, never text.
    2. **Flag** (pass B): re-scan the corpus; only windows whose h1 is in
       the duplicate set emit an occurrence (h1, h2, doc_id, pos). The dup
       set is broadcast via ``ray.put`` when small (size-gated), else the
       occurrence stream is hash-joined against it. A grouped pass on the
       128-bit (h1, h2) pair picks the winner occurrence (lowest
       (doc_id, pos)); all other occurrences are losers. h1-only false
       positives land in singleton groups and emit nothing.
    3. **Cut**: flagged occurrences (small relative to the corpus) are
       hash-joined back to documents by doc_id; one vectorized per-doc
       pass removes tokens covered by a loser window and not covered by
       any winner window, i.e. every duplicated substring survives in
       exactly its first-occurrence copy.

    The cleaned text is the analyzed token stream re-joined with single
    spaces (lowercased, punctuation-split — the same SimpleAnalyzer
    tokenization every other documents-table operator uses).

    Reference semantics: SignatureUpdateProcessorFactory.java removes
    whole duplicate documents; this operator is its substring-granular
    counterpart for training-data curation. Collision note: winner groups
    key on 128 bits (two independent siphash-derived rolling hashes) —
    ~6e-13 collision odds at 10^13 windows.
    """
    import ray

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    dup_ds = materialize_typed(
        _dup_window_hashes(ds, window),
        pa.schema([("win_hash", pa.int64())]))

    n_dup = dup_ds.count()
    use_broadcast = (n_dup <= broadcast_cap) and not _force_join

    def occ_from_hits(t: pa.Table, hit_mask, wdoc, pos, h1, h2) -> pa.Table:
        doc_ids = t.column("doc_id").to_numpy()
        return pa.table({
            "h1": pa.array(h1[hit_mask].view(np.int64), type=pa.int64()),
            "h2": pa.array(h2[hit_mask].view(np.int64), type=pa.int64()),
            "doc_id": pa.array(doc_ids[wdoc[hit_mask]], type=pa.int64()),
            "pos": pa.array(pos[hit_mask], type=pa.int64()),
        })

    if use_broadcast:
        dups = np.sort(dup_ds.to_pandas()["win_hash"].to_numpy()
                       .view(np.uint64)) if n_dup else np.empty(0, np.uint64)
        ref = ray.put(dups)

        class _Occ:
            def __init__(self):
                self.dups = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                _, wdoc, pos, h1, h2, _, _ = _window_positions(t, window)
                nb = len(self.dups)
                if len(h1) == 0 or nb == 0:
                    return _OCC_SCHEMA.empty_table()
                p = np.searchsorted(self.dups, h1)
                hit = (p < nb) & (self.dups[np.minimum(p, nb - 1)] == h1)
                return occ_from_hits(t, hit, wdoc, pos, h1, h2)

        occ = ds.map_batches(_Occ, batch_format="pyarrow",
                             concurrency=(1, 8), num_cpus=1)
    else:
        def all_occ(t: pa.Table) -> pa.Table:
            _, wdoc, pos, h1, h2, _, _ = _window_positions(t, window)
            if len(h1) == 0:
                return _OCC_SCHEMA.empty_table()
            return occ_from_hits(t, np.ones(len(h1), dtype=bool),
                                 wdoc, pos, h1, h2)

        occ = native_join(
            ds.map_batches(all_occ, batch_format="pyarrow"),
            dup_ds, on="h1", right_on="win_hash")
        occ = occ.select_columns(["h1", "h2", "doc_id", "pos"])

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h1", "h2", "doc_id", "pos"], kind="stable")
        grp = g.groupby(["h1", "h2"], sort=False)
        sizes = grp["pos"].transform("size")
        g = g[sizes >= 2]
        if len(g) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "pos": pd.Series(dtype=np.int64),
                                 "keep": pd.Series(dtype=bool)})
        first = g.groupby(["h1", "h2"], sort=False).cumcount() == 0
        return pd.DataFrame({"doc_id": g["doc_id"].astype(np.int64),
                             "pos": g["pos"].astype(np.int64),
                             "keep": first.to_numpy()})

    flagged = materialize_typed(
        bucketed_group_agg(occ, ["h1", "h2"], flag), _FLAG_SCHEMA)

    if flagged.count() == 0:
        # no duplicated windows anywhere: emit the tokenized passthrough
        # directly — a fully-empty join side leaves Ray's hash-join
        # aggregators with schema-less partitions (ArrowInvalid)
        def passthrough(t: pa.Table) -> pa.Table:
            from .textstats import _explode_terms

            doc_idx, terms = _explode_terms(t)
            n = len(t)
            counts = np.bincount(doc_idx, minlength=n).astype(np.int64)
            clean = np.full(n, "", dtype=object)
            if len(terms):
                joined_s = pd.Series(terms).groupby(doc_idx).agg(" ".join)
                clean[joined_s.index.to_numpy()] = joined_s.to_numpy()
            zeros = np.zeros(n, dtype=np.int64)
            return pa.table({
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(counts, type=pa.int64()),
                "n_dup_windows": pa.array(zeros, type=pa.int64()),
                "n_removed_tokens": pa.array(zeros, type=pa.int64()),
                "text_clean": pa.array(clean, type=pa.string()),
            })

        return ds.map_batches(passthrough, batch_format="pyarrow")

    joined = native_join(ds, flagged, on="doc_id", join_type="left_outer")

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        text = g["text"].iloc[0]
        toks = [w for w in _token_split_re().split(text.lower()) if w]
        n = len(toks)
        occ_rows = g.dropna(subset=["pos"])
        loser_pos = occ_rows.loc[~occ_rows["keep"].astype(bool),
                                 "pos"].to_numpy(dtype=np.int64)
        winner_pos = occ_rows.loc[occ_rows["keep"].astype(bool),
                                  "pos"].to_numpy(dtype=np.int64)

        def cover(starts: np.ndarray) -> np.ndarray:
            d = np.zeros(n + 1, dtype=np.int64)
            if len(starts):
                np.add.at(d, starts, 1)
                np.add.at(d, np.minimum(starts + window, n), -1)
            return np.cumsum(d[:n]) > 0

        removed = cover(loser_pos) & ~cover(winner_pos)
        clean = " ".join(np.array(toks, dtype=object)[~removed]) if n else ""
        return pd.DataFrame({
            "doc_id": [np.int64(g["doc_id"].iloc[0])],
            "n_tokens": [np.int64(n)],
            "n_dup_windows": [np.int64(len(loser_pos))],
            "n_removed_tokens": [np.int64(int(removed.sum()))],
            "text_clean": [clean],
        })

    return joined.groupby("doc_id").map_groups(cut, batch_format="pandas")
