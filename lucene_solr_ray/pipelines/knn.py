"""Similarity search over the embeddings table.

Brute-force cosine top-k: the query matrix is broadcast once (``ray.put``)
and every batch does one float64 matmul — the baseline ANN path. The
IVF-bucketed variant assigns each vector to its nearest of C centroids
(one extra pass) so the scale path probes only matching buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from .util import read, round_away


def _embed_matrix(batch: pd.DataFrame) -> np.ndarray:
    return np.stack(batch["embedding"].to_numpy()).astype(np.float64)


def knn_cosine(sf_dir: str, query_vec_id: int = 0, k: int = 10):
    """Top-k embeddings by cosine similarity to the query vector.

    Returns (vec_id, sim) with sim rounded to 6 — per-shard top-k then a
    driver merge, never a global sort.
    """
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    qrow = qt.filter(pa.compute.equal(qt.column("vec_id"), query_vec_id))
    q = np.asarray(qrow.column("embedding")[0].as_py(), dtype=np.float64)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(q_ref)
        m = _embed_matrix(batch)
        norms = np.linalg.norm(m, axis=1)
        sims = (m @ qv) / np.where(norms == 0, 1.0, norms)
        out = pd.DataFrame({"vec_id": batch["vec_id"].to_numpy(), "sim": sims})
        # per-batch partial top-k bounds what the driver merges
        return out.nlargest(k, "sim")

    parts = ds.map_batches(score, batch_format="pandas").to_pandas()
    top = parts.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
    out = pa.Table.from_pandas(top.reset_index(drop=True), preserve_index=False)
    return out.set_column(out.column_names.index("sim"), "sim",
                          round_away(out.column("sim"), 6))


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.3,
                            n_planes: int = 4, n_tables: int = 16,
                            seed: int = 42):
    """Embedding-cosine near-duplicate pairs via multi-table
    random-hyperplane LSH.

    ``n_tables`` independent sign-hash tables of ``n_planes`` hyperplanes
    each (one broadcast matrix); a pair becomes a candidate if it collides
    in ANY table (recall = 1 - (1 - p^k)^L for collision prob
    p = 1 - theta/pi), and every candidate is verified with the exact
    cosine — so there are no false positives, and recall is tunable via
    (n_planes, n_tables). The only shuffle is the (table, bucket) groupby;
    duplicate candidates across tables are deduped by a second tiny
    groupby on the verified pairs.
    """
    import pandas as pd

    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    probe = ds.take(1)[0]
    dim = len(probe["embedding"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, dim, n_planes))
    planes_ref = ray.put(planes)

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        pl = ray.get(planes_ref)
        m = _embed_matrix(batch)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        frames = []
        for t in range(pl.shape[0]):
            signs = (m @ pl[t]) > 0
            codes = (signs.astype(np.int64) <<
                     np.arange(signs.shape[1])).sum(axis=1)
            frames.append(pd.DataFrame({
                "table": t,
                "bucket": codes,
                "vec_id": batch["vec_id"].to_numpy(),
                "vec": list(m),
            }))
        return pd.concat(frames, ignore_index=True)

    buckets = ds.map_batches(bucket, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": pd.Series(dtype=np.int64),
                              "vec_b": pd.Series(dtype=np.int64),
                              "cosine": pd.Series(dtype=np.float64)})
        if len(g) < 2:
            return empty
        ids = g["vec_id"].to_numpy()
        m = np.stack(g["vec"].to_numpy())
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        if not keep.any():
            return empty
        a, b = ids[ia[keep]], ids[ib[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi,
                             "cosine": sims[ia[keep], ib[keep]]})

    from ray.data.aggregate import Max

    found = (buckets.groupby(["table", "bucket"])
             .map_groups(pairs, batch_format="pandas"))
    out = (found.groupby(["vec_a", "vec_b"])
           .aggregate(Max("cosine", alias_name="cosine")).to_pandas())
    if out.empty:  # keep a stable schema even with zero pairs
        out = pd.DataFrame({"vec_a": pd.Series(dtype=np.int64),
                            "vec_b": pd.Series(dtype=np.int64),
                            "cosine": pd.Series(dtype=np.float64)})
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


class IVFIndex:
    """Bucketed (IVF-style) variant: C random-seeded centroids from the
    data, vectors assigned to nearest centroid; queries probe the nprobe
    nearest buckets only. Demonstrates the scale path; exactness is not
    claimed (standard IVF recall trade-off)."""

    def __init__(self, sf_dir: str, n_centroids: int = 16, seed: int = 42):
        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        self.ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
        self.m = m / np.linalg.norm(m, axis=1, keepdims=True)
        rng = np.random.default_rng(seed)
        cent_idx = rng.choice(len(self.m), size=min(n_centroids, len(self.m)),
                              replace=False)
        self.centroids = self.m[cent_idx]
        self.assign = np.argmax(self.m @ self.centroids.T, axis=1)

    def search(self, qv: np.ndarray, k: int = 10, nprobe: int = 4):
        qn = qv / np.linalg.norm(qv)
        cd = qn @ self.centroids.T
        probe = np.argsort(-cd)[:nprobe]
        mask = np.isin(self.assign, probe)
        sims = self.m[mask] @ qn
        ids = self.ids[mask]
        order = np.lexsort((ids, -sims))[:k]
        return [(int(ids[i]), float(sims[i])) for i in order]
