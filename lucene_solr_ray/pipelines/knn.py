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
import ray.data as rd

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
