"""Similarity search: exact brute-force top-k vs numpy oracle, IVF recall,
and the bucketed index layout (partition-pruned probes)."""

import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.pipelines import knn

SF = "/root/testdata/sf0.001"


def _exact_topk(sf_dir: str, query_vec_id: int, k: int):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    q = m[np.where(ids == query_vec_id)[0][0]]
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(m, axis=1)
    sims = (m @ qn) / np.where(norms == 0, 1.0, norms)
    order = np.lexsort((ids, -sims))[:k]
    return [int(ids[i]) for i in order]


def test_knn_cosine_matches_numpy_oracle(ray_session):
    got = knn.knn_cosine(SF, query_vec_id=0, k=10).to_pandas()
    assert got["vec_id"].tolist() == _exact_topk(SF, 0, 10)
    assert (got["sim"].to_numpy()[:-1] >= got["sim"].to_numpy()[1:]).all()


def test_knn_ivf_recall(ray_session):
    shutil.rmtree("/tmp/lsr_ivf", ignore_errors=True)
    k = 10
    recalls = []
    for qid in [0, 7, 42]:
        exact = set(_exact_topk(SF, qid, k))
        approx = set(knn.knn_ivf(SF, query_vec_id=qid, k=k)
                     .to_pandas()["vec_id"].tolist())
        recalls.append(len(exact & approx) / k)
    assert np.mean(recalls) >= 0.9, recalls


def test_knn_ivf_full_probe_is_exact(ray_session):
    """Probing every bucket must reproduce the exact top-k ranking."""
    got = knn.knn_ivf(SF, query_vec_id=3, k=10, nprobe=16).to_pandas()
    assert got["vec_id"].tolist() == _exact_topk(SF, 3, 10)


def test_ivf_index_is_bucket_partitioned(ray_session, tmp_path):
    out = str(tmp_path / "ivf")
    knn.build_ivf_index(SF, out, n_centroids=8, seed=1)
    import pyarrow.dataset as pads

    d = pads.dataset(out + "/data", format="parquet", partitioning="hive")
    assert "bucket" in d.schema.names
    t = d.to_table(columns=["vec_id"])
    n = pq.ParquetFile(f"{SF}/embeddings.parquet").metadata.num_rows
    # every vector assigned to exactly assign_top buckets (default 3)
    assert t.num_rows == 3 * n
    assert len(set(t.column("vec_id").to_pylist())) == n
    # rebuild is a no-op (manifest detected)
    knn.build_ivf_index(SF, out, n_centroids=8, seed=1)
    assert d.to_table(columns=["vec_id"]).num_rows == 3 * n
