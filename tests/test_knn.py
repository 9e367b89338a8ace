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


def _brute_force_pairs(sf_dir: str, threshold: float):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    ia, ib = np.triu_indices(len(ids), k=1)
    keep = sims[ia, ib] >= threshold
    return {(int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
            for i, j in zip(ia[keep], ib[keep])}


def test_embedding_neardup_recall_vs_brute_force(ray_session):
    """Multi-table sign-LSH + exact verify: no false positives, and
    recall >= 0.8 of the brute-force cosine>=threshold pair set."""
    want = _brute_force_pairs(SF, 0.3)
    got_df = knn.embedding_neardup_pairs(SF, threshold=0.3).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(got_df["vec_a"], got_df["vec_b"])}
    assert got <= want  # exact verify: zero false positives
    assert len(want) > 0
    assert len(got & want) / len(want) >= 0.8, (len(got), len(want))


def test_embedding_neardup_hot_bucket_bounded(ray_session, tmp_path):
    """A corpus that is one giant LSH bucket (near-identical vectors) must
    complete via recursive splitting / chain fallback in O(n) pairs, not
    C(n, 2)."""
    import pyarrow as pa
    import time

    rng = np.random.default_rng(0)
    base = rng.standard_normal(64)
    n = 3000
    vecs = base + 1e-6 * rng.standard_normal((n, 64))
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.array([v.astype(np.float32).tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    t0 = time.monotonic()
    out = knn.embedding_neardup_pairs(
        str(tmp_path), threshold=0.99, max_bucket_pairing=256).to_pandas()
    elapsed = time.monotonic() - t0
    # all n vectors are mutual near-dups; bounded pairing must still
    # connect them transitively: the pair graph has one component
    assert len(out) >= n - 1
    parent = dict()
    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x
    for a, b in zip(out["vec_a"], out["vec_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[ra] = rb
    roots = {find(i) for i in range(n)}
    assert len(roots) == 1
    # boundedness: emitted pairs are O(n * tables), nowhere near C(n,2)
    assert len(out) < n * 40, len(out)
    assert elapsed < 120, elapsed


def test_pq_encode_centroids_roundtrip(ray_session):
    from lucene_solr_ray.pipelines.knn import _pq_encode
    rng = np.random.default_rng(3)
    books = rng.normal(size=(4, 16, 8))
    # encoding the codewords themselves returns their own indices
    m = books.transpose(1, 0, 2).reshape(16, 32)
    codes = _pq_encode(m, books)
    assert codes.dtype == np.uint8
    for j in range(4):
        assert codes[:, j].tolist() == list(range(16))


def test_ivfpq_recall_vs_exact(ray_session, tmp_path):
    from lucene_solr_ray.pipelines.knn import knn_cosine, knn_ivfpq
    hits = 0
    total = 0
    for qid in (0, 7, 42):
        exact = set(knn_cosine(SF, query_vec_id=qid, k=10)
                    .column("vec_id").to_pylist())
        approx = set(knn_ivfpq(SF, query_vec_id=qid, k=10)
                     .column("vec_id").to_pylist())
        hits += len(exact & approx)
        total += len(exact)
    assert hits / total >= 0.8


def test_ivfpq_codes_are_bytes(ray_session):
    import glob
    import json
    import os
    import pyarrow.parquet as papq
    from lucene_solr_ray.pipelines.knn import build_ivfpq_index
    out = "/tmp/lsr_test_ivfpq_idx"
    import shutil
    shutil.rmtree(out, ignore_errors=True)
    build_ivfpq_index(SF, out, n_centroids=8, m_sub=8, n_codes=32,
                      assign_top=2)
    man = json.load(open(os.path.join(out, "ivfpq_manifest.json")))
    assert man["m_sub"] == 8 and man["n_codes"] == 32
    files = glob.glob(os.path.join(out, "data", "bucket=*", "*.parquet"))
    t = papq.read_table(files[0])
    codes = t.column("codes")[0].as_py()
    assert len(codes) == 8                       # 8 bytes per vector
    assert all(0 <= c < 32 for c in codes)
    # resumable: a second build is a no-op (manifest detected)
    build_ivfpq_index(SF, out, n_centroids=8, m_sub=8, n_codes=32)
