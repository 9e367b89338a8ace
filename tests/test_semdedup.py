"""SemDeDup (arXiv:2303.09540): k-means semantic dedup — planted
near-duplicates removed, keep rule (lowest cos-to-centroid) honored,
kept set pairwise-clean within clusters, decisions recomputable from
the returned assignment."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.pipelines.knn import semdedup

EPS = 0.05
THRESH = 1.0 - EPS


def _write_embeddings(tmp, n_base=80, dim=16, seed=3):
    """Base random vectors plus planted duplicate groups: 5 exact
    copies, 10 near-copies (cos > THRESH after tiny noise)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = [base]
    # exact copies of vectors 0..4
    vecs.append(base[:5])
    # near copies of vectors 10..19 (noise small enough to stay above
    # the threshold)
    noisy = base[10:20] + 0.02 * rng.standard_normal((10, dim))
    noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
    vecs.append(noisy)
    m = np.concatenate(vecs)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(m)), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in m],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(m), dtype=np.int32)),
    })
    pq.write_table(t, f"{tmp}/embeddings.parquet")
    return m / np.linalg.norm(m, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def run(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("semdedup")
    m = _write_embeddings(str(tmp))
    out = semdedup(str(tmp), eps=EPS, n_clusters=6, iters=3).to_pandas()
    return m, out


def test_every_vector_decided_once(run):
    m, out = run
    assert sorted(out["vec_id"]) == list(range(len(m)))
    assert out["keep"].dtype == bool


def test_exact_duplicates_collapse(run):
    m, out = run
    keep = out.set_index("vec_id")["keep"]
    cluster = out.set_index("vec_id")["cluster"]
    n = len(m) - 15
    for i in range(5):
        a, b = i, n + i  # exact copy pair
        assert cluster[a] == cluster[b]  # identical vector, same argmax
        assert int(keep[a]) + int(keep[b]) == 1, (a, b)


def test_dropped_vectors_have_a_same_cluster_witness(run):
    m, out = run
    for _, row in out[~out["keep"]].iterrows():
        mates = out[(out["cluster"] == row["cluster"])
                    & (out["vec_id"] != row["vec_id"])]
        sims = m[mates["vec_id"].to_numpy()] @ m[int(row["vec_id"])]
        assert (sims >= THRESH - 1e-9).any(), row["vec_id"]


def test_kept_set_is_pairwise_clean_within_cluster(run):
    m, out = run
    for cl, g in out[out["keep"]].groupby("cluster"):
        ids = g["vec_id"].to_numpy()
        if len(ids) < 2:
            continue
        sims = m[ids] @ m[ids].T
        np.fill_diagonal(sims, 0.0)
        assert sims.max() < THRESH + 1e-9, cl


def test_keep_rule_lowest_cos_to_centroid(run):
    """Within each duplicate component the survivor must be the member
    with the smallest cos_centroid (ties to lower vec_id) — recompute
    components from the returned assignment."""
    m, out = run
    for cl, g in out.groupby("cluster"):
        ids = g["vec_id"].to_numpy()
        sims = m[ids] @ m[ids].T
        n = len(ids)
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(n):
            for j in range(i + 1, n):
                if sims[i, j] >= THRESH:
                    parent[find(j)] = find(i)
        comp = {}
        for i in range(n):
            comp.setdefault(find(i), []).append(i)
        cos_c = g["cos_centroid"].to_numpy()
        keep = g["keep"].to_numpy()
        for members in comp.values():
            want = min(members, key=lambda i: (cos_c[i], ids[i]))
            for i in members:
                assert keep[i] == (i == want), (cl, ids[i])


def test_tiny_eps_only_exact_dupes(ray_session, tmp_path_factory):
    # eps must sit above float32 carry precision (vectors ship between
    # stages as float32 blobs, so a self-cosine lands at 1 +/- ~1e-7)
    # and below the planted near-copy distance (~3e-3)
    tmp = tmp_path_factory.mktemp("semdedup_eps")
    m = _write_embeddings(str(tmp))
    out = semdedup(str(tmp), eps=1e-6, n_clusters=6, iters=2).to_pandas()
    dropped = out[~out["keep"]]["vec_id"].to_numpy()
    # near-copies survive; one of each exact-copy pair is dropped
    assert len(dropped) == 5
    n = len(m) - 15
    for d in dropped:
        assert d < 5 or d >= n


def test_deterministic(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("semdedup_det")
    _write_embeddings(str(tmp))
    a = semdedup(str(tmp), eps=EPS, n_clusters=6, iters=3).to_pandas()
    b = semdedup(str(tmp), eps=EPS, n_clusters=6, iters=3).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_hot_cluster_cap_stays_correct(ray_session, tmp_path_factory):
    """With the pairing cap forced below the cluster size, the split
    path must still drop every member of a tight duplicate pile except
    one (the pile is on one side of any hyperplane)."""
    tmp = tmp_path_factory.mktemp("semdedup_hot")
    rng = np.random.default_rng(11)
    anchor = rng.standard_normal(16)
    pile = anchor + 0.001 * rng.standard_normal((64, 16))
    pile /= np.linalg.norm(pile, axis=1, keepdims=True)
    others = rng.standard_normal((32, 16))
    others /= np.linalg.norm(others, axis=1, keepdims=True)
    m = np.concatenate([pile, others])
    t = pa.table({
        "vec_id": pa.array(np.arange(len(m)), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in m],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(m), dtype=np.int32)),
    })
    pq.write_table(t, f"{tmp}/embeddings.parquet")
    out = semdedup(str(tmp), eps=EPS, n_clusters=4, iters=2,
                   max_cluster_pairing=16).to_pandas()
    kept_pile = out[(out["vec_id"] < 64) & out["keep"]]
    assert len(kept_pile) == 1
