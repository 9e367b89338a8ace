"""Near-dup dedup: MinHash LSH recall/precision vs brute force, cluster
keep semantics vs union-find, SimHash determinism and Hamming pairs."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.pipelines import dedup


def _brute_force_pairs(texts: dict[int, str], threshold: float):
    """Exact shingle-Jaccard over all pairs (same shingle fn as engine)."""
    sets = {d: dedup._shingle_set(t) for d, t in texts.items()}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = np.intersect1d(sets[a], sets[b], assume_unique=True).size
            j = inter / max(1, len(sets[a]) + len(sets[b]) - inter)
            if j >= threshold:
                out[(a, b)] = j
    return out


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """60 unique docs + 3 clusters of near-identical variants."""
    rng = np.random.default_rng(123)
    words = [f"w{i:03d}" for i in range(300)]
    texts = {}
    doc_id = 0
    for _ in range(60):
        texts[doc_id] = " ".join(rng.choice(words, size=40))
        doc_id += 1
    for _ in range(3):  # clusters: a base doc + 3 lightly-edited copies
        base = list(rng.choice(words, size=60))
        texts[doc_id] = " ".join(base)
        doc_id += 1
        for _ in range(3):
            v = list(base)
            v[int(rng.integers(0, len(v)))] = str(rng.choice(words))
            texts[doc_id] = " ".join(v)
            doc_id += 1
    d = tmp_path_factory.mktemp("dedup_corpus")
    pq.write_table(pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)]),
    }), str(d / "documents.parquet"))
    return str(d), texts


def test_minhash_neardup_matches_brute_force(ray_session, corpus):
    sf_dir, texts = corpus
    got = dedup.minhash_neardup(sf_dir, threshold=0.6).to_pandas()
    want = _brute_force_pairs(texts, 0.6)
    got_pairs = {(int(a), int(b)): j for a, b, j in
                 zip(got["doc_a"], got["doc_b"], got["jaccard"])}
    # precision is exact (verify step recomputes true Jaccard)
    for p, j in got_pairs.items():
        assert p in want and abs(want[p] - j) < 1e-12
    # near-identical docs (1-word edits of 60-word docs) must be recalled
    recall = len(set(got_pairs) & set(want)) / max(1, len(want))
    assert recall >= 0.9, (recall, len(want))


def test_minhash_dedup_keep_matches_union_find(ray_session, corpus):
    sf_dir, texts = corpus
    pairs = dedup.minhash_neardup(sf_dir, threshold=0.6).to_pandas()
    keep = dedup.minhash_dedup_keep(sf_dir, threshold=0.6).to_pandas()
    assert sorted(keep["doc_id"]) == sorted(texts)
    # reference union-find over the SAME verified pairs
    parent = {d: d for d in texts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = {}
    for d in texts:
        roots.setdefault(find(d), []).append(d)
    expect_keep = {min(v) for v in roots.values()} | \
        {d for d in texts if len(roots[find(d)]) == 1}
    got_keep = {int(d) for d, k in zip(keep["doc_id"], keep["keep"]) if k}
    assert got_keep == expect_keep
    # at least one multi-doc cluster exists in this corpus
    assert any(len(v) > 1 for v in roots.values())
    assert len(got_keep) < len(texts)


def test_minhash_dedup_keep_no_pairs(ray_session, tmp_path):
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["alpha beta gamma delta unique one",
                          "epsilon zeta eta theta unlike two",
                          "iota kappa lambda mu distinct three"]),
    }), str(tmp_path / "documents.parquet"))
    keep = dedup.minhash_dedup_keep(str(tmp_path), threshold=0.6).to_pandas()
    assert keep["keep"].all() and len(keep) == 3


def test_simhash_deterministic_and_dup_detection(ray_session, corpus):
    sf_dir, texts = corpus
    fp1 = (dedup.simhash_fingerprints(sf_dir).to_pandas()
           .set_index("doc_id").sort_index())
    fp2 = (dedup.simhash_fingerprints(sf_dir).to_pandas()
           .set_index("doc_id").sort_index())
    assert (fp1["simhash"] == fp2["simhash"]).all()
    # identical texts share a fingerprint
    ids = sorted(texts)
    dup_a, dup_b = ids[0], max(ids) + 1000
    # exact-dup check on a tiny separate corpus
    near = dedup.simhash_neardup(sf_dir, max_hamming=3).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(near["doc_a"], near["doc_b"])}
    # every hamming<=3 pair by brute force must be found (4x16-bit LSH is
    # exhaustive for radius 3 by pigeonhole)
    h = fp1["simhash"].to_numpy().astype(np.uint64)
    ids_arr = fp1.index.to_numpy()
    ia, ib = np.triu_indices(len(ids_arr), k=1)
    x = h[ia] ^ h[ib]
    dist = np.zeros(len(x), dtype=np.int64)
    while x.any():
        dist += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    want = {(int(min(ids_arr[i], ids_arr[j])), int(max(ids_arr[i], ids_arr[j])))
            for i, j, d in zip(ia, ib, dist) if d <= 3}
    assert got == want


def test_shingle_hash_kernel_vectorized_consistency():
    """Kernel edge cases: short docs, unicode, empty string."""
    for t in ["", "ab", "abcd", "abcde", "héllo wörld ünïcode",
              "a" * 600, "\U0001F600 emoji text here"]:
        s = dedup._shingle_set(t)
        assert len(s) >= 1
        assert (s == np.sort(np.unique(s))).all()
        again = dedup._shingle_set(t)
        assert (s == again).all()
    # different texts hash differently (w.h.p.)
    assert not np.array_equal(dedup._shingle_set("hello world this is a"),
                              dedup._shingle_set("goodbye moon that was b"))


def test_simhash_hot_bucket_bounded(ray_session, tmp_path):
    """A deliberately hot (chunk, value) bucket — thousands of docs with
    near-identical fingerprints — must pair in O(m * window), not C(m, 2),
    and still find sorted-neighborhood near-dups."""
    import time

    # many copies of a few near-identical texts: all land in the same
    # 16-bit chunk buckets with tiny Hamming distances
    n = 3000
    texts = [f"the quick brown fox jumps over the lazy dog variant {i % 4}"
             for i in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "text": pa.array(texts),
    }), str(tmp_path / "documents.parquet"))
    t0 = time.monotonic()
    out = dedup.simhash_neardup(str(tmp_path), max_hamming=3,
                                max_bucket_pairing=256,
                                window=8).to_pandas()
    elapsed = time.monotonic() - t0
    # identical texts share fingerprints -> sort-adjacent -> found
    assert len(out) > 0
    assert (out["doc_a"] < out["doc_b"]).all()
    # boundedness: window pairing emits <= m * window * chunks pairs
    assert len(out) < n * 8 * 4, len(out)
    assert elapsed < 120, elapsed


def test_simhash_neardup_exhaustive_small_unchanged(ray_session, tmp_path):
    """On a bucket under the cap the radius-3 guarantee is exact — the cap
    path must not perturb small-corpus results."""
    texts = ["alpha beta gamma delta", "alpha beta gamma delta",
             "alpha beta gamma epsilon", "totally different words here"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    }), str(tmp_path / "documents.parquet"))
    a = dedup.simhash_neardup(str(tmp_path)).to_pandas()
    b = dedup.simhash_neardup(str(tmp_path),
                              max_bucket_pairing=100000).to_pandas()
    assert a.equals(b)
    got = {(int(x), int(y)) for x, y in zip(a["doc_a"], a["doc_b"])}
    assert (0, 1) in got  # identical texts


def test_dedup_keep_local_and_distributed_paths_agree(ray_session, corpus):
    """The size-gated local union-find and the distributed
    label-propagation rounds must produce identical keep sets."""
    sf_dir, _ = corpus
    local = (dedup.minhash_dedup_keep(sf_dir).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    dist = (dedup.minhash_dedup_keep(sf_dir, local_pairs_cap=0).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert local.equals(dist)
    assert (~local["keep"]).sum() > 0  # the fixture has near-dups


# ---- benchmark decontamination (n-gram eval-set overlap) ----

def test_decontaminate_semantics(ray_session):
    import ray.data as rd

    from lucene_solr_ray.pipelines.dedup import _token_ngrams, decontaminate

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta",          # benchmark doc
            "prefix alpha beta gamma delta",   # contains the bench 3-gram
            "alpha beta",                      # too short for any 3-gram
            "delta gamma beta alpha",          # same tokens, wrong order
        ]),
    })
    _, bench = _token_ngrams(docs.slice(0, 1), 3)
    assert set(bench) == {"alpha beta gamma", "beta gamma delta"}

    out = decontaminate(rd.from_arrow(docs), bench, n=3).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["contaminated"].tolist() == [True, True, False, False]
    # doc 1 contains both benchmark grams as occurrences
    assert out["n_hits"].tolist() == [2, 2, 0, 0]


def test_token_ngrams_never_straddle_docs(ray_session):
    from lucene_solr_ray.pipelines.dedup import _token_ngrams

    docs = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["one two", "three four"]),
    })
    doc_idx, grams = _token_ngrams(docs, 2)
    assert list(grams) == ["one two", "three four"]
    assert list(doc_idx) == [0, 1]
    # n larger than any doc -> no grams
    doc_idx, grams = _token_ngrams(docs, 3)
    assert len(grams) == 0


def test_repetition_stats_semantics(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from lucene_solr_ray.pipelines.textstats import repetition_stats

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            "spam spam spam spam",       # 4 tokens, 1 distinct
            "all tokens are different",  # no repetition
            "",                          # empty doc
        ]),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = (repetition_stats(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [4, 4, 0]
    assert out["n_distinct"].tolist() == [1, 4, 0]
    assert out["dup_token_frac"].tolist() == [0.75, 0.0, 0.0]
    # "spam spam" occurs 3 times; a no-repeat doc's top bigram occurs once
    assert out["top_bigram_count"].tolist() == [3, 1, 0]
