"""Sketch accuracy: HLL within error bounds, t-digest near exact quantiles."""

import numpy as np
import pytest

from lucene_solr_ray.pipelines.sketches import (
    TDigest,
    hll_add,
    hll_distinct,
    hll_estimate,
    tdigest_percentiles,
    _HLL_P,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hll_unit_accuracy():
    rng = np.random.default_rng(3)
    for true_n in [100, 5_000, 200_000]:
        regs = np.zeros(1 << _HLL_P, dtype=np.uint8)
        vals = rng.integers(0, 2**62, size=true_n)
        hll_add(regs, vals)
        est = hll_estimate(regs)
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_equals_single():
    rng = np.random.default_rng(4)
    vals = rng.integers(0, 2**62, size=10_000)
    r_all = np.zeros(1 << _HLL_P, dtype=np.uint8)
    hll_add(r_all, vals)
    r1 = np.zeros(1 << _HLL_P, dtype=np.uint8)
    r2 = np.zeros(1 << _HLL_P, dtype=np.uint8)
    hll_add(r1, vals[:6000])
    hll_add(r2, vals[6000:])
    np.testing.assert_array_equal(np.maximum(r1, r2), r_all)


def test_hll_distinct_vs_exact(ray_session):
    import duckdb

    exact = duckdb.sql(
        f"SELECT event_type, count(DISTINCT user_id) AS n FROM "
        f"read_parquet('{SF_DIR}/events.parquet') GROUP BY event_type").df()
    approx = hll_distinct(SF_DIR).to_pandas()
    merged = exact.merge(approx, on="event_type")
    rel_err = (merged["approx_distinct"] - merged["n"]).abs() / merged["n"]
    assert (rel_err < 0.06).all(), merged


def test_tdigest_quantiles():
    rng = np.random.default_rng(5)
    vals = rng.exponential(10.0, size=50_000)
    d = TDigest.of(vals[:20_000])
    for chunk in np.array_split(vals[20_000:], 7):
        d = d.merge(TDigest.of(chunk))
    for q in (0.1, 0.5, 0.9, 0.99):
        true = np.quantile(vals, q)
        est = d.quantile(q)
        assert abs(est - true) / true < 0.05, (q, true, est)


def test_tdigest_pipeline(ray_session):
    df = tdigest_percentiles(SF_DIR).to_pandas()
    assert set(df.columns) == {"event_type", "p50", "p95"}
    assert (df["p95"] >= df["p50"]).all()


def test_embedding_neardup_recall(ray_session):
    """LSH-bucketed near-dup pairs vs brute-force exact cosine."""
    import numpy as np
    import pyarrow.parquet as pq

    from lucene_solr_ray.pipelines.knn import embedding_neardup_pairs

    thr = 0.3  # synthetic embeddings are near-orthogonal; use a low bar
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    ia, ib = np.triu_indices(len(m), k=1)
    exact = {(int(a), int(b)) for a, b in
             zip(ia[sims[ia, ib] >= thr], ib[sims[ia, ib] >= thr])}
    got_df = embedding_neardup_pairs(SF_DIR, threshold=thr,
                                     n_planes=4).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(got_df["vec_a"], got_df["vec_b"])}
    assert got <= exact  # no false positives (exact verify)
    if exact:
        recall = len(got & exact) / len(exact)
        assert recall >= 0.3, (len(got), len(exact))


def test_mg_reduce_semantics():
    import pandas as pd
    from lucene_solr_ray.pipelines.sketches import mg_reduce

    counts = pd.Series({"a": 10, "b": 7, "c": 5, "d": 2, "e": 1})
    out = mg_reduce(counts, 2)
    # (k+1)-th largest = 5 subtracted, non-positive dropped
    assert out.to_dict() == {"a": 5, "b": 2}
    # at most k survive; undercount per entry <= cut
    assert len(mg_reduce(counts, 3)) <= 3
    # no reduction needed when k covers everything
    assert mg_reduce(counts, 5).to_dict() == counts.to_dict()


def test_mg_error_bound_random():
    import numpy as np
    import pandas as pd
    from lucene_solr_ray.pipelines.sketches import mg_reduce

    rng = np.random.default_rng(2)
    items = rng.zipf(1.5, size=20000)
    items = items[items < 1000]
    true = pd.Series(items).value_counts()
    k = 50
    # split into 8 "batches", reduce each, merge, reduce again
    parts = np.array_split(items, 8)
    merged = pd.concat([mg_reduce(pd.Series(p).value_counts(), k)
                        for p in parts]).groupby(level=0).sum()
    est = mg_reduce(merged, k)
    n = len(items)
    for item, e in est.items():
        assert e <= true[item]                   # never overcounts
        assert true[item] - e <= n / (k + 1)     # bounded undercount
    # every item with freq > n/(k+1) survives
    for item, t in true.items():
        if t > n / (k + 1):
            assert item in est.index


def test_heavy_hitters_exact_top(ray_session):
    import duckdb
    from lucene_solr_ray.pipelines.sketches import heavy_hitters_terms

    got = heavy_hitters_terms("/root/testdata/sf0.001").to_pandas()
    want = duckdb.sql(
        "WITH toks AS (SELECT unnest(string_split_regex(lower(text), "
        "'[^a-z0-9]+')) AS term FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')) "
        "SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks "
        "WHERE term <> '' GROUP BY term "
        "ORDER BY cnt DESC, term LIMIT 10").df()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["cnt"].tolist() == want["cnt"].tolist()


def test_heavy_hitters_uniform_fallback(ray_session, tmp_path):
    """Near-uniform corpus: the k-counter Misra-Gries summary gives no
    term the freq > n/(k+1) survival guarantee, so the sound-cut path
    cannot certify the top-k — the exact distributed fallback must kick
    in and still return the true top terms."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from lucene_solr_ray.pipelines.sketches import heavy_hitters_terms

    # term i appears i+1 times; with k=4, err = n/5 = 255 >> max freq 50
    docs = []
    for i in range(50):
        docs.extend([f"term{i:02d}"] * (i + 1))
    t = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                  "text": pa.array(docs)})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = heavy_hitters_terms(str(tmp_path), k=4, out_top=3).to_pandas()
    assert got["term"].tolist() == ["term49", "term48", "term47"]
    assert got["cnt"].tolist() == [50, 49, 48]
