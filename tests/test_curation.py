"""Training-data curation: domain-mix sampling + sequence packing."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from lucene_solr_ray.pipelines.curation import domain_mix, pack_sequences


def _docs_table(n=400, seed=3):
    rng = np.random.default_rng(seed)
    langs = rng.choice(["en", "fr", "zh"], size=n)
    texts = [" ".join(["tok"] * int(k))
             for k in rng.integers(1, 60, size=n)]
    return pa.table({"doc_id": np.arange(n, dtype=np.int64),
                     "lang": langs, "text": texts})


def test_domain_mix_deterministic_and_partition_invariant(ray_session):
    t = _docs_table()
    rates = {"en": 1.0, "fr": 0.4, "zh": 0.1}
    kept1 = set(domain_mix(rd.from_arrow(t), "lang", rates)
                .to_pandas()["doc_id"])
    kept2 = set(domain_mix(rd.from_arrow(t).repartition(13), "lang",
                           rates).to_pandas()["doc_id"])
    assert kept1 == kept2
    # en kept fully; zh heavily cut
    langs = t.column("lang").to_pylist()
    en = {i for i in range(len(langs)) if langs[i] == "en"}
    assert en <= kept1
    zh = [i for i in range(len(langs)) if langs[i] == "zh"]
    zh_kept = [i for i in zh if i in kept1]
    assert len(zh_kept) < 0.3 * len(zh)


def test_domain_mix_rate_validation(ray_session):
    with pytest.raises(ValueError):
        domain_mix(rd.from_arrow(_docs_table(10)), "lang", {"en": 1.5})


def test_pack_sequences_invariants(ray_session):
    t = _docs_table(300)
    budget = 128
    out = pack_sequences(rd.from_arrow(t).repartition(5),
                         budget=budget).to_pandas()
    # every doc exactly once
    assert sorted(out["doc_id"]) == list(range(300))
    # per-sequence budget respected, offsets contiguous
    for seq_id, grp in out.groupby("seq_id"):
        assert grp["n_tokens"].sum() <= budget
        grp = grp.sort_values("offset")
        want_off = 0
        for _, row in grp.iterrows():
            assert row["offset"] == want_off
            want_off += row["n_tokens"]
    # seq_id is the first doc id of its sequence
    firsts = out.loc[out.groupby("seq_id")["offset"].idxmin()]
    assert (firsts["seq_id"] == firsts["doc_id"]).all()


def test_pack_sequences_truncation_and_oversize(ray_session):
    t = pa.table({"doc_id": np.arange(3, dtype=np.int64),
                  "text": ["a " * 500, "b b b", "c"]})
    out = pack_sequences(rd.from_arrow(t), budget=100).to_pandas()
    big = out[out.doc_id == 0].iloc[0]
    assert big["n_tokens"] == 100  # truncated to budget
    out2 = pack_sequences(rd.from_arrow(t), budget=100,
                          truncate=False).to_pandas()
    big2 = out2[out2.doc_id == 0].iloc[0]
    assert big2["n_tokens"] == 500  # kept whole in its own sequence
    assert (out2[out2.seq_id == big2["seq_id"]]["doc_id"] == [0]).all()


def test_pack_sequences_precomputed_token_column(ray_session):
    t = pa.table({"doc_id": np.arange(4, dtype=np.int64),
                  "text": ["x", "x", "x", "x"],
                  "n_tokens": pa.array([50, 60, 50, 10])})
    out = pack_sequences(rd.from_arrow(t), budget=100).to_pandas()
    assert out["n_tokens"].tolist() == [50, 60, 50, 10]
    # greedy fill: [50] (60 would overflow), [60] (50 would overflow),
    # [50, 10]
    seqs = out.groupby("seq_id")["doc_id"].apply(list).tolist()
    assert sorted(map(tuple, seqs)) == [(0,), (1,), (2, 3)]


def test_c4_clean_filters_are_load_bearing(ray_session):
    """Each stage of the composed clean drops something at sf0.001."""
    import duckdb

    from lucene_solr_ray.pipelines.curation import c4_clean_docs

    sf = "/root/testdata/sf0.001"
    kept = c4_clean_docs(sf).to_pandas()["cnt"].sum()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{sf}/documents.parquet'")
    total = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    en = con.execute(
        "SELECT count(*) FROM documents WHERE lang='en'").fetchone()[0]
    assert 0 < kept < en < total


def test_lm_score_hand_oracle(ray_session):
    """Stupid-backoff LM scores on a hand-computable corpus."""
    import math

    from lucene_solr_ray.pipelines.curation import lm_score

    t = pa.table({"doc_id": np.arange(4, dtype=np.int64),
                  "text": ["a b", "a b", "a c", "b a"]})
    out = (lm_score(rd.from_arrow(t)).to_pandas()
           .set_index("doc_id").sort_index())
    # counts: a=4 b=3 c=1, 'a b'=2 'a c'=1 'b a'=1; tot unigrams = 8
    tot = 8.0
    logp_a_first = math.log(0.4 * 4 / tot)
    logp_b_first = math.log(0.4 * 3 / tot)
    want0 = (logp_a_first + math.log(2 / 4)) / 2      # "a b"
    want2 = (logp_a_first + math.log(1 / 4)) / 2      # "a c"
    want3 = (logp_b_first + math.log(1 / 3)) / 2      # "b a"
    assert out.loc[0, "mean_logp"] == pytest.approx(want0, abs=1e-6)
    assert out.loc[1, "mean_logp"] == pytest.approx(want0, abs=1e-6)
    assert out.loc[2, "mean_logp"] == pytest.approx(want2, abs=1e-6)
    assert out.loc[3, "mean_logp"] == pytest.approx(want3, abs=1e-6)
    assert out["n_tokens"].tolist() == [2, 2, 2, 2]


def test_lm_score_ranks_natural_text_higher(ray_session):
    """Repetitive natural-ish text scores above token soup from the
    same vocabulary (the CCNet filtering signal)."""
    from lucene_solr_ray.pipelines.curation import lm_score

    natural = ["the cat sat on the mat"] * 30
    soup = ["mat the on cat the sat", "sat mat cat on the the"]
    t = pa.table({
        "doc_id": np.arange(len(natural) + len(soup), dtype=np.int64),
        "text": natural + soup})
    out = (lm_score(rd.from_arrow(t)).to_pandas()
           .set_index("doc_id").sort_index())
    nat_score = out.loc[0, "mean_logp"]
    for d in range(len(natural), len(natural) + len(soup)):
        assert out.loc[d, "mean_logp"] < nat_score
