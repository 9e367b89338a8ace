"""lucene/classification analogs: SimpleNaiveBayes (hand-checked math)
and the MLT-vote kNN classifier."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from lucene_solr_ray.search.classify import (
    KNearestNeighborClassifier,
    NaiveBayesModel,
    classify_batches,
    train_naive_bayes,
)


@pytest.fixture(scope="module")
def tiny_model(ray_session):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array(["x x y", "x z", "y y", "z"]),
        "cls": pa.array(["a", "a", "b", "b"]),
    })
    return train_naive_bayes(rd.from_arrow(docs), "text", "cls")


def test_nb_training_stats(tiny_model):
    m = tiny_model
    assert m.classes == ["a", "b"]
    assert m.docs_with_class == 4
    # distinct (doc, term) pairs: {x,y},{x,z},{y},{z} -> 6
    assert m.avg_unique_terms == pytest.approx(6 / 4)
    # den_c = avgUnique*df(c) + docsWithClass = 1.5*2 + 4 = 7
    assert list(m.den) == [7.0, 7.0]
    ti = {t: i for i, t in enumerate(m.terms)}
    assert m.tc_df[ti["x"]].tolist() == [2, 0]
    assert m.tc_df[ti["y"]].tolist() == [1, 1]
    assert m.tc_df[ti["z"]].tolist() == [1, 1]


def test_nb_score_hand_math(tiny_model):
    # SimpleNaiveBayesClassifier.java:208-283 formula, computed by hand:
    # score("x", a) = ln(2/4) + ln((2+1)/7)
    s = tiny_model.scores([["x"]])
    assert s[0][0] == pytest.approx(math.log(0.5) + math.log(3 / 7))
    assert s[0][1] == pytest.approx(math.log(0.5) + math.log(1 / 7))
    assert tiny_model.predict([["x"]]) == ["a"]
    # unknown token: smoothed ln(1/den) for both -> tie -> class asc
    assert tiny_model.predict([["qqq"]]) == ["a"]
    # empty doc: prior only (equal priors here) -> class asc
    assert tiny_model.predict([[]]) == ["a"]


def test_nb_bulk_classify_matches_local(ray_session, tiny_model):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["x x", "y z", ""]),
    })
    out = classify_batches(rd.from_arrow(docs), tiny_model,
                           "text", "doc_id").to_pandas()
    out = out.sort_values("doc_id")
    local = tiny_model.predict([["x", "x"], ["y", "z"], []])
    assert out["pred"].tolist() == local


def test_nb_self_classification_learns_real_signal(ray_session):
    # two classes with mostly-disjoint vocabularies: self-classification
    # should be near-perfect
    rng = np.random.default_rng(5)
    va = ["alpha", "beta", "gamma", "delta"]
    vb = ["omega", "sigma", "theta", "kappa"]
    rows, cls = [], []
    for i in range(60):
        vocab = va if i % 2 == 0 else vb
        rows.append(" ".join(rng.choice(vocab, size=8)))
        cls.append("A" if i % 2 == 0 else "B")
    docs = pa.table({
        "doc_id": pa.array(range(60), type=pa.int64()),
        "text": pa.array(rows), "cls": pa.array(cls)})
    m = train_naive_bayes(rd.from_arrow(docs), "text", "cls")
    preds = classify_batches(rd.from_arrow(docs), m, "text",
                             "doc_id").to_pandas()
    preds = preds.sort_values("doc_id")["pred"].tolist()
    assert preds == cls


@pytest.fixture(scope="module")
def knn_index(ray_session, tmp_path_factory):
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.searcher import IndexSearcher

    root = tmp_path_factory.mktemp("knn_cls")
    sports = "football goal match striker penalty referee stadium"
    tech = "compiler kernel bytes register pointer thread socket"
    rows = []
    for i in range(20):
        vocab = sports if i % 2 == 0 else tech
        words = vocab.split()
        text = " ".join(words[(i + j) % len(words)] for j in range(5))
        rows.append((f"conv-{i:04d}", 0, text,
                     "sports" if i % 2 == 0 else "tech"))
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "text": pa.array([r[2] for r in rows]),
        "role": pa.array([r[3] for r in rows]),
    })
    pq.write_table(t, root / "src.parquet")
    idx = root / "idx"
    build_index(str(root / "src.parquet"), str(idx), num_shards=2)
    return IndexSearcher(str(idx))


def test_knn_classifier_votes(knn_index):
    clf = KNearestNeighborClassifier(knn_index, "role", k=5,
                                     min_doc_freq=1)
    cl, score = clf.assign_class("football match penalty")
    assert cl == "sports" and 0 < score <= 1.0
    cl2, _ = clf.assign_class("compiler pointer thread")
    assert cl2 == "tech"
    # full distribution is sorted score desc
    dist = clf.get_classes("football compiler match penalty goal")
    scores = [s for _, s in dist]
    assert scores == sorted(scores, reverse=True)


def test_knn_no_terms_returns_none(knn_index):
    clf = KNearestNeighborClassifier(knn_index, "role", k=5)
    assert clf.assign_class("the of") is None
