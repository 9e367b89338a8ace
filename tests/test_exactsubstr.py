"""Exact-substring dedup (ExactSubstr, Lee et al. 2022): engine vs a
brute-force window-table oracle, engineered-span cases, and broadcast vs
join-path identity."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.pipelines import dedup
from lucene_solr_ray.pipelines.textstats import _TOKEN_SPLIT

_SPLIT = re.compile(_TOKEN_SPLIT)


def _brute(texts: dict[int, str], window: int) -> dict[int, tuple]:
    """Reference policy: winner = lowest (doc_id, pos) per distinct
    window; a token is removed iff covered by a loser window and not by
    a winner window."""
    toks = {d: [w for w in _SPLIT.split(s.lower()) if w]
            for d, s in texts.items()}
    occ: dict[tuple, list] = {}
    for d in sorted(toks):
        tk = toks[d]
        for p in range(len(tk) - window + 1):
            occ.setdefault(tuple(tk[p:p + window]), []).append((d, p))
    winners: dict[int, list] = {}
    losers: dict[int, list] = {}
    for v in occ.values():
        if len(v) < 2:
            continue
        v.sort()
        winners.setdefault(v[0][0], []).append(v[0][1])
        for d, p in v[1:]:
            losers.setdefault(d, []).append(p)
    out = {}
    for d in sorted(toks):
        n = len(toks[d])

        def cover(starts):
            m = np.zeros(n + 1, dtype=np.int64)
            for s in starts:
                m[s] += 1
                m[min(s + window, n)] -= 1
            return np.cumsum(m[:n]) > 0

        removed = cover(losers.get(d, [])) & ~cover(winners.get(d, []))
        clean = (" ".join(np.array(toks[d], dtype=object)[~removed])
                 if n else "")
        out[d] = (n, len(losers.get(d, [])), int(removed.sum()), clean)
    return out


def _write(texts: dict[int, str], d) -> str:
    pq.write_table(pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)]),
    }), str(d / "documents.parquet"))
    return str(d)


def _check(sf_dir: str, texts: dict[int, str], window: int, **kw):
    got = (dedup.exactsubstr_dedup(sf_dir, window=window, **kw)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _brute(texts, window)
    assert len(got) == len(texts)
    for r in got.itertuples():
        assert (r.n_tokens, r.n_dup_windows, r.n_removed_tokens,
                r.text_clean) == want[r.doc_id], r.doc_id
    return got


@pytest.fixture(scope="module")
def engineered(tmp_path_factory):
    """Spans engineered to hit every policy branch: cross-doc copy,
    whole-doc dup, within-doc repetition, overlap with unique text."""
    shared = "alpha beta gamma delta epsilon zeta"
    texts = {
        0: f"{shared} one two three",             # winner copy
        1: f"intro words {shared} tail tokens",   # loser: span removed
        2: "unique doc nothing repeats here at all",
        3: "unique doc nothing repeats here at all",  # whole-doc dup
        4: f"{shared} middle filler {shared}",    # self-repetition
        5: "totally fresh content with no overlap anywhere",
    }
    d = tmp_path_factory.mktemp("exactsubstr")
    return _write(texts, d), texts


def test_engineered_spans(ray_session, engineered):
    sf_dir, texts = engineered
    got = _check(sf_dir, texts, window=4)
    by_id = got.set_index("doc_id")
    # doc 1 loses the shared span but keeps its unique flanks
    assert by_id.loc[1, "n_removed_tokens"] == 6
    assert "alpha" not in by_id.loc[1, "text_clean"]
    assert by_id.loc[1, "text_clean"].startswith("intro words")
    # whole-doc dup: doc 2 keeps everything, doc 3 is emptied
    assert by_id.loc[2, "n_removed_tokens"] == 0
    assert by_id.loc[3, "text_clean"] == ""
    # doc 4's copies both lose to doc 0 (the corpus-wide first
    # occurrence): the span survives only in doc 0
    assert by_id.loc[4, "text_clean"] == "middle filler"
    assert by_id.loc[0, "text_clean"].count("alpha") == 1
    # untouched doc passes through verbatim (lowercased token join)
    assert by_id.loc[5, "text_clean"] == texts[5]


def test_sf_documents_subset(ray_session, tmp_path):
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    t = t.slice(0, 120)
    texts = dict(zip(t.column("doc_id").to_pylist(),
                     t.column("text").to_pylist()))
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _check(str(tmp_path), texts, window=12)
    # the synthetic corpus repeats sentences across docs — the op fires
    assert got["n_removed_tokens"].sum() > 0


def test_join_path_identical(ray_session, engineered):
    sf_dir, texts = engineered
    a = _check(sf_dir, texts, window=4)
    b = _check(sf_dir, texts, window=4, _force_join=True)
    pd.testing.assert_frame_equal(a, b)


def test_no_dup_corpus_passthrough(ray_session, tmp_path):
    texts = {0: "one two three four five",
             1: "six seven eight nine ten"}
    sf_dir = _write(texts, tmp_path)
    got = _check(sf_dir, texts, window=3)
    assert (got["n_removed_tokens"] == 0).all()
    assert (got["n_dup_windows"] == 0).all()
