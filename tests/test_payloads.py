"""Payload analysis + PayloadScoreQuery over the term-bucketed sidecar."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.search.payloads import (
    PayloadIndex,
    build_payload_sidecar,
    delimited_payload_tokens,
)


def test_delimited_payload_tokens():
    terms, pos, pay = delimited_payload_tokens("Apple|2.5 banana cherry|0.5")
    assert terms == ["apple", "banana", "cherry"]
    assert pos == [0, 1, 2]
    assert pay == [2.5, 0.0, 0.5]
    # stopwords vanish but keep position holes; their payload goes with them
    terms2, pos2, pay2 = delimited_payload_tokens("the|9 apple|1.5")
    assert terms2 == ["apple"]
    assert pos2 == [1]
    assert pay2 == [1.5]


@pytest.fixture()
def sidecar(ray_session, tmp_path):
    docs = [
        (0, "apple|2.0 banana|1.0 apple|4.0"),
        (1, "apple|1.0 cherry|3.0"),
        (2, "banana|5.0 banana|0.5"),
    ]
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
        "text": pa.array([t for _, t in docs]),
    }), str(src))
    out = tmp_path / "payloads"
    build_payload_sidecar(str(src), str(out))
    return PayloadIndex(str(out))


def test_payload_functions(sidecar):
    # max: doc0 apple payloads [2.0, 4.0] -> 4.0; doc1 -> 1.0
    assert sidecar.payload_score("apple", "max", k=5) == \
        [(0, 4.0), (1, 1.0)]
    assert sidecar.payload_score("apple", "min", k=5) == \
        [(0, 2.0), (1, 1.0)]  # score desc, tie -> lower doc
    assert sidecar.payload_score("apple", "average", k=5) == \
        [(0, 3.0), (1, 1.0)]
    assert sidecar.payload_score("apple", "sum", k=5) == \
        [(0, 6.0), (1, 1.0)]
    assert sidecar.payload_score("banana", "max", k=5) == \
        [(2, 5.0), (0, 1.0)]
    assert sidecar.payload_score("nosuchterm", "max", k=5) == []
    with pytest.raises(ValueError):
        sidecar.payload_score("apple", "nosuchfn")


def test_payloads_by_doc_positions(sidecar):
    by_doc = sidecar.payloads_by_doc("apple")
    assert set(by_doc) == {0, 1}
    assert by_doc[0].tolist() == [2.0, 4.0]  # position order


def test_hot_term_streams_bounded_batches(ray_session, tmp_path):
    """Deliberately hot term (every row): the scoring path must stream
    per-batch partials — peak raw-row state is one scanner batch, and
    the distributed Ray Data path returns identical aggregates."""
    import numpy as np

    n = 20_000
    rng = np.random.default_rng(7)
    docs = rng.integers(0, 500, size=n)
    pays = rng.integers(1, 9, size=n).astype(float)
    text = [" ".join(f"hot|{p}" for p in pays[docs == d])
            or "filler|1" for d in range(500)]
    src = tmp_path / "hot.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(range(500), type=pa.int64()),
        "text": pa.array(text),
    }), str(src))
    out = tmp_path / "hotpay"
    build_payload_sidecar(str(src), str(out))
    idx = PayloadIndex(str(out))

    # brute-force oracle from the full per-doc vectors
    by_doc = idx.payloads_by_doc("hot")
    want_avg = sorted(((d, float(np.mean(v))) for d, v in by_doc.items()),
                      key=lambda kv: (-kv[1], kv[0]))[:10]

    # streaming path with a tiny batch size => many partial merges
    seen_batches = []
    orig = PayloadIndex._iter_term_batches

    def spy(self, term, batch_size=65_536):
        for b in orig(self, term, batch_size=256):
            seen_batches.append(b.num_rows)
            yield b

    PayloadIndex._iter_term_batches = spy
    try:
        got = idx.payload_score("hot", "average", k=10)
    finally:
        PayloadIndex._iter_term_batches = orig
    assert len(seen_batches) > 10          # genuinely streamed
    assert max(seen_batches) <= 256        # bounded raw-row state
    assert [(d, round(s, 9)) for d, s in got] == \
        [(d, round(s, 9)) for d, s in want_avg]

    # hot-term distributed path: force the threshold down and compare
    idx_hot = PayloadIndex(str(out), distributed_threshold=1)
    for fn in ("max", "min", "sum", "average"):
        a = idx.payload_score("hot", fn, k=25)
        b = idx_hot.payload_score("hot", fn, k=25)
        assert [(d, round(s, 9)) for d, s in a] == \
            [(d, round(s, 9)) for d, s in b], fn


def test_sidecar_rebuild_is_atomic(ray_session, tmp_path):
    """A leftover partial build (parquet but no meta) must be replaced,
    not appended to, on rebuild."""
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["apple|2.0 apple|4.0"]),
    }), str(src))
    out = tmp_path / "pay"
    build_payload_sidecar(str(src), str(out))
    # simulate a crash artifact: meta gone, parquet files still present
    (out / "_payload_meta.json").unlink()
    build_payload_sidecar(str(src), str(out))
    idx = PayloadIndex(str(out))
    assert idx.payload_score("apple", "sum", k=5) == [(0, 6.0)]
