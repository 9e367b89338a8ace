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
