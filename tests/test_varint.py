"""Varint codec roundtrips."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.util.varint import decode, decode_deltas, encode, encode_deltas


def test_empty():
    assert encode(np.array([], dtype=np.uint64)) == b""
    assert decode(b"").size == 0


def test_known_wire_format():
    # LEB128: 0->00, 127->7f, 128->80 01, 300->ac 02
    assert encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = decode(encode(arr), dtype=np.uint64)
    np.testing.assert_array_equal(out, arr)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(vals):
    arr = np.sort(np.array(vals, dtype=np.int64))
    out = decode_deltas(encode_deltas(arr))
    np.testing.assert_array_equal(out, arr)


def test_large_batch():
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 2**50, size=100_000).astype(np.uint64)
    np.testing.assert_array_equal(decode(encode(arr), dtype=np.uint64), arr)
