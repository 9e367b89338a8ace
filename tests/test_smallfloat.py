"""SmallFloat-315 bit-exactness (SmallFloat.java:78-98 semantics)."""

import numpy as np

from lucene_solr_ray.util.smallfloat import (
    NORM_TABLE,
    byte315_to_float,
    encode_norm,
    float_to_byte315,
)


def test_known_values():
    # documented constants: smallest non-zero = 5.820766E-10, largest = 7.5161928E9
    assert byte315_to_float(np.uint8(1)) == np.float32(5.820766e-10)
    assert byte315_to_float(np.uint8(255)) == np.float32(7.5161928e9)
    assert byte315_to_float(np.uint8(0)) == 0.0


def test_zero_and_negative_map_to_zero():
    assert float_to_byte315(np.float32(0.0)) == 0
    assert float_to_byte315(np.float32(-1.0)) == 0
    assert float_to_byte315(np.float32(-0.0)) == 0


def test_underflow_maps_to_one():
    assert float_to_byte315(np.float32(1e-12)) == 1


def test_overflow_maps_to_255():
    assert float_to_byte315(np.float32(1e12)) == 255
    assert float_to_byte315(np.float32(np.inf)) == 255


def test_roundtrip_monotone_truncating():
    # encode(decode(b)) == b for every byte (the 8-bit values are fixed points)
    bytes_in = np.arange(256, dtype=np.uint8)
    floats = byte315_to_float(bytes_in)
    back = float_to_byte315(floats)
    np.testing.assert_array_equal(back, bytes_in)
    # truncation: a value slightly above a representable point keeps its byte
    f = byte315_to_float(np.uint8(100))
    assert float_to_byte315(np.float32(f * 1.01)) == 100


def test_norm_table_values():
    f = byte315_to_float(np.arange(256, dtype=np.uint8)).astype(np.float32)
    expected = (np.float32(1.0) / (f[1:] * f[1:])).astype(np.float32)
    np.testing.assert_array_equal(NORM_TABLE[1:], expected)
    assert NORM_TABLE[0] == np.float32(1.0) / NORM_TABLE[255]


def test_encode_norm_lengths():
    # norm byte for common doc lengths: 1/sqrt(len) in float32 then 315-encode
    lengths = np.array([1, 2, 3, 4, 5, 10, 100, 1000], dtype=np.int64)
    expected = float_to_byte315((1.0 / np.sqrt(lengths.astype(np.float32))).astype(np.float32))
    np.testing.assert_array_equal(encode_norm(lengths), expected)
