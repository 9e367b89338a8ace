"""SmallFloat-315 norm quantization, bit-exact with the reference.

Reference behavior: ``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:78-98``
(floatToByte315 / byte315ToFloat: 3 mantissa bits, zero exponent 15) and the
BM25 norm table ``lucene/core/src/java/org/apache/lucene/search/similarities/
BM25Similarity.java:134-143`` (NORM_TABLE[v] = 1/f^2, slot 0 aliased to the
largest value so it never yields inf).

All functions are vectorized over numpy arrays; scalars work too.
"""

from __future__ import annotations

import numpy as np

_FZERO = (63 - 15) << 3  # 384


def float_to_byte315(f) -> np.ndarray:
    """Encode float32 -> uint8 (truncating 8-bit float, 3 mantissa bits)."""
    f32 = np.asarray(f, dtype=np.float32)
    bits = f32.view(np.int32)
    smallfloat = bits >> (24 - 3)
    under = np.where(bits <= 0, np.uint8(0), np.uint8(1))
    clipped = (smallfloat - _FZERO).astype(np.int64) & 0xFF
    out = np.where(
        smallfloat <= _FZERO,
        under,
        np.where(smallfloat >= _FZERO + 0x100, np.uint8(0xFF), clipped.astype(np.uint8)),
    )
    return out.astype(np.uint8)


def byte315_to_float(b) -> np.ndarray:
    """Decode uint8 -> float32."""
    b = np.asarray(b, dtype=np.uint8)
    bits = (b.astype(np.int32) << (24 - 3)) + ((63 - 15) << 24)
    out = bits.astype(np.int32).view(np.float32)
    return np.where(b == 0, np.float32(0.0), out)


def _build_norm_table() -> np.ndarray:
    """BM25's NORM_TABLE: 1/f^2 per byte, float32 arithmetic."""
    table = np.zeros(256, dtype=np.float32)
    f = byte315_to_float(np.arange(256, dtype=np.uint8)).astype(np.float32)
    with np.errstate(divide="ignore"):
        table[1:] = (np.float32(1.0) / (f[1:] * f[1:])).astype(np.float32)
    table[0] = np.float32(1.0) / table[255]
    return table


#: BM25 decodeNormValue lookup: NORM_TABLE[norm_byte] == decoded doc length
NORM_TABLE: np.ndarray = _build_norm_table()


def encode_norm(field_length) -> np.ndarray:
    """Norm byte for a document: floatToByte315(1/sqrt(numTerms)), boost=1.

    numTerms = emitted-token count after the stop filter (overlaps discounted,
    BM25Similarity.computeNorm semantics). Zero-length fields encode the
    overflow byte (they carry no postings, so the value is never scored).
    """
    length = np.asarray(field_length, dtype=np.float32)
    with np.errstate(divide="ignore"):
        val = (np.float32(1.0) / np.sqrt(length)).astype(np.float32)
    return float_to_byte315(val)
