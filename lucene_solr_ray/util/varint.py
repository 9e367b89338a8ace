"""Vectorized LEB128 varint codec (numpy), for posting-list block encoding.

Same wire format as the reference's vInt tail encoding
(``lucene/core/src/java/org/apache/lucene/store/DataOutput.java`` writeVInt):
little-endian base-128, continuation bit 0x80 on every byte but the last.
Encode/decode are fully vectorized — a Python loop only over the maximum
byte-width (<=10), never over values.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * i) for i in range(1, 10)]


def encode(values: np.ndarray) -> bytes:
    """Encode a uint array to LEB128 bytes."""
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b""
    nbytes = np.ones(len(vals), dtype=np.int64)
    maxv = vals.max()
    for t in _THRESHOLDS:
        if maxv < t:
            break
        nbytes += vals >= t
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    total = int(offsets[-1] + nbytes[-1])
    out = np.zeros(total, dtype=np.uint8)
    max_nb = int(nbytes.max())
    for i in range(max_nb):
        mask = nbytes > i
        chunk = ((vals[mask] >> np.uint64(7 * i)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > i + 1).astype(np.uint8) << 7
        out[offsets[mask] + i] = chunk | cont
    return out.tobytes()


def decode(buf: bytes | np.ndarray, dtype=np.int64) -> np.ndarray:
    """Decode LEB128 bytes to an array (default int64)."""
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if raw.size == 0:
        return np.empty(0, dtype=dtype)
    cont = (raw & 0x80) != 0
    ends = np.nonzero(~cont)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    max_len = int(lengths.max())
    payload = (raw & 0x7F).astype(np.uint64)
    for i in range(max_len):
        mask = lengths > i
        vals[mask] |= payload[starts[mask] + i] << np.uint64(7 * i)
    return vals.astype(dtype)


def encode_deltas(sorted_values: np.ndarray) -> bytes:
    """Delta-encode a strictly/weakly increasing array, then varint-pack."""
    v = np.ascontiguousarray(sorted_values, dtype=np.int64)
    if v.size == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    return encode(deltas.astype(np.uint64))


def decode_deltas(buf: bytes | np.ndarray, dtype=np.int64) -> np.ndarray:
    """Inverse of :func:`encode_deltas`."""
    deltas = decode(buf, dtype=dtype)
    return np.cumsum(deltas, dtype=dtype)
