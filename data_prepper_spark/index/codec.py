"""Vectorized delta + varint posting codec (numpy, no per-element Python).

Posting lists are docID-sorted int64 arrays stored as
``varint(first_biased) ++ varint(deltas...)`` where *biased* maps the signed
xxhash64 docID space onto uint64 preserving order. Term frequencies and doc
lengths are plain varint streams aligned with the docID stream.

Encode: per 7-bit byte position, one vectorized pass (≤10 passes total).
Decode: terminator-scan + masked shifts, same bound.

Reference analog: Data Prepper has no columnar codec at all (row-at-a-time
Jackson trees, SURVEY.md §1.3); this is the Lucene-style posting layout the
north rule mandates, built for Arrow-batch encode inside applyInPandas.
"""

from __future__ import annotations

import numpy as np

_BIAS = np.uint64(1 << 63)
# thresholds[j] = 2**(7*(j+1)); value >= thresholds[j] ⇒ needs > j+1 bytes
_THRESHOLDS = [np.uint64(1) << np.uint64(7 * (j + 1)) for j in range(9)]


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, fully vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.ones(v.size, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (v >= t)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    starts = ends - nbytes
    for j in range(10):
        mask = nbytes > j
        if not mask.any():
            break
        pos = starts[mask] + j
        byte = (v[mask] >> np.uint64(7 * j)).astype(np.uint64) & np.uint64(0x7F)
        cont = ((j + 1) < nbytes[mask]).astype(np.uint8) << 7
        out[pos] = byte.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode a LEB128 stream back to uint64, fully vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)  # terminator byte of each value
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    nbytes = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        chunk = b[starts[mask] + j].astype(np.uint64) & np.uint64(0x7F)
        vals[mask] |= chunk << np.uint64(7 * j)
    return vals


def delta_encode_docids(doc_ids: np.ndarray) -> bytes:
    """Sorted signed-int64 docIDs → delta+varint bytes (order-preserving bias)."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if d.size == 0:
        return b""
    u = d.astype(np.uint64) + _BIAS  # signed order → unsigned order
    stream = np.empty(u.size, dtype=np.uint64)
    stream[0] = u[0]
    stream[1:] = u[1:] - u[:-1]
    return varint_encode(stream)


def delta_decode_docids(buf: bytes) -> np.ndarray:
    """Inverse of :func:`delta_encode_docids`."""
    stream = varint_decode(buf)
    if stream.size == 0:
        return np.empty(0, dtype=np.int64)
    u = np.cumsum(stream, dtype=np.uint64)
    return (u - _BIAS).astype(np.int64)


def pack_i64(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype="<i8").tobytes()


def unpack_i64(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype="<i8")


def pack_f32(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype="<f4").tobytes()


def unpack_f32(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype="<f4")
