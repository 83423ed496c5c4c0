"""Pure-Python XXH64 matching Spark's ``F.xxhash64(col)`` (seed 42).

Spark computes xxhash64 over the UTF-8 bytes of a string column
(org.apache.spark.sql.catalyst.expressions.XxHash64 — a faithful
implementation of Yann Collet's public XXH64 spec) and returns a *signed*
64-bit long. We re-implement the public algorithm so the pure-Python
oracle can assign the exact same docIDs / term buckets the Spark plan
does: ``doc_id = xxhash64(url)`` is the engine's stable document identity
(reference analog: per-document ``document_id`` field in the OpenSearch
sink, /root/reference/data-prepper-plugins/opensearch/.../OpenSearchSink.java:342-354 —
ours must be stable across resume, so a hash, never zipWithIndex).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42  # Spark's fixed seed for xxhash64 expressions


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Unsigned XXH64 of *data* with *seed* (default: Spark's 42)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes | str, seed: int = SPARK_SEED) -> int:
    """Signed-long XXH64, identical to Spark's ``F.xxhash64`` on a string col."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod(x: int, m: int) -> int:
    """Spark's F.pmod: positive modulus (Python's % already is for m>0)."""
    return x % m
