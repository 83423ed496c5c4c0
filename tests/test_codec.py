import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_prepper_spark.index.codec import (
    delta_decode_docids,
    delta_encode_docids,
    pack_f32,
    pack_i64,
    unpack_f32,
    unpack_i64,
    varint_decode,
    varint_encode,
)


def test_varint_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_known():
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=200))
def test_varint_roundtrip(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        max_size=200,
        unique=True,
    )
)
def test_delta_roundtrip(xs):
    arr = np.sort(np.array(xs, dtype=np.int64))
    assert np.array_equal(delta_decode_docids(delta_encode_docids(arr)), arr)


def test_pack_roundtrip():
    a = np.array([-5, 0, 1 << 62], dtype=np.int64)
    assert np.array_equal(unpack_i64(pack_i64(a)), a)
    f = np.array([0.5, -1.25, 3e20], dtype=np.float32)
    assert np.array_equal(unpack_f32(pack_f32(f)), f)


def test_compression_is_compact():
    ids = np.sort(np.random.default_rng(0).choice(1 << 40, size=10000, replace=False)).astype(np.int64)
    enc = delta_encode_docids(ids)
    assert len(enc) < 10000 * 8 * 0.6  # beats raw int64 comfortably
