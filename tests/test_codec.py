"""Varbyte / delta-gap codec round-trips (FIXTURES.md §4)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from eaststorm_searchengine_spark.operators import codec


def test_empty():
    assert codec.vb_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.vb_decode(b"").size == 0
    assert codec.delta_decode(codec.delta_encode(np.array([], dtype=np.uint64))).size == 0


def test_single():
    for v in [0, 1, 127, 128, 255, 16383, 16384, 2**32, 2**56 - 1]:
        out = codec.vb_decode(codec.vb_encode(np.array([v], dtype=np.uint64)))
        assert out.tolist() == [v]


def test_known_sizes():
    # 7-bit values take 1 byte, 14-bit 2 bytes, etc.
    assert len(codec.vb_encode(np.array([5], dtype=np.uint64))) == 1
    assert len(codec.vb_encode(np.array([128], dtype=np.uint64))) == 2
    assert len(codec.vb_encode(np.array([1 << 14], dtype=np.uint64))) == 3


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip(values):
    a = np.array(values, dtype=np.uint64)
    assert codec.vb_decode(codec.vb_encode(a)).tolist() == values


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=1000, unique=True)
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(ids):
    a = np.array(sorted(ids), dtype=np.uint64)
    out = codec.delta_decode(codec.delta_encode(a))
    assert out.tolist() == sorted(ids)


def test_delta_large_list():
    a = np.arange(0, 10**5, dtype=np.uint64) * 3 + 7
    assert np.array_equal(codec.delta_decode(codec.delta_encode(a)), a)
    # gap coding should compress consecutive-ish ids well below 8B/id
    assert len(codec.delta_encode(a)) < a.size * 2


def test_positions_roundtrip():
    tfs = np.array([3, 1, 2], dtype=np.int64)
    pos = [[1, 5, 9], [2], [7, 30]]
    buf = codec.encode_positions(pos)
    out = codec.decode_positions(buf, tfs)
    assert [o.tolist() for o in out] == pos


@given(
    st.lists(
        st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=20),
        min_size=0,
        max_size=50,
    )
)
@settings(max_examples=100, deadline=None)
def test_positions_roundtrip_prop(poslists):
    poslists = [sorted(set(p)) for p in poslists]
    poslists = [p for p in poslists if p]
    tfs = np.array([len(p) for p in poslists], dtype=np.int64)
    out = codec.decode_positions(codec.encode_positions(poslists), tfs)
    assert [o.tolist() for o in out] == poslists


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=40),
        min_size=0, max_size=30,
    )
)
@settings(max_examples=150, deadline=None)
def test_vb_decode_concat_equals_per_buffer(seglists):
    """r7: decoding the concatenation of varbyte buffers == concatenating
    per-buffer decodes (self-delimiting wire format)."""
    bufs = [codec.vb_encode(np.array(s, dtype=np.uint64)) for s in seglists]
    got = codec.vb_decode_concat(bufs)
    want = (
        np.concatenate([codec.vb_decode(b) for b in bufs])
        if bufs and any(len(b) for b in bufs)
        else np.empty(0, dtype=np.uint64)
    )
    assert got.tolist() == want.tolist()


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**55), min_size=1, max_size=40)
        .map(lambda xs: sorted(set(xs))),
        min_size=1, max_size=30,
    )
)
@settings(max_examples=150, deadline=None)
def test_delta_decode_concat_equals_per_buffer(idlists):
    """r7: per-block delta resets must survive the one-pass concat
    decode (each block's first gap is absolute)."""
    bufs = [codec.delta_encode(np.array(s, dtype=np.uint64)) for s in idlists]
    counts = np.array([len(s) for s in idlists], dtype=np.int64)
    got = codec.delta_decode_concat(bufs, counts)
    want = np.concatenate([codec.delta_decode(b) for b in bufs])
    assert got.tolist() == want.tolist()
