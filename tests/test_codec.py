"""varbyte/delta codec round-trip + property tests (FIXTURES.md §4)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchenginesimple_spark.functions.codec import (
    block_stats,
    decode_ids,
    delta_decode,
    delta_encode,
    encode_ids,
    varbyte_decode,
    varbyte_encode,
)

EDGES = [
    np.array([], dtype=np.uint64),
    np.array([0], dtype=np.uint64),
    np.array([2**31], dtype=np.uint64),
    np.array([2**63 + 7], dtype=np.uint64),
    np.arange(1000, dtype=np.uint64),  # gaps of 1, long run
    np.array([0, 127, 128, 16383, 16384, 2**62], dtype=np.uint64),
]


def test_varbyte_roundtrip_edges():
    for arr in EDGES:
        got = varbyte_decode(varbyte_encode(arr))
        assert np.array_equal(got, arr), arr


def test_delta_roundtrip_edges():
    for arr in EDGES:
        s = np.sort(np.unique(arr))
        assert np.array_equal(delta_decode(delta_encode(s)), s)
        assert np.array_equal(decode_ids(encode_ids(s)), s)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63), max_size=300))
def test_varbyte_roundtrip_property(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_ids_roundtrip_property(xs):
    arr = np.array(sorted(xs), dtype=np.uint64)
    assert np.array_equal(decode_ids(encode_ids(arr)), arr)


def test_compression_actually_compresses():
    ids = np.arange(10_000, dtype=np.uint64) * 3  # small gaps
    assert len(encode_ids(ids)) < ids.nbytes / 4


def test_block_stats():
    ids = np.arange(10, dtype=np.uint64)
    tfs = np.array([1, 5, 2, 9, 1, 1, 7, 2, 3, 4], dtype=np.uint64)
    last, mx = block_stats(ids, tfs, block_size=4)
    assert last.tolist() == [3, 7, 9]
    assert mx.tolist() == [9, 7, 4]
    last0, mx0 = block_stats(np.empty(0, np.uint64), np.empty(0, np.uint64), 4)
    assert last0.size == 0 and mx0.size == 0
