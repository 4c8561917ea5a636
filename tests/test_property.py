"""Property-based tests (hypothesis) for the codec layer — pure numpy, no
Spark session: arbitrary adversarial inputs beyond the fixed-seed cases in
test_postings.py/test_phrase.py."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchenginesimple_spark.functions.codec import (
    block_stats,
    decode_ids,
    delta_decode_rows,
    delta_encode_rows,
    encode_ids,
    varbyte_decode,
    varbyte_encode,
    varbyte_encode_rows,
)

uint64s = st.integers(min_value=0, max_value=(1 << 64) - 1)


@given(st.lists(uint64s, max_size=200))
@settings(max_examples=200, deadline=None)
def test_varbyte_round_trip(vals):
    arr = np.array(vals, dtype=np.uint64)
    np.testing.assert_array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@given(st.sets(uint64s, max_size=200))
@settings(max_examples=200, deadline=None)
def test_delta_varbyte_ids_round_trip(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    np.testing.assert_array_equal(decode_ids(encode_ids(arr)), arr)


@given(st.lists(st.lists(uint64s, max_size=30), min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_varbyte_rows_slices_equal_per_row_encode(rows):
    lens = np.array([len(r) for r in rows], dtype=np.int64)
    flat = np.array([v for r in rows for v in r], dtype=np.uint64)
    buf, offs = varbyte_encode_rows(flat, lens)
    for i, r in enumerate(rows):
        assert buf[offs[i] : offs[i + 1]] == varbyte_encode(
            np.array(r, dtype=np.uint64)
        )


@given(st.lists(st.lists(st.integers(0, 1 << 40), max_size=30), min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_delta_rows_round_trip_property(rows):
    # per-row sorted (cumsummed) values, as posting/position runs are
    srows = [np.cumsum(np.array(sorted(r), dtype=np.uint64)) for r in rows]
    lens = np.array([len(r) for r in srows], dtype=np.int64)
    flat = (
        np.concatenate([r for r in srows if r.size])
        if any(r.size for r in srows)
        else np.empty(0, dtype=np.uint64)
    )
    enc = delta_encode_rows(flat, lens)
    np.testing.assert_array_equal(delta_decode_rows(enc, lens), flat)


@given(
    st.lists(st.tuples(st.integers(0, 1 << 40), st.integers(0, 1 << 20)), max_size=300),
    st.integers(1, 64),
)
@settings(max_examples=100, deadline=None)
def test_block_stats_bounds(pairs, block_size):
    pairs = sorted({p[0]: p for p in pairs}.values())  # unique sorted ids
    ids = np.array([p[0] for p in pairs], dtype=np.uint64)
    tfs = np.array([p[1] for p in pairs], dtype=np.uint64)
    last, mx = block_stats(ids, tfs, block_size)
    n_blocks = (ids.size + block_size - 1) // block_size
    assert last.size == mx.size == n_blocks
    for b in range(n_blocks):
        lo, hi = b * block_size, min((b + 1) * block_size, ids.size)
        assert last[b] == ids[lo:hi].max()          # block-max doc id
        assert mx[b] == tfs[lo:hi].max()            # block-max tf (WAND bound)
