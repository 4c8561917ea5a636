"""Delta + varbyte posting-list compression (numpy-vectorized, no per-value loop).

The reference keeps postings as in-memory ``std::map<int, double>`` and
serializes them whole with cereal (``include/Page/Page.hpp:376-381``).  At
10^12-file scale postings must be compressed columnar blobs; the north rule
mandates delta + varbyte over sorted docID runs.

Encoding (classic varint, little-endian 7-bit groups): each value is split
into 7-bit chunks, low chunk first; the HIGH bit (0x80) marks the FINAL byte
of a value.  Doc-id lists are strictly increasing → delta-encoded first
(first value absolute, then gaps ≥ 1).  TF lists are encoded as raw varbytes.

Both encode and decode are numpy throughout: the only loops are over the ≤ 10
byte positions of a uint64, never over values.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [1 << (7 * k) for k in range(1, 10)]  # value widths in 7-bit groups


def varbyte_encode(vals: np.ndarray) -> bytes:
    """uint64 array → varbyte bytes."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    if vals.size == 0:
        return b""
    nb = np.ones(vals.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nb += vals >= np.uint64(t)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(int(nb.max())):
        mask = nb > k
        idx = starts[mask] + k
        chunk = ((vals[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        is_last = (nb[mask] - 1) == k
        out[idx] = chunk | np.where(is_last, np.uint8(0x80), np.uint8(0))
    return out.tobytes()


def varbyte_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """varbyte bytes → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) != 0
    val_idx = np.zeros(b.size, dtype=np.int64)
    val_idx[1:] = np.cumsum(is_last)[:-1]
    last_pos = np.nonzero(is_last)[0]
    starts = np.zeros(last_pos.size, dtype=np.int64)
    starts[1:] = last_pos[:-1] + 1
    k = (np.arange(b.size, dtype=np.int64) - starts[val_idx]).astype(np.uint64)
    vals = np.zeros(last_pos.size, dtype=np.uint64)
    np.add.at(vals, val_idx, (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * k))
    return vals


def delta_encode(ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing uint64 ids → gaps (first absolute)."""
    ids = np.ascontiguousarray(ids, dtype=np.uint64)
    if ids.size == 0:
        return ids
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(gaps, dtype=np.uint64), dtype=np.uint64)


def encode_ids(ids: np.ndarray) -> bytes:
    """sorted doc ids → delta+varbyte blob."""
    return varbyte_encode(delta_encode(ids))


def decode_ids(buf: bytes) -> np.ndarray:
    return delta_decode(varbyte_decode(buf))


def varbyte_encode_rows(
    flat: np.ndarray, row_lens: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Encode MANY rows' values in one vectorized pass.

    flat = concatenation of all rows' values; returns (one bytes buffer,
    per-row byte offsets of length n_rows+1).  Callers slice the buffer per
    row — O(1) per row instead of a per-row encode call (the posting-encode
    hot spot: ~1M mostly-singleton rows per batch).
    """
    vals = np.ascontiguousarray(flat, dtype=np.uint64)
    n_rows = len(row_lens)
    if vals.size == 0:
        return b"", np.zeros(n_rows + 1, dtype=np.int64)
    nb = np.ones(vals.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nb += vals >= np.uint64(t)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(int(nb.max())):
        mask = nb > k
        idx = starts[mask] + k
        chunk = ((vals[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        is_last = (nb[mask] - 1) == k
        out[idx] = chunk | np.where(is_last, np.uint8(0x80), np.uint8(0))
    # byte offset of each row boundary
    val_ends = np.cumsum(row_lens)
    row_byte_ends = np.zeros(n_rows + 1, dtype=np.int64)
    nonzero = val_ends > 0
    row_byte_ends[1:][nonzero] = ends[val_ends[nonzero] - 1]
    # rows with zero values inherit the previous offset
    row_byte_ends = np.maximum.accumulate(row_byte_ends)
    return out.tobytes(), row_byte_ends


def delta_encode_rows(flat_ids: np.ndarray, row_lens: np.ndarray) -> np.ndarray:
    """Per-row delta encode over a flattened batch (first of each row absolute)."""
    ids = np.ascontiguousarray(flat_ids, dtype=np.uint64)
    if ids.size == 0:
        return ids
    gaps = ids.copy()
    gaps[1:] -= ids[:-1]
    starts = np.cumsum(row_lens) - row_lens
    starts = starts[row_lens > 0]
    gaps[starts] = ids[starts]
    return gaps


def delta_decode_rows(flat_gaps: np.ndarray, row_lens: np.ndarray) -> np.ndarray:
    """Inverse of :func:`delta_encode_rows` — per-row cumulative sums over a
    flattened batch, no per-row python (one global cumsum + a per-row base
    subtraction)."""
    gaps = np.ascontiguousarray(flat_gaps, dtype=np.uint64)
    if gaps.size == 0:
        return gaps
    c = np.cumsum(gaps, dtype=np.uint64)
    row_lens = np.asarray(row_lens, dtype=np.int64)
    nz = row_lens[row_lens > 0]
    starts = np.cumsum(nz) - nz
    base = np.zeros(nz.size, dtype=np.uint64)
    base[1:] = c[starts[1:] - 1]
    return c - np.repeat(base, nz)


def block_stats_rows(
    flat_ids: np.ndarray,
    flat_tfs: np.ndarray,
    row_lens: np.ndarray,
    block_size: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized per-row block metadata over a flattened batch.

    Returns (block_last_id, block_max_tf, blocks_per_row); the first two are
    flat arrays split by the third.  Uses maximum.reduceat over the computed
    block-start indices — no per-row python.
    """
    n_rows = len(row_lens)
    nblocks = (row_lens + block_size - 1) // block_size
    total_blocks = int(nblocks.sum())
    if total_blocks == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            nblocks.astype(np.int64),
        )
    row_starts = np.cumsum(row_lens) - row_lens
    # block start index within flat arrays: row_start + j*block_size
    reps = nblocks.astype(np.int64)
    row_of_block = np.repeat(np.arange(n_rows), reps)
    first_block_of_row = np.cumsum(reps) - reps
    block_in_row = np.arange(total_blocks) - first_block_of_row[row_of_block]
    block_starts = row_starts[row_of_block] + block_in_row * block_size
    last = np.maximum.reduceat(flat_ids.astype(np.int64), block_starts)
    mx = np.maximum.reduceat(flat_tfs.astype(np.int64), block_starts)
    return last, mx, reps


def block_stats(
    ids: np.ndarray, tfs: np.ndarray, block_size: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-block (last doc_id, max tf) for block-max WAND skipping.

    Block i covers postings [i·B, min((i+1)·B, n)).  ``block_last_id`` enables
    doc-range skipping during intersection; ``block_max_tf`` upper-bounds the
    BM25 contribution of any doc in the block (north rule: block-max pruning).
    """
    n = ids.size
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    n_blocks = (n + block_size - 1) // block_size
    pad = n_blocks * block_size - n
    ids_p = np.pad(ids.astype(np.int64), (0, pad), constant_values=np.int64(-1))
    tfs_p = np.pad(tfs.astype(np.int64), (0, pad), constant_values=0)
    last = ids_p.reshape(n_blocks, block_size).max(axis=1)
    mx = tfs_p.reshape(n_blocks, block_size).max(axis=1)
    return last, mx
