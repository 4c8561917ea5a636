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
