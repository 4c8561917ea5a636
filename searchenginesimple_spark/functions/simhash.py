"""64-bit simhash fingerprinting, Arrow-batched.

Re-expresses the reference's simhash (``include/simhash/Simhasher.hpp:44-71``:
jieba top-N keyword extraction → per-keyword 64-bit jenkins hash → weighted
bit-vote → sign bits) for source-code payloads:

* terms = engine tokenizer output (functions/tokenize.py), weighted by
  in-doc TF over ALL terms (the reference's topN=5 keyword cut is a
  vocabulary-poor shortcut for short news snippets; TF-weighting over all
  terms is the standard simhash construction and is strictly more robust for
  code files — parity noted in SURVEY.md §2.7);
* hash = FNV-1a 64-bit (public domain spec) instead of jenkins lookup3 —
  fingerprints are engine-internal, the oracle uses the identical hash, so
  bit-compatibility with jenkins is not required (SURVEY.md §2.7);
* bit j of the fingerprint = 1 iff Σ_t tf(t)·(2·bit_j(h(t))−1) > 0
  (reference sign rule, Simhasher.hpp:61-68).

The pandas UDF is numpy throughout: the only Python loop is over the batch's
*unique terms* (vocabulary-sized, memoized across batches), never over rows.
Fingerprints are int64 (two's-complement reinterpretation of the uint64, see
SURVEY.md §1 row 7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from searchenginesimple_spark.config import TOKEN_RE

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF

# process-level memo: term -> uint64 hash (vocabulary-sized, not row-sized)
_HASH_CACHE: dict[str, int] = {}


def fnv1a64(term: str) -> int:
    """FNV-1a 64-bit over UTF-8 bytes (public-domain algorithm)."""
    h = _FNV_OFFSET
    for byte in term.encode("utf-8"):
        h = ((h ^ byte) * _FNV_PRIME) & _MASK64
    return h


def fnv1a64_batch(terms: list[str] | np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a 64 over a batch of terms.

    The per-byte recurrence h = (h ^ b)·prime runs column-wise over a padded
    uint8 matrix: one numpy step per byte POSITION (≤ max term length), not
    per term — the per-unique-term python loop was the simhash hot spot at
    ~500k unique identifiers per corpus.
    """
    n = len(terms)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bs = [t.encode("utf-8") for t in terms]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=n)
    max_len = int(lens.max()) if n else 0
    flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
    mat = np.zeros((n, max_len), dtype=np.uint8)
    mask = np.arange(max_len)[None, :] < lens[:, None]
    mat[mask] = flat  # row-major fill order == concatenation order
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    prime = np.uint64(_FNV_PRIME)
    with np.errstate(over="ignore"):
        for j in range(max_len):
            m = lens > j
            h[m] = (h[m] ^ mat[m, j].astype(np.uint64)) * prime
    return h


def _term_hashes(terms: np.ndarray) -> np.ndarray:
    """uint64 hashes for an array of unique terms (vectorized FNV)."""
    return fnv1a64_batch(list(terms))


def simhash_batch(token_lists: list[list[str]]) -> np.ndarray:
    """Vectorized simhash of a batch of token lists → int64 array.

    Docs with no tokens fingerprint to 0 (the reference then drops them,
    Page.hpp:129-133).
    """
    n = len(token_lists)
    fp = np.zeros(n, dtype=np.int64)
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return fp
    flat = np.concatenate([np.asarray(t, dtype=object) for t in token_lists if t])
    doc_idx = np.repeat(np.arange(n), lens)

    uniq, inv = np.unique(flat.astype("U"), return_inverse=True)
    hashes = _term_hashes(uniq)
    # per-(doc, term) tf via unique over combined keys
    combined = doc_idx.astype(np.int64) * len(uniq) + inv
    pair_keys, tf = np.unique(combined, return_counts=True)
    pair_doc = pair_keys // len(uniq)
    pair_term = pair_keys % len(uniq)

    bit_sign = (
        ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        * 2
        - 1
    )  # (n_uniq, 64) in {-1, +1}
    votes = np.zeros((n, 64), dtype=np.int64)
    np.add.at(votes, pair_doc, tf[:, None] * bit_sign[pair_term])

    bits = (votes > 0).astype(np.uint64)  # sign rule: strictly positive → 1
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    fp_u64 = (bits * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return fp_u64.view(np.int64)


@pandas_udf(T.LongType())
def fnv64_udf(terms: pd.Series) -> pd.Series:
    """term → FNV-1a 64 hash as int64 (vectorized batch FNV).

    Applied once per UNIQUE term (vocabulary-sized table) so downstream
    fingerprinting never touches strings.
    """
    return pd.Series(
        fnv1a64_batch(terms.fillna("").tolist()).view(np.int64), index=terms.index
    )


def simhash_weighted_py(tf: dict[str, int], idf_w: dict[str, int]) -> int:
    """Scalar oracle for the tf·idf-weighted fingerprint (integer votes).

    ``idf_w`` carries the PRE-QUANTIZED integer idf weights
    (floor(ln((N+1)/(df+1))·10⁶ + 0.5), operators/dedup.py::
    fingerprints_from_tf) — votes are exact integer sums, so no summation
    order needs fixing and the oracle is order-free like the engine.
    """
    if not tf:
        return 0
    votes = [0] * 64
    for t, c in tf.items():
        h = fnv1a64(t)
        w = c * idf_w.get(t, 0)
        for j in range(64):
            votes[j] += w if (h >> j) & 1 else -w
    u = 0
    for j in range(64):
        if votes[j] > 0:
            u |= 1 << j
    return u - (1 << 64) if u >= (1 << 63) else u


@pandas_udf(T.LongType())
def simhash64_udf(content: pd.Series) -> pd.Series:
    """content → 64-bit simhash (int64).  Tokenization spec = tokenize.py."""
    tokens = content.fillna("").str.lower().str.findall(TOKEN_RE)
    return pd.Series(simhash_batch(list(tokens)), index=content.index)


def simhash_py(text: str) -> int:
    """Single-doc oracle simhash — independent scalar implementation."""
    from collections import Counter

    from searchenginesimple_spark.functions.tokenize import tokenize_py

    tf = Counter(tokenize_py(text))
    if not tf:
        return 0
    votes = [0] * 64
    for t, w in tf.items():
        h = fnv1a64(t)
        for j in range(64):
            votes[j] += w if (h >> j) & 1 else -w
    u = 0
    for j in range(64):
        if votes[j] > 0:
            u |= 1 << j
    return u - (1 << 64) if u >= (1 << 63) else u  # reinterpret as int64
