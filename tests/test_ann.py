"""ANN / embedding near-dup correctness and recall tests.

The LSH paths are approximate by design — the driver records them rows-only —
so their quality gates live here: candidate sets must be subsets of the exact
results' universe, and recall on seeded data must clear a fixed bar
(deterministic: hyperplanes and data are seeded).
"""

from __future__ import annotations

import numpy as np
import pytest

from searchenginesimple_spark.operators.ann import (
    cosine_topk,
    embedding_neardup_exact,
    embedding_neardup_pairs,
    lsh_topk,
)

DIM = 32


@pytest.fixture(scope="module")
def emb(spark):
    """200 seeded vectors in 8 gaussian clusters + 20 planted near-dups."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((8, DIM)) * 3
    rows = []
    for i in range(200):
        v = centers[i % 8] + rng.standard_normal(DIM) * 0.5
        rows.append((i, [float(x) for x in v]))
    for j in range(20):  # near-dup of vector j: tiny perturbation
        base = np.array(rows[j][1])
        rows.append((200 + j, [float(x) for x in base + rng.standard_normal(DIM) * 0.01]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def _pairs(df):
    return {(r["a_id"], r["b_id"]) for r in df.collect()}


def test_neardup_exact_finds_planted(emb):
    got = _pairs(embedding_neardup_exact(emb, threshold=0.999))
    planted = {(j, 200 + j) for j in range(20)}
    assert planted <= got


def test_neardup_lsh_subset_and_recall(emb):
    exact = _pairs(embedding_neardup_exact(emb, threshold=0.999))
    lsh = _pairs(embedding_neardup_pairs(emb, dim=DIM, threshold=0.999, n_planes=8))
    # soundness: the exact cosine re-check makes every LSH pair a true pair
    assert lsh <= exact
    # recall: near-identical vectors agree on nearly all hyperplane signs
    assert len(lsh & exact) / len(exact) >= 0.9


def test_lsh_topk_recall_at_10(emb):
    q = emb.filter("vec_id < 5")
    exact = cosine_topk(emb, q, k=10)
    approx = lsh_topk(emb, q, dim=DIM, k=10, n_planes=8, n_tables=8)
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    assert len(ex & ap) / len(ex) >= 0.8


def test_ivf_topk_recall_and_probe_sweep(emb):
    from searchenginesimple_spark.operators.ann import ivf_topk

    q = emb.filter("vec_id < 5")
    exact = {(r["query_id"], r["vec_id"]) for r in cosine_topk(emb, q, k=10).collect()}

    ap4 = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(emb, q, dim=DIM, k=10, n_centroids=16, n_probe=4).collect()
    }
    assert len(exact & ap4) / len(exact) >= 0.5  # 4/16 cells probed

    # probing every cell ≡ brute force (the IVF completeness property)
    ap_all = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(emb, q, dim=DIM, k=10, n_centroids=16, n_probe=16).collect()
    }
    assert ap_all == exact
