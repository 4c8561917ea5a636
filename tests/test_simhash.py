"""simhash fingerprint + Hamming-band dedup tests (SURVEY.md §5.1, FIXTURES §4)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT
from searchenginesimple_spark.functions.simhash import (
    simhash64_udf,
    simhash_batch,
    simhash_py,
)
from searchenginesimple_spark.operators.dedup import (
    exact_dedup,
    simhash_dedup,
    simhash_dup_pairs,
)
from searchenginesimple_spark.oracle import dedup_survivors_oracle
from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

TEXTS = [
    "def foo(): return bar + baz",
    "def foo(): return bar + qux",
    "",
    "completely unrelated words here about spark window functions",
    "def foo(): return bar + baz",  # exact copy of [0]
]


def test_udf_matches_scalar_oracle(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, content string"
    )
    got = {r["doc_id"]: r["s"] for r in df.select("doc_id", simhash64_udf("content").alias("s")).collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == simhash_py(t), f"doc {i}"


def test_batch_matches_scalar():
    from searchenginesimple_spark.functions.tokenize import tokenize_py

    fps = simhash_batch([tokenize_py(t) for t in TEXTS])
    for i, t in enumerate(TEXTS):
        assert int(fps[i]) == simhash_py(t)


def test_empty_doc_fingerprints_zero():
    assert simhash_py("") == 0
    assert simhash_py("+-*/ 123") == 0  # no valid tokens


def test_block_subset_recall():
    """Any pair at Hamming distance ≤ 3 shares ≥ 1 of the C(6,3) block-subset
    keys (exact-recall property of the Manku multi-block scheme)."""
    from itertools import combinations

    from searchenginesimple_spark.operators.dedup import _block_widths

    blocks = _block_widths(64, 6)
    rng = np.random.default_rng(42)
    xs = rng.integers(0, 2**63, size=200, dtype=np.int64)

    def block_vals(v: int) -> list[int]:
        return [(v >> off) & ((1 << w) - 1) for off, w in blocks]

    for x in xs:
        for k in (0, 1, 2, 3):
            flips = rng.choice(64, size=k, replace=False)
            y = int(x)
            for f in flips:
                y ^= 1 << int(f)
            bx, by = block_vals(int(x)), block_vals(y)
            shared = any(
                all(bx[i] == by[i] for i in s) for s in combinations(range(6), 3)
            )
            assert shared, (x, y, k)


@pytest.mark.parametrize(
    "dist,expect_pair",
    [(0, True), (1, True), (3, True), (4, False)],
)
def test_pair_detection_at_distance(spark, dist, expect_pair):
    base = 0x0123456789ABCDEF
    other = base
    for j in range(dist):
        other ^= 1 << (j * 7)  # flips spread over multiple bands
    fp = spark.createDataFrame([(0, base), (1, other)], "doc_id long, simhash long")
    pairs = simhash_dup_pairs(fp).collect()
    if expect_pair and dist > 0:
        assert len(pairs) == 1 and pairs[0]["a_id"] == 0 and pairs[0]["b_id"] == 1
    elif dist == 0:
        assert len(pairs) == 1
    else:
        assert len(pairs) == 0


@pytest.mark.parametrize("weighting", ["tfidf", "tf"])
def test_dedup_matches_oracle_on_corpus(spark, weighting):
    docs = with_doc_ids(docs_df(spark, 250)).cache()
    survivors = {
        r["doc_id"]
        for r in simhash_dedup(docs, weighting=weighting).select("doc_id").collect()
    }
    want = dedup_survivors_oracle(
        docs.select("doc_id", "content").toPandas(), weighting=weighting
    )
    assert survivors == want
    assert len(survivors) < 250  # planted near-dups actually dropped
    if weighting == "tfidf":
        # idf weighting must keep genuinely distinct docs apart
        assert len(survivors) > 200, f"fingerprints collapsed: {len(survivors)} survivors"


def test_dedup_idempotent(spark):
    # raw-tf fingerprints are content-only → dedup(dedup(x)) == dedup(x).
    # (tfidf fingerprints depend on corpus df, so strict idempotency is not
    # guaranteed for them — documented in operators/dedup.py.)
    docs = with_doc_ids(docs_df(spark, 150)).cache()
    once = simhash_dedup(docs, weighting="tf").select(
        "doc_id", "repo", "path", "commit", "lang", "content"
    )
    twice = simhash_dedup(once, weighting="tf")
    assert {r["doc_id"] for r in once.collect()} == {r["doc_id"] for r in twice.collect()}


def test_exact_dedup(spark):
    docs = with_doc_ids(docs_df(spark, 200)).cache()
    kept = exact_dedup(docs)
    pdf = docs.select("doc_id", "content").toPandas()
    want = set(pdf.groupby("content")["doc_id"].min())
    got = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert got == want


def test_vote_sum_identity_forms(spark):
    """r6 vote-agg rewrite: v_j = Σ w·(2·bit_j − 1) must equal 2·Σ(w·bit_j) − Σw
    exactly — the shipped fingerprint implementations (rewritten form) are
    pinned bit-for-bit against the original per-bit ±1-vote construction."""
    from searchenginesimple_spark.functions.simhash import fnv64_udf
    from searchenginesimple_spark.functions.text import polyhash62_expr
    from searchenginesimple_spark.operators.bm25 import tokens_of
    from searchenginesimple_spark.operators.dedup import (
        IDF_VOTE_SCALE,
        fingerprints_from_tf,
        verifiable_fingerprints,
    )

    docs = with_doc_ids(docs_df(spark, 300)).cache()
    n_docs = docs.count()
    tf = (
        tokens_of(docs, "content")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"))
    )

    def old_form(hash_col_fn, n_bits, round_w):
        dfc = tf.groupBy("term").agg(F.count("*").alias("df"))
        w = tf.join(dfc.withColumn("h", hash_col_fn()), "term")
        if round_w:
            wexpr = F.col("tf").cast("long") * F.round(
                F.log((F.lit(float(n_docs)) + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                * F.lit(IDF_VOTE_SCALE),
                0,
            ).cast("long")
        else:
            wexpr = F.col("tf").cast("long") * F.floor(
                F.log((F.lit(n_docs) + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                * F.lit(IDF_VOTE_SCALE)
                + F.lit(0.5)
            ).cast("long")
        w = w.withColumn("w", wexpr)
        votes = w.groupBy("doc_id").agg(
            *[
                F.sum(
                    F.col("w")
                    * (F.shiftrightunsigned(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
                ).alias(f"v{j}")
                for j in range(n_bits)
            ]
        )
        fp = F.lit(0).cast("long")
        for j in range(min(n_bits, 63)):
            fp = fp + F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        if n_bits == 64:
            fp = fp + F.when(
                F.col("v63") > 0, F.lit(-(1 << 63)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return votes.select("doc_id", fp.alias("simhash"))

    # FNV-64 build fingerprint (floor(+0.5) weights, 64 bits)
    got = fingerprints_from_tf(tf, n_docs=n_docs)
    want = old_form(lambda: fnv64_udf("term"), 64, round_w=False)
    mism = (
        got.withColumnRenamed("simhash", "a")
        .join(want.withColumnRenamed("simhash", "b"), "doc_id")
        .filter("a <> b")
        .count()
    )
    assert mism == 0 and got.count() == want.count()

    # polyhash62 verifiable fingerprint (round() weights, 62 bits)
    got62 = verifiable_fingerprints(docs, n_docs=n_docs)
    want62 = old_form(lambda: polyhash62_expr(F.col("term")), 62, round_w=True)
    mism62 = (
        got62.withColumnRenamed("simhash", "a")
        .join(want62.withColumnRenamed("simhash", "b"), "doc_id")
        .filter("a <> b")
        .count()
    )
    assert mism62 == 0 and got62.count() == want62.count()
