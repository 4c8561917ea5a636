"""Deduplication operators: exact, simhash near-dup (Hamming bands), MinHash-LSH,
n-gram Jaccard — the training-data-pipeline dedup family over the docs table.

The reference's near-dup semantics (``include/Page/Page.hpp:121-161,247-257``,
``include/simhash/Simhasher.hpp:109-151``) are a greedy, sequential,
first-seen-wins scan whose "equality" (Hamming ≤ 3) is not transitive — not a
well-defined set operation.  Canonical distributed spec (SURVEY.md §2.6):

    drop doc d  ⇔  ∃ doc e with e.doc_id < d.doc_id and hamming(e, d) ≤ 3

i.e. every doc with a smaller near-dup neighbor dies; cluster minima survive.
Equal to the reference's greedy outcome whenever near-dup clusters are cliques
(the planted fixture case), order-independent, and computable in one banded
self-join — no iteration, no driver state.  The oracle mirrors it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT, EngineConfig
from searchenginesimple_spark.functions.simhash import (
    band_key,
    simhash64_udf,
    simhash_weighted_udf,
)


def with_simhash(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """Raw tf-weighted content fingerprint (single-pass, corpus-free)."""
    return docs.withColumn("simhash", simhash64_udf(F.col(text_col)))


def tfidf_fingerprints(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """docs(doc_id, <text_col>) → (doc_id, simhash) with tf·idf vote weights.

    Weights: w(t,d) = tf(t,d) · ln((N+1)/(df(t)+1)) over the *input* corpus —
    idf computed in the same job (one extra small agg + broadcast join), so
    ubiquitous terms stop dominating the bit votes (see
    functions/simhash.py::simhash_weighted_batch).  Docs with no tokens get
    no row (treated as fingerprint 0 → dropped, Page.hpp:129-133).
    """
    from searchenginesimple_spark.operators.bm25 import tokens_of

    tf = tokens_of(docs, text_col).groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    dfc = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = tf.select("doc_id").distinct().agg(F.count("*").alias("n_docs"))
    w = (
        tf.join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "w",
            F.col("tf") * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
        )
    )
    grouped = w.groupBy("doc_id").agg(
        F.collect_list("term").alias("terms"), F.collect_list("w").alias("ws")
    )
    return grouped.select(
        "doc_id", simhash_weighted_udf("terms", "ws").alias("simhash")
    )


def simhash_dup_pairs(fp: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """fp(doc_id, simhash) → near-dup pairs (a_id < b_id, hamming ≤ threshold).

    Physical shape: explode each fingerprint into 4 disjoint 16-bit band keys
    (pigeonhole guarantee for distance ≤ 3) → self-equi-join on
    (band_id, band_val) → cheap JVM popcount theta-filter → distinct pairs.
    The join is an equi-join, so Spark shuffles by band key only; candidate
    pairs are a tiny fraction of the cross product.  Band-key skew (e.g. the
    all-zero band from near-empty docs) is handled by AQE skew-join splitting.
    """
    fp = fp.filter(F.col("simhash") != 0)  # reference drops simhash==0 (Page.hpp:129-133)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(*[band_key(F.col("simhash"), i, cfg.n_bands) for i in range(cfg.n_bands)])
        ).alias("band_id", "band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.simhash").alias("a_sim"),
            F.col("b.simhash").alias("b_sim"),
        )
        .filter(
            F.bit_count(F.col("a_sim").bitwiseXOR(F.col("b_sim"))) <= cfg.hamming_threshold
        )
        .select("a_id", "b_id")
        .distinct()
    )
    return pairs


def simhash_dedup(
    docs: DataFrame,
    cfg: EngineConfig = DEFAULT,
    text_col: str = "content",
    weighting: str = "tfidf",
) -> DataFrame:
    """docs(doc_id, <text_col>, …) → surviving docs (+ simhash column).

    Survivors: simhash != 0 and no near-dup neighbor with a smaller doc_id.
    weighting="tfidf" (default, build pipeline): idf-weighted fingerprints;
    weighting="tf": single-pass raw content fingerprints.
    """
    if weighting == "tfidf":
        fp_only = tfidf_fingerprints(docs, text_col)
        fp = docs.join(fp_only, "doc_id", "inner")  # no-token docs drop here
    else:
        fp = with_simhash(docs, text_col)
    dropped = simhash_dup_pairs(fp.select("doc_id", "simhash"), cfg).select(
        F.col("b_id").alias("doc_id")
    ).distinct()
    return fp.filter(F.col("simhash") != 0).join(dropped, "doc_id", "left_anti")


def exact_dedup(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """Exact dedup on sha256(content); lowest doc_id per hash survives.

    Pure hash-aggregate — one shuffle on the digest, no self-join.
    """
    h = docs.withColumn("_sha", F.sha2(F.col(text_col), 256))
    keep = h.groupBy("_sha").agg(F.min("doc_id").alias("doc_id"))
    return h.join(keep, ["_sha", "doc_id"], "left_semi").drop("_sha")
