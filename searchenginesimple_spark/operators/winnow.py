"""Winnowing document fingerprints + clone-pair mining (code-payload op).

Public design: Schleimer, Wilkerson, Aiken — "Winnowing: Local Algorithms
for Document Fingerprinting" (SIGMOD 2003, the MOSS algorithm).  The
reference engine dedups whole documents by 64-bit simhash
(include/simhash/simhasher.hpp via Page.hpp:121-161); winnowing answers the
code-corpus question simhash structurally cannot: WHICH passages two files
share (partial clones, vendored snippets, license headers), with a local
guarantee — any match of at least w+k−1 consecutive tokens produces at
least one shared fingerprint (SIGMOD'03 §3, the "(k, w)-guarantee").

Spark shape (the 100×-scale story):

* ``winnow_fingerprints`` is **shuffle-free**: tokenize → k-gram hash →
  window-min selection all run as per-row array higher-order functions
  (pure JVM, codegen'd) — the map-only stage a 10¹²-file corpus needs.
  No explode-then-window: a per-doc ``Window.partitionBy(doc_id)`` would
  shuffle every k-gram of every document once before selecting.
* ``clone_pairs`` is **one linear pipeline with no join**: ``max_df``
  (boilerplate fingerprints dropped the way the BM25 build drops
  stop-words — operators/bm25.py) bounds every fingerprint's bucket, so
  pairs are generated in-row from a collect_list per fingerprint —
  ≤ max_df(max_df−1)/2 combinations per bucket, never quadratic in
  corpus size.

With ``hash_family="poly"`` every hash is the engine's SQL-reproducible
polyhash62 (functions/text.py:polyhash62_expr), so the DuckDB oracle
reproduces fingerprints, selection, and pair scores bit-for-bit; the
default ``"xx"`` family swaps in native xxhash64 for the production path
(same selection rule — see the hash_family docstring below).

Selection rule (made arithmetic so Spark ≡ ANSI SQL without min_by/struct
comparators): within each window of ``w`` consecutive k-grams pick the
minimum of ``key = (h mod 2^36)·2^25 + (2^25−1−pos)`` — i.e. minimum
reduced hash, ties broken toward the RIGHTMOST position (larger pos ⇒
smaller key).  The reduced 36-bit hash only orders the selection; the
emitted fingerprint is the full 62-bit hash.  Documents are capped at
2^25 k-grams (≈ 33.5M tokens per file) and the cap is ENFORCED with
raise_error, not assumed.

Documented deviation from SIGMOD'03 §5's FULL robust rule: the paper
prefers re-selecting the PREVIOUS window's position on ties and falls
back to rightmost only otherwise.  That preference is inherently
sequential state (each window's choice depends on the last), which no
per-row expression or SQL window can express — so this engine uses the
stateless rightmost rule throughout.  Consequences, by construction:
every guarantee used here survives (≥1 selection per window, the (k,w)
locality/match guarantee, engine ≡ oracle); what changes is density on
degenerate low-entropy documents — a run of IDENTICAL grams (e.g. a
generated file repeating one line) selects every position (rightmost of
each window) instead of one per w.  That inflates fingerprint ROWS for
such docs, not clone results: clone_pairs dedups (doc_id, fp) first, and
a repeated gram is ONE fp value however many positions carry it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from searchenginesimple_spark.config import TOKEN_RE
from searchenginesimple_spark.functions.text import polyhash62_expr
from searchenginesimple_spark.functions.tokenize import tokenize_expr

WINNOW_POS_CAP = 1 << 25  # max k-grams per document (enforced)
WINNOW_R_MOD = 1 << 36  # reduced-hash modulus for the selection key


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    content_col: str = "content",
    id_col: str = "doc_id",
    token_re: str = TOKEN_RE,
    hash_family: str = "xx",
) -> DataFrame:
    """→ (doc_id, pos:int, fp:long): winnowed k-gram fingerprints.

    ``pos`` is the 0-based k-gram position the fingerprint was selected at;
    ``fp`` is the hash of the space-joined k-token gram.  Shuffle-free:
    every stage is a per-row projection (plan-asserted in tests).
    Documents with fewer than k tokens produce no fingerprints; documents
    with fewer grams than w use one window over all grams (the standard
    short-document rule: still ≥1 fingerprint per document).

    hash_family (the minhash_dup_pairs precedent, operators/dedup.py):

    * ``"xx"`` (production default) — ``xxhash64`` per gram, one native
      JVM call: ~50× faster than poly because HOF lambdas are interpreted,
      so a per-character fold inside ``transform`` costs ~60 interpreted
      expression evals per gram (measured 282 s vs ~6 s on 100k docs).
    * ``"poly"`` — polyhash62 (functions/text.py), bit-reproducible in
      ANSI SQL: the family the DuckDB oracle verifies.

    The SELECTION RULE is family-independent (same windows, same
    rightmost-min arithmetic), so the oracle-verified poly family pins the
    algorithm; xx only swaps the hash primitive, exactly as in MinHash.
    """
    if k < 1 or w < 1:
        raise ValueError("winnow_fingerprints: k and w must be >= 1")
    if hash_family not in ("xx", "poly"):
        raise ValueError(f"unknown hash_family {hash_family!r}")

    toks = tokenize_expr(F.col(content_col), token_re)
    staged = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).filter(
        F.size("toks") >= k
    )

    # k-gram hash array (map-side; hash nested inside transform).  The xx
    # family hashes the k tokens as a multi-arg xxhash64 tuple — no slice /
    # concat_ws string building per gram (HOF lambdas are interpreted, so
    # per-gram allocations dominate: measured 17-28 s vs 7 s on 100k docs).
    # The poly family hashes the space-joined gram STRING because that is
    # the form the DuckDB oracle reproduces character-by-character.
    n_grams = F.size("toks") - F.lit(k - 1)
    if hash_family == "xx":
        def gram_hash(i):
            return F.xxhash64(
                *[F.element_at(F.col("toks"), (i + 1 + j).cast("int")) for j in range(k)]
            )
    else:
        def gram_hash(i):
            return polyhash62_expr(
                F.concat_ws(" ", F.slice(F.col("toks"), i + 1, k))
            )

    grams = F.transform(F.sequence(F.lit(0), n_grams - 1), gram_hash)
    hashed = staged.select("doc_id", grams.alias("hs"))

    # Selection keys: reduced hash ‖ bitwise-flipped position (rightmost-min
    # tie rule).  Enforce the position cap loudly, never silently.
    n = F.size("hs")
    n_ok = F.when(
        n < F.lit(WINNOW_POS_CAP), n
    ).otherwise(
        F.raise_error(
            F.lit(
                "winnow_fingerprints: document exceeds 2^25 k-grams; "
                "raise WINNOW_POS_CAP (and the oracle's key constants)"
            )
        )
    )
    keys = F.transform(
        F.col("hs"),
        lambda h, i: F.pmod(h, F.lit(WINNOW_R_MOD)) * F.lit(WINNOW_POS_CAP)
        + (F.lit(WINNOW_POS_CAP - 1) - i),
    )
    keyed = hashed.select("doc_id", "hs", keys.alias("keys"), n_ok.alias("n"))

    # One window per ending gram q ∈ [wlen−1, n−1]; fingerprint = window min.
    # Full windows take a w-way least() over element_at — NO per-window
    # array allocation (array_min(slice(...)) measured 2.5-5× slower at
    # 100k docs).  Documents with fewer than w grams take one window over
    # everything (CaseWhen evaluates lazily, so the full-window branch's
    # element_at indices are never touched for them).
    def window_min(q):  # F.least needs >= 2 args; w == 1 is the identity
        terms = [
            F.element_at(F.col("keys"), (q + 1 - j).cast("int")) for j in range(w)
        ]
        return terms[0] if w == 1 else F.least(*terms)

    full_windows = F.transform(
        F.sequence(F.lit(w - 1), F.col("n") - 1), window_min
    )
    sel = F.array_distinct(
        F.when(F.col("n") >= F.lit(w), full_windows).otherwise(
            F.array(F.array_min(F.col("keys")))
        )
    )
    exploded = keyed.select("doc_id", "hs", F.explode(sel).alias("key"))

    pos = F.lit(WINNOW_POS_CAP - 1) - F.pmod(F.col("key"), F.lit(WINNOW_POS_CAP))
    return exploded.select(
        "doc_id",
        pos.cast("int").alias("pos"),
        F.element_at(F.col("hs"), pos.cast("int") + 1).alias("fp"),
    )


def clone_pairs(
    fps: DataFrame,
    min_shared: int = 2,
    min_similarity: float = 0.0,
    max_df: int = 64,
) -> DataFrame:
    """→ (a_id, b_id, shared:long, similarity:double): document pairs that
    share winnowed fingerprints.

    * ``max_df`` drops fingerprints present in more than max_df documents
      BEFORE pair generation (boilerplate guard = the scale knob: each
      bucket emits ≤ max_df(max_df−1)/2 pairs, so total volume is linear
      in fingerprint count, never quadratic in corpus size).
    * ``similarity`` = shared / min(|fp_a|, |fp_b|) (containment, MOSS
      report score) computed over the post-cap fingerprint sets of both
      documents, rounded to 6 decimals for cross-engine float stability.
    """
    # NO self-join: max_df bounds every fingerprint's bucket, so pairs are
    # generated IN-ROW from a collect_list per fp (≤ max_df(max_df−1)/2
    # combinations per bucket) — the LSH-banding pattern.  A fp-keyed
    # self-join here is strictly worse: Spark plans each join input as its
    # own subtree (ReuseExchange does not collapse them — measured: the
    # distinct+window base executed FOUR times in the naive
    # join-plus-sizes-joins shape, 9 exchanges vs 5).  The whole operator
    # is one linear pipeline — each stage computed exactly once
    # (plan-asserted in tests/test_winnow.py).
    distinct_fps = fps.select("doc_id", "fp").distinct()
    sized = (
        distinct_fps.withColumn("df", F.count("*").over(Window.partitionBy("fp")))
        .filter(F.col("df") <= F.lit(max_df))
        .drop("df")
        # post-cap set size (the similarity denominator; oracle in lockstep)
        .withColumn("n_fp", F.count("*").over(Window.partitionBy("doc_id")))
    )
    buckets = (
        sized.groupBy("fp")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n_fp"))).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    # all (i < j) combinations; sort_array ordered by doc_id, so a_id < b_id
    pair_arr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda d, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda e: F.struct(
                    d["doc_id"].alias("a_id"),
                    e["doc_id"].alias("b_id"),
                    d["n_fp"].alias("na"),
                    e["n_fp"].alias("nb"),
                ),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.a_id", "p.b_id", "p.na", "p.nb")
        # na/nb are functionally determined by a_id/b_id — grouping on them
        # adds no groups, and keeps the plan a single aggregation
        .groupBy("a_id", "b_id", "na", "nb")
        .agg(F.count("*").alias("shared"))
    )
    sim = F.round(
        F.col("shared").cast("double") / F.least(F.col("na"), F.col("nb")), 6
    )
    return pairs.select("a_id", "b_id", "shared", sim.alias("similarity")).filter(
        (F.col("shared") >= F.lit(min_shared))
        & (F.col("similarity") >= F.lit(min_similarity))
    )


def clone_spans(
    fps: DataFrame,
    pairs: DataFrame,
    k: int = 5,
    max_gap: int = 12,
) -> DataFrame:
    """The MOSS report: WHERE each clone pair matches, not just that it
    does → (a_id, b_id, side, start_tok, end_tok, n_grams) — maximal
    matched passages per document side, in token coordinates.

    ``fps`` is winnow_fingerprints output (same k); ``pairs`` is
    clone_pairs output (or any (a_id, b_id) subset — run span
    reconstruction only for the pairs that survived scoring, which is what
    bounds this operator: fps are joined against the FILTERED pair list,
    never against themselves).  Positions of fingerprints shared by the
    pair are gap-merged per side: a new span starts where the next matched
    gram is more than ``max_gap`` positions away (the winnowing guarantee
    places a fingerprint at least every w positions inside a true shared
    run, so max_gap ≳ w+k keeps one real passage in one span);
    ``end_tok`` = last matched gram + k − 1, inclusive.
    """
    shared_a = pairs.select("a_id", "b_id").join(
        fps.select(F.col("doc_id").alias("a_id"), F.col("pos").alias("a_pos"), "fp"),
        "a_id",
    )
    matched = (
        shared_a.join(
            fps.select(F.col("doc_id").alias("b_id"), F.col("pos").alias("b_pos"), "fp"),
            ["b_id", "fp"],
        )
        .select(
            "a_id",
            "b_id",
            F.explode(
                F.array(
                    F.struct(F.lit("a").alias("side"), F.col("a_pos").alias("pos")),
                    F.struct(F.lit("b").alias("side"), F.col("b_pos").alias("pos")),
                )
            ).alias("m"),
        )
        .select("a_id", "b_id", "m.side", "m.pos")
        .distinct()
    )
    # gap-merge (the sessionize shape): span breaks where the position gap
    # exceeds max_gap, span_id = running count of breaks
    w_ord = Window.partitionBy("a_id", "b_id", "side").orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(w_ord)
    spans = (
        matched.withColumn(
            "brk", F.when(gap > F.lit(max_gap), 1).otherwise(0)
        )
        .withColumn("span_id", F.sum("brk").over(w_ord))
        .groupBy("a_id", "b_id", "side", "span_id")
        .agg(
            F.min("pos").cast("long").alias("start_tok"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("end_tok"),
            F.count("*").cast("long").alias("n_grams"),
        )
        .drop("span_id")
    )
    return spans
