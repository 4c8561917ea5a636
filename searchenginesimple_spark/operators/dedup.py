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

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT, EngineConfig
from searchenginesimple_spark.functions.simhash import simhash64_udf


IDF_VOTE_SCALE = 1_000_000  # idf quantization for integer simhash votes


def with_simhash(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """Raw tf-weighted content fingerprint (single-pass, corpus-free)."""
    return docs.withColumn("simhash", simhash64_udf(F.col(text_col)))


def fingerprints_from_tf(
    tf: DataFrame, n_docs: int | None = None, df_global: DataFrame | None = None
) -> DataFrame:
    """tf(doc_id, term, tf) → (doc_id, simhash) with tf·idf vote weights.

    Weights: w(t,d) = tf(t,d) · round(ln((N+1)/(df(t)+1))·10⁶) — the tf·idf
    weighting quantized to an INTEGER so the 64 bit-votes are exact sums:
    deterministic under ANY aggregation order (float votes needed a per-doc
    summation-order sort), which unlocks the all-JVM physical shape below.
    Term hashes (FNV-1a 64) are computed ONCE per unique term (vectorized
    numpy UDF over the vocabulary-sized df table); the per-doc vote stage is
    64 integer aggregate expressions — ONE hash aggregation with map-side
    partial combine, no collect_list arrays, no Arrow transfer of the token
    stream, no Python in the tf-scale path.  (Shuffle volume: 64 longs per
    doc instead of the full (hash, weight) token stream — the dedup stage's
    former scaling bottleneck.)

    The df/hash join is vocabulary-sized; at 10^12-file scale broadcast only
    the top-K frequent terms' df (rare terms take idf ≈ ln(N+1), same
    downweighting outcome) or fall back to a shuffle join — same weight SPEC.

    Docs with no tokens get no row (→ fingerprint 0 → dropped,
    Page.hpp:129-133).
    """
    from searchenginesimple_spark.functions.simhash import fnv64_udf

    # no broadcast hint on term_aux: the identifier vocabulary scales with the
    # corpus (2.7M terms at 250k code files) and a driver-built broadcast is
    # serial time; AQE broadcasts it only while it is genuinely small.
    # ``df_global`` (term, df) overrides the per-call df derivation — the
    # incremental build passes base-df + delta-df so a delta's vote weights
    # reflect the whole corpus, not just the increment.
    dfc = (
        df_global.select("term", "df")
        if df_global is not None
        else tf.groupBy("term").agg(F.count("*").alias("df"))
    )
    term_aux = dfc.withColumn("h64", fnv64_udf("term")).select("term", "df", "h64")
    if n_docs is None:
        # last-resort fallback: derive N from tf (a full distinct shuffle).
        # Callers should pass n_docs — the build passes the staged doc count
        # from metrics (plans/build.py) and tfidf_fingerprints passes a cheap
        # docs.count(); N only tunes the heuristic ln((N+1)/(df+1)) vote
        # weights, never the dedup rule.
        nd = tf.select("doc_id").distinct().agg(F.count("*").alias("n_docs"))
    else:
        nd = tf.sparkSession.createDataFrame([(int(n_docs),)], "n_docs long")
    w = (
        tf.join(term_aux, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "w",
            F.col("tf").cast("long")
            * F.floor(
                F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                * F.lit(IDF_VOTE_SCALE)
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    # Vote-sum identity (r6): v_j = Σ w·(2·bit_j − 1) = 2·Σ(w·bit_j) − Σw,
    # so the 64 per-bit aggregates only sum w·bit_j (3 ops/row instead of 5)
    # and Σw is ONE extra sum; the sign rule v_j > 0 becomes 2·s_j > S —
    # exact integer arithmetic, bit-identical fingerprints (pinned by
    # tests/test_simhash.py::test_vote_sum_identity_forms).  Measured at 1
    # core / 250k docs: 21.4 → 19.1 s warm, 45 → 28 s cold (the smaller
    # expression tree also ~halves the aggregate's codegen time).
    votes = w.groupBy("doc_id").agg(
        F.sum("w").alias("S"),
        *[
            F.sum(
                F.col("w") * F.shiftrightunsigned(F.col("h64"), j).bitwiseAND(F.lit(1))
            ).alias(f"s{j}")
            for j in range(64)
        ],
    )
    fp = F.lit(0).cast("long")
    for j in range(63):
        fp = fp + F.when(
            F.col(f"s{j}") * 2 > F.col("S"), F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    # bit 63 is the int64 sign bit: add it as the two's-complement value
    fp = fp + F.when(
        F.col("s63") * 2 > F.col("S"), F.lit(-(1 << 63)).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return votes.select("doc_id", fp.alias("simhash"))


def tfidf_fingerprints(
    docs: DataFrame,
    text_col: str = "content",
    n_docs: int | None = None,
    token_re: str | None = None,
) -> DataFrame:
    """docs(doc_id, <text_col>) → (doc_id, simhash); tokenize + fingerprints_from_tf.

    N for the idf vote weights = total input docs (a cheap count on the docs
    table — partial-aggregated, no shuffle of tf), NOT a corpus-wide distinct
    over tf.  Token-less docs inflate N marginally; the weights are a
    heuristic and the dedup rule is N-independent (oracle.py mirrors this N).
    """
    from searchenginesimple_spark.config import TOKEN_RE
    from searchenginesimple_spark.operators.bm25 import tokens_of

    if n_docs is None:
        n_docs = docs.count()
    tf = tokens_of(docs, text_col, token_re=token_re or TOKEN_RE).groupBy(
        "doc_id", "term"
    ).agg(F.count("*").cast("int").alias("tf"))
    return fingerprints_from_tf(tf, n_docs=n_docs)


def _block_widths(n_bits: int = 64, n_blocks: int = 6) -> list[tuple[int, int]]:
    """(offset, width) for n_blocks roughly-equal disjoint bit blocks."""
    base, rem = divmod(n_bits, n_blocks)
    out, off = [], 0
    for i in range(n_blocks):
        w = base + (1 if i < rem else 0)
        out.append((off, w))
        off += w
    return out


def _subset_keys(simhash, cfg: EngineConfig):
    """Combined block-subset keys (Manku et al. 2007 multi-block scheme).

    Split the 64-bit fingerprint into B=threshold+3 blocks; a pair at Hamming
    distance ≤ t differs in ≤ t blocks, so it AGREES on some (B−t)-subset of
    blocks.  Joining on every C(B, B−t) concatenated subset key keeps exact
    recall while bucket population scales as N / 2^(~32 bits) — unlike the
    4×16-bit banding whose buckets grow as N / 2^16 and whose self-join
    explodes quadratically past ~10^6 docs.
    """
    from itertools import combinations

    blocks = _block_widths(64, cfg.n_blocks)
    vals = [
        F.shiftrightunsigned(simhash, off).bitwiseAND(F.lit((1 << w) - 1))
        for off, w in blocks
    ]
    keep = cfg.n_blocks - cfg.hamming_threshold
    keys = []
    for subset in combinations(range(cfg.n_blocks), keep):
        key = F.lit(0).cast("long")
        for i in subset:
            key = F.shiftleft(key, blocks[i][1] + 1) + vals[i].cast("long")
        keys.append(key)
    return keys


def _band_explode(fp: DataFrame, cfg: EngineConfig) -> DataFrame:
    # reference drops simhash==0 (Page.hpp:129-133)
    return fp.filter(F.col("simhash") != 0).select(
        "doc_id",
        "simhash",
        F.posexplode(F.array(*_subset_keys(F.col("simhash"), cfg))).alias(
            "band_id", "band_val"
        ),
    )


def simhash_dup_pairs(
    fp: DataFrame, cfg: EngineConfig = DEFAULT, right: DataFrame | None = None
) -> DataFrame:
    """fp(doc_id, simhash) → near-dup pairs (a_id < b_id, hamming ≤ threshold).

    Physical shape: explode each fingerprint into its block-subset keys
    (exact-recall guarantee for distance ≤ threshold, see _subset_keys) →
    self-equi-join on (band_id, band_val) → cheap JVM popcount theta-filter →
    distinct pairs.  Shuffle is by band key only; residual key skew is
    handled by AQE skew-join splitting.

    ``right`` restricts the b-side (the dropped-candidate side) of the join:
    the incremental build (plans/merge.py) passes right = the delta
    fingerprints so only delta-vs-anything pairs materialize — base-vs-base
    pairs (already resolved in earlier generations) never re-join.
    """
    bands = _band_explode(fp, cfg)
    a = bands.alias("a")
    b = (bands if right is None else _band_explode(right, cfg)).alias("b")
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
        fp_only = tfidf_fingerprints(docs, text_col, token_re=cfg.token_re)
        fp = docs.join(fp_only, "doc_id", "inner")  # no-token docs drop here
    else:
        fp = with_simhash(docs, text_col)
    dropped = simhash_dup_pairs(fp.select("doc_id", "simhash"), cfg).select(
        F.col("b_id").alias("doc_id")
    ).distinct()
    return fp.filter(F.col("simhash") != 0).join(dropped, "doc_id", "left_anti")


def verifiable_fingerprints(
    docs: DataFrame,
    text_col: str = "content",
    n_docs: int | None = None,
    token_re: str | None = None,
) -> DataFrame:
    """SQL-mirrorable simhash fingerprints: (doc_id, simhash) with simhash a
    62-bit polynomial-hash, integer-vote construction.

    Same SPEC as the engine fingerprint (tf·idf-weighted bit votes,
    Simhasher.hpp:61-68 sign rule) with every ingredient chosen so a DuckDB
    oracle reproduces it bit-for-bit:

    * term hash   = polyhash62 (functions/text.py) instead of FNV-1a;
    * vote weight = tf · round(ln((N+1)/(df+1))·10⁶) — INTEGER, so vote sums
      are exact and engine/oracle can never disagree on the >0 sign rule
      (float votes depend on summation order);
    * 62 bit-votes as aggregate expressions (one shuffle, JVM codegen — no
      bit explosion, no Python).

    The FNV/float path (fingerprints_from_tf) stays the build default; this
    variant exists so the dedup RULE (band join → Hamming filter → smallest-
    id survivor) is driver-hash-verified end-to-end.
    """
    from searchenginesimple_spark.config import TOKEN_RE
    from searchenginesimple_spark.functions.text import polyhash62_expr
    from searchenginesimple_spark.operators.bm25 import tokens_of

    if n_docs is None:
        n_docs = docs.count()
    tf = tokens_of(docs, text_col, use_pandas_udf=False, token_re=token_re or TOKEN_RE)
    tf = tf.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    dfc = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = (
        tf.join(dfc, "term")
        .withColumn(
            "w",
            F.col("tf")
            * F.round(
                F.log((F.lit(float(n_docs)) + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                * F.lit(IDF_VOTE_SCALE),
                0,
            ).cast("long"),
        )
        .withColumn("h", polyhash62_expr(F.col("term")))
    )
    # same vote-sum identity as fingerprints_from_tf (r6): v_j > 0 ⇔
    # 2·Σ(w·bit_j) > Σw — exact integer arithmetic, so the DuckDB oracle's
    # transform/filter mirror (frozen SQL) still matches bit-for-bit
    votes = w.groupBy("doc_id").agg(
        F.sum("w").alias("S"),
        *[
            F.sum(
                F.col("w") * F.shiftrightunsigned(F.col("h"), j).bitwiseAND(F.lit(1))
            ).alias(f"s{j}")
            for j in range(62)
        ],
    )
    fp = F.lit(0).cast("long")
    for j in range(62):
        fp = fp + F.when(
            F.col(f"s{j}") * 2 > F.col("S"), F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("doc_id", fp.alias("simhash"))


def simhash_dedup_verifiable(
    docs: DataFrame, cfg: EngineConfig = DEFAULT, text_col: str = "content"
) -> DataFrame:
    """simhash_dedup with the SQL-mirrorable fingerprint — same survivor rule
    (simhash ≠ 0, no smaller-id neighbor at Hamming ≤ threshold), same banded
    self-join; → (doc_id, simhash), fully DuckDB-hash-verifiable."""
    fp = verifiable_fingerprints(docs, text_col, token_re=cfg.token_re)
    dropped = (
        simhash_dup_pairs(fp, cfg).select(F.col("b_id").alias("doc_id")).distinct()
    )
    return fp.filter(F.col("simhash") != 0).join(dropped, "doc_id", "left_anti")


# Row guard shared by the documented O(N²)-family exact baselines: above
# this, the LSH twin is the production path and the exact path must be
# opted into explicitly (force=True) — a 100× scale-up must not silently
# default into an all-pairs plan.
EXACT_PATH_MAX_ROWS = 100_000


def _guard_exact_path(df: DataFrame, op: str, scale_twin: str, force: bool) -> None:
    """Refuse the exact O(N²)-family path past EXACT_PATH_MAX_ROWS input
    rows unless force=True.  limit-count: short-circuits, never scans a
    web-scale table to completion just to refuse it."""
    if force:
        return
    if df.limit(EXACT_PATH_MAX_ROWS + 1).count() > EXACT_PATH_MAX_ROWS:
        raise ValueError(
            f"{op}: exact all-pairs baseline refused above "
            f"{EXACT_PATH_MAX_ROWS} input rows — use {scale_twin} (the "
            "LSH-bucketed scale path) or pass force=True to insist"
        )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 5,
    threshold: float = 0.8,
    text_col: str = "content",
    id_col: str = "doc_id",
    force: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: (a_id < b_id, jaccard ≥ threshold).

    Shingle-inverted-index shape: explode distinct shingles → self-equi-join
    on shingle → |A∩B| per pair → Jaccard from per-doc shingle counts.  Exact
    (no hashing); at 100 TB the MinHash path below replaces the raw shingle
    join (common shingles fan out), but high thresholds keep this tractable
    because only pairs sharing ≥ 1 shingle ever materialize.  GUARDED: above
    EXACT_PATH_MAX_ROWS input docs this refuses without force=True — the
    MinHash-LSH twin (minhash_dup_pairs) is the scale path.
    """
    from searchenginesimple_spark.functions.text import shingles

    _guard_exact_path(docs, "ngram_jaccard_pairs", "minhash_dup_pairs", force)

    sh = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(shingles(F.col(text_col), n)).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "na"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "nb"), "b_id")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


MINHASH_P = 2147483647  # 2^31 − 1, the affine-family modulus


def minhash_affine_constants(n_hashes: int, seed: int = 42) -> tuple[list[int], list[int]]:
    """Deterministic (a_i, b_i) for the classic affine MinHash family
    h_i(x) = (a_i·x + b_i) mod p — shared by the engine and the DuckDB
    oracle builder (__spark_entry__ inlines them as SQL literals)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MINHASH_P, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, MINHASH_P, size=n_hashes, dtype=np.int64)
    return a.tolist(), b.tolist()


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 64,
    shingle_n: int = 5,
    text_col: str = "content",
    id_col: str = "doc_id",
    hash_family: str = "xxhash",
) -> DataFrame:
    """(doc_id, sig:array<long>) MinHash signatures over n-gram shingles.

    hash_family="xxhash" (production default): the shingle never becomes a
    string — tokens hash once each (xxhash64), a shingle is the variadic
    xxhash64 of its n token-hashes (the winnow.py precedent), and
    h_i(shingle) = xxhash64(shingle_hash, i) over longs.  Measured at 50k
    docs / 10.8M shingles: 72 s → 1.1 s for the signature stage vs the
    former concat_ws-string path — materializing 10.8M gram strings was
    the entire cost, the hashing is noise.  Shingle identity is by hash
    (a 2⁻⁶⁴-collision conflation of distinct shingles is far below the
    estimator's own error).
    hash_family="poly" (oracle-verifiable): string shingles, h_i =
    (a_i·base + b_i) mod p with base = polyhash31(shingle) and seeded
    affine constants — every value reproducible in ANSI SQL, same
    banding/estimation downstream.
    Both: sig[i] = min over shingles, all JVM-side.
    """
    from searchenginesimple_spark.functions.text import polyhash31_expr, shingles
    from searchenginesimple_spark.functions.tokenize import tokenize_expr

    if hash_family == "poly":
        sh = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(shingles(F.col(text_col), shingle_n)).alias("sh"),
        )
        a, b = minhash_affine_constants(n_hashes)
        base = polyhash31_expr(F.col("sh"), 31, 7)
        sh = sh.select("doc_id", base.alias("hb"))
        mins = [
            F.min((F.lit(a[i]) * F.col("hb") + F.lit(b[i])) % F.lit(MINHASH_P)).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    else:
        th = docs.select(
            F.col(id_col).alias("doc_id"),
            F.transform(
                tokenize_expr(F.col(text_col)), lambda t: F.xxhash64(t)
            ).alias("th"),
        )
        k = F.size(F.col("th")) - (shingle_n - 1)
        win = F.transform(
            F.sequence(F.lit(0), F.greatest(k - 1, F.lit(-1))),
            lambda i: F.xxhash64(
                *[F.element_at(F.col("th"), i + j + 1) for j in range(shingle_n)]
            ),
        )
        sh = th.select(
            "doc_id",
            F.explode(
                F.when(k > 0, F.array_distinct(win)).otherwise(
                    F.array().cast("array<bigint>")
                )
            ).alias("hb"),
        )
        mins = [
            F.min(F.xxhash64(F.col("hb"), F.lit(i))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig")
    )


BAND_FOLD_MULT = 1000003  # band-key fold multiplier (poly family)


def minhash_band_keys(n_hashes: int, bands: int, hash_family: str = "xxhash"):
    """One Column per band over a ``sig`` array column — THE banding rule,
    shared by minhash_dup_pairs and the incremental curation's
    delta-vs-base join (plans/curate_inc.py) so the two candidate
    generators can never diverge."""
    r = n_hashes // bands
    if hash_family == "poly":
        return [
            F.aggregate(
                F.slice("sig", b * r + 1, r),
                F.lit(0).cast("long"),
                lambda acc, x: (acc * F.lit(BAND_FOLD_MULT) + x) % F.lit(MINHASH_P),
            )
            for b in range(bands)
        ]
    return [
        F.xxhash64(*[F.col("sig")[i] for i in range(b * r, (b + 1) * r)])
        for b in range(bands)
    ]


def minhash_banded(
    sigs: DataFrame, n_hashes: int, bands: int, hash_family: str = "xxhash"
) -> DataFrame:
    """(doc_id, sig, band_id, band_key) rows from a (doc_id, sig) frame —
    null signatures (shingle-less docs) drop, they can never band-match."""
    return sigs.filter(F.col("sig").isNotNull()).select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(*minhash_band_keys(n_hashes, bands, hash_family))
        ).alias("band_id", "band_key"),
    )


def minhash_est_jaccard(siga, sigb, n_hashes: int):
    """Signature-estimated Jaccard (matching components / n_hashes)."""
    return F.size(
        F.filter(F.zip_with(siga, sigb, lambda x, y: x == y), lambda m: m)
    ) / F.lit(float(n_hashes))


def minhash_dup_pairs(
    docs: DataFrame,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    threshold: float = 0.7,
    text_col: str = "content",
    id_col: str = "doc_id",
    hash_family: str = "xxhash",
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band-bucket join → estimated Jaccard filter.

    rows-per-band r = n_hashes/bands; candidate pairs share ≥ 1 full band
    (the classic banding construction); the signature-estimated Jaccard
    (matching components / n_hashes) filters to ≥ threshold.
    hash_family="poly" makes every value SQL-reproducible (see
    minhash_signatures) — band keys then fold with the same modular
    polynomial instead of xxhash64.
    """
    sig = minhash_signatures(docs, n_hashes, shingle_n, text_col, id_col, hash_family)
    banded = minhash_banded(sig, n_hashes, bands, hash_family)
    a, b_ = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.sig").alias("siga"),
            F.col("b.sig").alias("sigb"),
        )
        .distinct()
    )
    est = minhash_est_jaccard("siga", "sigb", n_hashes)
    return (
        cand.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("a_id", "b_id", "est_jaccard")
    )


def exact_dedup(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """Exact dedup on sha256(content); lowest doc_id per hash survives.

    Pure hash-aggregate — one shuffle on the digest, no self-join.
    """
    h = docs.withColumn("_sha", F.sha2(F.col(text_col), 256))
    keep = h.groupBy("_sha").agg(F.min("doc_id").alias("doc_id"))
    return h.join(keep, ["_sha", "doc_id"], "left_semi").drop("_sha")


def contamination_counts(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decontamination scan: per doc, how many distinct token n-gram shingles
    it shares with ANY benchmark document (the n-gram-overlap rule used to
    scrub eval sets out of LLM training corpora; 13-grams is the common
    production spec — entry/tests use a smaller n to fit the fixtures).

    Physical shape: the benchmark side is an eval set — tiny — so its
    distinct shingle set BROADCASTS; the corpus side is a map-side shingle
    explode + broadcast-hash join + partial-agg count.  No shuffle of corpus
    shingles and no self-join (ngram_jaccard_pairs compares corpus-vs-corpus;
    this compares corpus-vs-constant).  → (doc_id, n_shared), contaminated
    docs only.
    """
    from searchenginesimple_spark.functions.text import shingles

    bench_sh = benchmark.select(
        F.explode(shingles(F.col(text_col), n)).alias("sh")
    ).distinct()
    doc_sh = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("sh")
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
