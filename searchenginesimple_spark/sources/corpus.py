"""Deterministic synthetic source-code corpus (FIXTURES.md §1, seed 42).

Generates the input_hint table ``docs(repo, path, commit, lang, content)`` with
planted structure the tests assert on:

* zipf(1.2) identifier vocabulary (500 terms) + one hot term (``return``) at
  ~20 % token frequency (skew-handling test, SURVEY.md §4.1);
* file-local identifiers (~1 in 8 tokens) — real code files carry many
  file-specific names; without them every doc's tf·idf simhash collapses;
* rare discriminative terms (one per ~25 docs) for selective queries;
* every 20th doc ≈ its predecessor with a tiny token perturbation (simhash
  near-dup, must dedup — reference Page.hpp:121-161);
* every 50th doc byte-identical to an earlier file (exact dup);
* ~2 % short docs (<10 chars) that the reference drops (Page.hpp:137-146).

Content is a PURE FUNCTION of (seed, doc index): generation distributes over
executors (``docs_df_distributed`` mapInPandas) and the pandas/oracle path
(``generate_docs_pdf``) produces byte-identical rows.  ``doc_id`` is NOT
generated: it is assigned deterministically by ``with_doc_ids`` so it is
identical at any parallelism.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LANGS = ["py", "java", "cpp", "go", "js"]
HOT_TERM = "return"
HOT_FRACTION = 0.20
VOCAB_SIZE = 500
RARE_EVERY = 25
NEAR_DUP_EVERY = 20
EXACT_DUP_EVERY = 50
SHORT_EVERY = 47  # ~2%

_VOCAB = np.array([f"ident_{i:03d}" for i in range(VOCAB_SIZE)])
_RANKS = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
_PROBS = _RANKS**-1.2
_PROBS /= _PROBS.sum()


def _base_content(i: int, seed: int) -> str:
    """Deterministic per-doc body (no dup/short overrides)."""
    rng = np.random.default_rng(seed * 1_000_003 + i)
    n_tok = int(rng.integers(50, 401))
    body = rng.choice(_VOCAB, size=n_tok, p=_PROBS)
    hot_mask = rng.random(n_tok) < HOT_FRACTION
    body[hot_mask] = HOT_TERM
    local_pos = np.arange(7, n_tok, 8)
    for k, p in enumerate(local_pos):
        body[p] = f"loc_{i}_{k % 11}"
    toks = body.tolist()
    if i % RARE_EVERY == 3:
        toks.append(f"rare_{i // RARE_EVERY:04d}")
    parts: list[str] = []
    for j, t in enumerate(toks):
        parts.append(t)
        parts.append("\n" if (j + 1) % 12 == 0 else " ")
    return "".join(parts).strip()


def _short_or_base(j: int, seed: int) -> str:
    if j % SHORT_EVERY == 5:
        return "x = 1"  # <10 chars → dropped by the short-doc rule
    return _base_content(j, seed)


def doc_content(i: int, seed: int = 42) -> str:
    """Pure content function: exact-dup > near-dup > short > base.

    (The dup sources i−1 / i−7 are provably never themselves dup-overridden
    for these moduli, so one level of indirection fully defines the corpus.)
    """
    if i % EXACT_DUP_EVERY == 11 and i >= 7:
        return _short_or_base(i - 7, seed)
    if i % NEAR_DUP_EVERY == 9 and i >= 1:
        prev = _short_or_base(i - 1, seed)
        words = prev.split(" ")
        if len(words) > 30:
            words[17] = "perturbed_token"
            return " ".join(words)
        return prev
    return _short_or_base(i, seed)


def doc_row(i: int, seed: int = 42) -> dict:
    lang = LANGS[i % len(LANGS)]
    return {
        "repo": f"org{i % 7}/repo{i % 97}",
        "path": f"src/m{i % 13}/f{i}.{lang}",
        "commit": hashlib.sha256(f"c{i}".encode()).hexdigest()[:40],
        "lang": lang,
        "content": doc_content(i, seed),
    }


def generate_docs_pdf(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Pure-pandas generator — shared by Spark tests and the Python oracle."""
    return pd.DataFrame(
        [doc_row(i, seed) for i in range(n_docs)],
        columns=["repo", "path", "commit", "lang", "content"],
    )


def docs_df(spark: SparkSession, n_docs: int, seed: int = 42, partitions: int = 8) -> DataFrame:
    """Synthetic docs as a Spark DataFrame (input_hint shape, no doc_id yet)."""
    pdf = generate_docs_pdf(n_docs, seed)
    return spark.createDataFrame(pdf).repartition(partitions)


def docs_df_distributed(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int = 32
) -> DataFrame:
    """Executor-side generation: content is a pure function of (seed, i), so
    the id range distributes and the result is identical to generate_docs_pdf
    at any parallelism.  Used by bench for corpora too big to build on the
    driver."""
    import pandas as _pd

    def gen(batches):
        for pdf in batches:
            yield _pd.DataFrame([doc_row(int(i), seed) for i in pdf["id"]])

    return (
        spark.range(0, n_docs)
        .repartition(partitions)
        .mapInPandas(gen, "repo string, path string, commit string, lang string, content string")
    )


N_ID_BUCKETS = 256


def with_doc_ids(
    docs: DataFrame,
    n_buckets: int = N_ID_BUCKETS,
    broadcast_max_rows: int = 2_000_000,
) -> DataFrame:
    """Assign deterministic, dense doc_ids — parallel at any scale.

    Two-phase bucketed rank (SURVEY.md §4.6): bucket = pmod(xxhash64(keys), B)
    is a pure function of the key, so it is identical at any parallelism;
    within each bucket a window ranks by (repo, path, commit); bucket offsets
    (a B-row collect) make the ids dense:

        doc_id = offset[bucket] + rank_within_bucket − 1

    No single-partition global sort anywhere — the windows parallelize over B
    buckets, which is what survives 10^12 files.  Unlike
    ``monotonically_increasing_id`` (partition-layout-dependent) the result
    is reproducible across cluster sizes; ids are dense but NOT globally
    key-ordered (no consumer requires that — dedup needs only a total order).

    A ``doc_id`` column already present (e.g. a corpus written by ``cli
    ingest``, which runs this same assignment) is DROPPED and re-derived:
    every caller of this function needs the dense-over-THIS-input contract
    (plans/build.py and plans/merge.py both rank a FILTERED set, so stale
    ids would carry gaps and break e.g. merge's first_id offsetting).
    Callers that want to respect pre-assigned ids guard at the call site
    (``if "doc_id" not in docs.columns`` — the cli query-path convention).
    """
    if "doc_id" in docs.columns:
        docs = docs.drop("doc_id")
    keys = ["repo", "path", "commit"]
    bucket = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")
    ids = docs.select(*keys).withColumn("_b", bucket)
    counts = {r["_b"]: r["count"] for r in ids.groupBy("_b").count().collect()}
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    off_df = ids.sparkSession.createDataFrame(
        [(b, o) for b, o in offsets.items()], "_b int, _off long"
    )
    w = Window.partitionBy("_b").orderBy(*keys)
    # How the ids get back onto the full rows (r6: the former unconditional
    # docs ⋈ ranked equi-join planned as a sort-merge join under the build's
    # AQE-off phase — shuffling AND sorting the full CONTENT column on three
    # string keys twice per build, the guide-§2.4 accidental exchange).  The
    # bucket counts are already on the driver, so the plan picks by size:
    #
    # * corpus ≤ broadcast_max_rows → rank the key-only frame and BROADCAST
    #   the (keys → doc_id) map: content never moves at all;
    # * larger corpora → run the SAME window over the full rows: content
    #   moves in exactly ONE bucket-keyed exchange (256 buckets spread any
    #   cluster) instead of two join-side exchanges + sorts.
    #
    # Identical doc_id assignment either way (same bucket/rank/offset
    # arithmetic over the same keys) — pinned by tests/test_corpus.py.
    if acc <= broadcast_max_rows:
        ranked = (
            ids.withColumn("_rank", F.row_number().over(w).cast("long"))
            .join(F.broadcast(off_df), "_b")
            .withColumn("doc_id", F.col("_off") + F.col("_rank") - 1)
            .select(*keys, "doc_id")
        )
        return docs.join(F.broadcast(ranked), keys)
    out_cols = docs.columns + ["doc_id"]
    return (
        docs.withColumn("_b", bucket)
        .withColumn("_rank", F.row_number().over(w).cast("long"))
        .join(F.broadcast(off_df), "_b")
        .withColumn("doc_id", F.col("_off") + F.col("_rank") - 1)
        .select(*out_cols)
    )


QUERY_SET: list[str] = [
    # single common / hot / rare terms  (FIXTURES.md §2 coverage)
    "ident_000",
    HOT_TERM,
    "rare_0001",
    # 2–4 term conjunctions, non-empty
    "ident_000 ident_001",
    "ident_001 ident_002 ident_003",
    "ident_000 ident_001 ident_002 ident_004",
    # conjunction with (almost surely) empty intersection
    "rare_0001 rare_0002",
    # OOV term pruned, does not empty the result (WebPageQuery.hpp:52-58)
    "ident_000 zz_out_of_vocab",
    # fully OOV → zero rows (WebPageQuery.hpp:64-68 short-circuit)
    "zz_out_of_vocab",
    # repeated term → duplicate-token weighting (WebPageQuery.hpp:87-99)
    "ident_000 ident_000 ident_001",
    # hot + common mix
    f"{HOT_TERM} ident_002",
    # tie-prone: exact-dup docs share scores → doc_id tie-break
    "ident_001",
]


def queries_df(spark: SparkSession, queries: list[str] | None = None) -> DataFrame:
    qs = queries if queries is not None else QUERY_SET
    # arrow_local_df: downstream broadcasts of the query batch materialize
    # from one JVM Arrow batch instead of a Python-RDD conversion job
    from searchenginesimple_spark.sources.io import arrow_local_df

    return arrow_local_df(
        spark, [(i, q) for i, q in enumerate(qs)], "query_id long, query string"
    )
