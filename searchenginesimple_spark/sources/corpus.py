"""Deterministic synthetic source-code corpus (FIXTURES.md §1, seed 42).

Generates the input_hint table ``docs(repo, path, commit, lang, content)`` with
planted structure the tests assert on:

* zipf(1.2) identifier vocabulary (500 terms) + one hot term (``return``) at
  ~20 % token frequency (skew-handling test, SURVEY.md §4.1);
* rare discriminative terms (one per ~25 docs) for selective queries;
* every 20th doc ≈ its predecessor with a tiny token perturbation (simhash
  near-dup, must dedup — reference Page.hpp:121-161);
* every 50th doc byte-identical to another repo's file (exact dup);
* ~2 % short docs (<10 chars) that the reference drops (Page.hpp:137-146).

Generation is driver-side numpy (cheap at test scale) then parallelized via
``spark.createDataFrame`` — at real scale the corpus is an Iceberg table, not
generated.  ``doc_id`` is NOT generated: it is assigned deterministically by
``row_number() over (order by repo, path, commit)`` (SURVEY.md §4.6) so it is
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


def _vocab() -> list[str]:
    return [f"ident_{i:03d}" for i in range(VOCAB_SIZE)]


def generate_docs_pdf(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Pure-pandas generator — shared by Spark tests and the Python oracle."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())
    # zipf-ish rank weights over the vocab
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    probs = ranks**-1.2
    probs /= probs.sum()

    rows: list[dict] = []
    for i in range(n_docs):
        n_tok = int(rng.integers(50, 401))
        body = rng.choice(vocab, size=n_tok, p=probs)
        hot_mask = rng.random(n_tok) < HOT_FRACTION
        body[hot_mask] = HOT_TERM
        # file-local identifiers (~1 in 8 tokens): real code files carry many
        # file-specific names; without them every doc's tf-weighted simhash is
        # dominated by the shared zipf head and ALL docs collapse within
        # Hamming ≤ 3 of each other (observed: 300 docs → 5 survivors)
        local_pos = np.arange(7, n_tok, 8)
        for k, p in enumerate(local_pos):
            body[p] = f"loc_{i}_{k % 11}"
        toks = body.tolist()
        if i % RARE_EVERY == 3:
            toks.append(f"rare_{i // RARE_EVERY:04d}")
        # newline every ~12 tokens to look like code lines
        parts: list[str] = []
        for j, t in enumerate(toks):
            parts.append(t)
            parts.append("\n" if (j + 1) % 12 == 0 else " ")
        content = "".join(parts).strip()

        if i % SHORT_EVERY == 5:
            content = "x = 1"  # <10 chars → dropped by the short-doc rule
        if i % NEAR_DUP_EVERY == 9 and rows:
            # near-dup of previous doc: change one rare-ish token
            prev = rows[-1]["content"]
            words = prev.split(" ")
            if len(words) > 30:
                words[17] = "perturbed_token"
                content = " ".join(words)
            else:
                content = prev
        if i % EXACT_DUP_EVERY == 11 and len(rows) > 3:
            content = rows[i - 7]["content"]  # byte-identical cross-repo copy

        lang = LANGS[i % len(LANGS)]
        rows.append(
            {
                "repo": f"org{i % 7}/repo{i % 97}",
                "path": f"src/m{i % 13}/f{i}.{lang}",
                "commit": hashlib.sha256(f"c{i}".encode()).hexdigest()[:40],
                "lang": lang,
                "content": content,
            }
        )
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def docs_df(spark: SparkSession, n_docs: int, seed: int = 42, partitions: int = 8) -> DataFrame:
    """Synthetic docs as a Spark DataFrame (input_hint shape, no doc_id yet)."""
    pdf = generate_docs_pdf(n_docs, seed)
    return spark.createDataFrame(pdf).repartition(partitions)


def with_doc_ids(docs: DataFrame) -> DataFrame:
    """Assign deterministic doc_id = row_number() over (repo, path, commit).

    Reproducible across cluster sizes — unlike monotonically_increasing_id
    (SURVEY.md §4.6).  The global window is a single total sort of the key
    columns only; at 10^12-file scale this would instead be a sort-based
    zipWithIndex over (repo, path, commit) ranges, same contract.
    """
    w = Window.orderBy("repo", "path", "commit")
    return docs.withColumn("doc_id", F.row_number().over(w).cast("long") - 1)


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
    return spark.createDataFrame(
        [(i, q) for i, q in enumerate(qs)], schema="query_id long, query string"
    )
