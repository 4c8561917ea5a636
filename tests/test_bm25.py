"""Oracle-parity tests for the dense BM25 path (SURVEY.md §5.2/§5.3)."""

from __future__ import annotations

import pandas as pd
import pytest

from searchenginesimple_spark.operators.bm25 import bm25_topk, build_index_stats
from searchenginesimple_spark.oracle import bm25_topk_oracle
from searchenginesimple_spark.sources.corpus import (
    QUERY_SET,
    docs_df,
    generate_docs_pdf,
    queries_df,
    with_doc_ids,
)


@pytest.fixture(scope="module")
def indexed(spark):
    docs = with_doc_ids(docs_df(spark, 300)).cache()
    idx = build_index_stats(docs)
    return docs, idx


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["query", "rank"]).reset_index(drop=True)


def test_rank_identical_to_oracle(spark, indexed):
    docs, idx = indexed
    got = _canon(bm25_topk(idx, queries_df(spark)).toPandas())
    docs_pdf = docs.select("doc_id", "content").toPandas()
    want = _canon(bm25_topk_oracle(docs_pdf, QUERY_SET))
    assert list(got["query"]) == list(want["query"])
    assert list(got["rank"]) == list(want["rank"])
    assert list(got["docID"]) == list(want["docID"]), "rank-identity violated"
    assert got["score"].tolist() == pytest.approx(want["score"].tolist(), rel=1e-9)


def test_conjunctive_semantics(spark, indexed):
    docs, idx = indexed
    res = bm25_topk(idx, queries_df(spark)).toPandas()
    # every returned doc contains all indexed query terms
    docs_pdf = docs.select("doc_id", "content").toPandas().set_index("doc_id")
    from searchenginesimple_spark.functions.tokenize import tokenize_py

    vocab = set()
    for text in docs_pdf["content"]:
        vocab.update(tokenize_py(text))
    for _, row in res.iterrows():
        q_terms = [t for t in tokenize_py(row["query"]) if t in vocab]
        doc_terms = set(tokenize_py(docs_pdf.loc[row["docID"], "content"]))
        assert all(t in doc_terms for t in q_terms), (row["query"], row["docID"])


def test_fully_oov_query_empty(spark, indexed):
    _, idx = indexed
    res = bm25_topk(idx, queries_df(spark, ["zz_never_a_token"])).toPandas()
    assert len(res) == 0


def test_topk_bound_and_rank_contiguity(spark, indexed):
    _, idx = indexed
    res = bm25_topk(idx, queries_df(spark)).toPandas()
    for q, grp in res.groupby("query"):
        ranks = sorted(grp["rank"])
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 10


def test_doc_id_deterministic_across_parallelism(spark):
    pdf = generate_docs_pdf(200)
    a = with_doc_ids(spark.createDataFrame(pdf).repartition(2))
    b = with_doc_ids(spark.createDataFrame(pdf).repartition(13))
    pa = a.select("doc_id", "repo", "path").toPandas().sort_values("doc_id").reset_index(drop=True)
    pb = b.select("doc_id", "repo", "path").toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa, pb)


def test_stopword_build_query_asymmetry(spark, indexed):
    """Reference asymmetry (Page.hpp:294 vs WebPageQuery.hpp:140-160): the
    stop filter runs at BUILD time only.  A stopword query term is simply
    absent from the index — fully-stopword queries resolve to zero rows via
    postings absence, and mixed queries degrade to their non-stop terms."""
    import dataclasses

    from searchenginesimple_spark.config import DEFAULT
    from searchenginesimple_spark.sources.corpus import HOT_TERM

    docs, _ = indexed
    cfg = dataclasses.replace(DEFAULT, stopwords=(HOT_TERM, "ident_000"))
    idx = build_index_stats(docs, cfg=cfg)

    # stopwords never appear in the index
    terms = {r["term"] for r in idx.term_stats.select("term").collect()}
    assert HOT_TERM not in terms and "ident_000" not in terms

    # fully-stopword query → zero rows (postings absence, not a rewrite)
    assert len(bm25_topk(idx, queries_df(spark, [HOT_TERM]), cfg).collect()) == 0

    # mixed query degrades to the non-stop terms: identical result to
    # querying only the surviving term against the same index
    mixed = bm25_topk(idx, queries_df(spark, [f"{HOT_TERM} ident_001"]), cfg).toPandas()
    alone = bm25_topk(idx, queries_df(spark, ["ident_001"]), cfg).toPandas()
    assert list(mixed["docID"]) == list(alone["docID"])
    assert list(mixed["score"]) == list(alone["score"])


def test_doc_keywords_matches_hand_computation(spark):
    import math

    from searchenginesimple_spark.operators.bm25 import build_index_stats, doc_keywords

    docs = spark.createDataFrame(
        [(0, "x x x y z"), (1, "y z z"), (2, "w")],
        "doc_id long, content string",
    )
    idx = build_index_stats(docs)
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["weight"])
        for r in doc_keywords(idx, k=2).collect()
    }

    def idf(df_, n=3):
        return math.log((n - df_ + 0.5) / (df_ + 0.5) + 1.0)

    # doc 0: x tf3 df1, y tf1 df2, z tf1 df2 → x top, then y (term asc tie)
    assert got[(0, 1)] == ("x", round(3 * idf(1), 6))
    assert got[(0, 2)] == ("y", round(1 * idf(2), 6))
    # doc 1: z tf2 beats y tf1
    assert got[(1, 1)][0] == "z" and got[(1, 2)][0] == "y"
    assert got[(2, 1)] == ("w", round(1 * idf(1), 6))
    assert (2, 2) not in got


def test_more_like_this_excludes_seed_and_ranks_overlap(spark):
    from searchenginesimple_spark.operators.bm25 import build_index_stats, more_like_this

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma epsilon"),   # 3 shared keywords with seed
            (2, "alpha zeta eta theta"),       # 1 shared
            (3, "iota kappa lam mu"),          # 0 shared
        ],
        "doc_id long, content string",
    )
    idx = build_index_stats(docs)
    got = more_like_this(idx, [0], k_keywords=4).collect()
    ids = [r["docID"] for r in sorted(got, key=lambda r: r["rank"])]
    assert 0 not in ids                 # seed excluded
    assert ids[0] == 1                  # most keyword overlap ranks first
    assert set(ids) == {1, 2}           # doc 3 shares no terms → no score
    assert all(r["seed"] == 0 for r in got)


def test_more_like_this_duplicate_seeds_no_cross_join(spark):
    """r2 advisor finding: recovering the seed by joining back on the
    synthesized keyword STRING cross-joined seeds with identical keyword
    sets (e.g. duplicate documents).  The seed id must ride query_id:
    each seed gets exactly ONE ranked list, even when seeds are copies."""
    from searchenginesimple_spark.operators.bm25 import build_index_stats, more_like_this

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma delta"),     # exact duplicate of seed 0
            (2, "alpha beta gamma epsilon"),
            (3, "unrelated terms only"),
        ],
        "doc_id long, content string",
    )
    idx = build_index_stats(docs)
    got = more_like_this(idx, [0, 1], k_keywords=4).collect()
    per_seed = {}
    for r in got:
        per_seed.setdefault(r["seed"], []).append((r["rank"], r["docID"]))
    # identical keyword sets → identical (mirror-image) result shape, but
    # NO duplicated (seed, rank) rows
    for seed, rows in per_seed.items():
        ranks = [rk for rk, _ in rows]
        assert len(ranks) == len(set(ranks)), f"duplicated ranks for seed {seed}"
    assert set(per_seed) == {0, 1}
    # each seed's top hit is its twin (highest term overlap)
    top = {s: sorted(rows)[0][1] for s, rows in per_seed.items()}
    assert top == {0: 1, 1: 0}


def test_with_doc_ids_paths_identical(spark):
    """r6: with_doc_ids picks its physical shape by corpus size (broadcast
    the (keys → doc_id) map vs one bucket-keyed window over the full rows).
    Both paths must assign byte-identical ids — same bucket/rank/offset
    arithmetic — at any parallelism."""
    pdf = generate_docs_pdf(250)
    df = spark.createDataFrame(pdf).repartition(5)
    a = with_doc_ids(df).select("repo", "path", "commit", "doc_id")
    b = with_doc_ids(df, broadcast_max_rows=0).select(
        "repo", "path", "commit", "doc_id"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # dense ids either way
    ids = sorted(r["doc_id"] for r in b.collect())
    assert ids == list(range(250))
