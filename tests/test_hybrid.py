"""Hybrid search (operators/hybrid.py): boolean filter × BM25 ranking.

Twin: both legs are already independently oracled (bm25_topk against the
driver's DuckDB gate, boolean_search against the brute-force scan), so the
composition is pinned against their composition — the unrestricted BM25
ranking filtered by the bruteforce match set and re-truncated to k.  The
key semantic under test: top-k is computed OVER the filtered set (filter
before rank), not as a post-filter of the unfiltered top-k.
"""

from __future__ import annotations

import dataclasses

import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT
from searchenginesimple_spark.operators.bm25 import bm25_topk, build_index_stats
from searchenginesimple_spark.operators.boolquery import boolean_search_bruteforce
from searchenginesimple_spark.operators.hybrid import filtered_bm25_topk
from searchenginesimple_spark.operators.trigram import build_trigram_index
from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

N_DOCS = 250


@pytest.fixture(scope="module")
def hybrid_fixture(spark):
    docs = with_doc_ids(docs_df(spark, N_DOCS)).cache()
    docs.count()
    idx = build_index_stats(docs)
    tri_postings, tri_stats = build_trigram_index(docs)
    return docs, idx, tri_postings, tri_stats


def _twin(spark, docs, idx, queries, mode="and"):
    """Unrestricted full ranking ∩ bruteforce filter matches → top-k."""
    big = dataclasses.replace(DEFAULT, top_k=10**6)
    qdf = spark.createDataFrame(
        [(qid, text) for qid, text, _ in queries], "query_id long, query string"
    )
    full = bm25_topk(idx, qdf, cfg=big, mode=mode, keep_query_id=True).collect()
    by_qid: dict[int, list] = {}
    for r in sorted(full, key=lambda r: (r["query_id"], r["rank"])):
        by_qid.setdefault(r["query_id"], []).append(r)
    matches: dict[int, set[int]] = {}
    flt_queries = [(qid, flt) for qid, _, flt in queries if flt is not None]
    if flt_queries:
        for r in boolean_search_bruteforce(docs, flt_queries).collect():
            matches.setdefault(r["query_id"], set()).add(r["doc_id"])
    fmap = {qid: flt for qid, _, flt in queries}
    out = []
    for qid, _, flt in queries:
        kept = [
            r
            for r in by_qid.get(qid, [])
            if flt is None or r["docID"] in matches.get(qid, set())
        ]
        for rank, r in enumerate(kept[: DEFAULT.top_k], 1):
            out.append((qid, r["query"], fmap[qid], rank, r["docID"], r["score"]))
    return sorted(out)


def test_hybrid_matches_composition_twin(spark, hybrid_fixture):
    docs, idx, tri_postings, tri_stats = hybrid_fixture
    lang = sorted(r["lang"] for r in docs.select("lang").distinct().collect())[0]
    queries = [
        (0, "return ident", f"lang:{lang}"),          # field filter
        (1, "return ident", None),                     # unfiltered leg
        (2, "return ident", "loc_7_ -absent_zzz"),     # content filter + negation
        (3, "return ident", "absent_zzz_needle"),      # filter matches nothing
    ]
    got = sorted(
        map(
            tuple,
            filtered_bm25_topk(
                docs, idx, tri_postings, tri_stats, queries
            ).collect(),
        )
    )
    want = _twin(spark, docs, idx, queries)
    assert got == want
    by_qid: dict[int, list] = {}
    for r in got:
        by_qid.setdefault(r[0], []).append(r)
    # the battery is non-trivial: filtered and unfiltered legs both return
    # rows, the impossible filter returns none
    assert by_qid.get(0) and by_qid.get(1) and by_qid.get(2)
    assert 3 not in by_qid
    # filter-before-rank actually bit: the filtered leg's result set is a
    # strict subset of the unfiltered leg's docs only if ranks were
    # recomputed — ranks must be dense 1..n per query
    for qid, rows in by_qid.items():
        assert [r[3] for r in sorted(rows, key=lambda t: t[3])] == list(
            range(1, len(rows) + 1)
        )


def test_hybrid_filter_changes_membership_not_scores(spark, hybrid_fixture):
    """Non-scoring filter semantics: every (doc, score) pair of the
    filtered result appears with the SAME score in the unfiltered ranking
    of the same text."""
    docs, idx, tri_postings, tri_stats = hybrid_fixture
    queries = [(0, "return ident", "loc_7_"), (1, "return ident", None)]
    out = filtered_bm25_topk(docs, idx, tri_postings, tri_stats, queries)
    rows = out.collect()
    big = {
        r["docID"]: r["score"]
        for r in bm25_topk(
            idx,
            spark.createDataFrame([(1, "return ident")], "query_id long, query string"),
            cfg=dataclasses.replace(DEFAULT, top_k=10**6),
            keep_query_id=True,
        ).collect()
    }
    filtered_rows = [r for r in rows if r["query_id"] == 0]
    assert filtered_rows
    for r in filtered_rows:
        assert big[r["doc_id"]] == r["score"]


def test_hybrid_topk_is_over_filtered_set(spark, hybrid_fixture):
    """A doc outside the unfiltered top-k must surface once the filter
    removes enough better-scoring docs — the post-filter-of-top-k shortcut
    would lose it."""
    docs, idx, tri_postings, tri_stats = hybrid_fixture
    text = "return ident"
    big = dataclasses.replace(DEFAULT, top_k=10**6)
    full = bm25_topk(
        idx,
        spark.createDataFrame([(0, text)], "query_id long, query string"),
        cfg=big,
        keep_query_id=True,
    ).collect()
    assert len(full) > DEFAULT.top_k + 1, "fixture too small for the scenario"
    # filter precisely to docs BELOW the unfiltered top-k cutoff, selected
    # by their unique path basenames (f{i}.{lang} — no basename is a
    # substring of another's path)
    tail_ids = sorted(r["docID"] for r in full if r["rank"] > DEFAULT.top_k)
    some_tail = set(tail_ids[: DEFAULT.top_k + 2])
    paths = {
        r["doc_id"]: r["path"].rsplit("/", 1)[-1]
        for r in docs.select("doc_id", "path")
        .filter(F.col("doc_id").isin(sorted(some_tail)))
        .collect()
    }
    flt = " OR ".join(f"path:{paths[i]}" for i in sorted(some_tail))
    got = filtered_bm25_topk(
        docs, idx, tri_postings, tri_stats, [(0, text, flt)]
    ).collect()
    got_ids = {r["doc_id"] for r in got}
    # every surfaced doc was OUTSIDE the unfiltered top-k, and the filter's
    # best docs fill the slots
    assert got_ids and got_ids <= some_tail
    assert len(got) == min(DEFAULT.top_k, len(some_tail))
