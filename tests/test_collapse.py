"""Result collapsing (operators/collapse.py): one hit per near-dup cluster.

Twin: a pure-Python collapse over the same (results, clusters) inputs —
keep the min-rank doc per cluster per query (doc_id tie-break), re-rank
by original rank, cut to k.  Plus an end-to-end composition: planted
exact duplicates → connected_components → bm25_topk → collapse, and a
physical-plan pin that the corpus-scale cluster table is never shuffled
(both joins broadcast).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.operators.collapse import collapse_results
from searchenginesimple_spark.operators.graph import connected_components


def _py_collapse(results, clusters, k=None):
    """results: [(qid, doc, rank, score)]; clusters: {doc: component}."""
    out = []
    for qid in sorted({r[0] for r in results}):
        rows = sorted(
            (r for r in results if r[0] == qid), key=lambda r: (r[2], r[1])
        )
        seen, kept = set(), []
        for r in rows:
            key = clusters.get(r[1], ("s", r[1]))
            key = ("c", key) if not isinstance(key, tuple) else key
            if key in seen:
                continue
            seen.add(key)
            kept.append(r)
        for new_rank, r in enumerate(kept, start=1):
            if k is not None and new_rank > k:
                break
            out.append((r[0], r[1], new_rank, r[2], r[3]))
    return sorted(out)


RESULTS = [
    # qid, doc, rank, score — rank dense per query
    (1, 10, 1, 9.0),
    (1, 11, 2, 8.0),   # same cluster as 10 → dropped
    (1, 20, 3, 7.0),
    (1, 21, 4, 6.5),   # same cluster as 20 → dropped
    (1, 30, 5, 6.0),   # singleton
    (2, 11, 1, 5.0),   # cluster rep differs per query: 11 survives here
    (2, 30, 2, 4.0),
    (2, 10, 3, 3.0),   # same cluster as 11 → dropped
]
CLUSTERS = [(10, 10), (11, 10), (20, 20), (21, 20)]


@pytest.fixture()
def frames(spark):
    res = spark.createDataFrame(
        RESULTS, "query_id long, doc_id long, rank int, score double"
    )
    cl = spark.createDataFrame(CLUSTERS, "node long, component long")
    return res, cl


def test_collapse_matches_python_twin(spark, frames):
    res, cl = frames
    got = sorted(
        (r["query_id"], r["doc_id"], r["rank"], r["orig_rank"], r["score"])
        for r in collapse_results(res, cl).collect()
    )
    want = _py_collapse(RESULTS, dict(CLUSTERS))
    assert [(q, d, rk, s) for q, d, rk, _, s in got] == [
        (q, d, rk, s) for q, d, rk, _, s in want
    ]
    # orig_rank preserved; scores untouched; survivors are per-cluster best
    for q, d, rk, orig, s in got:
        assert (q, d, orig, s) in RESULTS
    # query 2 keeps 11 (its best of cluster 10), query 1 keeps 10
    by_q = {(q, d) for q, d, *_ in got}
    assert (1, 10) in by_q and (1, 11) not in by_q
    assert (2, 11) in by_q and (2, 10) not in by_q


def test_collapse_k_cut_and_singletons(spark, frames):
    res, cl = frames
    rows = collapse_results(res, cl, k=2).collect()
    assert {r["query_id"]: len([x for x in rows if x["query_id"] == r["query_id"]])
            for r in rows} == {1: 2, 2: 2}
    for r in rows:
        assert 1 <= r["rank"] <= 2
    # singleton docs carry null cluster_id
    all_rows = collapse_results(res, cl).collect()
    assert {r["doc_id"]: r["cluster_id"] for r in all_rows if r["query_id"] == 1} == {
        10: 10, 20: 20, 30: None
    }


def test_collapse_plan_never_shuffles_clusters(spark, frames):
    res, cl = frames
    plan = collapse_results(res, cl)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2


def test_collapse_end_to_end_with_planted_duplicates(spark):
    """Planted exact dups → CC clusters → bm25 over-retrieve → collapse:
    at most one doc per cluster per query, survivor = best pre-collapse
    rank, non-dup result order unchanged."""
    import dataclasses

    from searchenginesimple_spark.config import DEFAULT
    from searchenginesimple_spark.operators.bm25 import bm25_topk, build_index_stats
    from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

    docs = with_doc_ids(docs_df(spark, 120))
    dups = docs.withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
    corpus = docs.unionByName(dups).cache()

    pairs = (
        corpus.alias("a")
        .join(corpus.alias("b"), F.sha2(F.col("a.content"), 256) == F.sha2(F.col("b.content"), 256))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
    )
    clusters = connected_components(pairs)

    idx = build_index_stats(corpus)
    qdf = spark.createDataFrame(
        [(1, "return ident_001"), (2, "ident_010 ident_020")],
        "query_id long, query string",
    )
    cfg = dataclasses.replace(DEFAULT, top_k=20)
    ranked = bm25_topk(idx, qdf, cfg=cfg, mode="or", keep_query_id=True)
    out = collapse_results(
        ranked, clusters, k=10, doc_col="docID"
    ).collect()

    cl_map = {r["node"]: r["component"] for r in clusters.collect()}
    ranked_rows = ranked.collect()
    for qid in (1, 2):
        kept = sorted(
            (r for r in out if r["query_id"] == qid), key=lambda r: r["rank"]
        )
        assert kept and len(kept) <= 10
        keys = [cl_map.get(r["docID"], ("s", r["docID"])) for r in kept]
        assert len(keys) == len(set(keys)), "two survivors share a cluster"
        assert [r["rank"] for r in kept] == list(range(1, len(kept) + 1))
        # survivor = min orig_rank within its cluster among retrieved docs
        pre = [r for r in ranked_rows if r["query_id"] == qid]
        for r in kept:
            key = cl_map.get(r["docID"], ("s", r["docID"]))
            best = min(
                p["rank"] for p in pre
                if cl_map.get(p["docID"], ("s", p["docID"])) == key
            )
            assert r["orig_rank"] == best
    corpus.unpersist()
