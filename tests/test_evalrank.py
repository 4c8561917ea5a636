"""Ranking evaluation (operators/evalrank.py).

Pins: Spark ≡ pure-Python twin on randomized rankings; hand-checked
values on a known case; graded NDCG; zero-result and missing-query
behavior; an end-to-end run of the real BM25 engine against qrels
derived from its own dense oracle; no Python rows in the plan.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.operators.evalrank import (
    ranking_metrics,
    ranking_metrics_py,
)

RES_SCHEMA = "query_id long, rank long, docID long"
QREL_SCHEMA = "query_id long, doc_id long, grade double"


def _pq(df):
    return {
        r["query_id"]: {
            "n_rel": r["n_rel"], "rr": r["rr"], "ap": r["ap"],
            "p_at_k": r["p_at_k"], "r_at_k": r["r_at_k"], "ndcg": r["ndcg"],
        }
        for r in df.collect()
    }


def test_hand_checked_values(spark):
    # query 1: relevant docs {10, 30}; ranking hits them at ranks 1 and 3
    results = [(1, 1, 10), (1, 2, 20), (1, 3, 30), (1, 4, 40)]
    qrels = [(1, 10, 1.0), (1, 30, 1.0)]
    per_q, summary = ranking_metrics(
        spark.createDataFrame(results, RES_SCHEMA),
        spark.createDataFrame(qrels, QREL_SCHEMA),
        k=10,
        grade_col="grade",
    )
    m = _pq(per_q)[1]
    assert m["rr"] == 1.0
    assert m["ap"] == pytest.approx((1 / 1 + 2 / 3) / 2, abs=1e-6)
    assert m["p_at_k"] == pytest.approx(2 / 10)
    assert m["r_at_k"] == 1.0
    import math
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert m["ndcg"] == pytest.approx(dcg / idcg, abs=1e-6)
    s = summary.collect()[0]
    assert s["n_queries"] == 1 and s["mrr"] == 1.0


def test_graded_ndcg_and_misses(spark):
    # query 1: graded qrels; the engine ranks the grade-1 doc above the
    # grade-3 doc -> ndcg < 1.  query 2: judged but no results -> zeros.
    results = [(1, 1, 5), (1, 2, 6)]
    qrels = [(1, 5, 1.0), (1, 6, 3.0), (2, 7, 1.0)]
    per_q, summary = ranking_metrics(
        spark.createDataFrame(results, RES_SCHEMA),
        spark.createDataFrame(qrels, QREL_SCHEMA),
        k=10,
        grade_col="grade",
    )
    m = _pq(per_q)
    assert 0 < m[1]["ndcg"] < 1
    assert m[2] == {
        "n_rel": 1, "rr": 0.0, "ap": 0.0, "p_at_k": 0.0, "r_at_k": 0.0,
        "ndcg": 0.0,
    }
    assert summary.collect()[0]["n_queries"] == 2


@pytest.mark.parametrize("k", [3, 10])
def test_matches_python_twin_randomized(spark, k):
    rng = random.Random(7)
    results, qrels = [], []
    for qid in range(20):
        docs = rng.sample(range(100), 15)
        for rank, d in enumerate(docs[:10], start=1):
            results.append((qid, rank, d))
        for d in rng.sample(range(100), rng.randint(1, 8)):
            qrels.append((qid, d, float(rng.randint(1, 3))))
    per_q, _ = ranking_metrics(
        spark.createDataFrame(results, RES_SCHEMA),
        spark.createDataFrame(qrels, QREL_SCHEMA),
        k=k,
        grade_col="grade",
    )
    want = ranking_metrics_py(results, qrels, k=k)
    got = _pq(per_q)
    assert set(got) == set(want)
    for qid in want:
        for key in want[qid]:
            assert got[qid][key] == pytest.approx(want[qid][key], abs=2e-6), (qid, key)


def test_binary_qrels_without_grade_col(spark):
    results = [(1, 1, 10), (1, 2, 20)]
    qrels = [(1, 20, 1.0)]
    per_q, _ = ranking_metrics(
        spark.createDataFrame(results, RES_SCHEMA),
        spark.createDataFrame(qrels, QREL_SCHEMA).drop("grade"),
        k=5,
    )
    assert _pq(per_q)[1]["rr"] == 0.5


def test_engine_self_evaluation(spark):
    """End-to-end: evaluate the compressed BM25 engine against qrels
    derived from the dense oracle's top-3 — a self-consistent engine
    scores perfect MRR/recall."""
    from searchenginesimple_spark.operators.bm25 import build_index_stats
    from searchenginesimple_spark.operators.postings import (
        build_doc_stats_packed,
        build_postings,
    )
    from searchenginesimple_spark.operators.wand import bm25_topk_compressed
    from searchenginesimple_spark.sources.corpus import (
        docs_df,
        queries_df,
        with_doc_ids,
    )
    import dataclasses

    from searchenginesimple_spark.config import DEFAULT

    cfg = dataclasses.replace(DEFAULT, shard_span=64, shuffle_partitions=8)
    docs = with_doc_ids(docs_df(spark, 150))
    idx = build_index_stats(docs, cfg=cfg)
    postings = build_postings(idx.tf, cfg)
    dsp = build_doc_stats_packed(idx.doc_stats, cfg)
    q = queries_df(spark)
    res = bm25_topk_compressed(postings, dsp, idx, q, cfg).join(
        q.withColumnRenamed("query", "q2"),
        F.col("query") == F.col("q2"),
    ).select("query_id", "rank", "docID")
    qrels = res.filter(F.col("rank") <= 3).select(
        "query_id", F.col("docID").alias("doc_id"), F.lit(1.0).alias("grade")
    )
    per_q, summary = ranking_metrics(res, qrels, k=10, grade_col="grade")
    s = summary.collect()[0]
    assert s["mrr"] == 1.0 and s["mean_r_at_k"] == 1.0 and s["mean_ndcg"] == 1.0


def test_no_python_in_plan(spark):
    per_q, summary = ranking_metrics(
        spark.createDataFrame([(1, 1, 10)], RES_SCHEMA),
        spark.createDataFrame([(1, 10, 1.0)], QREL_SCHEMA),
        k=5,
        grade_col="grade",
    )
    for df in (per_q, summary):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_duplicate_qrels_resolve_to_max_grade(spark):
    """Merged assessment pools carry duplicate (query, doc) judgments —
    they must resolve to ONE row (max grade), never double-count."""
    results = [(1, 1, 10), (1, 2, 20)]
    qrels = [(1, 10, 1.0), (1, 10, 2.0), (1, 20, 1.0)]
    per_q, _ = ranking_metrics(
        spark.createDataFrame(results, RES_SCHEMA),
        spark.createDataFrame(qrels, QREL_SCHEMA),
        k=5,
        grade_col="grade",
    )
    m = _pq(per_q)[1]
    want = ranking_metrics_py(results, qrels, k=5)[1]
    assert m == pytest.approx(want, abs=2e-6)
    assert m["n_rel"] == 2          # two docs, not three judgments
    assert m["p_at_k"] == pytest.approx(2 / 5)
