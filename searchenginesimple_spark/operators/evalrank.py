"""Ranking evaluation: MRR / MAP / NDCG / precision / recall @k over a
labeled query set, computed distributed.

The reference ships no evaluation (its quality story is eyeballing
results); an engine serving a 10^12-doc corpus tunes BM25 parameters,
boosts, and collapse settings against a LABELED set — queries with
relevance-judged docs (the TREC "qrels" shape) — and the metric job
itself must scale to millions of logged queries.  Standard definitions
(TREC / Manning et al., IR textbook):

  RR      1/rank of the first relevant hit (0 if none in top-k)
  AP@k    mean over relevant ranks r≤k of precision@r, divided by
          min(|relevant|, k)
  P@k     relevant-in-top-k / k
  R@k     relevant-in-top-k / |relevant|
  NDCG@k  Σ gain/log2(rank+1) over the top-k, normalized by the ideal
          ordering of the query's graded judgments (graded ``grade``
          column; binary qrels are grade 1)

Spark shape: results(query_id, rank, docID) join qrels(query_id, doc_id,
grade) — ONE join keyed (query_id, doc_id), then per-query aggregation;
the ideal DCG comes from a window over qrels (grade desc) — no collects,
no Python, linear in |results| + |qrels|.  Aggregates are exact (means
over per-query metrics, "macro" averaging — every query weighs equally,
the TREC convention).

Per-query output feeds error analysis (which queries fail); the 1-row
summary feeds dashboards/CI gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "docID",
    qrel_doc_col: str = "doc_id",
    grade_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """→ (per_query, summary).

    ``results``: (query_col, rank, doc_col) — rank 1-based, the engine's
    output shape.  ``qrels``: (query_col, qrel_doc_col [, grade]) — docs
    with grade > 0 are relevant; omit ``grade_col`` for binary judgments.
    Queries present in qrels but absent from results score 0 across the
    board (an engine returning nothing is wrong, not unmeasured); queries
    absent from qrels are ignored.

    per_query: (query_id, n_rel, rr, ap, p_at_k, r_at_k, ndcg) — all
    doubles rounded to 6 dp.  summary: 1 row (n_queries, mrr, map,
    mean_p_at_k, mean_r_at_k, mean_ndcg).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    grade = (
        F.col(grade_col).cast("double")
        if grade_col
        else F.lit(1.0)
    )
    # one judgment per (query, doc): real qrels files carry duplicate rows
    # (merged assessment pools) — resolve to the MAX grade, matching the
    # Python twin, so a dup can never double-count n_rel/hits/DCG
    q = (
        qrels.select(
            F.col(query_col).alias("query_id"),
            F.col(qrel_doc_col).alias("_doc"),
            grade.alias("_grade"),
        )
        .filter(F.col("_grade") > 0)
        .groupBy("query_id", "_doc")
        .agg(F.max("_grade").alias("_grade"))
    )

    # per-query relevant count + ideal DCG@k (window over grades desc)
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.desc("_grade"), F.asc("_doc")
    )
    ideal = (
        q.withColumn("_irank", F.row_number().over(w_ideal))
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_rel"),
            F.sum(
                F.when(
                    F.col("_irank") <= k,
                    F.col("_grade") / F.log2(F.col("_irank") + 1),
                ).otherwise(0.0)
            ).alias("_idcg"),
        )
    )

    r = results.select(
        F.col(query_col).alias("query_id"),
        F.col("rank").cast("long").alias("rank"),
        F.col(doc_col).alias("_doc"),
    ).filter(F.col("rank") <= k)
    hits = r.join(q, ["query_id", "_doc"], "inner")

    # precision@r for each relevant hit = (# relevant hits with rank <= r)/r
    w_cum = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_hit = hits.withColumn("_cumrel", F.count("*").over(w_cum))
    got = per_hit.groupBy("query_id").agg(
        F.max(1.0 / F.col("rank")).alias("_rr"),
        F.sum(F.col("_cumrel") / F.col("rank")).alias("_sum_prec"),
        F.count("*").alias("_nhit"),
        F.sum(F.col("_grade") / F.log2(F.col("rank") + 1)).alias("_dcg"),
    )

    per_query = (
        ideal.join(got, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.round(F.coalesce(F.col("_rr"), F.lit(0.0)), 6).alias("rr"),
            F.round(
                F.coalesce(
                    F.col("_sum_prec")
                    / F.least(F.col("n_rel"), F.lit(k)).cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("ap"),
            F.round(
                F.coalesce(F.col("_nhit").cast("double"), F.lit(0.0)) / F.lit(float(k)),
                6,
            ).alias("p_at_k"),
            F.round(
                F.coalesce(F.col("_nhit").cast("double"), F.lit(0.0))
                / F.col("n_rel").cast("double"),
                6,
            ).alias("r_at_k"),
            F.round(
                F.coalesce(F.col("_dcg"), F.lit(0.0)) / F.col("_idcg"), 6
            ).alias("ndcg"),
        )
    )
    summary = per_query.agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg("rr"), 6).alias("mrr"),
        F.round(F.avg("ap"), 6).alias("map"),
        F.round(F.avg("p_at_k"), 6).alias("mean_p_at_k"),
        F.round(F.avg("r_at_k"), 6).alias("mean_r_at_k"),
        F.round(F.avg("ndcg"), 6).alias("mean_ndcg"),
    )
    return per_query, summary


def ranking_metrics_py(
    result_rows: list[tuple[int, int, int]],
    qrel_rows: list[tuple[int, int, float]],
    k: int = 10,
) -> dict[int, dict]:
    """Pure-Python twin (the test oracle): identical definitions over
    (query_id, rank, doc) results and (query_id, doc, grade) qrels."""
    import math
    from collections import defaultdict

    rel: dict[int, dict[int, float]] = defaultdict(dict)
    for qid, doc, g in qrel_rows:
        if g > 0:
            rel[qid][doc] = max(float(g), rel[qid].get(doc, 0.0))
    ranked: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for qid, rank, doc in result_rows:
        if rank <= k:
            ranked[qid].append((rank, doc))
    out = {}
    for qid, docs in rel.items():
        hits = sorted(
            (rank, docs[d]) for rank, d in ranked.get(qid, []) if d in docs
        )
        rr = 1.0 / hits[0][0] if hits else 0.0
        cum, sum_prec = 0, 0.0
        for rank, _ in hits:
            cum += 1
            sum_prec += cum / rank
        ap = sum_prec / min(len(docs), k) if docs else 0.0
        dcg = sum(g / math.log2(rank + 1) for rank, g in hits)
        ideal = sorted(docs.values(), reverse=True)[:k]
        idcg = sum(g / math.log2(i + 2) for i, g in enumerate(ideal))
        out[qid] = {
            "n_rel": len(docs),
            "rr": round(rr, 6),
            "ap": round(ap, 6),
            "p_at_k": round(len(hits) / k, 6),
            "r_at_k": round(len(hits) / len(docs), 6),
            "ndcg": round(dcg / idcg, 6) if idcg else 0.0,
        }
    return out
