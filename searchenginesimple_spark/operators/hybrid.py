"""Hybrid search: boolean/field filtering composed with BM25 relevance.

The two query surfaces this engine carries answer different questions —
the token index (operators/bm25.py, the reference's search path,
``WebPageQuery.hpp:38-139`` with the north rule's BM25 scorer) RANKS free
text; the trigram index (operators/boolquery.py, the zoekt algebra)
FILTERS by exact substring / field / regex / symbol predicates.  Every
production code-search UI composes them: "rank by relevance, among the
docs that satisfy the filter" (GitHub code search's qualifiers, zoekt's
filter atoms around a scored query, Elasticsearch's bool filter context —
which is exactly a non-scoring candidate restriction, like here).

``filtered_bm25_topk`` is that composition: the boolean filter produces a
verified candidate set (scan-exact by boolquery's contract), and
``bm25_topk``'s ``candidates`` hook restricts scoring output to it with a
left-semi join BEFORE the per-query ranking window — so top-k is over the
filtered set, not a post-filter of an unfiltered top-k (the difference
matters whenever more than k docs outscore the best filtered doc).

Scale shape: both legs are the already-audited plans — the filter leg is
one trigram-postings pass + candidate-sized verify, the scoring leg is
one broadcast of the (tiny) query terms against tf with a window top-k;
the composition adds exactly one left-semi join on (query_id, doc_id),
candidate-sized on both sides.  Queries WITHOUT a filter skip the
restriction entirely (a separate bm25_topk call, same single plan shape)
rather than paying a degenerate all-docs candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT, EngineConfig
from searchenginesimple_spark.operators.bm25 import IndexStats, bm25_topk
from searchenginesimple_spark.operators.boolquery import boolean_search


def filtered_bm25_topk(
    docs: DataFrame,
    index: IndexStats,
    tri_postings: DataFrame,
    tri_stats: DataFrame,
    queries: list[tuple[int, str, str | None]],
    cfg: EngineConfig = DEFAULT,
    content_col: str = "content",
    case_insensitive: bool = False,
    use_pandas_udf: bool = False,
    mode: str = "and",
    **bool_kwargs,
) -> DataFrame:
    """→ (query_id, query, filter, rank, doc_id, score): per query, the
    BM25 top-k among the documents satisfying its boolean filter.

    ``queries``: (query_id, text, filter) triples — ``text`` is the free
    text BM25 ranks (the reference's query model: conjunctive by default,
    ``mode="or"`` for disjunctive); ``filter`` is a boolquery string
    (fields, regex, sym:, case:, negation — the full algebra) or ``None``
    for unfiltered ranking.  Filter semantics are non-scoring (the
    Elasticsearch filter-context rule): a filter-only match with no text
    hit never appears, and the filter never changes a surviving doc's
    score — only which docs compete for the k slots.

    ``case_insensitive`` is the FILTER leg's index pairing/default (see
    ``boolean_search``); the text leg's case handling stays the engine's
    tokenizer spec, which lowercases — the two legs' case rules are
    independent by design, like zoekt's scored-query-vs-filter split.
    """
    spark = docs.sparkSession
    out: list[DataFrame] = []

    for has_filter in (True, False):
        batch = [q for q in queries if (q[2] is not None) == has_filter]
        if not batch:
            continue
        qdf = spark.createDataFrame(
            [(qid, text) for qid, text, _ in batch], "query_id long, query string"
        )
        cands = None
        if has_filter:
            cands = boolean_search(
                docs,
                tri_postings,
                tri_stats,
                [(qid, flt) for qid, _, flt in batch],
                content_col=content_col,
                case_insensitive=case_insensitive,
                **bool_kwargs,
            ).select("query_id", "doc_id")
        ranked = bm25_topk(
            index,
            qdf,
            cfg=cfg,
            use_pandas_udf=use_pandas_udf,
            mode=mode,
            candidates=cands,
            keep_query_id=True,
        )
        out.append(ranked)

    if not out:
        return spark.createDataFrame(
            [],
            "query_id long, query string, filter string, rank int, "
            "doc_id long, score double",
        )
    ranked = out[0]
    for r in out[1:]:
        ranked = ranked.unionByName(r)
    fdf = spark.createDataFrame(
        [(qid, flt) for qid, _, flt in queries],
        "query_id long, filter string",
    )
    return (
        ranked.join(F.broadcast(fdf), "query_id", "left")
        .select(
            "query_id",
            "query",
            "filter",
            F.col("rank").cast("int").alias("rank"),
            F.col("docID").alias("doc_id"),
            F.col("score").cast("double").alias("score"),
        )
    )
