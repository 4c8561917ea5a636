"""Result collapsing: one hit per near-duplicate cluster on the results page.

Every production engine hides near-duplicates at serving time — Google's
"similar results omitted", Elasticsearch field collapsing (one hit per
collapse-key value), zoekt's per-repo result dedup.  This engine already
MINES the duplicate structure (minhash/simhash pairs →
``graph.connected_components`` → the driver-verified ``dedup_clusters``
entry); ``collapse_results`` applies it at query time: per query, keep the
best-ranked document of each near-dup cluster, re-rank the survivors
densely, and optionally cut back to k.

Collapse is a POST-RANKING step by design (retrieve k' ≥ k, then collapse
— the standard over-retrieve pattern): scores are never changed, only
which docs occupy the result slots, so the scoring contract (rank-identity
vs the reference on non-duplicate corpora) is untouched.  A doc absent
from the cluster assignment is its own singleton cluster (negative ids
keep synthetic singleton keys disjoint from real cluster ids, which are
min-doc_id components and hence ≥ 0).

Scale shape (the part that must survive 10^12 docs): the cluster
assignment table is corpus-scale, the result set is (queries × k) —
tiny.  So the assignment table is NEVER shuffled: it is semi-joined down
to the hit set with a broadcast of the distinct hit doc_ids (one map-side
pass over the assignment scan, output ≤ |results|), and everything after
that — the left join back onto results, both windows — runs on
candidate-sized data.  Plan-pinned in tests/test_collapse.py: both joins
broadcast, zero sort-merge/shuffled-hash joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_results(
    results: DataFrame,
    clusters: DataFrame,
    k: int | None = None,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    node_col: str = "node",
    component_col: str = "component",
) -> DataFrame:
    """→ ``results`` with near-dup clusters collapsed to their best hit.

    ``results``: any ranked result set carrying (query_col, doc_col,
    rank_col) — ``bm25_topk(keep_query_id=True)`` output,
    ``filtered_bm25_topk``, ``boolean_search_topk_ranked`` … rank must be
    dense-from-1 per query (every producer here guarantees that).

    ``clusters``: (node_col, component_col) cluster assignment —
    ``connected_components`` over near-dup pairs (the ``dedup_clusters``
    shape).  Docs not present are singletons.

    Output schema = input schema with rank_col recomputed (dense 1..m per
    query after collapsing), plus ``orig_rank`` (the pre-collapse rank)
    and ``cluster_id`` (the collapse key; null for singleton docs).
    ``k``: optional final cut after re-ranking (the over-retrieve k'→k
    pattern); None keeps every survivor.
    """
    # one upstream evaluation: hit_ids and the join below both read
    # ``results``, and Spark does not share common subplans across joins —
    # without this the whole retrieval pipeline (postings pass + verify +
    # ranking) would execute twice per collapsed search.  The result set
    # is (queries × k'), tiny, so flattening it once is cheap
    # (graph.py's lineage-truncation pattern; eager=False defers
    # materialization to the first action).
    results = results.localCheckpoint(eager=False)
    assign = clusters.select(
        F.col(node_col).alias(doc_col), F.col(component_col).alias("cluster_id")
    )
    # corpus-scale side stays map-side: broadcast the tiny hit-id set into
    # a semi join, then broadcast the (≤ |results|) survivors back.
    hit_ids = results.select(doc_col).distinct()
    assign_hits = assign.join(F.broadcast(hit_ids), doc_col, "left_semi")
    joined = results.join(F.broadcast(assign_hits), doc_col, "left")

    # synthetic singleton keys must not collide with real component ids
    # (components are min-node ids, ≥ 0) — flip sign and offset.
    key = F.coalesce(F.col("cluster_id"), -F.col(doc_col) - F.lit(1))
    per_cluster = Window.partitionBy(query_col, "_ckey").orderBy(
        F.col(rank_col).asc(), F.col(doc_col).asc()
    )
    per_query = Window.partitionBy(query_col).orderBy(
        F.col("orig_rank").asc(), F.col(doc_col).asc()
    )
    out = (
        joined.withColumn("_ckey", key)
        .withColumn("_best", F.row_number().over(per_cluster))
        .filter(F.col("_best") == 1)
        .withColumnRenamed(rank_col, "orig_rank")
        .withColumn(rank_col, F.row_number().over(per_query))
        .drop("_ckey", "_best")
    )
    if k is not None:
        out = out.filter(F.col(rank_col) <= k)
    cols = [c for c in results.columns if c != rank_col]
    return out.select(*cols, rank_col, "orig_rank", "cluster_id")
