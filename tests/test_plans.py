"""Physical-plan assertions: the plan properties the design claims must show
up in `.explain` output, not just in docstrings (SURVEY.md §4).

* term-IN predicate pushdown reaches the postings parquet scan,
* shard partition pruning reaches the scan's PartitionFilters,
* the query-side joins of the compressed BM25 path are broadcast joins,
* the full-scan projection of the tf table is column-pruned (ReadSchema).
"""

from __future__ import annotations

import dataclasses

import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT
from searchenginesimple_spark.operators.wand import bm25_topk_compressed
from searchenginesimple_spark.plans.build import build_index, load_index
from searchenginesimple_spark.sources.corpus import docs_df, queries_df
from searchenginesimple_spark.sources.io import TableIO

CFG = dataclasses.replace(
    DEFAULT, shard_span=64, block_size=16, shuffle_partitions=8
)


@pytest.fixture(scope="module")
def built_io(spark, tmp_path_factory):
    io = TableIO(spark, str(tmp_path_factory.mktemp("idx_plans")))
    build_index(spark, docs_df(spark, 300), io, CFG)
    return io


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _broadcast_subtree_ids(plan: str) -> set[int]:
    """Node ids that sit underneath any BroadcastExchange in the formatted
    plan's tree header (children are the strictly-deeper following lines)."""
    import re

    header = plan.split("\n\n", 1)[0].splitlines()
    nodes: list[tuple[int, int, str]] = []
    for line in header:
        m = re.search(r"([A-Za-z][\w .]*?)\s*\((\d+)\)\s*$", line)
        if m:
            depth = len(line) - len(line.lstrip(" :+-*"))
            nodes.append((depth, int(m.group(2)), m.group(1)))
    out: set[int] = set()
    for i, (d, _nid, name) in enumerate(nodes):
        if "BroadcastExchange" in name:
            for d2, nid2, _ in nodes[i + 1 :]:
                if d2 <= d:
                    break
                out.add(nid2)
    return out


def _parquet_scan_ids(plan: str, path_fragment: str) -> set[int]:
    """Ids of parquet scan nodes whose Location contains path_fragment."""
    import re

    ids: set[int] = set()
    for block in plan.split("\n\n"):
        m = re.match(r"\((\d+)\)\s+Scan parquet", block.strip())
        if m and path_fragment in block:
            ids.add(int(m.group(1)))
    return ids


def test_term_in_pushdown_reaches_scan(spark, built_io):
    postings = built_io.read("postings").filter(
        F.col("term").isin(["ident_000", "ident_001"])
    )
    plan = _plan(postings)
    assert "PushedFilters" in plan and "In(term" in plan, plan


def test_shard_partition_pruning(spark, built_io):
    pruned = built_io.read("postings").filter(F.col("shard").isin([0, 1]))
    plan = _plan(pruned)
    # directory-partition column filters appear as PartitionFilters, and the
    # scan must not read data filters for shard (it is not in the file schema)
    assert "PartitionFilters" in plan and "shard" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0], plan


def test_compressed_bm25_query_side_broadcasts(spark, built_io):
    postings, dsp, idx = load_index(built_io)
    # fastpath_max_bytes=None forces the distributed plan (the driver fast
    # path would collect and leave no joins to assert on)
    out = bm25_topk_compressed(
        postings, dsp, idx, queries_df(spark), CFG, fastpath_max_bytes=None
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    # the big side (postings) must NOT be broadcast: its parquet scan must not
    # appear anywhere under a BroadcastExchange subtree
    p_ids = _parquet_scan_ids(plan, "/postings")
    assert p_ids, plan  # the postings scan exists in the plan
    assert p_ids.isdisjoint(_broadcast_subtree_ids(plan)), plan


def test_tf_projection_column_pruned(spark, built_io):
    tf = built_io.read("tf").select("term")
    plan = _plan(tf)
    # ReadSchema carries only the projected column — doc_id/tf pruned out
    read_schema = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "term" in read_schema and "doc_id" not in read_schema, plan


def test_fingerprint_vote_stage_is_jvm(spark, built_io):
    """The tf·idf simhash vote stage must be pure JVM aggregation with
    map-side partial combine: no collect_list arrays, and the only Python
    node is the vocabulary-sized FNV hash UDF."""
    from searchenginesimple_spark.operators.dedup import fingerprints_from_tf

    import re

    tf = built_io.read("tf")
    plan = _plan(fingerprints_from_tf(tf, n_docs=300))
    assert "collect_list" not in plan, plan
    py_nodes = re.findall(r"\(\d+\) (?:Arrow|Batch)EvalPython", plan)
    assert len(py_nodes) <= 1, plan
    assert "partial_sum" in plan, plan  # map-side combine before the doc_id shuffle


def test_per_key_cap_partial_window_group_limit(spark):
    """per_key_cap must keep the map-side WindowGroupLimit (Partial) — the
    shuffle then carries ≤ cap rows per group per input partition, which is
    the whole point of the quota at skewed-host scale."""
    from searchenginesimple_spark.operators.sample import per_key_cap

    df = spark.createDataFrame(
        [(i, f"s{i % 5}") for i in range(100)], "doc_id long, source string"
    )
    plan = per_key_cap(df, 10)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_tf_mapside_has_no_exchange(spark):
    """The build's tf computation must be map-only: per-doc run-length
    counting in the projection, no shuffle of the raw token stream (the
    former explode+groupBy was the 10^12-file build's largest shuffle)."""
    from searchenginesimple_spark.operators.bm25 import tf_mapside

    df = spark.createDataFrame(
        [(0, "a b a"), (1, "c")], "doc_id long, content string"
    )
    plan = tf_mapside(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_more_like_this_seed_filter_below_window(spark):
    """more_like_this narrows doc_keywords to the seed docs AFTER the
    keyword window in source order; doc_id is the window's partition key, so
    Catalyst must push the seed filter BELOW the Window — at 10^12 docs
    that's the difference between ranking keywords for 3 documents and for
    all of them.  (In the optimized-plan tree, children print after their
    parent: pushed ⇒ the IN-filter line appears after the Window line.)"""
    import re

    from searchenginesimple_spark.operators.bm25 import build_index_stats, doc_keywords
    from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

    idx = build_index_stats(with_doc_ids(docs_df(spark, 50)))
    df = doc_keywords(idx, k=5).filter(F.col("doc_id").isin([0, 7, 42]))
    lp = df._jdf.queryExecution().optimizedPlan().toString().splitlines()
    win = [i for i, line in enumerate(lp) if "Window [" in line]
    # Catalyst may rewrite doc_id to its defining expression when pushing —
    # match the IN-set itself, wherever it landed
    filt = [
        i for i, line in enumerate(lp)
        if re.search(r"IN \(0,\s*7,\s*42\)", line) or "INSET" in line
    ]
    assert win and filt, f"plan missing window/filter:\n" + "\n".join(lp)
    assert min(filt) > min(win), (
        "seed filter was NOT pushed below the keyword Window:\n" + "\n".join(lp)
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on term with equal bucket counts must join with
    NO Exchange on either side — the co-located layout postings/term_stats
    get at deployment scale (sources/io.py::write_bucketed)."""
    from searchenginesimple_spark.sources.io import TableIO

    io = TableIO(spark, str(tmp_path))
    a = spark.createDataFrame(
        [(f"t{i % 17}", i, i % 5) for i in range(200)], "term string, doc_id long, tf int"
    )
    b = spark.createDataFrame(
        [(f"t{i}", i) for i in range(17)], "term string, df int"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        io.write_bucketed(a, "bk_tf", "term", 8)
        io.write_bucketed(b, "bk_stats", "term", 8)
        joined = spark.table("bk_tf").join(spark.table("bk_stats"), "term")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 200
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bk_tf")
        spark.sql("DROP TABLE IF EXISTS bk_stats")


@pytest.fixture(scope="module")
def bool_setup(spark, tmp_path_factory):
    from searchenginesimple_spark.operators.trigram import (
        build_trigram_index,
        write_trigram_index,
    )
    from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

    docs = with_doc_ids(docs_df(spark, 120)).select(
        "doc_id", "repo", "lang", "path", "content"
    )
    raw, _ = build_trigram_index(docs)
    # the deployed shape: a materialized parquet index, not an inline build
    postings, stats = write_trigram_index(
        raw, str(tmp_path_factory.mktemp("tri_plans"))
    )
    return docs, postings, stats


def test_boolean_lines_explodes_content_once(spark, bool_setup):
    """boolean_search_lines' claim: a k-query batch explodes the matched
    docs' content into lines ONCE (over the distinct matched docs), never
    once per query — at results-page scale the explode output dominates,
    so k would multiply it."""
    from searchenginesimple_spark.operators.boolquery import boolean_search_lines

    docs, postings, stats = bool_setup
    df = boolean_search_lines(
        docs, postings, stats,
        [(0, "return ident"), (1, "return -def"), (2, "loc_7_ OR ident_001")],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 1, plan


def test_boolean_facets_aggregate_is_partial(spark, bool_setup):
    """boolean_search_facets' claim: the per-facet count is a hash-agg with
    map-side partials (partial_count) — no raw hit rows cross the shuffle
    un-combined."""
    from searchenginesimple_spark.operators.boolquery import boolean_search_facets

    docs, postings, stats = bool_setup
    df = boolean_search_facets(docs, postings, stats, [(0, "return ident")])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan


def test_boolean_ranked_topk_is_window_group_limit(spark, bool_setup):
    """boolean_search_topk_ranked's claim: the per-query top-k rank filter
    runs as WindowGroupLimit (map-side partial limit before the shuffle),
    the same guarantee every rank-filter in this engine pins."""
    from searchenginesimple_spark.operators.boolquery import (
        boolean_search_topk_ranked,
    )

    docs, postings, stats = bool_setup
    df = boolean_search_topk_ranked(
        docs, postings, stats, [(0, "return ident")], k=5
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_boolean_scan_fallback_is_single_pass(spark, bool_setup, tmp_path):
    """boolean_search's claim: every scan-routed query of a batch shares
    ONE pass over the doc store — three pure-negation/short-atom queries
    must produce exactly one parquet scan of docs, not three."""
    from searchenginesimple_spark.operators.boolquery import boolean_search

    docs, postings, stats = bool_setup
    d = str(tmp_path / "docs_pq")
    docs.write.parquet(d)
    pq_docs = spark.read.parquet(d)
    df = boolean_search(
        pq_docs, postings, stats,
        [(0, "-return"), (1, "id"), (2, "-ident OR id")],  # all scan-path
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
