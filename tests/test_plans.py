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
    # the big side (postings) must NOT be broadcast: a shuffle/scan of
    # postings feeds the join as the streamed side
    assert "SortMergeJoin" not in plan or "BroadcastHashJoin" in plan, plan


def test_tf_projection_column_pruned(spark, built_io):
    tf = built_io.read("tf").select("term")
    plan = _plan(tf)
    # ReadSchema carries only the projected column — doc_id/tf pruned out
    read_schema = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "term" in read_schema and "doc_id" not in read_schema, plan
