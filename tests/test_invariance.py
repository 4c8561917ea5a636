"""Parallelism/partitioning invariance (SURVEY.md §5.5): the index must be
byte-identical regardless of how the input happens to be partitioned —
catches order-dependence bugs (collect_list ordering, float summation, id
assignment)."""

from __future__ import annotations

import dataclasses

import pandas as pd

from searchenginesimple_spark.config import DEFAULT
from searchenginesimple_spark.plans.build import build_index
from searchenginesimple_spark.sources.corpus import generate_docs_pdf
from searchenginesimple_spark.sources.io import TableIO

CFG = dataclasses.replace(
    DEFAULT, shard_span=64, block_size=16, shuffle_partitions=8, checkpoint_batch_shards=8
)


def _canon(df: pd.DataFrame, key) -> pd.DataFrame:
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda x: x.hex() if isinstance(x, (bytes, bytearray))
                else tuple(x) if isinstance(x, list) else x
            )
    return df.sort_values(key).reset_index(drop=True)


def test_index_invariant_under_input_partitioning(spark, tmp_path):
    pdf = generate_docs_pdf(260)
    outs = []
    for i, parts in enumerate([3, 17]):
        docs = spark.createDataFrame(pdf).repartition(parts)
        io = TableIO(spark, str(tmp_path / f"idx{i}"))
        build_index(spark, docs, io, CFG)
        outs.append(io)
    for name, key in [
        ("docstore_raw", ["doc_id"]),
        ("survivors", ["doc_id"]),
        ("postings", ["term", "shard"]),
        ("doc_stats_packed", ["shard"]),
        ("term_stats", ["term"]),
        ("corpus", ["n_docs"]),
    ]:
        a = _canon(outs[0].read(name).toPandas(), key)
        b = _canon(outs[1].read(name).toPandas(), key)
        pd.testing.assert_frame_equal(a, b, check_like=True)


def test_boolean_family_invariant_under_partitioning(spark):
    """The query-algebra results (matches, ranked ladder, line hits) must be
    identical regardless of input partitioning — rank ties and line caps all
    break on deterministic keys, never on partition layout."""
    from searchenginesimple_spark.operators.boolquery import (
        boolean_search,
        boolean_search_lines,
        boolean_search_topk_ranked,
    )
    from searchenginesimple_spark.operators.trigram import build_trigram_index
    from searchenginesimple_spark.sources.corpus import with_doc_ids

    pdf = generate_docs_pdf(200)
    queries = [
        (0, "return ident"),
        (1, "re:loc_7_. OR ident_001"),
        (2, "return -ident_002"),
    ]
    outs = []
    for parts in (3, 17):
        docs = with_doc_ids(spark.createDataFrame(pdf).repartition(parts)).select(
            "doc_id", "path", "content"
        )
        postings, stats = build_trigram_index(docs)
        outs.append(
            (
                sorted(map(tuple, boolean_search(docs, postings, stats, queries).collect())),
                sorted(
                    map(
                        tuple,
                        boolean_search_topk_ranked(
                            docs, postings, stats, queries, k=10
                        ).collect(),
                    )
                ),
                sorted(
                    map(
                        tuple,
                        boolean_search_lines(
                            docs, postings, stats, queries, max_lines_per_doc=2
                        ).collect(),
                    )
                ),
            )
        )
    assert outs[0] == outs[1]
