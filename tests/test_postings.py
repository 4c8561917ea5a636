"""Compressed posting build + WAND query path tests.

The compressed path must be rank-identical to the dense path (and therefore
to the pure-Python oracle) in both AND and OR modes, with a shard span small
enough to force multi-shard intersection and block-max pruning.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT
from searchenginesimple_spark.functions.codec import varbyte_decode
from searchenginesimple_spark.operators.bm25 import bm25_topk, build_index_stats
from searchenginesimple_spark.operators.postings import (
    build_doc_stats_packed,
    build_postings,
)
from searchenginesimple_spark.operators.wand import bm25_topk_compressed
from searchenginesimple_spark.sources.corpus import QUERY_SET, docs_df, queries_df, with_doc_ids

CFG = dataclasses.replace(DEFAULT, shard_span=64, block_size=16, shuffle_partitions=8)


@pytest.fixture(scope="module")
def built(spark):
    docs = with_doc_ids(docs_df(spark, 300)).cache()
    idx = build_index_stats(docs, cfg=CFG)
    postings = build_postings(idx.tf, CFG).cache()
    dsp = build_doc_stats_packed(idx.doc_stats, CFG).cache()
    return docs, idx, postings, dsp


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["query", "rank"]).reset_index(drop=True)


def test_postings_roundtrip_vs_tf(spark, built):
    docs, idx, postings, dsp = built
    # decode every (term, shard) run and compare against the tf table
    rows = postings.collect()
    tf_pdf = idx.tf.toPandas()
    want = {
        (r.term, r.doc_id): r.tf
        for r in tf_pdf.itertuples()
    }
    got = {}
    for r in rows:
        ids = np.cumsum(varbyte_decode(r["ids"]), dtype=np.uint64).astype(np.int64)
        tfs = varbyte_decode(r["tfs"]).astype(np.int64)
        assert len(ids) == r["df"]
        assert np.all(np.diff(ids) > 0), "ids not strictly increasing"
        assert np.all(ids // CFG.shard_span == r["shard"]), "doc outside its shard"
        nb = (len(ids) + CFG.block_size - 1) // CFG.block_size
        assert len(r["block_last_id"]) == nb and len(r["block_max_tf"]) == nb
        for d, t in zip(ids, tfs):
            got[(r["term"], int(d))] = int(t)
    assert got == want


def test_doc_stats_packed_roundtrip(spark, built):
    docs, idx, postings, dsp = built
    want = {r.doc_id: r.dlen for r in idx.doc_stats.toPandas().itertuples()}
    got = {}
    for r in dsp.collect():
        ids = np.cumsum(varbyte_decode(r["ids"]), dtype=np.uint64).astype(np.int64)
        dls = varbyte_decode(r["dlens"]).astype(np.int64)
        assert len(ids) == r["n"]
        for d, dl in zip(ids, dls):
            got[int(d)] = int(dl)
    assert got == want


@pytest.mark.parametrize("mode", ["and", "or"])
@pytest.mark.parametrize("fastpath", [None, 32 * 1024 * 1024])
def test_compressed_matches_dense(spark, built, mode, fastpath):
    docs, idx, postings, dsp = built
    q = queries_df(spark)
    dense = _canon(bm25_topk(idx, q, cfg=CFG, mode=mode).toPandas())
    comp = _canon(
        bm25_topk_compressed(
            postings, dsp, idx, q, cfg=CFG, mode=mode, fastpath_max_bytes=fastpath
        ).toPandas()
    )
    assert list(comp["query"]) == list(dense["query"])
    assert list(comp["docID"]) == list(dense["docID"]), f"{mode}: rank-identity violated"
    assert comp["score"].tolist() == pytest.approx(dense["score"].tolist(), abs=1e-9)


def test_hot_term_sharding_bounds_group_size(spark, built):
    docs, idx, postings, dsp = built
    sizes = postings.groupBy("term").agg(
        F.max("df").alias("max_shard_df"), F.sum("df").alias("total_df")
    )
    hot = sizes.filter(F.col("term") == "return").collect()[0]
    assert hot["total_df"] > 200  # planted hot term really is hot
    assert hot["max_shard_df"] <= CFG.shard_span  # skew bound holds per shard


@pytest.mark.parametrize("mode", ["and", "or"])
def test_query_engine_bit_identical(spark, built, mode):
    """The serving path (Bm25QueryEngine, cached driver slices) must return
    byte-identical results to the distributed compressed plan AND the dense
    baseline — across repeated queries (cache hits) and fresh ones."""
    from searchenginesimple_spark.operators.wand import Bm25QueryEngine

    docs, idx, postings, dsp = built
    engine = Bm25QueryEngine(postings, dsp, idx, CFG, mode=mode)
    dense = _canon(bm25_topk(idx, queries_df(spark), cfg=CFG, mode=mode).toPandas())
    got1 = _canon(engine.query(QUERY_SET))
    got2 = _canon(engine.query(QUERY_SET))  # all-cached second pass
    for got in (got1, got2):
        assert list(got["query"]) == list(dense["query"])
        assert list(got["docID"]) == list(dense["docID"])
        assert got["score"].tolist() == pytest.approx(dense["score"].tolist(), abs=1e-9)


def test_query_engine_hot_fallback_matches(spark, built):
    """With a tiny size cap every query trips the df-estimate guard and takes
    the distributed path — results must be unchanged."""
    from searchenginesimple_spark.operators.wand import Bm25QueryEngine

    docs, idx, postings, dsp = built
    engine = Bm25QueryEngine(postings, dsp, idx, CFG, fastpath_max_bytes=1)
    dense = _canon(bm25_topk(idx, queries_df(spark), cfg=CFG).toPandas())
    got = _canon(engine.query(QUERY_SET))
    assert list(got["docID"]) == list(dense["docID"])
    assert got["score"].tolist() == pytest.approx(dense["score"].tolist(), abs=1e-9)


def test_postings_stats_rollup(spark):
    import dataclasses

    from searchenginesimple_spark.config import DEFAULT
    from searchenginesimple_spark.operators.postings import postings_stats

    cfg = dataclasses.replace(DEFAULT, shard_span=4)
    tf = spark.createDataFrame(
        [(0, "a", 2), (1, "a", 1), (1, "b", 3), (4, "a", 1), (5, "c", 1)],
        "doc_id long, term string, tf int",
    )
    rows = {r["shard"]: r for r in postings_stats(tf, cfg).collect()}
    assert rows[0]["n_terms"] == 2 and rows[0]["n_postings"] == 3 and rows[0]["n_tokens"] == 6
    assert rows[1]["n_terms"] == 2 and rows[1]["n_postings"] == 2 and rows[1]["n_tokens"] == 2
