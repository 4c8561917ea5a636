"""Checkpoint/resume equivalence tests (north rule; SURVEY.md §5.4)."""

from __future__ import annotations

import dataclasses

import pandas as pd
import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT
from searchenginesimple_spark.operators.wand import bm25_topk_compressed
from searchenginesimple_spark.plans.build import build_index, load_index
from searchenginesimple_spark.sources.corpus import docs_df, queries_df
from searchenginesimple_spark.sources.io import TableIO

CFG = dataclasses.replace(
    DEFAULT, shard_span=32, block_size=16, shuffle_partitions=8, checkpoint_batch_shards=2
)


def _table_pdf(io: TableIO, name: str, key) -> pd.DataFrame:
    df = io.read(name).toPandas()
    for c in df.columns:
        if df[c].dtype == object and df[c].map(lambda x: isinstance(x, (bytes, bytearray))).any():
            df[c] = df[c].map(lambda b: b.hex() if isinstance(b, (bytes, bytearray)) else b)
        elif df[c].dtype == object and df[c].map(lambda x: isinstance(x, list)).any():
            df[c] = df[c].map(lambda x: tuple(x) if isinstance(x, list) else x)
    return df.sort_values(key).reset_index(drop=True)


@pytest.fixture(scope="module")
def raw_docs(spark):
    return docs_df(spark, 300).cache()


def test_fresh_build_and_query(spark, raw_docs, tmp_path_factory):
    io = TableIO(spark, str(tmp_path_factory.mktemp("idx_fresh")))
    res = build_index(spark, raw_docs, io, CFG)
    assert res.built_shards == res.n_shards > 1
    assert res.resumed_shards == 0
    postings, dsp, idx = load_index(io)
    out = bm25_topk_compressed(postings, dsp, idx, queries_df(spark), CFG).toPandas()
    assert len(out) > 0
    # metrics table: one done row per shard + docstore + finalize markers
    m = io.read("build_metrics").toPandas()
    assert set(m[m.stage == "shards"]["shard"]) == set(range(res.n_shards)) or len(
        m[m.stage == "shards"]
    ) == res.n_shards
    assert (m[m.stage == "shards"]["postings"] > 0).all()
    assert (m[m.stage == "shards"]["bytes"] > 0).all()


def test_kill_and_resume_equals_fresh(spark, raw_docs, tmp_path_factory):
    io_a = TableIO(spark, str(tmp_path_factory.mktemp("idx_a")))
    build_index(spark, raw_docs, io_a, CFG, run_id="fresh")

    io_b = TableIO(spark, str(tmp_path_factory.mktemp("idx_b")))
    with pytest.raises(RuntimeError, match="fault injection"):
        build_index(spark, raw_docs, io_b, CFG, run_id="crashed", fail_after_shards=2)
    res = build_index(spark, raw_docs, io_b, CFG, run_id="resumed")
    assert res.resumed_shards == 2
    assert res.built_shards == res.n_shards - 2

    for name, key in [
        ("docstore_raw", ["doc_id"]),
        ("survivors", ["doc_id"]),
        ("postings", ["term", "shard"]),
        ("doc_stats_packed", ["shard"]),
        ("term_stats", ["term"]),
    ]:
        a = _table_pdf(io_a, name, key)
        b = _table_pdf(io_b, name, key)
        pd.testing.assert_frame_equal(a, b, check_like=True), name

    # and the query results agree bit-for-bit
    pa, da, ia = load_index(io_a)
    pb, db, ib = load_index(io_b)
    qa = bm25_topk_compressed(pa, da, ia, queries_df(spark), CFG).toPandas()
    qb = bm25_topk_compressed(pb, db, ib, queries_df(spark), CFG).toPandas()
    pd.testing.assert_frame_equal(
        qa.sort_values(["query", "rank"]).reset_index(drop=True),
        qb.sort_values(["query", "rank"]).reset_index(drop=True),
    )


def test_noop_resume_rebuilds_nothing(spark, raw_docs, tmp_path_factory):
    io = TableIO(spark, str(tmp_path_factory.mktemp("idx_noop")))
    r1 = build_index(spark, raw_docs, io, CFG, run_id="one")
    r2 = build_index(spark, raw_docs, io, CFG, run_id="two")
    assert r2.built_shards == 0
    assert r2.resumed_shards == r1.n_shards


def test_read_docstore_verify_sha(spark, raw_docs, tmp_path_factory):
    """North-rule per-row invariant: read_docstore(verify_sha=True) is a
    no-op projection on a clean store, and fails the reading TASK (via a
    distributed raise_error, no collect) on the first corrupt row."""
    from pyspark.sql.utils import AnalysisException  # noqa: F401  (doc aid)

    from searchenginesimple_spark.plans.build import read_docstore

    io = TableIO(spark, str(tmp_path_factory.mktemp("idx_sha")))
    build_index(spark, raw_docs, io, CFG)

    clean = read_docstore(io).toPandas().sort_values("doc_id").reset_index(drop=True)
    checked = (
        read_docstore(io, verify_sha=True)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(clean, checked)

    # corrupt exactly one row's content in place (hash stamp left stale)
    store = io.read("docstore_raw")
    bad_id = store.select(F.min("doc_id")).first()[0]
    corrupted = store.withColumn(
        "content",
        F.when(F.col("doc_id") == bad_id, F.lit("tampered")).otherwise(F.col("content")),
    )
    corrupted.write.mode("overwrite").parquet(io.path("docstore_corrupt"))
    spark.read.parquet(io.path("docstore_corrupt")).write.mode("overwrite").parquet(
        io.path("docstore_raw")
    )

    with pytest.raises(Exception, match="sha256 mismatch"):
        read_docstore(io, verify_sha=True).select("doc_id", "content").collect()
    # without the flag the corruption sails through silently — the flag is
    # the contract, not the storage layer
    assert read_docstore(io).count() == len(clean)


def test_exists_probe_semantics(spark, tmp_path_factory):
    """fs-level exists(): False for absent, True for written tables; with
    committed=True a directory missing the _SUCCESS job-commit marker (the
    footprint of a build killed mid-write) does NOT count as present, so the
    fingerprint checkpoint re-runs instead of trusting partial files."""
    import os

    io = TableIO(spark, str(tmp_path_factory.mktemp("idx_exists")))
    assert not io.exists("t")
    spark.range(3).write.parquet(io.path("t"))
    assert io.exists("t")
    assert io.exists("t", committed=True)
    os.remove(io.path("t") + "/_SUCCESS")
    assert io.exists("t")
    assert not io.exists("t", committed=True)
