"""Posting-run merge + incremental index build (north rule: "posting-list
construction, MERGE, compression"; plans/merge.py, operators/merge.py)."""

from __future__ import annotations

import dataclasses

import pandas as pd
import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT
from searchenginesimple_spark.operators.dedup import simhash_dup_pairs
from searchenginesimple_spark.operators.merge import (
    decode_postings,
    merge_doc_stats_packed,
    merge_postings,
)
from searchenginesimple_spark.operators.postings import (
    build_doc_stats_packed,
    build_postings,
)
from searchenginesimple_spark.plans.build import build_index, load_index
from searchenginesimple_spark.plans.merge import build_index_incremental
from searchenginesimple_spark.sources.io import TableIO

CFG = dataclasses.replace(
    DEFAULT, shard_span=32, block_size=16, shuffle_partitions=8,
    checkpoint_batch_shards=2,
)


# ---------------------------------------------------------------- run merge

def _tf_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, term string, tf int")


def test_merge_postings_equals_union(spark):
    """Split a tf set by doc_id, build postings per half, merge → the decode
    equals the postings built over the union (overlapping (term, shard)
    groups re-encode; one-sided groups pass through)."""
    rows = [(d, t, (d + len(t)) % 5 + 1)
            for d in range(100)
            for t in ("alpha", "beta", f"rare_{d % 7}")]
    lo = _tf_df(spark, [r for r in rows if r[0] < 60])
    hi = _tf_df(spark, [r for r in rows if r[0] >= 60])
    merged = merge_postings(build_postings(lo, CFG), build_postings(hi, CFG), CFG)
    got = decode_postings(merged).toPandas().sort_values(
        ["term", "doc_id"]).reset_index(drop=True)
    want = decode_postings(build_postings(_tf_df(spark, rows), CFG)).toPandas(
    ).sort_values(["term", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # block metadata must also match the from-scratch build bit-for-bit
    cols = ["term", "shard", "df", "ids", "tfs"]
    a = merged.select(*cols).toPandas().sort_values(["term", "shard"]).reset_index(drop=True)
    b = build_postings(_tf_df(spark, rows), CFG).select(*cols).toPandas(
    ).sort_values(["term", "shard"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_merge_postings_interleaved_ids(spark):
    """Sides whose doc_ids interleave within a shard still merge correctly
    (the stable re-sort path)."""
    rows = [(d, "tok", 1) for d in range(40)]
    even = _tf_df(spark, [r for r in rows if r[0] % 2 == 0])
    odd = _tf_df(spark, [r for r in rows if r[0] % 2 == 1])
    merged = merge_postings(build_postings(even, CFG), build_postings(odd, CFG), CFG)
    got = decode_postings(merged).toPandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == list(range(40))
    assert (got["tf"] == 1).all()


def test_merge_postings_duplicate_doc_id_raises(spark):
    both = _tf_df(spark, [(1, "tok", 2), (2, "tok", 1)])
    p = build_postings(both, CFG)
    with pytest.raises(Exception, match="disjoint"):
        merge_postings(p, p, CFG).collect()


def test_merge_doc_stats_packed(spark):
    lo = spark.createDataFrame([(d, d + 3) for d in range(50)], "doc_id long, dlen long")
    hi = spark.createDataFrame([(d, d + 3) for d in range(50, 80)], "doc_id long, dlen long")
    merged = merge_doc_stats_packed(
        build_doc_stats_packed(lo, CFG), build_doc_stats_packed(hi, CFG), CFG
    )
    want = build_doc_stats_packed(lo.union(hi), CFG)
    cols = ["shard", "n", "sum_dlen", "ids", "dlens"]
    a = merged.select(*cols).toPandas().sort_values("shard").reset_index(drop=True)
    b = want.select(*cols).toPandas().sort_values("shard").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_dup_pairs_right_side_restriction(spark):
    """right= restricts the droppable side: base-vs-base pairs never emerge."""
    fp = spark.createDataFrame(
        [(0, 7), (1, 7), (10, 7), (11, 1 << 40)], "doc_id long, simhash long"
    )
    base = fp.filter(F.col("doc_id") < 10)
    delta = fp.filter(F.col("doc_id") >= 10)
    pairs = simhash_dup_pairs(base.union(delta), DEFAULT, right=delta).toPandas()
    got = set(map(tuple, pairs[["a_id", "b_id"]].values.tolist()))
    # 0-1 (base-base) excluded; 10 is droppable vs both base docs
    assert got == {(0, 10), (1, 10)}


# ------------------------------------------------------- incremental build

def _doc(i: int, content: str) -> tuple:
    return (f"repo_{i % 4}", f"src/f{i}.py", f"c{i:04d}", "py", content)


def _content(i: int) -> str:
    toks = " ".join(f"ident_{i}_{j} shared_{j % 3}" for j in range(12))
    return f"def func_{i}(arg):\n    return {toks}\n"


_SCHEMA = "repo string, path string, commit string, lang string, content string"


@pytest.fixture(scope="module")
def inc_corpora(spark):
    base_rows = [_doc(i, _content(i)) for i in range(120)]
    delta_rows = (
        [_doc(i, _content(i)) for i in range(200, 260)]           # new docs
        + [_doc(i + 500, _content(i)) for i in (3, 40, 77)]       # exact dups of base
        + [_doc(900, _content(222)), _doc(901, _content(222))]    # exact dup pair inside delta
    )
    base = spark.createDataFrame(base_rows, _SCHEMA).cache()
    delta = spark.createDataFrame(delta_rows, _SCHEMA).cache()
    return base, delta


def _index_state(spark, io: TableIO):
    """Index state keyed by content sha (doc_ids differ across build paths)."""
    sha_of = io.read("docstore_raw").select("doc_id", "sha256")
    surv_sha = (
        io.read("survivors").join(sha_of, "doc_id").select("sha256")
        .toPandas()["sha256"].sort_values().tolist()
    )
    tstats = io.read("term_stats").select("term", "df").toPandas().sort_values(
        "term").reset_index(drop=True)
    corpus = io.read("corpus").toPandas().iloc[0]
    post = (
        decode_postings(io.read("postings"))
        .join(sha_of, "doc_id")
        .select("term", "sha256", "tf")
        .toPandas()
        .sort_values(["term", "sha256"])
        .reset_index(drop=True)
    )
    return surv_sha, tstats, corpus, post


def test_incremental_equals_full_rebuild(spark, inc_corpora, tmp_path_factory):
    """build(A) + increment(B) ≡ build(A ∪ B) on every content-keyed surface
    (survivor sha set, per-term df, corpus scalars, decoded postings, BM25
    scores).  The corpora's dups are EXACT (content-identical) — the one dup
    class whose fingerprints are weight-independent, so full and incremental
    dedup provably agree (plans/merge.py module docstring)."""
    base, delta = inc_corpora
    io_full = TableIO(spark, str(tmp_path_factory.mktemp("m_full")))
    build_index(spark, base.union(delta), io_full, CFG)

    io_inc = TableIO(spark, str(tmp_path_factory.mktemp("m_inc")))
    build_index(spark, base, io_inc, CFG)
    res = build_index_incremental(spark, delta, io_inc, CFG)
    assert res.n_shards > 0 and res.built_shards == res.n_shards

    s_f, t_f, c_f, p_f = _index_state(spark, io_full)
    s_i, t_i, c_i, p_i = _index_state(spark, io_inc)
    assert s_f == s_i                      # survivor content set
    pd.testing.assert_frame_equal(t_f, t_i)  # per-term df
    assert int(c_f["n_docs"]) == int(c_i["n_docs"])
    assert c_f["avgdl"] == pytest.approx(c_i["avgdl"])
    pd.testing.assert_frame_equal(p_f, p_i)  # postings content

    # BM25 over both indexes: same (query, score, sha) multiset.  top_k is
    # raised past the match counts: doc_ids differ across the two build
    # paths, so a score TIE at the k-boundary would legitimately pick
    # different docs — with every match returned the comparison is
    # boundary-free and must agree exactly.
    from searchenginesimple_spark.operators.wand import bm25_topk_compressed
    from searchenginesimple_spark.sources.corpus import queries_df

    cfg_allk = dataclasses.replace(CFG, top_k=1000)
    q = queries_df(spark, ["shared_0", "ident_3_2", "func_222"])
    out = {}
    for tag, io in [("full", io_full), ("inc", io_inc)]:
        postings, dsp, idx = load_index(io)
        r = bm25_topk_compressed(postings, dsp, idx, q, cfg_allk)
        sha_of = io.read("docstore_raw").select(
            F.col("doc_id").alias("docID"), "sha256")
        out[tag] = (
            r.join(sha_of, "docID")
            .select("query", "score", "sha256")
            .toPandas()
            .sort_values(["query", "score", "sha256"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(out["full"], out["inc"])


def test_incremental_is_partition_append(spark, inc_corpora, tmp_path_factory):
    """Base postings partitions are byte-identical after the increment —
    the merge writes only fresh shards (LSM property)."""
    base, delta = inc_corpora
    io = TableIO(spark, str(tmp_path_factory.mktemp("m_app")))
    build_index(spark, base, io, CFG)
    before = io.read("postings").toPandas()
    base_shards = set(before["shard"])
    build_index_incremental(spark, delta, io, CFG)
    after = io.read("postings").toPandas()
    new_shards = set(after["shard"]) - base_shards
    assert new_shards and min(new_shards) > max(base_shards)
    a = before.sort_values(["term", "shard"]).reset_index(drop=True)
    b = after[after["shard"].isin(base_shards)].sort_values(
        ["term", "shard"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_incremental_resume_after_crash(spark, inc_corpora, tmp_path_factory):
    base, delta = inc_corpora
    io_a = TableIO(spark, str(tmp_path_factory.mktemp("m_ra")))
    build_index(spark, base, io_a, CFG)
    build_index_incremental(spark, delta, io_a, CFG)

    io_b = TableIO(spark, str(tmp_path_factory.mktemp("m_rb")))
    build_index(spark, base, io_b, CFG)
    with pytest.raises(RuntimeError, match="fault injection"):
        build_index_incremental(spark, delta, io_b, CFG, fail_after_shards=1)
    res = build_index_incremental(spark, delta, io_b, CFG)
    # fault fired after the first BATCH (checkpoint_batch_shards=2) committed
    assert res.resumed_shards == 2
    assert res.built_shards == res.n_shards - 2

    for a, b in zip(_index_state(spark, io_a), _index_state(spark, io_b)):
        if isinstance(a, pd.DataFrame):
            pd.testing.assert_frame_equal(a, b)
        elif isinstance(a, pd.Series):
            assert int(a["n_docs"]) == int(b["n_docs"])
            assert a["avgdl"] == pytest.approx(b["avgdl"])
        else:
            assert a == b


def test_incremental_all_dup_delta_is_noop(spark, inc_corpora, tmp_path_factory):
    base, _ = inc_corpora
    io = TableIO(spark, str(tmp_path_factory.mktemp("m_nop")))
    r0 = build_index(spark, base, io, CFG)
    dup_delta = spark.createDataFrame(
        [_doc(700 + k, _content(k)) for k in range(5)], _SCHEMA
    )
    res = build_index_incremental(spark, dup_delta, io, CFG)
    assert res.n_shards == 0 and res.built_shards == 0
    assert res.n_docs == r0.n_docs


def test_incremental_requires_base(spark, inc_corpora, tmp_path_factory):
    _, delta = inc_corpora
    io = TableIO(spark, str(tmp_path_factory.mktemp("m_nobase")))
    with pytest.raises(ValueError, match="no finalized base"):
        build_index_incremental(spark, delta, io, CFG)
