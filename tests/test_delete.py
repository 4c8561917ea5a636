"""Deletes + compaction (plans/delete.py).

Contract: tombstoned docs vanish from every query path immediately (dense,
compressed distributed, driver fastpath, serving engine — AND and OR
modes) with top-k backfilling from live docs; compaction removes the ids
from the decoded postings, re-finalizes term_stats/corpus, rewrites only
affected shard partitions, clears the tombstones, and (with purge) drops
the content bytes; query results with tombstones == query results after
compaction == dense scoring over the surviving tf rows.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT
from searchenginesimple_spark.functions.codec import varbyte_decode
from searchenginesimple_spark.operators.bm25 import IndexStats, bm25_topk
from searchenginesimple_spark.operators.wand import (
    Bm25QueryEngine,
    bm25_topk_compressed,
)
from searchenginesimple_spark.plans.build import build_index, load_index
from searchenginesimple_spark.plans.delete import (
    compact_index,
    delete_docs,
    load_tombstones,
)
from searchenginesimple_spark.sources.corpus import docs_df, queries_df
from searchenginesimple_spark.sources.io import TableIO

CFG = dataclasses.replace(
    DEFAULT, shard_span=32, block_size=16, shuffle_partitions=8,
    checkpoint_batch_shards=4,
)
N_DOCS = 260


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    io = TableIO(spark, str(tmp_path_factory.mktemp("idx_del")))
    build_index(spark, docs_df(spark, N_DOCS), io, CFG)
    return io


def _dense_idx(io: TableIO) -> IndexStats:
    # the raw tf table includes dedup-dropped docs; the built postings do
    # not — restrict to survivors so the dense oracle scores the same corpus
    tf = io.read("tf").join(
        io.read("survivors").select("doc_id"), "doc_id", "left_semi"
    )
    doc_stats = tf.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("dlen")
    )
    return IndexStats(
        tf=tf, doc_stats=doc_stats,
        term_stats=io.read("term_stats"), corpus=io.read("corpus"),
    )


def _res(df):
    return sorted(map(tuple, df.select("query", "rank", "docID", "score").collect()))


def _top_docs(io, spark, mode="and", tomb=None, **kw):
    postings, dsp, idx = load_index(io)
    return _res(
        bm25_topk_compressed(
            postings, dsp, idx, queries_df(spark), CFG, mode=mode,
            tombstones=tomb, **kw,
        )
    )


def _first_hits(io, spark):
    """(query strings, their current top docIDs) for the default query set."""
    base = _top_docs(io, spark)
    return {r[0]: r[2] for r in base if r[1] == 1}


def test_tombstones_filter_every_path(spark, built):
    io = built
    # delete each query's current rank-1 doc -> forces visible backfill
    victims = sorted(set(_first_hits(io, spark).values()))
    tomb_df = spark.createDataFrame([(d,) for d in victims], "doc_id long")

    postings, dsp, idx = load_index(io)
    dense = _dense_idx(io)
    for mode in ("and", "or"):
        want = _res(
            bm25_topk(dense, queries_df(spark), CFG, use_pandas_udf=False,
                      mode=mode, tombstones=tomb_df)
        )
        assert want, mode
        assert not {r[2] for r in want} & set(victims)
        # distributed kernel path
        got_dist = _top_docs(io, spark, mode=mode, tomb=tomb_df,
                             fastpath_max_bytes=None)
        assert got_dist == want, mode
        # driver fastpath (same kernel, collected)
        got_fast = _top_docs(io, spark, mode=mode, tomb=tomb_df,
                             fastpath_max_bytes=256 * 1024 * 1024)
        assert got_fast == want, mode
        # serving engine
        eng = Bm25QueryEngine(postings, dsp, idx, CFG, mode=mode,
                              tombstones=tomb_df)
        qs = [r["query"] for r in queries_df(spark).collect()]
        got_eng = sorted(
            map(tuple, eng.query(qs)[["query", "rank", "docID", "score"]]
                .itertuples(index=False))
        )
        assert got_eng == want, mode
        # a fresh engine without tombstones still sees the victims
        eng2 = Bm25QueryEngine(postings, dsp, idx, CFG, mode=mode)
        assert {t[2] for t in map(tuple, eng2.query(qs)[
            ["query", "rank", "docID", "score"]].itertuples(index=False))
        } & set(victims)
        # refresh_tombstones flips visibility on the live engine
        eng2.refresh_tombstones(tomb_df)
        got_refresh = sorted(
            map(tuple, eng2.query(qs)[["query", "rank", "docID", "score"]]
                .itertuples(index=False))
        )
        assert got_refresh == want, mode


def test_compact_rewrites_only_affected_and_matches_tombstoned(
    spark, tmp_path_factory
):
    io = TableIO(spark, str(tmp_path_factory.mktemp("idx_cmp")))
    build_index(spark, docs_df(spark, N_DOCS), io, CFG)
    victims = sorted(set(_first_hits(io, spark).values()))[:3]
    n_before = io.read("corpus").collect()[0]["n_docs"]

    delete_docs(io, victims)
    tomb = load_tombstones(io)
    assert sorted(r["doc_id"] for r in tomb.collect()) == victims
    with_tomb = {
        m: _top_docs(io, spark, mode=m, tomb=tomb) for m in ("and", "or")
    }

    res = compact_index(spark, io, CFG)
    assert res.n_deleted == len(victims)
    assert res.affected_shards == sorted({d // CFG.shard_span for d in victims})
    assert res.n_docs == n_before - len(victims)

    # tombstones cleared; survivors/corpus shrunk
    assert load_tombstones(io).count() == 0
    assert io.read("corpus").collect()[0]["n_docs"] == res.n_docs
    assert io.read("survivors").filter(F.col("doc_id").isin(victims)).count() == 0

    # no victim id survives in any decoded posting or doc-stats run
    aff = res.affected_shards
    for r in io.read("postings").filter(F.col("shard").isin(aff)).collect():
        ids = np.cumsum(varbyte_decode(r["ids"]))
        assert not set(ids.tolist()) & set(victims)
    for r in io.read("doc_stats_packed").filter(F.col("shard").isin(aff)).collect():
        ids = np.cumsum(varbyte_decode(r["ids"]))
        assert not set(ids.tolist()) & set(victims)

    # term_stats df equals a recompute from the compacted postings
    df_re = {
        r["term"]: r["df"]
        for r in io.read("postings").groupBy("term")
        .agg(F.sum("df").cast("int").alias("df")).collect()
    }
    assert {
        r["term"]: r["df"] for r in io.read("term_stats").collect()
    } == df_re

    # post-compaction compressed results == the dense oracle over the
    # compacted index, and no victim anywhere.  (Pre/post rank lists are
    # NOT compared verbatim: n_docs changed, so every idf rescales —
    # rounded near-ties can flip — and a term whose last doc died becomes
    # OOV only at compaction, legitimately widening conjunctive queries
    # that contained it: the df-until-merge semantics in plans/delete.py.)
    for m in ("and", "or"):
        after = _top_docs(io, spark, mode=m)
        dense_after = _res(
            bm25_topk(_dense_idx(io), queries_df(spark), CFG,
                      use_pandas_udf=False, mode=m)
        )
        assert after == dense_after, m
        assert not {r[2] for r in after} & set(victims)
        assert not {r[2] for r in with_tomb[m]} & set(victims)


def test_compact_purges_content_and_empties_shards(spark, tmp_path_factory):
    io = TableIO(spark, str(tmp_path_factory.mktemp("idx_purge")))
    build_index(spark, docs_df(spark, N_DOCS), io, CFG)

    # kill shard 0 wholesale (every surviving doc_id in [0, 32)) plus one
    # doc from another shard
    s0 = [
        int(r["doc_id"])
        for r in io.read("survivors").filter(F.col("shard") == 0).collect()
    ]
    assert s0
    other = int(
        io.read("survivors").filter(F.col("shard") == 2).limit(1)
        .collect()[0]["doc_id"]
    )
    delete_docs(io, s0 + [other])
    res = compact_index(spark, io, CFG, purge_content=True)
    assert 0 in res.emptied_shards

    # emptied partitions are GONE, not stale
    assert io.read("postings").filter(F.col("shard") == 0).count() == 0
    assert io.read("doc_stats_packed").filter(F.col("shard") == 0).count() == 0
    # purge removed the bytes from the docstore and the tf table
    gone = s0 + [other]
    assert io.read("docstore_raw").filter(F.col("doc_id").isin(gone)).count() == 0
    assert io.read("tf").filter(F.col("doc_id").isin(gone)).count() == 0
    # the index still answers queries from the remaining shards
    assert _top_docs(io, spark)


def test_compact_noop_and_idempotent_repeat(spark, tmp_path_factory):
    io = TableIO(spark, str(tmp_path_factory.mktemp("idx_noop")))
    build_index(spark, docs_df(spark, 80), io, CFG)
    res = compact_index(spark, io, CFG)
    assert res.n_deleted == 0 and res.affected_shards == []

    victims = [int(io.read("survivors").limit(1).collect()[0]["doc_id"])]
    delete_docs(io, victims)
    delete_docs(io, victims)  # repeated delete is idempotent via dedup
    assert load_tombstones(io).count() == 1
    r1 = compact_index(spark, io, CFG)
    assert r1.n_deleted == 1
    base = _top_docs(io, spark)
    # re-compact with nothing pending: byte-stable results
    r2 = compact_index(spark, io, CFG)
    assert r2.n_deleted == 0
    assert _top_docs(io, spark) == base


def test_compact_crash_resume_equals_clean(spark, tmp_path_factory):
    """A compact that dies mid-shard-rebuild redoes itself in full on retry
    (tombstones clear LAST), landing on bytes identical to a never-crashed
    compact of a twin index."""
    import pandas as pd

    def _table(io, name, key):
        df = io.read(name).toPandas()
        for c in df.columns:
            if df[c].dtype == object and df[c].map(
                lambda x: isinstance(x, (bytes, bytearray))
            ).any():
                df[c] = df[c].map(
                    lambda b: b.hex() if isinstance(b, (bytes, bytearray)) else b
                )
            elif df[c].dtype == object and df[c].map(
                lambda x: isinstance(x, list)
            ).any():
                df[c] = df[c].map(lambda x: tuple(x) if isinstance(x, list) else x)
        return df.sort_values(key).reset_index(drop=True)

    cfg = dataclasses.replace(CFG, checkpoint_batch_shards=1)
    ios = []
    for tag in ("clean", "crash"):
        io = TableIO(spark, str(tmp_path_factory.mktemp(f"idx_{tag}")))
        build_index(spark, docs_df(spark, N_DOCS), io, cfg, run_id="base")
        # victims spread over >= 2 shards so batch-1 fault injection bites
        victims = sorted(
            int(r["doc_id"])
            for r in io.read("survivors")
            .filter(F.col("shard").isin([0, 3]))
            .groupBy("shard")
            .agg(F.min("doc_id").alias("doc_id"))
            .collect()
        )
        delete_docs(io, victims)
        ios.append((io, victims))

    io_clean, v1 = ios[0]
    io_crash, v2 = ios[1]
    assert v1 == v2
    compact_index(spark, io_clean, cfg, run_id="c1")
    with pytest.raises(RuntimeError, match="fault injection"):
        compact_index(spark, io_crash, cfg, run_id="c2", fail_after_shards=1)
    # tombstones survive the crash -> retry redoes the whole fold
    assert load_tombstones(io_crash).count() == len(v2)
    compact_index(spark, io_crash, cfg, run_id="c3")
    assert load_tombstones(io_crash).count() == 0

    for name, key in [
        ("postings", ["term", "shard"]),
        ("doc_stats_packed", ["shard"]),
        ("survivors", ["doc_id"]),
        ("term_stats", ["term"]),
        ("corpus", ["n_docs"]),
    ]:
        a, b = _table(io_clean, name, key), _table(io_crash, name, key)
        pd.testing.assert_frame_equal(a, b), name


def test_compact_after_incremental_merge(spark, tmp_path_factory):
    """Deletes spanning base AND delta generations compact correctly: the
    shard machinery and finalize are generation-agnostic (one postings
    table, doc-range shards), so compacting a grown index removes ids from
    whichever generation's shards they live in and leaves results equal to
    the dense oracle over the survivors."""
    from searchenginesimple_spark.plans.merge import build_index_incremental

    all_docs = docs_df(spark, 200)
    base = all_docs.filter(F.col("path").substr(-4, 1) != "7")
    delta = all_docs.subtract(base)
    io = TableIO(spark, str(tmp_path_factory.mktemp("idx_gen")))
    build_index(spark, base, io, CFG)
    build_index_incremental(spark, delta, io, CFG)

    surv = io.read("survivors")
    lo = int(surv.agg(F.min("doc_id")).collect()[0][0])
    hi = int(surv.agg(F.max("doc_id")).collect()[0][0])
    assert hi // CFG.shard_span > lo // CFG.shard_span  # really two generations
    victims = [lo, hi]  # one doc from the base range, one from the delta
    n_before = io.read("corpus").collect()[0]["n_docs"]

    delete_docs(io, victims)
    res = compact_index(spark, io, CFG)
    assert res.n_deleted == 2
    assert res.n_docs == n_before - 2
    assert io.read("survivors").filter(F.col("doc_id").isin(victims)).count() == 0

    for m in ("and", "or"):
        after = _top_docs(io, spark, mode=m)
        dense_after = _res(
            bm25_topk(_dense_idx(io), queries_df(spark), CFG,
                      use_pandas_udf=False, mode=m)
        )
        assert after == dense_after, m
        assert not {r[2] for r in after} & set(victims)


def test_compact_preserves_concurrent_tombstones(spark, tmp_path_factory):
    """Ids tombstoned between a compact's snapshot and its finish must stay
    pending (the clear removes ONLY the snapshotted set)."""
    io = TableIO(spark, str(tmp_path_factory.mktemp("idx_conc")))
    build_index(spark, docs_df(spark, 120), io, CFG)
    ids = sorted(
        int(r["doc_id"]) for r in io.read("survivors").limit(3).collect()
    )
    delete_docs(io, ids[:1])
    # simulate a delete landing mid-compact: append directly after the
    # snapshot would normally happen — easiest faithful simulation is to
    # append BOTH, snapshot manually, then verify the clear semantics via
    # two sequential compacts
    delete_docs(io, ids[1:])
    res1 = compact_index(spark, io, CFG)
    assert res1.n_deleted == 3 and load_tombstones(io).count() == 0
    # late delete after the fold: stays pending until its own compact
    delete_docs(io, [ids[0]])  # re-deleting a gone id is harmless
    assert load_tombstones(io).count() == 1
    res2 = compact_index(spark, io, CFG)
    assert res2.n_deleted == 1
    assert load_tombstones(io).count() == 0


def test_compact_everything_leaves_readable_empty_index(spark, tmp_path_factory):
    io = TableIO(spark, str(tmp_path_factory.mktemp("idx_all")))
    build_index(spark, docs_df(spark, 80), io, CFG)
    all_ids = [int(r["doc_id"]) for r in io.read("survivors").collect()]
    delete_docs(io, all_ids)
    res = compact_index(spark, io, CFG, purge_content=True)
    assert res.n_deleted == len(all_ids) and res.n_docs == 0
    assert load_tombstones(io).count() == 0
    # every table reads back as a schema-correct EMPTY table
    postings, dsp, idx = load_index(io)
    assert postings.count() == 0 and dsp.count() == 0
    assert idx.term_stats.count() == 0
    assert io.read("corpus").collect()[0]["n_docs"] == 0
    assert io.read("survivors").count() == 0
    assert io.read("docstore_raw").count() == 0 and io.read("tf").count() == 0
    # queries return empty, not an error
    assert _top_docs(io, spark) == []


def test_merge_into_fully_emptied_index(spark, tmp_path_factory):
    """After delete-everything + compact, the empty index must accept an
    incremental merge: the sentinel partitions keep the table layout
    consistent with dynamic-partition appends (a root-level empty file
    would make the merged table unreadable)."""
    from searchenginesimple_spark.plans.merge import build_index_incremental

    all_docs = docs_df(spark, 120)
    base = all_docs.limit(60)
    io = TableIO(spark, str(tmp_path_factory.mktemp("idx_refill")))
    build_index(spark, base, io, CFG)
    delete_docs(io, [int(r["doc_id"]) for r in io.read("survivors").collect()])
    res = compact_index(spark, io, CFG, purge_content=True)
    assert res.n_docs == 0

    delta = all_docs.subtract(base)
    inc = build_index_incremental(spark, delta, io, CFG)
    assert inc.n_docs > 0
    # every table reads back post-merge and queries answer from the delta
    postings, dsp, idx = load_index(io)
    assert postings.count() > 0 and dsp.count() > 0
    assert io.read("survivors").count() == inc.n_docs
    assert _top_docs(io, spark)


def test_mass_delete_guard_never_collects_to_driver(spark, built, monkeypatch):
    """A 10^6-id takedown (verdict r3 finding #1): past
    cfg.tombstone_fastpath_max no query path collects the deleted set to
    the driver — the kernel fastpath and serving engine route to the
    distributed _del_by_shard_df join, the dense scorer drops its broadcast
    hint — and results still match the small-set paths exactly."""
    import searchenginesimple_spark.operators.wand as wand_mod
    from searchenginesimple_spark.operators.wand import (
        DEL_TOO_BIG,
        _collect_del_by_shard,
    )

    io = built
    victims = sorted(set(_first_hits(io, spark).values()))
    # 10^6 synthetic ids OUTSIDE the corpus range plus the real victims:
    # result sets must equal the victims-only tombstoning
    tomb_small = spark.createDataFrame([(d,) for d in victims], "doc_id long")
    tomb_big = (
        spark.range(1_000_000)
        .select((F.col("id") + 1_000_000).alias("doc_id"))
        .unionAll(tomb_small)
    )

    # the guard itself: over-cap set is detected, not collected
    assert _collect_del_by_shard(tomb_big, CFG) is DEL_TOO_BIG
    assert _collect_del_by_shard(tomb_small, CFG) is not DEL_TOO_BIG

    # any driver-side materialization of the big set now fails the test
    real_collect = wand_mod._collect_del_by_shard

    def guarded(tombstones, cfg):
        out = real_collect(tombstones, cfg)
        assert out is None or out is DEL_TOO_BIG or sum(
            len(v) for v in out.values()
        ) <= cfg.tombstone_fastpath_max
        return out

    monkeypatch.setattr(wand_mod, "_collect_del_by_shard", guarded)

    postings, dsp, idx = load_index(io)
    dense = _dense_idx(io)
    qs = [r["query"] for r in queries_df(spark).collect()]
    for mode in ("and", "or"):
        want = _res(
            bm25_topk(dense, queries_df(spark), CFG, use_pandas_udf=False,
                      mode=mode, tombstones=tomb_small)
        )
        assert want and not {r[2] for r in want} & set(victims)
        # dense with the huge set (non-broadcast anti-join)
        got_dense = _res(
            bm25_topk(dense, queries_df(spark), CFG, use_pandas_udf=False,
                      mode=mode, tombstones=tomb_big)
        )
        assert got_dense == want, mode
        # compressed path: fastpath REQUESTED but guard must route distributed
        got = _top_docs(io, spark, mode=mode, tomb=tomb_big,
                        fastpath_max_bytes=256 * 1024 * 1024)
        assert got == want, mode
        # serving engine: construction must not collect; queries fall back
        eng = Bm25QueryEngine(postings, dsp, idx, CFG, mode=mode,
                              tombstones=tomb_big)
        assert eng._del_too_big and eng._del_by_shard is None
        got_eng = sorted(
            map(tuple, eng.query(qs)[["query", "rank", "docID", "score"]]
                .itertuples(index=False))
        )
        assert got_eng == want, mode
        # refresh back to a small set re-enables the fastpath dict
        eng.refresh_tombstones(tomb_small)
        assert not eng._del_too_big and eng._del_by_shard is not None


def test_mass_delete_docs_appends_distributed(spark, tmp_path_factory):
    """delete_docs with an over-cap DataFrame appends via a Spark write
    (no driver collect) and needs_compaction() trips; compact_index folds
    the distributed set without collecting the ids."""
    import dataclasses as dc

    from searchenginesimple_spark.plans.delete import needs_compaction

    cfg = dc.replace(CFG, tombstone_fastpath_max=200)
    io = TableIO(spark, str(tmp_path_factory.mktemp("idx_massdel")))
    build_index(spark, docs_df(spark, N_DOCS), io, cfg)
    n_before = io.read("survivors").count()

    # 1000 ids (> cap): every 3rd survivor plus out-of-corpus ids
    surv = io.read("survivors").select("doc_id")
    in_corpus = surv.filter(F.col("doc_id") % 3 == 0)
    n_in = in_corpus.count()
    ids_df = in_corpus.unionAll(
        spark.range(1000 - n_in).select((F.col("id") + 10_000).alias("doc_id"))
    )
    n = delete_docs(io, ids_df, cfg)
    assert n == 1000
    assert needs_compaction(io, cfg)
    stored = {r["doc_id"] for r in io.read("tombstones").collect()}
    assert stored == {r["doc_id"] for r in ids_df.collect()}

    res = compact_index(spark, io, cfg)
    assert res.n_deleted == 1000
    assert io.read("survivors").count() == n_before - n_in
    assert not needs_compaction(io, cfg)
    assert io.read("tombstones").count() == 0

    # janitor loop closed: with the set folded in, a fresh serving engine
    # runs in fastpath mode again (per-shard dict, no distributed join)
    postings, dsp, idx = load_index(io)
    eng = Bm25QueryEngine(
        postings, dsp, idx, cfg, tombstones=load_tombstones(io)
    )
    assert not eng._del_too_big


def test_load_tombstones_survives_concurrent_clear(spark, tmp_path_factory):
    """The compact/reader race (plans/delete.py clear-LAST commit): a
    reader that listed the tombstones directory BEFORE the clear must not
    die with FileNotFoundException when snapshotted part files vanish
    mid-evaluation.  load_tombstones reads with ignoreMissingFiles —
    skipping a vanished file is exact, not lossy: it only vanishes because
    the compact that folded its ids into the index committed."""
    import glob
    import os

    io = TableIO(spark, str(tmp_path_factory.mktemp("tomb_race")))
    delete_docs(io, [1, 2, 3])
    delete_docs(io, [4, 5])  # second append → second part file
    t = load_tombstones(io)  # directory listing happens at read/plan time
    assert t is not None
    files = sorted(glob.glob(io.path("tombstones") + "/part-*.parquet"))
    assert len(files) >= 2
    # simulate the compact commit racing this reader: one listed part gone
    os.remove(files[0])
    got = {r["doc_id"] for r in t.collect()}  # must not raise
    # the vanished file's ids are already folded in; the rest must remain
    assert got in ({1, 2, 3}, {4, 5})
