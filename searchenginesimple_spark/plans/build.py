"""Resumable, metered index build (north rule: per-partition checkpoint/resume
with lineage + build metrics).

Replaces the reference's single-process build (``src/page.cc`` →
``Page.hpp:262-381``) and the *intent* of its dead MapReduce module
(``src/MapReduce/coordinator.cc`` task re-queue / straggler logic, SURVEY.md
§3.4): Spark's DAG covers intra-run recovery; THIS layer covers cross-run
resume, which Spark does not give you.

Design — the checkpoint unit is the doc-range ``shard`` (the same salt the
posting shuffle uses):

  stage "docstore"   global: short-doc filter → deterministic doc_ids →
                     sha256 → simhash dedup → docstore parquet partitioned
                     by shard.  Global because doc_id assignment is a total
                     order; all-or-nothing checkpoint.
  stage "shards"     per-partition: for every shard NOT marked done in
                     build_metrics: tokenize that shard's docstore slice →
                     tf → compressed postings + doc_stats_packed, written
                     with dynamic partition overwrite (idempotent — a
                     half-written shard from a crash is replaced on resume).
                     Metrics row (docs/postings/bytes) appended AFTER the
                     data write = the commit point.
  stage "finalize"   derived globals: term_stats (df/idf from postings),
                     corpus (n_docs/avgdl from doc_stats_packed sidecars).
                     Cheap; recomputed idempotently.

Resume = rerun the same command: done shards are anti-joined away via the
metrics table (``status='done'``), everything else is recomputed.  Lineage
rows record input path, config and run ids.
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT, EngineConfig
from searchenginesimple_spark.operators.bm25 import IndexStats
from searchenginesimple_spark.operators.dedup import simhash_dedup
from searchenginesimple_spark.operators.postings import (
    build_doc_stats_packed,
    build_postings,
    shard_of,
)
from searchenginesimple_spark.sources.corpus import with_doc_ids
from searchenginesimple_spark.sources.io import TableIO

METRICS_SCHEMA = (
    "run_id string, stage string, shard int, docs long, postings long, "
    "bytes long, wall_ms long, status string, lineage string, ts double"
)


@dataclass
class BuildResult:
    run_id: str
    n_docs: int
    n_shards: int
    resumed_shards: int
    built_shards: int
    wall_ms: int


def _metrics(io: TableIO) -> DataFrame | None:
    return io.read("build_metrics") if io.exists("build_metrics") else None


def _done(io: TableIO, stage: str) -> set[int]:
    m = _metrics(io)
    if m is None:
        return set()
    rows = m.filter((F.col("stage") == stage) & (F.col("status") == "done")).select("shard").collect()
    return {r["shard"] for r in rows}


def _log_metrics(io: TableIO, rows: list[tuple]) -> None:
    io.append(io.spark.createDataFrame(rows, METRICS_SCHEMA), "build_metrics")


def prepare_docstore(
    docs_raw: DataFrame, cfg: EngineConfig = DEFAULT, text_col: str = "content"
) -> DataFrame:
    """(repo,path,commit,lang,content) → deduped docstore with doc_id/sha256/simhash/shard.

    Order of operations mirrors the reference reduce (Page.hpp:121-161):
    short-doc drop (137-146), then simhash near-dup dedup (127-133) — with
    doc_ids assigned first so the canonical min-id survivor rule is defined.
    """
    ided = with_doc_ids(docs_raw)
    kept = ided.filter(F.length(F.col(text_col)) >= cfg.min_content_len)
    deduped = simhash_dedup(kept, cfg, text_col)  # adds simhash, drops near-dups
    return deduped.withColumn("sha256", F.sha2(F.col(text_col), 256)).withColumn(
        "shard", shard_of(F.col("doc_id"), cfg)
    )


def build_index(
    spark: SparkSession,
    docs_raw: DataFrame,
    io: TableIO,
    cfg: EngineConfig = DEFAULT,
    run_id: str | None = None,
    use_pandas_udf: bool = True,
    fail_after_shards: int | None = None,
) -> BuildResult:
    """Run (or resume) the full index build.  ``fail_after_shards`` is a
    test-only fault injection: raise after N shard checkpoints commit."""
    from searchenginesimple_spark.operators.bm25 import tokens_of

    t0 = time.time()
    run_id = run_id or uuid.uuid4().hex[:12]
    lineage = json.dumps({"config": asdict(cfg), "input": "caller-supplied DataFrame"})

    # ---- stage: docstore (global) -----------------------------------------
    docstore_done = -1 in _done(io, "docstore")
    if not docstore_done:
        ds = prepare_docstore(docs_raw, cfg)
        io.overwrite_partitions(ds, "docstore", "shard")
        per_shard = (
            io.read("docstore")
            .groupBy("shard")
            .agg(F.count("*").alias("docs"), F.sum(F.length("content")).alias("bytes"))
            .collect()
        )
        wall = int((time.time() - t0) * 1000)
        _log_metrics(
            io,
            [
                (run_id, "docstore_shard", int(r["shard"]), int(r["docs"]), 0, int(r["bytes"]), wall, "done", lineage, time.time())
                for r in per_shard
            ]
            + [(run_id, "docstore", -1, sum(int(r["docs"]) for r in per_shard), 0, 0, wall, "done", lineage, time.time())],
        )

    docstore = io.read("docstore")
    all_shards = {r["shard"] for r in docstore.select("shard").distinct().collect()}

    # ---- stage: shards (per-partition checkpoint, batched) ----------------
    # All shards of one batch are built in a SINGLE Spark job (the per-shard
    # loop would serialize a 10^12-file build); the checkpoint commit point is
    # the metrics append after each batch, so a crash re-does at most one
    # batch and dynamic partition overwrite makes the redo idempotent.
    done = _done(io, "shards")
    todo = sorted(all_shards - done)
    built = 0
    bsz = max(1, cfg.checkpoint_batch_shards)
    for i in range(0, len(todo), bsz):
        if fail_after_shards is not None and built >= fail_after_shards:
            raise RuntimeError(f"fault injection: stopping after {built} shards")
        batch = todo[i : i + bsz]
        ts = time.time()
        slice_df = docstore.filter(F.col("shard").isin(batch)).select("doc_id", "content")
        tf = (
            tokens_of(slice_df, "content", use_pandas_udf)
            .groupBy("doc_id", "term")
            .agg(F.count("*").cast("int").alias("tf"))
        )
        doc_stats = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dlen"))
        postings = build_postings(tf, cfg)
        dsp = build_doc_stats_packed(doc_stats, cfg)
        io.overwrite_partitions(postings, "postings", "shard")
        io.overwrite_partitions(dsp, "doc_stats_packed", "shard")
        wall_batch = int((time.time() - ts) * 1000)
        pstats = {
            int(r["shard"]): r
            for r in io.read("postings")
            .filter(F.col("shard").isin(batch))
            .groupBy("shard")
            .agg(
                F.sum("df").alias("postings"),
                F.sum(F.length("ids") + F.length("tfs")).alias("bytes"),
            )
            .collect()
        }
        dcounts = {
            int(r["shard"]): int(r["docs"])
            for r in slice_df.join(docstore.select("doc_id", "shard"), "doc_id")
            .groupBy("shard")
            .agg(F.count("*").alias("docs"))
            .collect()
        }
        _log_metrics(
            io,
            [
                (
                    run_id, "shards", int(s), dcounts.get(int(s), 0),
                    int(pstats[int(s)]["postings"] or 0) if int(s) in pstats else 0,
                    int(pstats[int(s)]["bytes"] or 0) if int(s) in pstats else 0,
                    wall_batch, "done", lineage, time.time(),
                )
                for s in batch
            ],
        )
        built += len(batch)

    # ---- stage: finalize (derived globals, idempotent) --------------------
    postings = io.read("postings")
    dsp = io.read("doc_stats_packed")
    corpus_row = dsp.agg(
        F.sum("n").cast("long").alias("n_docs"),
        (F.sum("sum_dlen") / F.sum("n")).alias("avgdl"),
    )
    io.overwrite(corpus_row, "corpus")
    n_docs = io.read("corpus").collect()[0]["n_docs"]
    term_stats = (
        postings.groupBy("term")
        .agg(F.sum("df").cast("int").alias("df"))
        .withColumn(
            "idf",
            F.log((F.lit(int(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)),
        )
    )
    io.overwrite(term_stats, "term_stats")
    wall = int((time.time() - t0) * 1000)
    _log_metrics(io, [(run_id, "finalize", -1, int(n_docs), 0, 0, wall, "done", lineage, time.time())])

    return BuildResult(
        run_id=run_id,
        n_docs=int(n_docs),
        n_shards=len(all_shards),
        resumed_shards=len(done),
        built_shards=built,
        wall_ms=wall,
    )


def load_index(io: TableIO) -> tuple[DataFrame, DataFrame, IndexStats]:
    """→ (postings, doc_stats_packed, IndexStats for the query layer).

    IndexStats.tf is not materialized on disk (it is an intermediate); the
    dense scorer can rebuild it from docstore when needed — the compressed
    scorer (operators/wand.py) never needs it.
    """
    postings = io.read("postings")
    dsp = io.read("doc_stats_packed")
    term_stats = io.read("term_stats")
    corpus = io.read("corpus")
    idx = IndexStats(tf=None, doc_stats=None, term_stats=term_stats, corpus=corpus)
    return postings, dsp, idx
