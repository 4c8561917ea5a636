"""Resumable, metered index build (north rule: per-partition checkpoint/resume
with lineage + build metrics).

Replaces the reference's single-process build (``src/page.cc`` →
``Page.hpp:262-381``) and the *intent* of its dead MapReduce module
(``src/MapReduce/coordinator.cc`` task re-queue / straggler logic, SURVEY.md
§3.4): Spark's DAG covers intra-run recovery; THIS layer covers cross-run
resume, which Spark does not give you.

Stage graph (checkpoint unit = the doc-range ``shard``, the same salt the
posting shuffle uses):

  stage "tf"        stage the corpus once (docstore_raw: + doc_id, sha256,
                    shard — the ONLY full-content write) and tokenize ONCE
                    (Arrow pandas UDF) → tf(doc_id, term, tf) parquet
                    partitioned by shard.  tf feeds BOTH the tf·idf simhash
                    fingerprints and the posting lists; resume never
                    re-tokenizes a committed shard.
  stage "dedup"     fingerprints from tf → Hamming-band dedup → small
                    ``survivors(doc_id, simhash, shard)`` table.  Global
                    (corpus-wide df), all-or-nothing, no content rewrite.
  stage "shards"    per-partition: for every shard not marked done: tf slice
                    (partition-pruned read) semi-joined to surviving doc_ids
                    → compressed postings + doc_stats_packed, dynamic
                    partition overwrite (idempotent).  Metrics row appended
                    AFTER the write = the commit point.
  stage "finalize"  derived globals: term_stats (df/idf from postings),
                    corpus (n_docs/avgdl from sidecars).  Idempotent.

Resume = rerun the same command: done shards are skipped via the metrics
table (``status='done'``); a half-written shard from a crash is replaced by
the dynamic partition overwrite.  Lineage rows record config + run ids.
"""

from __future__ import annotations

import json
import time
import uuid
from contextlib import contextmanager
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT, EngineConfig
from searchenginesimple_spark.operators.bm25 import (
    IndexStats,
    tf_mapside,
)
from searchenginesimple_spark.operators.dedup import (
    fingerprints_from_tf,
    simhash_dup_pairs,
)
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


@contextmanager
def _aqe(spark: SparkSession, on: bool):
    """Phase AQE per build stage.  AQE re-plans the query at every stage
    materialization; with the 64-expression vote aggregates and multi-stage
    writes that re-planning is pure driver serial time — measured 26 s of
    inter-job gaps per 250 k-doc build (4 cores), an Amdahl term that caps
    N→4N scaling.  The tf/postings shuffles need no runtime re-plan: their
    skew is bounded by construction (the doc-range shard salt caps every
    (term, shard) group, operators/postings.py), so AQE is OFF for them.
    The dedup band self-join keeps the session default (ON): its bucket
    sizes are data-dependent (near-dup clusters make hot bands) and AQE
    skew-join splitting is the designed mitigation (operators/dedup.py)."""
    key = "spark.sql.adaptive.enabled"
    prior = spark.conf.get(key)
    spark.conf.set(key, "true" if on else "false")
    try:
        yield
    finally:
        spark.conf.set(key, prior)


@dataclass
class BuildResult:
    run_id: str
    n_docs: int
    n_shards: int
    resumed_shards: int
    built_shards: int
    wall_ms: int


class _Metrics:
    """Driver-side view of the build_metrics table, read ONCE per build.

    The metrics table is tiny (one row per shard per stage); reading it with
    a Spark job for every _done() check and appending with a Spark job per
    checkpoint added ~6 jobs of pure launch latency per build.  This caches
    the rows at entry, tracks in-process appends, and writes through
    ``TableIO.append_rows`` (driver-side parquet, no job)."""

    def __init__(self, io: TableIO):
        self.io = io
        self.rows: list = (
            [tuple(r) for r in io.read("build_metrics").collect()]
            if io.exists("build_metrics")
            else []
        )

    def log(self, rows: list[tuple]) -> None:
        self.io.append_rows(rows, METRICS_SCHEMA, "build_metrics")  # commit point
        self.rows.extend(rows)

    def done(self, stage: str) -> set[int]:
        return {r[2] for r in self.rows if r[1] == stage and r[7] == "done"}

    def latest_per_shard(self, stage: str) -> dict[int, tuple]:
        out: dict[int, tuple] = {}
        for r in self.rows:
            if r[1] == stage and r[7] == "done":
                if r[2] not in out or r[9] >= out[r[2]][9]:
                    out[r[2]] = r
        return out




def _build_shard_batches(
    io: TableIO,
    m: "_Metrics",
    run_id: str,
    lineage: str,
    cfg: EngineConfig,
    survivors: DataFrame,
    todo: list[int],
    fail_after_shards: int | None = None,
) -> int:
    """The per-partition-checkpoint shard loop, shared by the full build and
    the incremental build (plans/merge.py).  One Spark job per BATCH of
    shards (a per-shard loop would serialize a 10^12-file build); a crash
    re-does at most one batch, idempotently."""
    built = 0
    bsz = max(1, cfg.checkpoint_batch_shards)
    tf_all = io.read("tf")
    for i in range(0, len(todo), bsz):
        if fail_after_shards is not None and built >= fail_after_shards:
            raise RuntimeError(f"fault injection: stopping after {built} shards")
        batch = todo[i : i + bsz]
        ts = time.time()
        with _aqe(io.spark, False):
            # partition-pruned tf slice, restricted to dedup survivors
            tf_b = tf_all.filter(F.col("shard").isin(batch)).drop("shard")
            surv = survivors.filter(F.col("shard").isin(batch)).select("doc_id")
            tf_b = tf_b.join(surv, "doc_id", "left_semi")
            doc_stats = tf_b.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dlen"))
            # post-encode repartition by shard: exactly one (compressed, small)
            # file per shard — commit + read-back cost independent of core count
            io.overwrite_partitions(
                build_postings(tf_b, cfg).repartition("shard"), "postings", "shard"
            )
            io.overwrite_partitions(build_doc_stats_packed(doc_stats, cfg), "doc_stats_packed", "shard")
            wall_batch = int((time.time() - ts) * 1000)
            # one metadata job for both read-backs (join of two tiny per-shard aggs)
            p_stats = (
                io.read("postings")
                .filter(F.col("shard").isin(batch))
                .groupBy("shard")
                .agg(
                    F.sum("df").alias("postings"),
                    F.sum(F.length("ids") + F.length("tfs")).alias("bytes"),
                )
            )
            d_stats = (
                io.read("doc_stats_packed").filter(F.col("shard").isin(batch)).select("shard", "n")
            )
            stats = {int(r["shard"]): r for r in p_stats.join(d_stats, "shard", "full").collect()}
        m.log(
            [
                (
                    run_id, "shards", int(s), int(stats[int(s)]["n"] or 0) if int(s) in stats else 0,
                    int(stats[int(s)]["postings"] or 0) if int(s) in stats else 0,
                    int(stats[int(s)]["bytes"] or 0) if int(s) in stats else 0,
                    wall_batch, "done", lineage, time.time(),
                )
                for s in batch
            ],
        )
        built += len(batch)
    return built


def build_index(
    spark: SparkSession,
    docs_raw: DataFrame,
    io: TableIO,
    cfg: EngineConfig = DEFAULT,
    run_id: str | None = None,
    use_pandas_udf: bool = False,
    fail_after_shards: int | None = None,
) -> BuildResult:
    """Run (or resume) the full index build.  ``fail_after_shards`` is a
    test-only fault injection: raise after N shard checkpoints commit.

    ``use_pandas_udf`` selects the tokenizer implementation (bit-identical
    results either way, tests/test_tokenize.py).  Default False = the
    all-JVM ``regexp_extract_all`` path: measured 20-25 % faster end-to-end
    at every core count on this class of host because the tokenize stage
    skips the JVM↔Python Arrow serialize/copy hop — the Arrow-batched
    pandas-UDF path stays selectable (and is the shape the other Python
    stages — posting encode, simhash hashing, codecs — always use)."""
    t0 = time.time()
    run_id = run_id or uuid.uuid4().hex[:12]
    lineage = json.dumps({"config": asdict(cfg)})
    m = _Metrics(io)  # ONE metrics read for the whole build

    # ---- stage: tf (stage corpus once, tokenize once) ----------------------
    # docstore_raw carries the full content exactly ONCE (doc_id, sha256,
    # shard added); dedup later emits only a small survivors table — no
    # second full-content write.
    if -1 not in m.done("tf"):
        with _aqe(spark, False):  # with_doc_ids collects its bucket counts
            ided = with_doc_ids(docs_raw).filter(
                F.length(F.col("content")) >= cfg.min_content_len
            )
        staged = (
            ided.withColumn("shard", shard_of(F.col("doc_id"), cfg))
            .withColumn("sha256", F.sha2(F.col("content"), 256))
            .withColumn("n_bytes", F.length("content").cast("long"))
        )
        with _aqe(spark, False):
            io.overwrite_partitions(
                staged.select("doc_id", "shard", "repo", "path", "commit", "lang", "content", "sha256", "n_bytes"),
                "docstore_raw",
                "shard",
            )
        staged = io.read("docstore_raw")
        # stopword filter on the BUILD path only (Page.hpp:294; the query
        # path is never filtered — the reference's asymmetry).  tf_mapside:
        # per-doc counts are computed with run-length array expressions in
        # the scan projection — map-only, NO shuffle of the raw token
        # stream (at 10^12 files the former explode+groupBy shuffle was the
        # build's largest data movement; bit-identity pinned in
        # tests/test_tokenize.py).
        tf = tf_mapside(
            staged.select("doc_id", "content"), "content",
            use_pandas_udf, cfg.token_re, cfg.stopwords,
        ).withColumn("shard", shard_of(F.col("doc_id"), cfg))
        with _aqe(spark, False):
            io.overwrite_partitions(tf, "tf", "shard")
            # column-pruned: reads only (shard, n_bytes), never content
            per_shard = (
                staged.groupBy("shard")
                .agg(F.count("*").alias("docs"), F.sum("n_bytes").alias("bytes"))
                .collect()
            )
        wall = int((time.time() - t0) * 1000)
        m.log(
            [
                (run_id, "tf_shard", int(r["shard"]), int(r["docs"]), 0, int(r["bytes"]), wall, "done", lineage, time.time())
                for r in per_shard
            ]
            + [(run_id, "tf", -1, 0, 0, 0, wall, "done", lineage, time.time())],
        )

    # ---- stage: dedup (global; emits the small survivors table) -----------
    if -1 not in m.done("dedup"):
        ts = time.time()
        tf = io.read("tf")
        # N for the idf vote weights = staged doc count, already in the tf
        # stage's metrics — saves a corpus-wide distinct.  Equals the
        # docs-with-tokens count whenever every staged (≥ min_content_len)
        # doc yields ≥ 1 token; token-less docs would only perturb the
        # heuristic ln((N+1)/(df+1)) vote weights, never the dedup rule.
        # Latest row per shard (a tf-stage re-run appends a second set of
        # tf_shard rows and must not double-count N).
        tf_shard_rows = m.latest_per_shard("tf_shard")
        if tf_shard_rows:
            n_staged = sum(r[3] for r in tf_shard_rows.values())
        else:  # no tf_shard rows at all → derive from tf
            n_staged = tf.select("doc_id").distinct().count()
        # Checkpoint the fingerprints (doc_id, simhash — 16 B/doc) before
        # the band join.  Three reasons: (1) the old single dedup query
        # referenced the fingerprint subtree TWICE (band join + survivor
        # anti-join) and Spark re-executed the corpus-wide vote aggregate
        # for each — materializing it once cut a 250k-doc build ~30 %;
        # (2) AQE now re-plans only within this one bounded query instead
        # of across the whole dedup mega-query (AQE stays ON here: the
        # vocabulary-side df/hash join relies on its runtime broadcast
        # conversion — statically it can flip to a full sort-merge join on
        # a file-size estimate); (3) the fingerprint table is build lineage
        # worth persisting — a crash between fingerprint and survivors
        # resumes without re-aggregating the corpus-wide votes.
        if not io.exists("fingerprints", committed=True):
            io.overwrite(
                fingerprints_from_tf(tf, n_docs=int(n_staged)), "fingerprints"
            )
        fp = io.read("fingerprints")
        dropped = simhash_dup_pairs(fp, cfg).select(F.col("b_id").alias("doc_id")).distinct()
        obs = Observation()
        survivors = (
            fp.filter(F.col("simhash") != 0)
            .join(dropped, "doc_id", "left_anti")
            .withColumn("shard", shard_of(F.col("doc_id"), cfg))
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        io.overwrite_partitions(survivors, "survivors", "shard")
        n_surv = obs.get["n"]  # metric piggybacks on the write job
        m.log([(run_id, "dedup", -1, int(n_surv), 0, 0, int((time.time() - ts) * 1000), "done", lineage, time.time())])

    survivors = io.read("survivors")
    # shard universe from the tf-stage metrics (driver-side, no distinct job);
    # a shard whose docs all dedup away still gets its (empty, 0-doc) pass
    all_shards = set(m.latest_per_shard("tf_shard").keys())

    # ---- stage: shards (per-partition checkpoint, batched) ----------------
    done = m.done("shards")
    todo = sorted(all_shards - done)
    built = _build_shard_batches(
        io, m, run_id, lineage, cfg, survivors, todo, fail_after_shards
    )

    # ---- stage: finalize (derived globals, idempotent) --------------------
    with _aqe(spark, False):
        dsp = io.read("doc_stats_packed")
        stats_row = dsp.agg(
            F.sum("n").cast("long").alias("n_docs"),
            (F.sum("sum_dlen") / F.sum("n")).alias("avgdl"),
        ).collect()[0]
        n_docs = stats_row["n_docs"]
        # 1-row scalar table: driver-side write, no Spark job
        io.overwrite_rows(
            [(int(n_docs), float(stats_row["avgdl"]))], "n_docs long, avgdl double", "corpus"
        )
        term_stats = (
            io.read("postings")
            .groupBy("term")
            .agg(F.sum("df").cast("int").alias("df"))
            .withColumn(
                "idf",
                F.log((F.lit(int(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)),
            )
        )
        io.overwrite(term_stats, "term_stats")
    wall = int((time.time() - t0) * 1000)
    m.log([(run_id, "finalize", -1, int(n_docs), 0, 0, wall, "done", lineage, time.time())])

    return BuildResult(
        run_id=run_id,
        n_docs=int(n_docs),
        n_shards=len(all_shards),
        resumed_shards=len(done),
        built_shards=built,
        wall_ms=wall,
    )


def read_docstore(io: TableIO, verify_sha: bool = False) -> DataFrame:
    """The logical docstore = raw staged docs ∩ dedup survivors (with simhash).

    Content bytes are stored once (docstore_raw); the survivors table is
    (doc_id, simhash, shard) only.

    ``verify_sha=True`` enforces the north rule's per-row invariant —
    content sha256 equality against the hash stamped at stage time
    (input_hint: "per-row invariant vs the reference: content sha256
    equality").  The check is a map-side projection (``sha2`` ≡ the stored
    column, else a distributed ``raise_error`` that fails the reading task
    on the FIRST corrupt row) — no extra action, no collect, and the scan
    still prunes/pushes down around it, so it is safe to leave on for
    fetch paths at any scale.
    """
    out = io.read("docstore_raw").join(
        io.read("survivors").select("doc_id", "simhash"), "doc_id", "inner"
    )
    if verify_sha:
        ok = F.sha2(F.col("content"), 256) == F.col("sha256")
        out = out.withColumn(
            "content",
            F.when(ok, F.col("content")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("docstore corruption: content sha256 mismatch for doc_id="),
                        F.col("doc_id").cast("string"),
                    )
                )
            ),
        )
    return out


def load_index(io: TableIO) -> tuple[DataFrame, DataFrame, IndexStats]:
    """→ (postings, doc_stats_packed, IndexStats for the query layer).

    IndexStats.tf/doc_stats point at the staged tables (dense-path scoring);
    the compressed scorer (operators/wand.py) only touches term_stats/corpus.
    """
    tf = io.read("tf") if io.exists("tf") else None
    idx = IndexStats(
        tf=tf,
        doc_stats=None,
        term_stats=io.read("term_stats"),
        corpus=io.read("corpus"),
    )
    return io.read("postings"), io.read("doc_stats_packed"), idx
