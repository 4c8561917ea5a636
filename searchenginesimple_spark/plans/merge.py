"""Incremental index build: merge a delta corpus into an existing index.

The reference rebuilds its whole in-memory index per run (``src/page.cc``);
at 10^12-file scale the index must GROW.  This plan is the LSM move: each
increment's docs get doc_ids aligned to the NEXT shard boundary, so every
new posting run lands in a fresh shard partition and the "merge" into the
base index (north rule: "posting-list construction, merge, compression") is
pure partition-append — no base partition is ever rewritten, and the
query layer needs no change (a term's full posting list was already the
shard-ordered concatenation, operators/postings.py:8-15).  Only the two
global tables are rewritten per increment:

  term_stats  — every idf changes when n_docs changes, so the table is
                rewritten regardless; df is recomputed from the postings
                (term, df) columns — a column-pruned scan of the compressed
                index, never of content.
  corpus      — (n_docs, avgdl) from the per-shard doc_stats_packed sidecars
                (one row per shard).

Dedup across generations:

  exact  — delta docs whose sha256 already exists in the base docstore are
           skipped (the north rule's per-row content-sha invariant, exact at
           any generation).
  near   — delta fingerprints (vote weights from base-df + delta-df, the
           whole-corpus estimate) band-join against base SURVIVORS ∪ delta;
           only delta docs can drop (every base id < every delta id and the
           canonical rule drops the larger id).  Base docs that were
           themselves dropped in earlier generations are not compared —
           increments never re-litigate history (the LSM trade; the full
           rebuild is the semantics of record, tests/test_merge.py pins
           where they agree).

Resume: stages are metered per generation (``tf.g{k}`` / ``dedup.g{k}`` /
shared ``shards`` / ``finalize.g{k}``); re-running the same increment after
a crash skips committed stages exactly like the base build, and the
generation number is re-derived from the count of finalized generations, so
a crashed increment resumes as itself.
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import asdict

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT, EngineConfig
from searchenginesimple_spark.operators.bm25 import tf_mapside
from searchenginesimple_spark.operators.dedup import (
    fingerprints_from_tf,
    simhash_dup_pairs,
)
from searchenginesimple_spark.operators.postings import shard_of
from searchenginesimple_spark.plans.build import (
    BuildResult,
    _aqe,
    _build_shard_batches,
    _Metrics,
)
from searchenginesimple_spark.sources.corpus import with_doc_ids
from searchenginesimple_spark.sources.io import TableIO


def _tf_shard_rows_like(m: _Metrics, prefix: str) -> dict[int, tuple]:
    """Latest done row per shard across ALL generations of a stage family
    (``tf_shard``, ``tf_shard.g1``, …)."""
    out: dict[int, tuple] = {}
    for r in m.rows:
        name = r[1]
        if (name == prefix or name.startswith(prefix + ".g")) and r[7] == "done":
            if r[2] not in out or r[9] >= out[r[2]][9]:
                out[r[2]] = r
    return out


def build_index_incremental(
    spark: SparkSession,
    new_docs_raw: DataFrame,
    io: TableIO,
    cfg: EngineConfig = DEFAULT,
    run_id: str | None = None,
    use_pandas_udf: bool = False,  # same default + rationale as build_index
    fail_after_shards: int | None = None,
) -> BuildResult:
    """Merge ``new_docs_raw`` into the index at ``io`` (see module docstring)."""
    t0 = time.time()
    run_id = run_id or uuid.uuid4().hex[:12]
    m = _Metrics(io)

    gens_done = sum(
        1 for r in m.rows if r[1].startswith("finalize") and r[7] == "done"
    )
    if gens_done == 0:
        raise ValueError(
            "build_index_incremental: no finalized base index at "
            f"{io.root} — run build_index first"
        )
    gen = gens_done  # base finalize = generation 0's; first increment = g1
    sfx = f".g{gen}"
    lineage = json.dumps({"config": asdict(cfg), "generation": gen})

    # shard universe of PRIOR generations only (current gen's tf rows may
    # already exist on resume — they must not move the boundary)
    prior = {
        s
        for s, r in _tf_shard_rows_like(m, "tf_shard").items()
        if r[1] != f"tf_shard{sfx}"
    }
    first_shard = (max(prior) + 1) if prior else 0
    first_id = first_shard * cfg.shard_span

    # ---- stage tf.g{gen}: assign boundary-aligned ids, stage, tokenize ----
    # AQE phasing as in plans/build.py: OFF for the skew-bounded-by-
    # construction stages (its re-planning is serial driver time), session
    # default (ON) for the dedup band join below
    if -1 not in m.done(f"tf{sfx}"):
        with _aqe(spark, False):
            ided = with_doc_ids(
                new_docs_raw.filter(F.length(F.col("content")) >= cfg.min_content_len)
            ).withColumn("doc_id", F.col("doc_id") + F.lit(int(first_id)))
            staged = (
                ided.withColumn("shard", shard_of(F.col("doc_id"), cfg))
                .withColumn("sha256", F.sha2(F.col("content"), 256))
                .withColumn("n_bytes", F.length("content").cast("long"))
            )
            # exact-dup skip vs the base: sha256 anti-join (column-pruned scan
            # of the base docstore's sha column; the fingerprint comparison
            # below is approximate across generations — weights drift with df —
            # this one is the exact guarantee).  shard < first_shard: a crashed
            # attempt's own partial writes must not make the delta skip itself
            # on resume.
            base_sha = (
                io.read("docstore_raw")
                .filter(F.col("shard") < first_shard)
                .select("sha256")
            )
            staged = staged.join(base_sha, "sha256", "left_anti")
            io.overwrite_partitions(
                staged.select(
                    "doc_id", "shard", "repo", "path", "commit", "lang",
                    "content", "sha256", "n_bytes",
                ),
                "docstore_raw",
                "shard",
            )
            staged = io.read("docstore_raw").filter(F.col("shard") >= first_shard)
            # shuffle-free per-doc counts (see plans/build.py tf stage)
            tf = tf_mapside(
                staged.select("doc_id", "content"), "content",
                use_pandas_udf, cfg.token_re, cfg.stopwords,
            ).withColumn("shard", shard_of(F.col("doc_id"), cfg))
            io.overwrite_partitions(tf, "tf", "shard")
            per_shard = (
                staged.groupBy("shard")
                .agg(F.count("*").alias("docs"), F.sum("n_bytes").alias("bytes"))
                .collect()
            )
        wall = int((time.time() - t0) * 1000)
        m.log(
            [
                (run_id, f"tf_shard{sfx}", int(r["shard"]), int(r["docs"]), 0,
                 int(r["bytes"]), wall, "done", lineage, time.time())
                for r in per_shard
            ]
            + [(run_id, f"tf{sfx}", -1, 0, 0, 0, wall, "done", lineage, time.time())],
        )

    new_shards = sorted(
        s for s, r in _tf_shard_rows_like(m, "tf_shard").items()
        if r[1] == f"tf_shard{sfx}"
    )

    # ---- stage dedup.g{gen}: delta vs (base survivors ∪ delta) ------------
    if -1 not in m.done(f"dedup{sfx}"):
        ts = time.time()
        n_total = sum(r[3] for r in _tf_shard_rows_like(m, "tf_shard").values())
        delta_tf = io.read("tf").filter(F.col("shard") >= first_shard)
        delta_df = delta_tf.groupBy("term").agg(F.count("*").alias("df"))
        base_df = io.read("term_stats").select("term", "df")
        # whole-corpus df estimate; full outer so every delta term keeps a row
        # (fingerprints_from_tf inner-joins tf to this table)
        df_global = (
            base_df.withColumnRenamed("df", "df_a")
            .join(delta_df.withColumnRenamed("df", "df_b"), "term", "full")
            .select(
                "term",
                (F.coalesce("df_a", F.lit(0)) + F.coalesce("df_b", F.lit(0))).alias("df"),
            )
        )
        fp_delta = fingerprints_from_tf(
            delta_tf.drop("shard"), n_docs=int(n_total), df_global=df_global
        )
        base_surv = io.read("survivors").select("doc_id", "simhash")
        dropped = (
            simhash_dup_pairs(base_surv.unionByName(fp_delta), cfg, right=fp_delta)
            .select(F.col("b_id").alias("doc_id"))
            .distinct()
        )
        obs = Observation()
        survivors_delta = (
            fp_delta.filter(F.col("simhash") != 0)
            .join(dropped, "doc_id", "left_anti")
            .withColumn("shard", shard_of(F.col("doc_id"), cfg))
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        if new_shards:
            io.overwrite_partitions(survivors_delta, "survivors", "shard")
            n_surv = obs.get["n"]
        else:  # whole delta was exact-dup/short — nothing to write
            n_surv = 0
        m.log([(run_id, f"dedup{sfx}", -1, int(n_surv), 0, 0,
                int((time.time() - ts) * 1000), "done", lineage, time.time())])

    # ---- stage shards: only the new shards are todo ------------------------
    done = m.done("shards")
    todo = sorted(set(new_shards) - done)
    survivors = io.read("survivors")
    built = _build_shard_batches(
        io, m, run_id, lineage, cfg, survivors, todo, fail_after_shards
    )

    # ---- finalize.g{gen}: rewrite the two global tables --------------------
    with _aqe(spark, False):
        dsp = io.read("doc_stats_packed")
        stats_row = dsp.agg(
            F.sum("n").cast("long").alias("n_docs"),
            (F.sum("sum_dlen") / F.sum("n")).alias("avgdl"),
        ).collect()[0]
        n_docs = int(stats_row["n_docs"])
        io.overwrite_rows(
            [(n_docs, float(stats_row["avgdl"]))], "n_docs long, avgdl double", "corpus"
        )
        # df recompute from the postings' small columns (idempotent under
        # crash/re-run — an additive base+delta update would double-count on
        # resume); every idf changes with n_docs, so a full rewrite is forced
        # anyway
        term_stats = (
            io.read("postings")
            .groupBy("term")
            .agg(F.sum("df").cast("int").alias("df"))
            .withColumn(
                "idf",
                F.log(
                    (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                ),
            )
        )
        io.overwrite(term_stats, "term_stats")
    wall = int((time.time() - t0) * 1000)
    m.log([(run_id, f"finalize{sfx}", -1, n_docs, 0, 0, wall, "done", lineage, time.time())])

    return BuildResult(
        run_id=run_id,
        n_docs=n_docs,
        n_shards=len(new_shards),
        resumed_shards=len(set(new_shards) & done),
        built_shards=built,
        wall_ms=wall,
    )
