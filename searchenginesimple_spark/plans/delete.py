"""Document deletion: tombstones now, compaction later (the Lucene/LSM
delete discipline the reference cannot express — its index is rebuilt
in-memory per run, ``src/page.cc``; at 10^12 files deletes must be
incremental, and takedown compliance additionally requires the CONTENT
bytes gone, not just unsearchable).

Two-phase contract:

  delete_docs      appends doc_ids to the ``tombstones`` table — a driver-
                   side parquet append, no Spark job.  Visibility is
                   immediate for every query path that accepts the table:
                   the dense scorer anti-joins it before ranking
                   (operators/bm25.py), the compressed kernels filter
                   candidates at score time (operators/wand.py — AND mode
                   drops deleted docs from the intersection, OR mode keeps
                   them in the candidate index map but excludes them from
                   the pruning threshold and the final cut, so block-max
                   pruning stays exact), and the serving engine carries the
                   set as per-shard sorted arrays.  Top-k therefore
                   BACKFILLS with live docs — a deleted rank-1 doc never
                   leaves a hole.

  compact_index    rewrites ONLY the shard partitions that contain
                   tombstoned docs — survivors, postings, doc_stats_packed
                   (and with ``purge_content=True`` the docstore_raw and tf
                   partitions, which is what actually removes the bytes) —
                   by re-running the build's own shard-batch machinery over
                   the shrunk survivor set, then re-finalizes the global
                   term_stats/corpus tables and clears the tombstones.
                   Unaffected shards are untouched (the dynamic-partition-
                   overwrite resume primitive); a shard whose docs ALL
                   died has its partition directories removed outright
                   (dynamic overwrite cannot replace a partition with
                   nothing).  Idempotent: a crash mid-compact leaves
                   tombstones in place, and re-running redoes only the
                   rewrite (same committed-table discipline as
                   plans/build.py).

Near-dup history is NOT re-litigated: deleting a doc whose near-duplicates
were suppressed at build time does not resurrect them (the LSM trade
documented in plans/merge.py — the full rebuild is the semantics of
record).

Serving visibility: a compact rewrites shard partitions in place, and
dynamic partition overwrite is atomic per PARTITION, not across the
table — a distributed query scanning WHILE a compact commits can mix
old and new partitions (it never sees torn files, and deleted docs are
filtered by the tombstones it was given, so results stay correct; only
score-affecting stats may briefly straddle).  The serving engines are
immune by construction: they collect their slices at construction time
(a point-in-time view, the Lucene searcher-reopen discipline) — reopen
after compaction, exactly like refresh_tombstones after deletes.

df-until-merge semantics (Lucene's): term_stats df/idf keep counting
tombstoned docs until compaction — tombstones filter CANDIDATES, not
statistics.  Consequently a term whose last live doc is tombstoned stays
in the vocabulary (a conjunctive query containing it matches nothing)
until compaction removes its postings, at which point the OOV prune drops
the term from queries and conjunctive semantics legitimately widen.
Scores also rescale at compaction (n_docs shrinks → every idf moves),
which can flip rounded near-ties; tests pin post-compaction results to
the dense oracle over the compacted index rather than to pre-compaction
rank lists.
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT, EngineConfig
from searchenginesimple_spark.plans.build import (
    _aqe,
    _build_shard_batches,
    _Metrics,
)
from searchenginesimple_spark.sources.io import TableIO


@dataclass
class CompactResult:
    run_id: str
    n_deleted: int
    affected_shards: list[int]
    emptied_shards: list[int]
    n_docs: int
    wall_ms: int


def delete_docs(io: TableIO, doc_ids, cfg: EngineConfig = DEFAULT) -> int:
    """Tombstone ``doc_ids`` (a list of ints or a (doc_id) DataFrame).

    Append-only and idempotent under repeats (readers dedup); the append is
    driver-side parquet — zero Spark jobs for a list, one collect for a
    DataFrame (collecting ONCE means the appended ids and the returned
    count come from the same evaluation — a nondeterministic input frame
    cannot report one set and store another).

    SIZE-GUARDED (the mass-takedown path): a DataFrame past
    cfg.tombstone_fastpath_max ids is never collected — it is persisted
    once (count and append then read the same materialization) and appended
    as a distributed Spark write.  A whole-repo takedown of 10^8 ids costs
    executor memory, not driver memory.  After such a delete,
    needs_compaction() is true and the query paths run in their distributed
    tombstone mode until compact_index() folds the set in."""
    if isinstance(doc_ids, DataFrame):
        ids_df = doc_ids.select(F.col("doc_id").cast("long").alias("doc_id"))
        cap = cfg.tombstone_fastpath_max
        if ids_df.limit(cap + 1).count() > cap:
            ids_df = ids_df.persist()
            try:
                n = ids_df.count()
                io.append(ids_df, "tombstones")
            finally:
                ids_df.unpersist()
            return n
        doc_ids = [int(r["doc_id"]) for r in ids_df.collect()]
    rows = [(int(d),) for d in doc_ids]
    io.append_rows(rows, "doc_id long", "tombstones")
    return len(rows)


def _read_tombstones(io: TableIO) -> DataFrame:
    """The one concurrent-compaction-safe way to scan the tombstones table
    — EVERY reader goes through here: compact_index clears the snapshotted
    part files LAST (its commit point), so any reader that listed the
    directory just before that clear would try to open vanished files
    mid-scan.  ``ignoreMissingFiles`` makes the scan skip them — which is
    exactly the right semantics, not a lossy workaround: a part file only
    vanishes because the compact that folded its ids into the index
    COMMITTED, so those ids no longer need filtering.  Ids appended after
    the snapshot live in newer files the clear never touches.  Catalog
    deployments get the same property from Iceberg snapshot isolation."""
    if io.catalog:
        return io.read("tombstones")
    return io.spark.read.option("ignoreMissingFiles", "true").parquet(
        io.path("tombstones")
    )


def needs_compaction(io: TableIO, cfg: EngineConfig = DEFAULT) -> bool:
    """True when the pending tombstone set exceeds the fastpath guard —
    the signal an operator (or a scheduled janitor) uses to trigger
    compact_index().  Short-circuiting limit-count: never scans a huge set
    to completion."""
    if not io.exists("tombstones"):
        return False
    cap = cfg.tombstone_fastpath_max
    return _read_tombstones(io).limit(cap + 1).count() > cap


def load_tombstones(io: TableIO) -> DataFrame | None:
    """The current deleted set (deduped), or None when nothing is deleted —
    pass straight to the query paths' ``tombstones`` parameter.
    Concurrent-compaction safe via _read_tombstones."""
    if not io.exists("tombstones"):
        return None
    return _read_tombstones(io).select("doc_id").distinct()


def _fs(io: TableIO, path: str):
    jvm = io.spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(io.spark.sparkContext._jsc.hadoopConfiguration()), hpath


def _delete_partition(io: TableIO, table: str, shard: int) -> None:
    """Remove one shard partition directory (storage-agnostic Hadoop FS)."""
    fs, hpath = _fs(io, f"{io.path(table)}/shard={shard}")
    if fs.exists(hpath):
        fs.delete(hpath, True)


def _list_parquet_files(io: TableIO, table: str) -> list[str]:
    """Current parquet part files of a table dir (non-recursive)."""
    fs, hpath = _fs(io, io.path(table))
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet"):
            out.append(str(st.getPath()))
    return out


def _write_empty_sentinel(io: TableIO, table: str, schema) -> None:
    """A 0-row parquet under ``shard=-1``: keeps a shard-partitioned table
    readable — AND its directory depth consistent with later dynamic-
    partition writes (a root-level empty file would make the next
    partitioned append an unreadable mixed layout) — when every real
    partition is gone.  Fixed filename ⇒ idempotent under retry.  Local-FS
    direct write, the same driver-side shortcut TableIO.append_rows takes
    (catalog deployments go through the Iceberg path instead)."""
    import os

    import pyarrow.parquet as pq

    empty = io.spark.createDataFrame([], schema)
    if "shard" in empty.columns:
        empty = empty.drop("shard")
    d = f"{io.path(table)}/shard=-1"
    os.makedirs(d, exist_ok=True)
    pq.write_table(empty.toArrow(), f"{d}/part-empty.parquet")


def compact_index(
    spark: SparkSession,
    io: TableIO,
    cfg: EngineConfig = DEFAULT,
    purge_content: bool = False,
    run_id: str | None = None,
    fail_after_shards: int | None = None,
) -> CompactResult:
    """Fold the tombstone set into the index; see module docstring.

    After return the index is byte-equivalent to one whose shard stages
    were built over the surviving docs (tests pin query equivalence and
    absence of deleted ids from the decoded postings), and the SNAPSHOTTED
    ids are removed from the tombstones table — ids tombstoned while the
    compact ran stay pending for the next one.  No-op when nothing is
    tombstoned; deleting every remaining doc leaves a readable empty index.

    Crash-safe by idempotence rather than by stage skip: tombstones are
    cleared LAST, so a crashed compact re-runs in full on retry — every
    step (anti-join rewrites, partition drops, shard rebuild, finalize)
    produces identical bytes the second time.  ``fail_after_shards`` is the
    test-only fault injection (same contract as plans/build.py)."""
    t0 = time.time()
    run_id = run_id or uuid.uuid4().hex[:12]
    # SNAPSHOT = the tombstone table's parquet part FILES at this instant.
    # Parquet parts are immutable and delete_docs only ever appends new
    # ones, so (a) every join below and the final clear work off exactly
    # this file set, never the live table, and (b) ids tombstoned while
    # this compact runs land in newer files that the clear does not touch —
    # they stay pending for the next compact, with no lock needed.
    snap_files = _list_parquet_files(io, "tombstones")
    if not snap_files:
        return CompactResult(run_id, 0, [], [], -1, 0)
    # The deleted set stays DISTRIBUTED end-to-end — a 10^8-id takedown is
    # exactly when compaction runs, so this path must not collect it.
    # persist() pins one evaluation for the count, the shard list and every
    # anti-join below; only the distinct SHARD list (bounded by the shard
    # count, not the id count) ever reaches the driver.
    from searchenginesimple_spark.operators.postings import shard_of

    tomb = spark.read.parquet(*snap_files).select("doc_id").distinct().persist()
    n_del = tomb.count()
    if n_del == 0:
        tomb.unpersist()
        return CompactResult(run_id, 0, [], [], -1, 0)
    affected = sorted(
        int(r["shard"])
        for r in tomb.select(shard_of(F.col("doc_id"), cfg).alias("shard"))
        .distinct()
        .collect()
    )
    # over-guard sets are too big to broadcast into the anti-joins
    tomb_b = (
        F.broadcast(tomb) if n_del <= cfg.tombstone_fastpath_max else tomb
    )

    m = _Metrics(io)
    lineage = json.dumps({"config": asdict(cfg), "compact_deleted": n_del})

    with _aqe(spark, False):
        # survivors minus tombstones, affected partitions only.  A shard
        # whose survivors ALL died must be detected from the NEW frame —
        # dynamic partition overwrite writes nothing for an empty partition
        # and would leave the old files in place
        surv = io.read("survivors")
        surv_aff = surv.filter(F.col("shard").isin(affected)).join(
            tomb_b, "doc_id", "left_anti"
        )
        remaining = {
            int(r["shard"]): int(r["n"])
            for r in surv_aff.groupBy("shard").agg(F.count("*").alias("n")).collect()
        }
        n_unaffected_shards = (
            surv.select("shard")
            .distinct()
            .filter(~F.col("shard").isin(affected))
            .count()
        )
        io.overwrite_partitions(surv_aff, "survivors", "shard")

        if purge_content:
            for table in ("docstore_raw", "tf"):
                kept = (
                    io.read(table)
                    .filter(F.col("shard").isin(affected))
                    .join(tomb_b, "doc_id", "left_anti")
                )
                io.overwrite_partitions(kept, table, "shard")

    # drop fully-emptied partitions outright everywhere (see above: the
    # dynamic overwrite cannot replace a partition with nothing)
    emptied = [s for s in affected if remaining.get(s, 0) == 0]
    rebuilt = [s for s in affected if s not in emptied]
    # the delete set covered EVERY remaining doc → all real partitions are
    # about to vanish; FIRST write each table a 0-row ``shard=-1`` sentinel
    # partition (readable empty index, AND the same directory depth a later
    # dynamic-partition append expects — a root-level empty file would make
    # the next merge an unreadable mixed layout).  Sentinel-before-delete
    # ordering keeps every table readable at EVERY crash point, so the
    # idempotent-retry contract holds.
    index_emptied = not rebuilt and n_unaffected_shards == 0
    if index_emptied:
        for table in ("survivors", "postings", "doc_stats_packed") + (
            ("docstore_raw", "tf") if purge_content else ()
        ):
            _write_empty_sentinel(io, table, io.read(table).schema)
    for s in emptied:
        for table in ("survivors", "postings", "doc_stats_packed") + (
            ("docstore_raw", "tf") if purge_content else ()
        ):
            _delete_partition(io, table, s)

    # re-run the build's own shard machinery over the shrunk survivor set
    # (reads tf semi-joined to survivors, so purge order does not matter)
    if rebuilt:
        _build_shard_batches(
            io, m, run_id, lineage, cfg, io.read("survivors"), rebuilt,
            fail_after_shards,
        )

    # re-finalize globals (identical rule to build/merge finalize)
    with _aqe(spark, False):
        if index_emptied:
            n_docs = 0
            io.overwrite_rows([(0, 0.0)], "n_docs long, avgdl double", "corpus")
            io.overwrite_rows(
                [], "term string, df int, idf double", "term_stats"
            )
        else:
            dsp = io.read("doc_stats_packed")
            stats_row = dsp.agg(
                F.sum("n").cast("long").alias("n_docs"),
                (F.sum("sum_dlen") / F.sum("n")).alias("avgdl"),
            ).collect()[0]
            n_docs = int(stats_row["n_docs"])
            io.overwrite_rows(
                [(n_docs, float(stats_row["avgdl"]))], "n_docs long, avgdl double", "corpus"
            )
            term_stats = (
                io.read("postings")
                .groupBy("term")
                .agg(F.sum("df").cast("int").alias("df"))
                .withColumn(
                    "idf",
                    F.log(
                        (F.lit(n_docs) - F.col("df") + F.lit(0.5))
                        / (F.col("df") + F.lit(0.5))
                        + F.lit(1.0)
                    ),
                )
            )
            io.overwrite(term_stats, "term_stats")

    # clear LAST, by deleting EXACTLY the snapshotted part files (the
    # commit point: a crash before this re-compacts the same set,
    # idempotently).  Files appended by concurrent delete_docs calls —
    # even ones landing at this very instant — are not in the snapshot
    # list and survive for the next compact: no read-modify-write window.
    # The empty append first keeps the table readable once the last
    # snapshot file is gone.  Reader race, closed reader-side: a
    # load_tombstones that LISTED the directory before this clear could
    # try to OPEN a just-deleted part file mid-scan — load_tombstones
    # reads with ignoreMissingFiles, which skips exactly those files (their
    # ids are already folded into the index, so skipping is correct, not
    # lossy); on a catalog deployment Iceberg snapshot isolation removes
    # the race entirely.  Renaming to a trash dir first would not help:
    # the files vanish from their listed paths either way.
    io.append_rows([], "doc_id long", "tombstones")
    fs, _ = _fs(io, io.path("tombstones"))
    jvm = spark.sparkContext._jvm
    for f in snap_files:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)
    wall = int((time.time() - t0) * 1000)
    m.log(
        [
            (
                run_id, "compact", int(s), 0, 0, 0, wall, "done", lineage,
                time.time(),
            )
            for s in affected
        ]
    )
    tomb.unpersist()
    return CompactResult(run_id, n_del, affected, emptied, n_docs, wall)
