"""Per-component / per-stage measurement probes for the optimization round.

NOT the driver bench (bench.py is frozen): this harness isolates each
component of the bench with the noop sink (guide §1.4), labels jobs
(guide §1.5), and breaks the composite pipelines (build, curate, trigram,
clone) into stage timings so optimizations target the measured cost, not a
guess.  Numbers from here are cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py stage              # stage the 100k corpus (once)
  python bench_extra.py build|trigram|curate|clone|bool|bm25|all [--docs N]

Env: SPARK_GRAFT_BENCH_DOCS (100000), SPARK_GRAFT_SF_DIR, probe work dir is
/dev/shm/bex_<docs> and is REUSED across invocations (delete to re-stage).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
WORK = f"/dev/shm/bex_{N_DOCS}"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TIMES: dict[str, float] = {}


def timed(name):
    class _T:
        def __enter__(self):
            self.t0 = time.time()
            return self

        def __exit__(self, *a):
            TIMES[name] = round(time.time() - self.t0, 3)
            print(f"  {name}: {TIMES[name]:.3f}s", flush=True)

    return _T()


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def get_session():
    from searchenginesimple_spark.session import get_spark

    threads = min(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        int(os.environ.get("SPARK_GRAFT_BUILD_THREADS", "16")),
    )
    os.makedirs(WORK, exist_ok=True)
    return get_spark(
        "bench-extra",
        master=f"local[{threads}]",
        shuffle_partitions=max(8, threads),
        extra_conf={"spark.local.dir": WORK},
    )


def ensure_staged(spark):
    from searchenginesimple_spark.sources.corpus import docs_df_distributed, with_doc_ids

    if not os.path.exists(f"{WORK}/raw/_SUCCESS"):
        with timed("stage_raw"):
            docs_df_distributed(spark, N_DOCS).write.mode("overwrite").parquet(
                f"{WORK}/raw"
            )
    if not os.path.exists(f"{WORK}/raw_ids/_SUCCESS"):
        with timed("stage_ids"):
            with_doc_ids(spark.read.parquet(f"{WORK}/raw")).select(
                "doc_id", "content"
            ).write.mode("overwrite").parquet(f"{WORK}/raw_ids")


def probe_build(spark):
    import dataclasses
    import shutil

    from searchenginesimple_spark.config import DEFAULT
    from searchenginesimple_spark.plans.build import build_index
    from searchenginesimple_spark.sources.io import TableIO

    threads = min(16, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    cfg = dataclasses.replace(DEFAULT, shuffle_partitions=max(8, threads))
    docs = spark.read.parquet(f"{WORK}/raw")
    for rep in range(2):
        out = f"{WORK}/bidx{rep}"
        shutil.rmtree(out, ignore_errors=True)
        with timed(f"build_full_rep{rep}"):
            build_index(spark, docs, TableIO(spark, out), cfg)
        # per-stage walls from the build's own metrics table
        m = spark.read.parquet(f"{out}/build_metrics").collect()
        stages = {}
        for r in m:
            if r["stage"] in ("tf", "dedup", "finalize") or r["stage"] == "shards":
                k = r["stage"]
                stages[k] = max(stages.get(k, 0), r["wall_ms"] / 1000.0)
        print(f"  build stages rep{rep}: {stages}", flush=True)


def probe_trigram(spark):
    import shutil

    from searchenginesimple_spark.operators.trigram import (
        build_trigram_index,
        write_trigram_index,
        write_trigram_metrics,
    )

    docs = spark.read.parquet(f"{WORK}/raw_ids")
    docs = docs.cache()
    docs.count()
    postings, _ = build_trigram_index(docs)
    spark.sparkContext.setJobDescription("trigram: explode-only (noop)")
    with timed("tri_explode_noop"):
        noop(postings)
    spark.sparkContext.setJobDescription("trigram: full build+write")
    for rep in range(2):
        shutil.rmtree(f"{WORK}/tri{rep}", ignore_errors=True)
        with timed(f"tri_build_write_rep{rep}"):
            p, _ = build_trigram_index(docs)
            write_trigram_index(p, f"{WORK}/tri{rep}")
    # sub-phase split on a fresh dir: write postings only / stats / metrics
    shutil.rmtree(f"{WORK}/tri_phases", ignore_errors=True)
    p, _ = build_trigram_index(docs)
    with timed("tri_phase_postings"):
        pp = p.repartitionByRange(F.col("trigram")).sortWithinPartitions(
            "trigram", "doc_id"
        )
        pp.write.mode("overwrite").parquet(f"{WORK}/tri_phases/postings")
    pr = spark.read.parquet(f"{WORK}/tri_phases/postings")
    with timed("tri_phase_stats"):
        pr.groupBy("trigram").agg(F.count("*").cast("long").alias("df")).write.mode(
            "overwrite"
        ).parquet(f"{WORK}/tri_phases/stats")
    with timed("tri_phase_metrics"):
        write_trigram_metrics(spark, f"{WORK}/tri_phases")
    spark.sparkContext.setJobDescription(None)
    docs.unpersist()


def probe_curate(spark):
    import shutil

    from searchenginesimple_spark.operators.dedup import minhash_dup_pairs
    from searchenginesimple_spark.operators.graph import connected_components
    from searchenginesimple_spark.plans.curate import CurateConfig, curate
    from searchenginesimple_spark.sources.io import TableIO

    cur_n = int(os.environ.get("SPARK_GRAFT_CURATE_DOCS", "50000"))
    docs = (
        spark.read.parquet(f"{WORK}/raw_ids").filter(F.col("doc_id") < cur_n).cache()
    )
    docs.count()
    for rep in range(2):
        root = f"{WORK}/cur{rep}"
        shutil.rmtree(root, ignore_errors=True)
        with timed(f"curate_rep{rep}"):
            curate(spark, docs, TableIO(spark, root), CurateConfig())
    # stage isolation
    spark.sparkContext.setJobDescription("curate: exact dedup ids (noop)")
    with timed("cur_exact_noop"):
        noop(
            docs.select("doc_id", F.sha2(F.col("content"), 256).alias("sha256"))
            .groupBy("sha256")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
    spark.sparkContext.setJobDescription("curate: minhash pairs (noop)")
    with timed("cur_minhash_pairs_noop"):
        pairs = minhash_dup_pairs(docs, 64, 16, 5, 0.7)
        noop(pairs)
    spark.sparkContext.setJobDescription("curate: CC over pairs")
    pairs = minhash_dup_pairs(docs, 64, 16, 5, 0.7)
    with timed("cur_cc"):
        connected_components(pairs, "a_id", "b_id").count()
    spark.sparkContext.setJobDescription("curate: quality filter (noop)")
    from searchenginesimple_spark.functions.text import (
        quality_features,
        repetition_features,
    )

    c = F.col("content")
    q = dict(quality_features(c))
    r = repetition_features(c)
    keep = (
        (q["n_tokens"] >= 5) & (q["alpha_ratio"] >= 0.2) & (r["top_token_frac"] <= 0.5)
    )
    with timed("cur_quality_noop"):
        noop(docs.filter(keep).select("doc_id"))
    spark.sparkContext.setJobDescription(None)
    docs.unpersist()


def probe_clone(spark):
    from searchenginesimple_spark.operators.graph import connected_components
    from searchenginesimple_spark.operators.winnow import (
        clone_pairs,
        winnow_fingerprints,
    )

    docs = spark.read.parquet(f"{WORK}/raw_ids").cache()
    docs.count()
    spark.sparkContext.setJobDescription("clone: fingerprints (noop)")
    with timed("clone_fps_noop"):
        noop(winnow_fingerprints(docs, k=5, w=4))
    spark.sparkContext.setJobDescription("clone: full mine")
    def mine():
        return clone_pairs(
            winnow_fingerprints(docs, k=5, w=4),
            min_shared=2,
            min_similarity=0.5,
            max_df=64,
        )

    mine().count()  # warm
    for rep in range(2):
        with timed(f"clone_mine_rep{rep}"):
            mine().count()
    pairs = mine().select("a_id", "b_id").cache()
    pairs.count()
    with timed("clone_cluster_warm"):
        connected_components(pairs, "a_id", "b_id").count()
    for rep in range(2):
        with timed(f"clone_cluster_rep{rep}"):
            connected_components(pairs, "a_id", "b_id").count()
    pairs.unpersist()
    spark.sparkContext.setJobDescription(None)
    docs.unpersist()


def probe_bool(spark):
    from searchenginesimple_spark.operators.boolquery import (
        boolean_search,
        boolean_search_facets,
        boolean_search_topk_ranked,
    )
    from searchenginesimple_spark.operators.trigram import (
        build_trigram_index,
        trigram_search,
        trigram_search_lines,
        write_trigram_index,
    )
    import shutil

    docs = spark.read.parquet(f"{WORK}/raw_ids").cache()
    docs.count()
    shutil.rmtree(f"{WORK}/tri_q", ignore_errors=True)
    p, _ = build_trigram_index(docs)
    tri_post, tri_stats = write_trigram_index(p, f"{WORK}/tri_q")
    needles = spark.createDataFrame(
        [(0, "return ident"), (1, "loc_42_7"), (2, "zz_absent_zz"), (3, "ident_00")],
        "needle_id long, needle string",
    )
    bool_queries = [
        (0, "return ident -loc_42_7"),
        (1, '"return ident" OR loc_42_7'),
        (2, "ident_00 -(return OR zz_absent_zz)"),
        (3, "return -ident_00"),
    ]
    surf_docs = (
        docs.withColumn(
            "path",
            F.concat(F.lit("src/"), F.col("doc_id").cast("string"), F.lit(".txt")),
        )
        .withColumn("repo", F.lit("bench"))
        .withColumn("lang", F.lit("en"))
    )
    line_needles = spark.createDataFrame(
        [(0, "return ident"), (1, "ident_00")], "needle_id long, needle string"
    )

    def tq():
        trigram_search(docs, tri_post, tri_stats, needles).count()

    def bq():
        boolean_search(docs, tri_post, tri_stats, bool_queries).count()

    tq(); bq()  # warm
    for rep in range(2):
        with timed(f"trigram_query_rep{rep}"):
            tq()
    for rep in range(2):
        with timed(f"bool_search_rep{rep}"):
            bq()

    def surfaces():
        hits = (
            boolean_search(docs, tri_post, tri_stats, bool_queries)
            .select("query_id", "query", "doc_id")
            .persist()
        )
        try:
            with timed("surf_hits"):
                hits.count()
            with timed("surf_facets"):
                boolean_search_facets(
                    surf_docs, tri_post, tri_stats, bool_queries, hits=hits
                ).count()
            with timed("surf_ranked"):
                boolean_search_topk_ranked(
                    surf_docs, tri_post, tri_stats, bool_queries, k=10, hits=hits
                ).count()
            with timed("surf_lines"):
                trigram_search_lines(
                    surf_docs, tri_post, tri_stats, line_needles, max_lines_per_doc=3
                ).count()
        finally:
            hits.unpersist()

    surfaces()  # warm
    with timed("bool_surfaces_total"):
        surfaces()
    docs.unpersist()


def probe_bm25(spark):
    import dataclasses

    from searchenginesimple_spark.config import DEFAULT
    from searchenginesimple_spark.operators.bm25 import bm25_topk, build_index_stats
    from searchenginesimple_spark.operators.wand import bm25_topk_compressed
    from searchenginesimple_spark.plans.build import build_index, load_index
    from searchenginesimple_spark.sources.corpus import QUERY_SET, queries_df
    from searchenginesimple_spark.sources.documents import load_documents
    from searchenginesimple_spark.sources.io import TableIO
    import shutil

    import __spark_entry__ as entrymod

    threads = min(16, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    cfg = dataclasses.replace(DEFAULT, shuffle_partitions=max(8, threads))
    out = f"{WORK}/bm25_idx"
    if not os.path.exists(f"{out}/postings/_SUCCESS"):
        shutil.rmtree(out, ignore_errors=True)
        build_index(spark, spark.read.parquet(f"{WORK}/raw"), TableIO(spark, out), cfg)
    postings, dsp, idx = load_index(TableIO(spark, out))
    postings = postings.cache(); dsp = dsp.cache()
    idx.term_stats = idx.term_stats.cache()
    postings.count(), dsp.count(), idx.term_stats.count()
    bm25_topk_compressed(postings, dsp, idx, queries_df(spark, [QUERY_SET[0]]), cfg).collect()
    for rep in range(3):
        with timed(f"bm25_batch_rep{rep}"):
            bm25_topk_compressed(postings, dsp, idx, queries_df(spark), cfg).collect()
    for rep in range(2):
        with timed(f"dense_rep{rep}"):
            docs = load_documents(spark, SF_DIR)
            stats = build_index_stats(docs)
            bm25_topk(stats, entrymod._queries_df(spark)).collect()


PROBES = {
    "build": probe_build,
    "trigram": probe_trigram,
    "curate": probe_curate,
    "clone": probe_clone,
    "bool": probe_bool,
    "bm25": probe_bm25,
}


def main():
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or ["all"]
    spark = get_session()
    ensure_staged(spark)
    if which == ["stage"]:
        return
    names = list(PROBES) if which == ["all"] else which
    for n in names:
        print(f"== {n} ==", flush=True)
        PROBES[n](spark)
    print(json.dumps(TIMES))


if __name__ == "__main__":
    main()
