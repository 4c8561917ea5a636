"""spark-submit entry points (north rule: ships via ``spark-submit --py-files``).

Usage on a cluster (module zip built by e.g. ``zip -r engine.zip
searchenginesimple_spark``; ``driver.py`` is the two-line shim
``from searchenginesimple_spark.cli import main; raise SystemExit(main())``
— spark-submit takes a script, not ``-m``):

    spark-submit --master yarn --py-files engine.zip driver.py build ...

The whole flow — zip the package, submit with --py-files, imports resolved
from the ZIP (not a checkout) — is exercised end-to-end by
tests/test_cli.py::test_spark_submit_py_files_ships.  Or locally:

    python -m searchenginesimple_spark.cli ingest --root /path/checkout --output /path/docs_parquet \\
                                                  [--repo name] [--commit sha] [--glob '*.py']
    python -m searchenginesimple_spark.cli build  --input /path/docs_parquet --index /path/idx
    python -m searchenginesimple_spark.cli query  --index /path/idx --query "spark window" [--mode or]
    python -m searchenginesimple_spark.cli delete --index /path/idx --doc-id 42 --doc-id 7
    python -m searchenginesimple_spark.cli compact --index /path/idx [--purge-content]
    python -m searchenginesimple_spark.cli suggest --index-docs /path/docs_parquet --word spakr
    python -m searchenginesimple_spark.cli search --input /path/docs_parquet --index /path/tri \\
                                                  --query 'spark window' [--filter 'lang:py -vendor'] \\
                                                  [--collapse /path/clusters_parquet]
    python -m searchenginesimple_spark.cli grep   --input /path/docs_parquet --index /path/tri \\
                                                  --query 'lang:py crypto -vendor' [--ci]
    python -m searchenginesimple_spark.cli chunk  --input /path/docs_parquet --output /path/chunks \\
                                                  [--chunk-tokens 512] [--overlap-lines 4]
    python -m searchenginesimple_spark.cli pack   --input /path/docs_parquet --output /path/samples \\
                                                  [--sample-tokens 8192]
    python -m searchenginesimple_spark.cli despan --input /path/docs_parquet --output /path/cleaned \\
                                                  [--min-span-tokens 20]
    python -m searchenginesimple_spark.cli watch  --input /path/incoming --output /path/matches \\
                                                  --query 'lang:py crypto -vendor' [--ci]
    python -m searchenginesimple_spark.cli curate --input /path/docs_parquet --output /path/curated \\
                                                  [--allowed-licenses mit,apache-2.0,unknown] \\
                                                  [--drop-vendored] [--drop-generated] [--drop-minified] \\
                                                  [--per-source-cap N] [--chunk-tokens 512]

Replaces the reference's three binaries + HTTP servers (``src/page.cc``,
``src/keyWord.cc``, ``src/Server/*``) with batch jobs over tables.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="searchenginesimple_spark")
    p.add_argument("--master", default=None, help="spark master (default: env/local)")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) the inverted index")
    b.add_argument("--input", required=True, help="parquet dir of docs(repo,path,commit,lang,content)")
    b.add_argument("--index", required=True, help="output index root")
    b.add_argument("--run-id", default=None)

    i = sub.add_parser(
        "ingest", help="scan a source tree into a docs parquet (distributed DirScanner)"
    )
    i.add_argument("--root", required=True, help="checkout tree to scan recursively")
    i.add_argument("--output", required=True, help="output parquet dir (input_hint shape + doc_id)")
    i.add_argument("--repo", default=None, help="repo name (default: basename of --root)")
    i.add_argument("--commit", default="HEAD")
    i.add_argument("--glob", default=None, help="filename glob pushed into the listing (e.g. '*.py')")
    i.add_argument("--max-bytes", type=int, default=None,
                   help="drop files larger than this before decode (default 1 MiB)")
    i.add_argument("--mode", choices=["walk", "spark"], default=None,
                   help="walk = distributed tree walk, exact dotfile-only skip "
                        "(default for local roots); spark = binaryFile listing "
                        "(default for scheme:// roots; hides _* names)")
    i.add_argument("--seed-depth", type=int, default=2,
                   help="walk mode: driver seed-frontier depth (raise to split "
                        "one giant subtree across more tasks)")

    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--index", required=True)
    q.add_argument("--query", action="append", required=True, help="repeatable")
    q.add_argument("--mode", choices=["and", "or"], default="and")
    q.add_argument("--k", type=int, default=10)

    d = sub.add_parser("delete", help="tombstone docs (visible to query immediately)")
    d.add_argument("--index", required=True)
    d.add_argument("--doc-id", action="append", type=int, required=True,
                   help="repeatable doc_id to delete")
    d.add_argument(
        "--compact-if-needed", action="store_true",
        help="run compact_index right away when the pending tombstone set "
        "exceeds the fastpath guard (the janitor wiring for "
        "needs_compaction — every query path would otherwise run in its "
        "distributed-tombstone mode until someone compacts)",
    )

    x = sub.add_parser(
        "compact", help="fold tombstones into the index (rewrites affected shards)"
    )
    x.add_argument("--index", required=True)
    x.add_argument("--purge-content", action="store_true",
                   help="also remove the docstore/tf bytes (takedown)")

    h = sub.add_parser(
        "search",
        help="hybrid: BM25 top-k among the docs matching a boolean filter",
    )
    h.add_argument("--input", required=True, help="parquet dir of docs")
    h.add_argument(
        "--index", required=True, help="trigram index root (built/resumed on demand)"
    )
    h.add_argument("--query", action="append", required=True, help="repeatable text query")
    h.add_argument(
        "--filter",
        action="append",
        default=None,
        help="repeatable boolean filter, one per --query in order ('' = none); "
        "omit entirely for unfiltered ranking",
    )
    h.add_argument("--mode", choices=["and", "or"], default="and")
    h.add_argument("-k", "--topk", type=int, default=10)
    h.add_argument("--ci", action="store_true", help="case-insensitive filter leg")
    h.add_argument(
        "--collapse",
        default=None,
        metavar="CLUSTERS_PARQUET",
        help="near-dup collapse: parquet of cluster assignments — (node, "
        "component) as connected_components emits, or (doc_id, cluster_id) "
        "as the dedup_clusters entry emits; results are over-retrieved 2k, "
        "collapsed to one hit per cluster, re-ranked and cut to k",
    )

    s = sub.add_parser("suggest", help="levenshtein suggestions from a docs corpus")
    s.add_argument("--input", required=True)
    s.add_argument("--word", action="append", required=True)

    g = sub.add_parser("grep", help="boolean substring search (zoekt query algebra)")
    g.add_argument("--input", required=True, help="parquet dir of docs")
    g.add_argument("--index", required=True, help="trigram index root (built/resumed on demand)")
    g.add_argument("--query", action="append", required=True, help="repeatable boolean query")
    g.add_argument("--ci", action="store_true", help="case-insensitive (index folds with it)")
    g.add_argument(
        "--lines",
        action="store_true",
        help="grep-style per-line matches (positive-leaf highlights)",
    )
    g.add_argument(
        "-m",
        "--max-lines-per-doc",
        type=int,
        default=None,
        help="with --lines: cap matched lines per (query, doc), grep -m",
    )
    g.add_argument(
        "--ranked",
        action="store_true",
        help="top-k results per query by the symbol > path > occurrence ladder",
    )
    g.add_argument("-k", "--topk", type=int, default=10, help="with --ranked: k")
    g.add_argument(
        "--priority",
        default=None,
        help="with --ranked: parquet of (doc_id, rank) importance — e.g. an "
        "import_rank output — tie-breaks quality ties toward high-rank docs",
    )
    g.add_argument(
        "--facets",
        action="store_true",
        help="per-repo/lang matching-doc counts instead of hit rows",
    )
    g.add_argument(
        "--explain",
        action="store_true",
        help="report each query's route (index/scan/empty) and index "
        "selectivity instead of executing it — touches stats only",
    )

    w = sub.add_parser(
        "watch", help="percolation: standing boolean queries over an incoming dir"
    )
    w.add_argument("--input", required=True, help="incoming parquet dir of docs (must carry doc_id)")
    w.add_argument("--output", required=True, help="matches root (per-batch subdirs)")
    w.add_argument("--checkpoint", default=None, help="stream checkpoint (default <output>/_checkpoint)")
    w.add_argument("--query", action="append", required=True, help="repeatable standing query")
    w.add_argument("--ci", action="store_true")

    c = sub.add_parser("chunk", help="context-window packing into training chunks")
    c.add_argument("--input", required=True, help="parquet dir of docs")
    c.add_argument("--output", required=True, help="output parquet dir of chunks")
    c.add_argument("--chunk-tokens", type=int, default=512)
    c.add_argument("--overlap-lines", type=int, default=0)

    cm = sub.add_parser(
        "complete", help="type-ahead completions mined from a query/click log"
    )
    cm.add_argument("--log", required=True, help="parquet of logged queries (query col)")
    cm.add_argument("--prefix", action="append", required=True, help="repeatable prefix")
    cm.add_argument("--k", type=int, default=5)
    cm.add_argument("--min-count", type=int, default=1)
    cm.add_argument("--max-prefix", type=int, default=12,
                    help="longest prefix mined (longer lookups are an error)")

    e = sub.add_parser(
        "eval", help="ranking metrics (MRR/MAP/NDCG/P/R@k) vs a qrels table"
    )
    e.add_argument("--results", required=True,
                   help="parquet of (query_id, rank, docID)")
    e.add_argument("--qrels", required=True,
                   help="parquet of (query_id, doc_id [, grade])")
    e.add_argument("--k", type=int, default=10)
    e.add_argument("--per-query", default=None,
                   help="optional parquet dir for the per-query metric rows")

    s2 = sub.add_parser(
        "despan", help="cut duplicated passages (winnow clone spans) from docs"
    )
    s2.add_argument("--input", required=True, help="parquet dir of docs")
    s2.add_argument("--output", required=True, help="output parquet dir of cleaned docs")
    s2.add_argument("--k", type=int, default=5, help="winnow k-gram size")
    s2.add_argument("--w", type=int, default=4, help="winnow window size")
    s2.add_argument("--min-shared", type=int, default=2)
    s2.add_argument("--min-span-tokens", type=int, default=20)

    k = sub.add_parser(
        "pack", help="repo-level context packing into training samples"
    )
    k.add_argument("--input", required=True, help="parquet dir of docs (repo/path/content)")
    k.add_argument("--output", required=True, help="output parquet dir of samples")
    k.add_argument("--sample-tokens", type=int, default=8192)

    u = sub.add_parser(
        "curate", help="training-data curation pipeline (resumable, per-stage metrics)"
    )
    u.add_argument("--input", required=True, help="parquet dir of docs")
    u.add_argument("--output", required=True, help="curation root (stage tables + curate_kept)")
    u.add_argument("--allowed-licenses", default=None,
                   help="comma-separated allow-list (e.g. mit,apache-2.0,unknown)")
    u.add_argument("--drop-vendored", action="store_true")
    u.add_argument("--drop-generated", action="store_true")
    u.add_argument("--drop-minified", action="store_true")
    u.add_argument("--per-source-cap", type=int, default=None)
    u.add_argument("--source-col", default="repo",
                   help="grouping column for --per-source-cap (default: repo)")
    u.add_argument("--chunk-tokens", type=int, default=None)
    u.add_argument("--repo-pack-tokens", type=int, default=None)
    u.add_argument("--despan-min-tokens", type=int, default=None)
    u.add_argument("--increment", action="store_true",
                   help="admit --input as a DELTA into an existing curation root")

    args = p.parse_args(argv)

    from searchenginesimple_spark.config import DEFAULT
    from searchenginesimple_spark.session import get_spark

    spark = get_spark("cli", master=args.master)

    if args.cmd == "build":
        from searchenginesimple_spark.plans.build import build_index
        from searchenginesimple_spark.sources.io import TableIO

        docs = spark.read.parquet(args.input)
        res = build_index(spark, docs, TableIO(spark, args.index), DEFAULT, run_id=args.run_id)
        print(json.dumps(res.__dict__))
        return 0

    if args.cmd == "ingest":
        from searchenginesimple_spark.sources.corpus import with_doc_ids
        from searchenginesimple_spark.sources.files import (
            DEFAULT_MAX_BYTES,
            read_source_tree,
        )

        docs = read_source_tree(
            spark,
            args.root,
            repo=args.repo,
            commit=args.commit,
            glob=args.glob,
            max_bytes=args.max_bytes if args.max_bytes is not None else DEFAULT_MAX_BYTES,
            mode=args.mode,
            seed_depth=args.seed_depth,
        )
        with_doc_ids(docs).write.mode("error").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(json.dumps({"ingested_docs": n, "output": args.output}))
        return 0

    if args.cmd == "query":
        import dataclasses

        from searchenginesimple_spark.operators.wand import Bm25QueryEngine
        from searchenginesimple_spark.plans.build import load_index
        from searchenginesimple_spark.sources.io import TableIO

        from searchenginesimple_spark.plans.delete import load_tombstones

        cfg = dataclasses.replace(DEFAULT, top_k=args.k)
        io = TableIO(spark, args.index)
        postings, dsp, idx = load_index(io)
        # serving path: postings/stats slices cached on the driver across
        # queries; hot terms automatically fall back to the distributed plan.
        # Pending deletes (tombstones not yet compacted) filter at score time
        engine = Bm25QueryEngine(
            postings, dsp, idx, cfg, mode=args.mode,
            tombstones=load_tombstones(io),
        )
        out = engine.query(args.query)
        for _, r in out.iterrows():
            print(json.dumps({"query": r["query"], "rank": int(r["rank"]), "docID": int(r["docID"]), "score": float(r["score"])}))
        return 0

    if args.cmd == "delete":
        from searchenginesimple_spark.plans.delete import (
            compact_index,
            delete_docs,
            needs_compaction,
        )
        from searchenginesimple_spark.sources.io import TableIO

        io = TableIO(spark, args.index)
        n = delete_docs(io, args.doc_id)
        # post-delete janitor check: past the fastpath guard every query
        # path degrades to its distributed-tombstone mode — surface the
        # signal (and optionally act on it) instead of leaving it latent
        needed = needs_compaction(io, DEFAULT)
        out = {"tombstoned": n, "needs_compaction": needed}
        if needed and args.compact_if_needed:
            res = compact_index(spark, io, DEFAULT)
            out["compacted"] = res.__dict__
            out["needs_compaction"] = needs_compaction(io, DEFAULT)
        print(json.dumps(out))
        return 0

    if args.cmd == "compact":
        from searchenginesimple_spark.plans.delete import compact_index
        from searchenginesimple_spark.sources.io import TableIO

        res = compact_index(
            spark, TableIO(spark, args.index), DEFAULT,
            purge_content=args.purge_content,
        )
        print(json.dumps(res.__dict__))
        return 0

    if args.cmd == "search":
        import dataclasses

        from searchenginesimple_spark.operators.bm25 import build_index_stats
        from searchenginesimple_spark.operators.hybrid import filtered_bm25_topk
        from searchenginesimple_spark.operators.trigram import (
            build_trigram_index,
            write_trigram_index,
        )
        from searchenginesimple_spark.sources.corpus import with_doc_ids

        filters = args.filter or []
        if filters and len(filters) != len(args.query):
            p.error("--filter must be given once per --query (use '' for none)")
        docs = spark.read.parquet(args.input)
        if "doc_id" not in docs.columns:
            docs = with_doc_ids(docs)
        raw, _ = build_trigram_index(docs, case_insensitive=args.ci)
        tri_postings, tri_stats = write_trigram_index(raw, args.index, resume=True)
        idx = build_index_stats(docs)
        triples = [
            (int(i), q, (filters[i] or None) if filters else None)
            for i, q in enumerate(args.query)
        ]
        # collapsing cuts survivors back to k, so over-retrieve 2k first
        # (the standard pattern — operators/collapse.py docstring)
        k_retrieve = 2 * args.topk if args.collapse else args.topk
        cfg = dataclasses.replace(DEFAULT, top_k=k_retrieve)
        out = filtered_bm25_topk(
            docs,
            idx,
            tri_postings,
            tri_stats,
            triples,
            cfg=cfg,
            mode=args.mode,
            case_insensitive=args.ci,
        )
        if args.collapse:
            from searchenginesimple_spark.operators.collapse import collapse_results

            clusters = spark.read.parquet(args.collapse)
            if "node" not in clusters.columns:  # dedup_clusters-entry shape
                clusters = clusters.select(
                    clusters.doc_id.alias("node"), clusters.cluster_id.alias("component")
                )
            out = collapse_results(
                out, clusters, k=args.topk, query_col="query_id", doc_col="doc_id"
            )
        for r in out.orderBy("query_id", "rank").collect():
            rec = {
                "query": r["query"],
                "filter": r["filter"],
                "rank": int(r["rank"]),
                "doc_id": int(r["doc_id"]),
                "score": float(r["score"]),
            }
            if args.collapse:
                rec["orig_rank"] = int(r["orig_rank"])
                rec["cluster_id"] = (
                    int(r["cluster_id"]) if r["cluster_id"] is not None else None
                )
            print(json.dumps(rec))
        return 0

    if args.cmd == "suggest":
        from searchenginesimple_spark.operators.suggest import (
            build_char_index,
            build_dict,
            suggest_topk,
        )

        docs = spark.read.parquet(args.input).withColumnRenamed("text", "content")
        d = build_dict(docs)
        ci = build_char_index(d)
        qdf = spark.createDataFrame([(w,) for w in args.word], "word string")
        for r in suggest_topk(d, ci, qdf).collect():
            print(json.dumps({"query_word": r["query_word"], "rank": r["rank"], "word": r["word"], "dist": r["dist"]}))
        return 0

    if args.cmd == "grep":
        from searchenginesimple_spark.operators.boolquery import (
            boolean_search,
            boolean_search_facets,
            boolean_search_lines,
            boolean_search_topk_ranked,
            explain_search,
        )
        from searchenginesimple_spark.operators.trigram import (
            build_trigram_index,
            write_trigram_index,
        )

        docs = spark.read.parquet(args.input)
        if "doc_id" not in docs.columns:
            from searchenginesimple_spark.sources.corpus import with_doc_ids

            docs = with_doc_ids(docs)
        # resume=True: first run materializes the clustered index at
        # --index, later runs skip straight to the committed parquet
        raw, _ = build_trigram_index(docs, case_insensitive=args.ci)
        postings, stats = write_trigram_index(raw, args.index, resume=True)
        queries = [(int(i), q) for i, q in enumerate(args.query)]
        if args.explain:
            out = explain_search(stats, queries, case_insensitive=args.ci)
            for r in out.orderBy("query_id").collect():
                print(
                    json.dumps(
                        {
                            "query": r["query"],
                            "path": r["path"],
                            "n_conjuncts": r["n_conjuncts"],
                            "n_trigrams": r["n_trigrams"],
                            "est_candidates": r["est_candidates"],
                        }
                    )
                )
            return 0
        if args.facets:
            by = tuple(c for c in ("repo", "lang") if c in docs.columns)
            out = boolean_search_facets(
                docs, postings, stats, queries, by=by, case_insensitive=args.ci
            )
            for r in out.orderBy("query_id", "facet", "value").collect():
                print(
                    json.dumps(
                        {
                            "query": r["query"],
                            "facet": r["facet"],
                            "value": r["value"],
                            "n_docs": int(r["n_docs"]),
                        }
                    )
                )
            return 0
        if args.ranked:
            prio = spark.read.parquet(args.priority) if args.priority else None
            out = boolean_search_topk_ranked(
                docs,
                postings,
                stats,
                queries,
                k=args.topk,
                case_insensitive=args.ci,
                priority=prio,
            )
            for r in out.orderBy("query_id", "rank").collect():
                rec = {
                    "query": r["query"],
                    "rank": int(r["rank"]),
                    "doc_id": int(r["doc_id"]),
                    "symbol_match": int(r["symbol_match"]),
                    "path_match": int(r["path_match"]),
                    "n_occurrences": int(r["n_occurrences"]),
                }
                if prio is not None:
                    rec["priority"] = int(r["priority"])
                print(json.dumps(rec))
            return 0
        if args.lines:
            out = boolean_search_lines(
                docs,
                postings,
                stats,
                queries,
                max_lines_per_doc=args.max_lines_per_doc,
                case_insensitive=args.ci,
            )
            for r in out.orderBy("query_id", "doc_id", "line_no").collect():
                print(
                    json.dumps(
                        {
                            "query": r["query"],
                            "doc_id": int(r["doc_id"]),
                            "line_no": int(r["line_no"]),
                            "line": r["line"],
                        }
                    )
                )
            return 0
        out = boolean_search(
            docs, postings, stats, queries, case_insensitive=args.ci
        )
        for r in out.orderBy("query_id", "doc_id").collect():
            print(json.dumps({"query": r["query"], "doc_id": int(r["doc_id"])}))
        return 0

    if args.cmd == "watch":
        from searchenginesimple_spark.streaming.percolate import (
            read_percolated,
            stream_percolate,
        )

        schema = spark.read.parquet(args.input).schema
        if "doc_id" not in schema.names:
            # ids must be stable ACROSS micro-batches, so per-batch
            # assignment is not an option — fail loudly at the seam
            print(
                json.dumps({"error": "watch input must carry a doc_id column"}),
                file=sys.stderr,
            )
            return 2
        stream = spark.readStream.schema(schema).parquet(args.input)
        queries = [(int(i), q) for i, q in enumerate(args.query)]
        q = stream_percolate(
            stream,
            queries,
            args.output,
            args.checkpoint or f"{args.output}/_checkpoint",
            case_insensitive=args.ci,
            available_now=True,
        )
        q.awaitTermination()
        import glob as _glob

        if _glob.glob(f"{args.output}/batch=*"):  # no batch matched → no dirs
            out = read_percolated(spark, args.output)
            for r in out.orderBy("query_id", "doc_id").collect():
                print(json.dumps({"query": r["query"], "doc_id": int(r["doc_id"])}))
        return 0

    if args.cmd == "curate":
        from searchenginesimple_spark.plans.curate import CurateConfig, curate
        from searchenginesimple_spark.sources.io import TableIO

        docs = spark.read.parquet(args.input)
        if "doc_id" not in docs.columns:
            if args.increment:
                # fresh with_doc_ids would restart at 0 and collide with the
                # base — increments must ship their own monotone ids
                raise SystemExit(
                    "curate --increment needs a doc_id column with ids beyond "
                    "the base's max (the min-id survivor contract)"
                )
            from searchenginesimple_spark.sources.corpus import with_doc_ids

            docs = with_doc_ids(docs)
        cfg = CurateConfig(
            allowed_licenses=(
                tuple(args.allowed_licenses.split(","))
                if args.allowed_licenses
                else None
            ),
            drop_vendored=args.drop_vendored,
            drop_generated=args.drop_generated,
            drop_minified=args.drop_minified,
            per_source_cap=args.per_source_cap,
            source_col=args.source_col,
            chunk_tokens=args.chunk_tokens,
            repo_pack_tokens=args.repo_pack_tokens,
            despan_min_tokens=args.despan_min_tokens,
        )
        io = TableIO(spark, args.output)
        if args.increment:
            # the terminal stages are batch-only (curate_inc.py docstring);
            # silently ignoring their flags would claim work that never ran
            batch_only = {
                "--despan-min-tokens": args.despan_min_tokens,
                "--chunk-tokens": args.chunk_tokens,
                "--repo-pack-tokens": args.repo_pack_tokens,
            }
            bad = [k for k, v in batch_only.items() if v is not None]
            if bad:
                raise SystemExit(
                    f"curate --increment does not run {', '.join(bad)} "
                    "(batch-only stages) — run them over the full kept table"
                )
            from searchenginesimple_spark.plans.curate_inc import (
                curate_increment,
                read_curated,
            )

            admitted = curate_increment(spark, docs, io, cfg)
            gens = [
                dict(gen=r["gen"], docs_in=r["docs_in"], docs_out=r["docs_out"])
                for r in io.read("curate_generations").collect()
            ]
            print(json.dumps({
                "admitted": admitted.count(),
                "kept_total": read_curated(io).count(),
                "generations": sorted(gens, key=lambda d: d["gen"]),
            }))
            return 0
        kept = curate(spark, docs, io, cfg)
        metrics = {
            r["stage"]: [r["docs_in"], r["docs_out"]]
            for r in io.read("curate_metrics").collect()
        }
        print(json.dumps({"kept": kept.count(), "stages": metrics}))
        return 0

    if args.cmd == "chunk":
        from searchenginesimple_spark.operators.chunk import chunk_documents

        docs = spark.read.parquet(args.input)
        if "doc_id" not in docs.columns:
            from searchenginesimple_spark.sources.corpus import with_doc_ids

            docs = with_doc_ids(docs)
        chunk_documents(
            docs,
            chunk_tokens=args.chunk_tokens,
            overlap_lines=args.overlap_lines,
        ).write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(json.dumps({"chunks": n, "output": args.output}))
        return 0

    if args.cmd == "complete":
        from pyspark.sql import functions as F

        from searchenginesimple_spark.operators.suggest import popular_completions

        import re as _re

        # normalize EXACTLY like the operator (lower, collapse whitespace),
        # but keep a single trailing space — "spark " asks for continuations
        # of the complete word, a distinct prefix the table does contain
        wanted = [
            _re.sub(r"\s+", " ", p.lower()).lstrip() for p in args.prefix
        ]
        if any(not p for p in wanted):
            raise SystemExit(
                "empty (or whitespace-only) --prefix — the completion table "
                "has no empty-prefix rows, so the lookup would silently "
                "return nothing"
            )
        too_long = [p for p in wanted if len(p) > args.max_prefix]
        if too_long:
            raise SystemExit(
                f"prefix(es) longer than --max-prefix={args.max_prefix}: "
                f"{too_long!r} — raise --max-prefix (longer prefixes are "
                "never mined, so the lookup would silently return nothing)"
            )
        comp = popular_completions(
            spark.read.parquet(args.log), k=args.k,
            max_prefix=args.max_prefix, min_count=args.min_count,
        )
        for r in (
            comp.filter(F.col("prefix").isin(wanted))
            .orderBy("prefix", "rank")
            .collect()
        ):
            print(json.dumps({
                "prefix": r["prefix"], "rank": r["rank"],
                "completion": r["completion"], "count": r["count"],
            }))
        return 0

    if args.cmd == "eval":
        from searchenginesimple_spark.operators.evalrank import ranking_metrics

        qrels = spark.read.parquet(args.qrels)
        per_q, summary = ranking_metrics(
            spark.read.parquet(args.results),
            qrels,
            k=args.k,
            grade_col="grade" if "grade" in qrels.columns else None,
        )
        if args.per_query:
            # summary derives from per_query — cache so the join/window
            # pipeline (millions of queries) executes once, not twice
            per_q.persist()
            per_q.write.mode("overwrite").parquet(args.per_query)
        print(json.dumps(summary.collect()[0].asDict()))
        if args.per_query:
            per_q.unpersist()
        return 0

    if args.cmd == "despan":
        from pyspark.sql import functions as F

        from searchenginesimple_spark.operators.spandedup import remove_clone_spans
        from searchenginesimple_spark.operators.winnow import (
            clone_pairs,
            clone_spans,
            winnow_fingerprints,
        )

        docs = spark.read.parquet(args.input)
        if "doc_id" not in docs.columns:
            from searchenginesimple_spark.sources.corpus import with_doc_ids

            docs = with_doc_ids(docs)
        fps = winnow_fingerprints(docs, k=args.k, w=args.w)
        spans = clone_spans(fps, clone_pairs(fps, min_shared=args.min_shared), k=args.k)
        remove_clone_spans(
            docs, spans, min_span_tokens=args.min_span_tokens
        ).write.mode("overwrite").parquet(args.output)
        out = spark.read.parquet(args.output)
        stats = out.agg(
            F.count("*").alias("docs"),
            F.sum(F.when(F.col("n_spans_applied") > 0, 1).otherwise(0)).alias("rewritten"),
            F.sum("n_tokens_removed").alias("tokens_removed"),
        ).collect()[0]
        print(json.dumps({
            "docs": stats["docs"], "rewritten": int(stats["rewritten"] or 0),
            "tokens_removed": int(stats["tokens_removed"] or 0),
            "output": args.output,
        }))
        return 0

    if args.cmd == "pack":
        from searchenginesimple_spark.operators.repopack import pack_repo_samples

        docs = spark.read.parquet(args.input)
        if "doc_id" not in docs.columns:
            from searchenginesimple_spark.sources.corpus import with_doc_ids

            docs = with_doc_ids(docs)
        pack_repo_samples(
            docs, sample_tokens=args.sample_tokens
        ).write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(json.dumps({"samples": n, "output": args.output}))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
