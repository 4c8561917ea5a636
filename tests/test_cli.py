"""CLI smoke: the spark-submit entry points build an index and answer a query
end-to-end (cli.py is the ship-to-cluster surface the north rule names)."""

from __future__ import annotations

import json


def test_cli_build_and_query(spark, tmp_path, capsys):
    import searchenginesimple_spark.cli as cli
    from searchenginesimple_spark.sources.corpus import docs_df

    corpus, idx = tmp_path / "corpus", tmp_path / "idx"
    docs_df(spark, 200).write.mode("overwrite").parquet(str(corpus))

    rc = cli.main(["build", "--input", str(corpus), "--index", str(idx)])
    assert rc == 0
    build_line = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(build_line)
    assert res["n_docs"] > 0 and res["built_shards"] >= 1

    rc = cli.main(["query", "--index", str(idx), "--query", "ident_000"])
    assert rc == 0
    rows = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert rows and all(set(r) == {"query", "rank", "docID", "score"} for r in rows)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_cli_grep_and_chunk(spark, tmp_path, capsys):
    import searchenginesimple_spark.cli as cli
    from searchenginesimple_spark.sources.corpus import docs_df

    corpus, tri, chunks = tmp_path / "corpus", tmp_path / "tri", tmp_path / "chunks"
    docs_df(spark, 150).write.mode("overwrite").parquet(str(corpus))

    rc = cli.main(
        ["grep", "--input", str(corpus), "--index", str(tri),
         "--query", "return ident", "--query", "zzz_absent OR loc_7_"]
    )
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and all(set(r) == {"query", "doc_id"} for r in rows)
    assert {r["query"] for r in rows} == {"return ident", "zzz_absent OR loc_7_"}

    # second run resumes the committed index (no rebuild) — same answers
    rc = cli.main(
        ["grep", "--input", str(corpus), "--index", str(tri),
         "--query", "return ident", "--query", "zzz_absent OR loc_7_"]
    )
    assert rc == 0
    rows2 = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert sorted(map(tuple, (r.items() for r in rows2))) == sorted(
        map(tuple, (r.items() for r in rows))
    )

    # --lines: grep-style per-line rows, -m 1 caps to the first line per doc
    rc = cli.main(
        ["grep", "--input", str(corpus), "--index", str(tri),
         "--query", "return ident", "--lines", "-m", "1"]
    )
    assert rc == 0
    lrows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lrows and all(
        set(r) == {"query", "doc_id", "line_no", "line"} for r in lrows
    )
    assert {r["doc_id"] for r in lrows} == {
        r["doc_id"] for r in rows if r["query"] == "return ident"
    }
    assert len(lrows) == len({r["doc_id"] for r in lrows})  # -m 1
    assert all(
        "return" in r["line"] or "ident" in r["line"] for r in lrows
    )

    # --ranked: ladder-ordered top-k rows per query
    rc = cli.main(
        ["grep", "--input", str(corpus), "--index", str(tri),
         "--query", "return ident", "--ranked", "-k", "5"]
    )
    assert rc == 0
    rrows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [r["rank"] for r in rrows] == list(range(1, len(rrows) + 1))
    assert 0 < len(rrows) <= 5
    occ = [(r["symbol_match"], r["path_match"], r["n_occurrences"]) for r in rrows]
    assert occ == sorted(occ, reverse=True)  # the ladder is the sort key

    # --facets: per-repo/lang match counts; totals equal the hit rows
    rc = cli.main(
        ["grep", "--input", str(corpus), "--index", str(tri),
         "--query", "return ident", "--facets"]
    )
    assert rc == 0
    frows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    n_hits = len({r["doc_id"] for r in rows if r["query"] == "return ident"})
    for facet in ("repo", "lang"):
        assert sum(r["n_docs"] for r in frows if r["facet"] == facet) == n_hits

    # --explain: routing report, no corpus access; routes match the rules
    rc = cli.main(
        ["grep", "--input", str(corpus), "--index", str(tri),
         "--query", "return ident", "--query=-return", "--explain"]
    )
    assert rc == 0
    erows = {
        r["query"]: r
        for r in map(json.loads, capsys.readouterr().out.strip().splitlines())
    }
    assert erows["return ident"]["path"] == "index"
    assert erows["return ident"]["est_candidates"] >= n_hits
    assert erows["-return"]["path"] == "scan"

    # --ranked --priority: (doc_id, rank) parquet tie-breaks quality ties
    # and surfaces as a priority column
    prio = tmp_path / "prio"
    spark.createDataFrame(
        [(i, 1000 - i) for i in range(150)], "doc_id long, rank long"
    ).write.mode("overwrite").parquet(str(prio))
    rc = cli.main(
        ["grep", "--input", str(corpus), "--index", str(tri),
         "--query", "return ident", "--ranked", "-k", "5",
         "--priority", str(prio)]
    )
    assert rc == 0
    prows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert prows and all("priority" in r for r in prows)
    keys = [
        (r["symbol_match"], r["path_match"], r["n_occurrences"], r["priority"])
        for r in prows
    ]
    assert keys == sorted(keys, reverse=True)

    rc = cli.main(
        ["chunk", "--input", str(corpus), "--output", str(chunks),
         "--chunk-tokens", "32", "--overlap-lines", "2"]
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["chunks"] > 150  # budget 32 splits the corpus docs
    out = spark.read.parquet(str(chunks))
    assert set(out.columns) == {"doc_id", "chunk_id", "n_chunks", "n_tokens", "chunk"}


def test_cli_watch(spark, tmp_path, capsys):
    import searchenginesimple_spark.cli as cli

    incoming, matches = tmp_path / "incoming", tmp_path / "matches"
    docs = [
        (1, "py", "def crypto_sign(): return seal"),
        (2, "py", "def vendor_crypto(): pass"),
        (3, "js", "function crypto() { return 1 }"),
    ]
    for row in docs:
        spark.createDataFrame(
            [row], "doc_id long, lang string, content string"
        ).coalesce(1).write.mode("append").parquet(str(incoming))

    argv = ["watch", "--input", str(incoming), "--output", str(matches),
            "--query", "crypto -vendor", "--query", "sym:crypto lang:py"]
    rc = cli.main(argv)
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    got = {(r["query"], r["doc_id"]) for r in rows}
    assert got == {
        ("crypto -vendor", 1), ("crypto -vendor", 3),
        ("sym:crypto lang:py", 1), ("sym:crypto lang:py", 2),
    }

    # a drained re-run on the same checkpoint reports the same matches
    rc = cli.main(argv)
    assert rc == 0
    rows2 = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {(r["query"], r["doc_id"]) for r in rows2} == got

    # a doc_id-less input fails loudly at the seam
    bad = tmp_path / "bad"
    spark.createDataFrame([("x",)], "content string").write.parquet(str(bad))
    rc = cli.main(["watch", "--input", str(bad), "--output", str(tmp_path / "m2"),
                   "--query", "x"])
    assert rc == 2


def test_spark_submit_py_files_ships(spark, tmp_path):
    """The literal north-rule ship mechanism: zip the package, launch a real
    ``spark-submit --py-files engine.zip driver.py`` subprocess from a cwd
    where the repo checkout is NOT importable, and prove the job both ran
    end-to-end (build then query, rank-ordered JSON rows out) and resolved
    the engine from the ZIP (the shim prints the module's __file__)."""
    import os
    import shutil
    import subprocess
    import sys
    import zipfile

    import pyspark

    from searchenginesimple_spark.sources.corpus import docs_df

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "searchenginesimple_spark")
    zip_path = tmp_path / "engine.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))

    shim = tmp_path / "driver.py"
    shim.write_text(
        "import sys\n"
        "import searchenginesimple_spark\n"
        "print('ENGINE_FROM', searchenginesimple_spark.__file__, flush=True)\n"
        "from searchenginesimple_spark.cli import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )

    corpus, idx = tmp_path / "corpus", tmp_path / "idx"
    docs_df(spark, 150).write.mode("overwrite").parquet(str(corpus))

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    env = {**os.environ}
    env.pop("PYTHONPATH", None)  # imports must come from the zip, not the repo
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    def submit(*args: str) -> list[str]:
        res = subprocess.run(
            [spark_submit, "--master", "local[4]", "--py-files", str(zip_path),
             str(shim), *args],
            cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=600,
        )
        assert res.returncode == 0, res.stderr[-3000:]
        lines = [l for l in res.stdout.splitlines() if l.strip()]
        assert any(
            l.startswith("ENGINE_FROM") and "engine.zip" in l for l in lines
        ), lines[:3]
        return [l for l in lines if not l.startswith("ENGINE_FROM")]

    import json

    build_out = submit("build", "--input", str(corpus), "--index", str(idx))
    built = json.loads(build_out[-1])
    assert built["n_docs"] > 0 and built["built_shards"] >= 1

    query_out = submit("query", "--index", str(idx), "--query", "ident_000")
    rows = [json.loads(l) for l in query_out]
    assert rows and [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(set(r) == {"query", "rank", "docID", "score"} for r in rows)


def test_cli_curate(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    import searchenginesimple_spark.cli as cli
    from searchenginesimple_spark.sources.corpus import docs_df

    corpus, out = tmp_path / "corpus", tmp_path / "curated"
    docs_df(spark, 120).write.mode("overwrite").parquet(str(corpus))

    rc = cli.main(
        ["curate", "--input", str(corpus), "--output", str(out),
         "--allowed-licenses", "unknown", "--drop-minified",
         "--per-source-cap", "3", "--chunk-tokens", "64"]
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < res["kept"] <= 120
    assert set(res["stages"]) == {
        "prefilter", "exact", "neardup", "quality", "sample", "chunk"
    }
    # the metrics chain is monotone non-increasing through the doc stages
    chain = [res["stages"][s] for s in
             ("prefilter", "exact", "neardup", "quality", "sample")]
    assert all(a[1] <= a[0] for a in chain)
    # quota bites: ≤3 docs per repo among kept
    kept = spark.read.parquet(str(out / "curate_kept"))
    mx = kept.groupBy("repo").count().agg(F.max("count")).collect()[0][0]
    assert mx <= 3
    # chunks exist for the kept docs
    chunks = spark.read.parquet(str(out / "curate_chunks"))
    assert chunks.count() >= res["kept"]


def test_cli_search_hybrid(spark, tmp_path, capsys):
    """search = BM25 ranking over a boolean-filtered candidate set; the
    unfiltered leg and the filtered leg ride one invocation."""
    import searchenginesimple_spark.cli as cli
    from searchenginesimple_spark.sources.corpus import docs_df

    corpus, tri = tmp_path / "corpus", tmp_path / "tri"
    docs_df(spark, 150).write.mode("overwrite").parquet(str(corpus))

    rc = cli.main(
        ["search", "--input", str(corpus), "--index", str(tri),
         "--query", "return ident", "--query", "return ident",
         "--filter", "loc_7_", "--filter", "",
         "-k", "5"]
    )
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows
    flt = [r for r in rows if r["filter"] == "loc_7_"]
    unf = [r for r in rows if r["filter"] is None]
    assert flt and unf
    # ranks dense per leg; the filtered leg is a subset of docs but its
    # scores agree with the unfiltered ranking where they overlap
    assert [r["rank"] for r in flt] == list(range(1, len(flt) + 1))
    assert [r["rank"] for r in unf] == list(range(1, len(unf) + 1))
    unf_scores = {r["doc_id"]: r["score"] for r in unf}
    for r in flt:
        if r["doc_id"] in unf_scores:
            assert r["score"] == unf_scores[r["doc_id"]]


def test_cli_search_collapse(spark, tmp_path, capsys):
    """search --collapse: planted exact duplicates collapse to one hit per
    cluster, survivors re-ranked densely, orig_rank/cluster_id reported."""
    import searchenginesimple_spark.cli as cli
    from pyspark.sql import functions as F
    from searchenginesimple_spark.operators.graph import connected_components
    from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

    corpus, tri, cl = tmp_path / "corpus", tmp_path / "tri", tmp_path / "cl"
    docs = with_doc_ids(docs_df(spark, 100))
    dups = docs.withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
    both = docs.unionByName(dups)
    both.write.mode("overwrite").parquet(str(corpus))
    pairs = (
        both.alias("a")
        .join(both.alias("b"),
              F.sha2(F.col("a.content"), 256) == F.sha2(F.col("b.content"), 256))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
    )
    connected_components(pairs).write.mode("overwrite").parquet(str(cl))

    rc = cli.main(
        ["search", "--input", str(corpus), "--index", str(tri),
         "--query", "return ident_001", "--collapse", str(cl), "-k", "5"]
    )
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and len(rows) <= 5
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # every original doc was planted with an exact duplicate, so every
    # survivor carries a cluster_id and no two survivors share one
    cids = [r["cluster_id"] for r in rows]
    assert all(c is not None for c in cids) and len(cids) == len(set(cids))
    # collapse dropped the duplicate partners: orig_rank gaps appear
    assert [r["orig_rank"] for r in rows] != [r["rank"] for r in rows]


def test_cli_pack(spark, tmp_path, capsys):
    import pyspark.sql.functions as F

    import searchenginesimple_spark.cli as cli
    from searchenginesimple_spark.operators.repopack import pack_repo_samples_py
    from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

    corpus, samples = tmp_path / "corpus", tmp_path / "samples"
    # re-key to a few multi-file repos (the synthetic repo key is unique
    # per doc at this scale)
    docs = with_doc_ids(docs_df(spark, 60)).withColumn(
        "repo", F.concat(F.lit("r"), F.col("doc_id") % 5)
    )
    docs.write.mode("overwrite").parquet(str(corpus))

    rc = cli.main(
        ["pack", "--input", str(corpus), "--output", str(samples),
         "--sample-tokens", "256"]
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    out = spark.read.parquet(str(samples))
    assert res["samples"] == out.count() > 5  # budget 256 splits the repos
    assert set(out.columns) == {"repo", "sample_id", "n_files", "n_tokens", "sample"}
    got = sorted(map(tuple, out.collect()))
    want = pack_repo_samples_py(
        [
            (r["repo"], r["path"], r["doc_id"], r["content"])
            for r in docs.collect()
        ],
        sample_tokens=256,
    )
    assert got == want


def test_cli_delete_and_compact(spark, tmp_path, capsys):
    import searchenginesimple_spark.cli as cli
    from searchenginesimple_spark.sources.corpus import docs_df

    corpus, idx = tmp_path / "corpus", tmp_path / "idx"
    docs_df(spark, 200).write.mode("overwrite").parquet(str(corpus))
    assert cli.main(["build", "--input", str(corpus), "--index", str(idx)]) == 0
    capsys.readouterr()

    def top(query="ident_000"):
        assert cli.main(["query", "--index", str(idx), "--query", query]) == 0
        return [
            json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
        ]

    before = top()
    victim = before[0]["docID"]

    # tombstone the rank-1 doc: next query backfills immediately
    assert cli.main(
        ["delete", "--index", str(idx), "--doc-id", str(victim)]
    ) == 0
    del_out = json.loads(capsys.readouterr().out.strip())
    assert del_out["tombstoned"] == 1
    assert del_out["needs_compaction"] is False  # one id ≪ fastpath cap
    after_del = top()
    assert victim not in {r["docID"] for r in after_del}
    assert len(after_del) == len(before)  # top-k backfilled, no hole

    # compact folds it in; the doc stays gone
    assert cli.main(["compact", "--index", str(idx), "--purge-content"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["n_deleted"] == 1 and len(res["affected_shards"]) == 1
    after_cmp = top()
    assert victim not in {r["docID"] for r in after_cmp}


def test_cli_delete_janitor_autocompacts(spark, tmp_path, capsys, monkeypatch):
    """--compact-if-needed is the janitor wiring for needs_compaction():
    a delete that pushes the pending set past the fastpath guard triggers
    compact_index inline, and the emitted JSON reports the signal cleared
    (every query path is back in fastpath mode)."""
    import dataclasses

    import searchenginesimple_spark.cli as cli
    from searchenginesimple_spark.sources.corpus import docs_df

    corpus, idx = tmp_path / "corpus", tmp_path / "idx"
    docs_df(spark, 200).write.mode("overwrite").parquet(str(corpus))
    assert cli.main(["build", "--input", str(corpus), "--index", str(idx)]) == 0
    capsys.readouterr()

    # guard shrunk so a 3-id delete counts as a mass delete (cli.main
    # re-imports DEFAULT from config per call, so the module attr patch
    # is what its delete handler reads)
    import searchenginesimple_spark.config as config_mod

    monkeypatch.setattr(
        config_mod,
        "DEFAULT",
        dataclasses.replace(config_mod.DEFAULT, tombstone_fastpath_max=2),
    )
    assert cli.main(
        ["delete", "--index", str(idx), "--doc-id", "0", "--doc-id", "1",
         "--doc-id", "2", "--compact-if-needed"]
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tombstoned"] == 3
    assert "compacted" in out and out["compacted"]["n_deleted"] == 3
    assert out["needs_compaction"] is False
    from searchenginesimple_spark.sources.io import TableIO

    assert TableIO(spark, str(idx)).read("tombstones").count() == 0


def test_cli_despan(spark, tmp_path, capsys):
    import searchenginesimple_spark.cli as cli

    corpus, cleaned = tmp_path / "corpus", tmp_path / "cleaned"
    run = " ".join(f"shared{i}" for i in range(40))
    rows = [
        (1, "k1.py", f"prefix_one {run} suffix_one"),
        (2, "k2.py", " ".join(f"bpre{i}" for i in range(15)) + f" {run}"),
        (3, "k3.py", " ".join(f"other{i}" for i in range(50))),
    ]
    spark.createDataFrame(
        rows, "doc_id long, path string, content string"
    ).write.mode("overwrite").parquet(str(corpus))

    rc = cli.main(
        ["despan", "--input", str(corpus), "--output", str(cleaned),
         "--min-span-tokens", "10"]
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["docs"] == 3 and res["rewritten"] == 1
    assert res["tokens_removed"] > 20
    out = {r["doc_id"]: r for r in spark.read.parquet(str(cleaned)).collect()}
    assert out[1]["content"] == rows[0][2]      # keep-first: doc 1 intact
    assert out[3]["content"] == rows[2][2]
    assert "shared20" not in out[2]["content"]  # passage interior cut


def test_cli_curate_increment(spark, tmp_path, capsys):
    import searchenginesimple_spark.cli as cli

    base, delta, out = tmp_path / "base", tmp_path / "delta", tmp_path / "cur"
    spark.createDataFrame(
        [
            (0, "one two three four five six seven eight nine ten", "en", "s"),
            (1, "ichi ni san shi go roku nana hachi kyu ju", "en", "s"),
        ],
        "doc_id long, content string, lang string, source string",
    ).write.mode("overwrite").parquet(str(base))
    spark.createDataFrame(
        [
            # exact dup of base doc 0 -> rejected
            (10, "one two three four five six seven eight nine ten", "en", "s"),
            (11, "uno due tre quattro cinque sei sette otto nove dieci", "en", "s"),
        ],
        "doc_id long, content string, lang string, source string",
    ).write.mode("overwrite").parquet(str(delta))

    assert cli.main(["curate", "--input", str(base), "--output", str(out)]) == 0
    capsys.readouterr()
    rc = cli.main(
        ["curate", "--increment", "--input", str(delta), "--output", str(out)]
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["admitted"] == 1 and res["kept_total"] == 3
    assert res["generations"] == [{"gen": 1, "docs_in": 2, "docs_out": 1}]


def test_cli_eval(spark, tmp_path, capsys):
    import searchenginesimple_spark.cli as cli

    res, qrels, pq = tmp_path / "res", tmp_path / "qrels", tmp_path / "pq"
    spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (2, 1, 30)], "query_id long, rank long, docID long"
    ).write.mode("overwrite").parquet(str(res))
    spark.createDataFrame(
        [(1, 20, 1.0), (2, 99, 1.0)], "query_id long, doc_id long, grade double"
    ).write.mode("overwrite").parquet(str(qrels))

    rc = cli.main(
        ["eval", "--results", str(res), "--qrels", str(qrels),
         "--k", "5", "--per-query", str(pq)]
    )
    assert rc == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["n_queries"] == 2
    assert abs(s["mrr"] - 0.25) < 1e-9  # (0.5 + 0) / 2
    out = spark.read.parquet(str(pq))
    assert out.count() == 2


def test_cli_complete(spark, tmp_path, capsys):
    import searchenginesimple_spark.cli as cli

    log = tmp_path / "log"
    rows = [("spark sql",)] * 3 + [("spark window",)] * 2 + [("spa day",)]
    spark.createDataFrame(rows, "query string").write.mode("overwrite").parquet(str(log))

    rc = cli.main(
        ["complete", "--log", str(log), "--prefix", "spark", "--prefix", "SPA",
         "--prefix", "spa ", "--k", "2"]
    )
    assert rc == 0
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    by = {(r["prefix"], r["rank"]): r for r in out}
    assert by[("spark", 1)]["completion"] == "spark sql"
    assert by[("spark", 2)]["completion"] == "spark window"
    assert by[("spa", 1)]["count"] == 3   # case normalized like the log
    # a trailing space is a REAL prefix (word-boundary continuations only)
    assert by[("spa ", 1)]["completion"] == "spa day"
    assert ("spa ", 2) not in by

    # a lookup beyond the mined prefix length fails loudly, not silently
    import pytest as _pytest
    with _pytest.raises(SystemExit, match="max-prefix"):
        cli.main(["complete", "--log", str(log),
                  "--prefix", "a prefix well beyond twelve chars"])
    # whitespace-only normalizes to the empty prefix — same loud contract
    with _pytest.raises(SystemExit, match="empty"):
        cli.main(["complete", "--log", str(log), "--prefix", "   "])


def test_cli_ingest_then_build_and_query(spark, tmp_path, capsys):
    """ingest (distributed DirScanner) → docs parquet → build → query: the
    full bootstrap path from a raw checkout tree to a served answer."""
    import searchenginesimple_spark.cli as cli

    root = tmp_path / "checkout"
    (root / "src").mkdir(parents=True)
    (root / ".git").mkdir()
    for i in range(30):
        (root / "src" / f"mod_{i:02d}.py").write_text(
            f"def ident_{i:03d}():\n    return shared_token + {i}\n"
        )
    (root / ".git" / "HEAD").write_text("ref: refs/heads/main\n")

    docs, idx = tmp_path / "docs", tmp_path / "idx"
    rc = cli.main(
        ["ingest", "--root", str(root), "--output", str(docs),
         "--repo", "demo", "--commit", "abc123"]
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["ingested_docs"] == 30  # .git skipped

    out = spark.read.parquet(str(docs))
    assert set(out.columns) == {"repo", "path", "commit", "lang", "content", "doc_id"}
    first = out.filter("path = 'src/mod_00.py'").first()
    assert first.lang == "python" and first.commit == "abc123"
    assert sorted(r.doc_id for r in out.select("doc_id").collect()) == list(range(30))

    rc = cli.main(["build", "--input", str(docs), "--index", str(idx)])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["n_docs"] == 30

    rc = cli.main(["query", "--index", str(idx), "--query", "ident_007"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and rows[0]["rank"] == 1

    # --output is write-once (mode=error): a re-ingest cannot clobber a corpus
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import AnalysisException
    with _pytest.raises((AnalysisException, Py4JJavaError)):
        cli.main(["ingest", "--root", str(root), "--output", str(docs)])
