"""Curation plan (plans/curate.py): stage rules, metrics chain, resume."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from searchenginesimple_spark.plans.curate import CurateConfig, curate
from searchenginesimple_spark.sources.io import TableIO

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
NEAR = "red orange yellow green blue indigo violet black white brown"


@pytest.fixture()
def corpus(spark):
    rows = [
        # 0/1: exact duplicates — exact stage keeps 0
        (0, BASE + " one", "en", "srcA"),
        (1, BASE + " one", "en", "srcA"),
        # 2/3/4: near-duplicate cluster (one trailing token differs;
        # vocabulary disjoint from BASE so the cluster cannot LSH-link to
        # docs 0/1) — neardup stage keeps the cluster min (2)
        (2, NEAR + " " + NEAR + " two", "en", "srcA"),
        (3, NEAR + " " + NEAR + " three", "en", "srcB"),
        (4, NEAR + " " + NEAR + " four", "en", "srcB"),
        # 5: junk — too few tokens, fails quality
        (5, "x y", "en", "srcB"),
        # 6: junk — symbol soup, fails alpha_ratio
        (6, "$$$ %%% ### !!! ??? ;;; ::: @@@ ^^^ &&&", "en", "srcC"),
        # 7: repetitive — one token dominates, fails top_token_frac
        (7, "spam spam spam spam spam spam spam spam spam ok", "en", "srcC"),
        # 8: clean unique doc, different lang
        (8, "uno dos tres cuatro cinco seis siete ocho nueve diez", "es", "srcC"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, content string, lang string, source string"
    )


def _cfg(**kw):
    return CurateConfig(
        minhash_threshold=0.5, minhash_hashes=32, minhash_bands=16, shingle_n=3, **kw
    )


def test_curate_stage_rules(spark, corpus, tmp_path):
    io = TableIO(spark, str(tmp_path))
    kept = curate(spark, corpus, io, _cfg())
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == [0, 2, 8]
    # full input columns survive to the kept table, content written once
    assert set(kept.columns) == {"doc_id", "content", "lang", "source"}

    m = {
        r["stage"]: (r["docs_in"], r["docs_out"])
        for r in io.read("curate_metrics").collect()
    }
    assert m["exact"] == (9, 8)  # doc 1 dropped
    assert m["neardup"] == (8, 6)  # docs 3, 4 dropped (cluster min = 2 kept)
    assert m["quality"] == (6, 3)  # docs 5, 6, 7 dropped
    assert m["sample"] == (3, 3)  # pass-through (no rates, no cap)


def test_curate_chunk_stage(spark, corpus, tmp_path):
    from searchenginesimple_spark.operators.chunk import chunk_documents_py

    io = TableIO(spark, str(tmp_path))
    kept = curate(spark, corpus, io, _cfg(chunk_tokens=6, chunk_overlap_lines=0))
    chunks = io.read("curate_chunks")
    assert set(chunks.columns) == {"doc_id", "chunk_id", "n_chunks", "n_tokens", "chunk"}
    # chunks cover exactly the kept docs, and match the greedy twin
    got = sorted(map(tuple, chunks.collect()))
    rows = [(r["doc_id"], r["content"]) for r in kept.collect()]
    assert got == chunk_documents_py(rows, chunk_tokens=6)
    assert {r[0] for r in got} == {0, 2, 8}
    # these docs are single-line: an over-budget line is its own chunk,
    # never split (the splitting behavior itself is pinned in test_chunk.py)
    assert all(r[2] == 1 and r[4] == dict(rows)[r[0]] for r in got)

    m = {
        r["stage"]: (r["docs_in"], r["docs_out"])
        for r in io.read("curate_metrics").collect()
    }
    assert m["chunk"] == (3, 3)

    # resume: chunk table committed → re-run rewrites nothing, same rows
    again = curate(spark, corpus, io, _cfg(chunk_tokens=6, chunk_overlap_lines=0))
    assert sorted(map(tuple, io.read("curate_chunks").collect())) == got
    assert {r["doc_id"] for r in again.collect()} == {0, 2, 8}


def test_curate_resume_is_idempotent(spark, corpus, tmp_path):
    io = TableIO(spark, str(tmp_path))
    first = {r["doc_id"] for r in curate(spark, corpus, io, _cfg()).collect()}
    # full re-run over committed tables: same kept set, same metrics
    again = {r["doc_id"] for r in curate(spark, corpus, io, _cfg()).collect()}
    assert first == again
    # simulate a crash AFTER stage 2: drop quality + downstream, re-run —
    # only the uncommitted stages re-execute and converge to the same set
    import shutil

    for t in ("curate_quality_ids", "curate_kept"):
        shutil.rmtree(f"{tmp_path}/{t}")
    third = {r["doc_id"] for r in curate(spark, corpus, io, _cfg()).collect()}
    assert first == third


def test_curate_sampling_and_quota(spark, corpus, tmp_path):
    io = TableIO(spark, str(tmp_path))
    # en fully sampled but capped to 1 doc per source; es dropped (rate 0)
    kept = curate(
        spark,
        corpus,
        io,
        _cfg(sample_rates={"en": 1.0}, per_source_cap=1),
    )
    got = sorted(r["doc_id"] for r in kept.collect())
    # quality survivors are {0 (srcA), 2 (srcA), 8 (srcC/es)}: es sampled
    # out, srcA capped to its smallest doc_id
    assert got == [0]
    m = {r["stage"]: r["docs_out"] for r in io.read("curate_metrics").collect()}
    assert m["sample"] == 1


def test_curate_deterministic_across_partitioning(spark, corpus, tmp_path):
    io1 = TableIO(spark, str(tmp_path / "a"))
    io2 = TableIO(spark, str(tmp_path / "b"))
    k1 = {r["doc_id"] for r in curate(spark, corpus.repartition(7), io1, _cfg()).collect()}
    k2 = {r["doc_id"] for r in curate(spark, corpus.coalesce(1), io2, _cfg()).collect()}
    assert k1 == k2


def test_curate_prefilter_stage(spark, corpus, tmp_path):
    """Stage-0 prefilter: license allow-list + vendored/generated drops run
    BEFORE dedup, the metrics chain gains the prefilter row, and a
    default-config run leaves the stage as a table-less pass-through."""
    rows = [
        # vendored path — dropped by drop_vendored
        (20, "vendor/lib/util.py",
         "alpha beta gamma delta epsilon zeta eta theta iota kappa v"),
        # generated marker — dropped by drop_generated
        (21, "src/gen/pb.py",
         "# Code generated by protoc. DO NOT EDIT.\n"
         "alpha beta gamma delta epsilon zeta eta theta iota kappa g"),
        # GPL header — dropped by the allow-list
        (22, "src/gpl.py",
         "# under the terms of the GNU General Public License\n"
         "alpha2 beta2 gamma2 delta2 epsilon2 zeta2 eta2 theta2 iota2 kappa2"),
        # MIT header — kept
        (23, "src/mit.py",
         "# MIT License\n"
         "uno2 dos2 tres2 cuatro2 cinco2 seis2 siete2 ocho2 nueve2 diez2"),
        # no header — kept ('unknown' allowed)
        (24, "src/plain.py",
         "one3 two3 three3 four3 five3 six3 seven3 eight3 nine3 ten3"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, path string, content string"
    ).withColumn("lang", F.lit("py")).withColumn("source", F.lit("srcZ"))

    io = TableIO(spark, str(tmp_path / "pre"))
    cfg = _cfg(
        allowed_licenses=("mit", "unknown"),
        drop_vendored=True,
        drop_generated=True,
        drop_minified=True,
    )
    kept = curate(spark, docs, io, cfg)
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == [23, 24]
    m = {
        r["stage"]: (r["docs_in"], r["docs_out"])
        for r in io.read("curate_metrics").collect()
    }
    assert m["prefilter"] == (5, 2)
    assert m["exact"][0] == 2  # dedup never saw the excluded docs

    # default config: no prefilter table, stage is a metrics pass-through
    io2 = TableIO(spark, str(tmp_path / "nopre"))
    curate(spark, docs, io2, _cfg())
    m2 = {
        r["stage"]: (r["docs_in"], r["docs_out"])
        for r in io2.read("curate_metrics").collect()
    }
    assert m2["prefilter"] == (5, 5)
    assert not io2.exists("curate_prefilter_ids")

    # drop_vendored without a path column fails loudly
    with pytest.raises(ValueError):
        curate(
            spark,
            docs.drop("path"),
            TableIO(spark, str(tmp_path / "bad")),
            _cfg(drop_vendored=True),
        )


def test_curate_repo_pack_stage(spark, corpus, tmp_path):
    from searchenginesimple_spark.operators.repopack import pack_repo_samples_py

    docs = corpus.withColumn(
        "repo", F.concat(F.lit("r"), F.col("doc_id") % 3)
    ).withColumn("path", F.concat(F.lit("f"), F.col("doc_id"), F.lit(".py")))
    io = TableIO(spark, str(tmp_path))
    kept = curate(spark, docs, io, _cfg(repo_pack_tokens=15))
    samples = io.read("curate_repo_samples")
    assert set(samples.columns) == {"repo", "sample_id", "n_files", "n_tokens", "sample"}
    got = sorted(map(tuple, samples.collect()))
    rows = [
        (r["repo"], r["path"], r["doc_id"], r["content"]) for r in kept.collect()
    ]
    assert got == pack_repo_samples_py(rows, sample_tokens=15)
    # kept docs are 0, 2, 8 → repos r0 (0) and r2 (2, 8); every kept doc packed
    assert {r[0] for r in got} == {"r0", "r2"}
    assert sum(r[2] for r in got) == 3

    m = {
        r["stage"]: (r["docs_in"], r["docs_out"])
        for r in io.read("curate_metrics").collect()
    }
    assert m["repo_pack"][0] == 3

    # repo_pack_tokens without repo/path columns fails loudly
    with pytest.raises(ValueError):
        curate(
            spark,
            corpus,
            TableIO(spark, str(tmp_path / "bad")),
            _cfg(repo_pack_tokens=15),
        )


def test_curate_despan_stage(spark, tmp_path):
    """Two docs sharing a long passage but dissimilar overall survive the
    doc-level dedup stages; the despan stage cuts the passage from the
    LARGER doc_id, quality scores the cleaned text, and curate_kept
    carries it."""
    run = " ".join(f"shared{i}" for i in range(40))
    uniq_a = " ".join(f"aword{i}" for i in range(120))
    uniq_b = " ".join(f"bword{i}" for i in range(120))
    rows = [
        (0, f"{uniq_a} {run}", "en", "srcA"),
        (1, f"{uniq_b} {run}", "en", "srcA"),
        (2, "uno dos tres cuatro cinco seis siete ocho nueve diez", "en", "srcB"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, content string, lang string, source string"
    )
    io = TableIO(spark, str(tmp_path))
    kept = curate(spark, docs, io, _cfg(despan_min_tokens=10))
    got = {r["doc_id"]: r["content"] for r in kept.collect()}
    assert set(got) == {0, 1, 2}
    assert got[0] == rows[0][1]            # keep-first: doc 0 intact
    assert got[2] == rows[2][1]            # clone-free doc untouched
    assert got[1] != rows[1][1]            # doc 1 was span-cleaned
    assert "bword5" in got[1]              # unique text survives
    assert "shared20" not in got[1]        # passage interior cut

    # only the rewritten doc is stored; metrics row records it
    despan = io.read("curate_despan").collect()
    assert [r["doc_id"] for r in despan] == [1]
    m = {
        r["stage"]: (r["docs_in"], r["docs_out"])
        for r in io.read("curate_metrics").collect()
    }
    assert m["despan"] == (3, 1)

    # resume: re-running with the same root is a no-op with identical output
    kept2 = curate(spark, docs, io, _cfg(despan_min_tokens=10))
    assert {r["doc_id"]: r["content"] for r in kept2.collect()} == got


def test_curate_config_change_against_committed_root_raises(spark, corpus, tmp_path):
    """Resume with a CHANGED config is a loud error, not a silent keep of
    the old committed stages (e.g. enabling despan after curate_kept
    committed used to append a despan metrics row over dirty text)."""
    io = TableIO(spark, str(tmp_path))
    first = {r["doc_id"] for r in curate(spark, corpus, io, _cfg()).collect()}
    # identical config resumes fine
    assert {r["doc_id"] for r in curate(spark, corpus, io, _cfg()).collect()} == first
    with pytest.raises(ValueError, match="config changed"):
        curate(spark, corpus, io, _cfg(despan_min_tokens=4))
    with pytest.raises(ValueError, match="config changed"):
        curate(spark, corpus, io, _cfg(min_tokens=7))
