"""Repo-level context packing (operators/repopack.py).

Contract: Spark output ≡ the pure-Python greedy twin byte-for-byte, the
token budget holds except for single-over-budget files, every input file
lands in exactly one sample (reconstruction), output is invariant to the
input's partition layout, and no Python rows appear in the plan.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.config import TOKEN_RE
from searchenginesimple_spark.operators.repopack import (
    pack_repo_samples,
    pack_repo_samples_py,
)
from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

N_DOCS = 150


@pytest.fixture(scope="module")
def corpus(spark):
    # the synthetic repo key (org i%7 / repo i%97) is unique per doc below
    # 679 docs — re-key to ~12 repos of ~12 files so packing actually packs
    docs = (
        with_doc_ids(docs_df(spark, N_DOCS))
        .withColumn("repo", F.concat(F.lit("r"), F.col("doc_id") % 12))
        .select("repo", "path", "doc_id", "content")
    )
    docs = docs.cache()
    docs.count()
    return docs


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _twin_rows(corpus):
    return [
        (r["repo"], r["path"], r["doc_id"], r["content"])
        for r in corpus.collect()
    ]


@pytest.mark.parametrize("budget", [64, 300, 10_000])
def test_matches_python_twin(spark, corpus, budget):
    got = _rows(pack_repo_samples(corpus, sample_tokens=budget))
    want = pack_repo_samples_py(_twin_rows(corpus), sample_tokens=budget)
    assert got == want
    n_repos = corpus.select("repo").distinct().count()
    if budget <= 300:
        assert len(got) > n_repos  # small budgets actually split repos
    assert len(got) >= n_repos  # every repo emits >= 1 sample


def test_budget_and_oversize_rule(spark):
    docs = spark.createDataFrame(
        [
            ("r1", "a.py", 0, "x y z"),                       # 3 tokens
            ("r1", "b.py", 1, "p q"),                         # 2 tokens
            ("r1", "c.py", 2, " ".join(f"t{i}" for i in range(40))),  # 40 > budget
            ("r1", "d.py", 3, "end"),
            ("r2", "only.py", 4, ""),                         # empty file
        ],
        "repo string, path string, doc_id long, content string",
    )
    out = {
        (r["repo"], r["sample_id"]): r
        for r in pack_repo_samples(docs, sample_tokens=8).collect()
    }
    # r1: [a(3) b(2)] fit in 8; c(40) alone over-budget; d starts fresh
    assert out[("r1", 0)]["n_tokens"] == 5 and out[("r1", 0)]["n_files"] == 2
    assert out[("r1", 1)]["n_tokens"] == 40 and out[("r1", 1)]["n_files"] == 1
    assert out[("r1", 2)]["n_tokens"] == 1
    # empty file still occupies a sample slot with its header
    assert out[("r2", 0)]["sample"] == "### only.py\n"
    # all non-oversize samples respect the budget
    assert all(
        r["n_tokens"] <= 8 for r in out.values() if r["n_files"] > 1
    )


def test_reconstruction_every_file_once(spark, corpus):
    """Splitting every sample back at its headers recovers exactly the
    input file set, each with its exact content."""
    out = pack_repo_samples(corpus, sample_tokens=200).collect()
    seen = {}
    for r in out:
        parts = re.split(r"(?:^|\n)### ", r["sample"])
        for p in parts:
            if not p:
                continue
            path, _, body = p.partition("\n")
            seen[(r["repo"], path)] = body
    want = {
        (r["repo"], r["path"]): r["content"] for r in corpus.collect()
    }
    assert seen == want


def test_partition_invariance(spark, corpus):
    a = _rows(pack_repo_samples(corpus.repartition(1), sample_tokens=128))
    b = _rows(pack_repo_samples(corpus.repartition(13, "path"), sample_tokens=128))
    assert a == b


def test_no_python_in_plan(spark, corpus):
    plan = pack_repo_samples(corpus, sample_tokens=128)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_n_tokens_matches_token_re(spark, corpus):
    out = pack_repo_samples(corpus, sample_tokens=256).collect()
    docs = {
        (r["repo"], r["path"]): len(re.findall(TOKEN_RE, r["content"].lower()))
        for r in corpus.collect()
    }
    for r in out:
        paths = re.findall(r"(?:^|\n)### ([^\n]*)", r["sample"])
        assert r["n_tokens"] == sum(docs[(r["repo"], p)] for p in paths)
        assert r["n_files"] == len(paths)


def test_null_keys_fold_to_empty(spark):
    """NULL repo/path must not silently drop files at the phase-2 join —
    they fold to the empty string (and sort first within the repo)."""
    docs = spark.createDataFrame(
        [
            (None, "a.py", 0, "x y z"),
            (None, None, 1, "p q"),
            ("r1", "b.py", 2, "m n"),
        ],
        "repo string, path string, doc_id long, content string",
    )
    got = _rows(pack_repo_samples(docs, sample_tokens=100))
    want = pack_repo_samples_py(
        [(None, "a.py", 0, "x y z"), (None, None, 1, "p q"), ("r1", "b.py", 2, "m n")],
        sample_tokens=100,
    )
    assert got == want
    by_repo = {r[0]: r for r in got}
    assert set(by_repo) == {"", "r1"}
    assert by_repo[""][2] == 2  # both null-repo files packed, none lost
    assert "p q" in by_repo[""][4] and "x y z" in by_repo[""][4]
