"""Document chunking (operators/chunk.py).

Contract: Spark output ≡ the pure-Python greedy twin byte-for-byte, the
budget holds except for single-over-budget-line chunks, overlap lines are
literal prefixes from the previous chunk, and chunks with overlap removed
reconstruct the document exactly.  Plus a plan pin: the operator is one
map-side projection — no shuffle.
"""

from __future__ import annotations

import pytest

from searchenginesimple_spark.operators.chunk import (
    chunk_documents,
    chunk_documents_py,
)
from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

N_DOCS = 120


@pytest.fixture(scope="module")
def corpus(spark):
    docs = with_doc_ids(docs_df(spark, N_DOCS)).select("doc_id", "content")
    docs = docs.cache()
    docs.count()
    return docs


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("budget,overlap", [(32, 0), (32, 2), (8, 1), (512, 4)])
def test_matches_python_twin(spark, corpus, budget, overlap):
    got = _rows(chunk_documents(corpus, chunk_tokens=budget, overlap_lines=overlap))
    rows = [tuple(r) for r in corpus.collect()]
    want = chunk_documents_py(rows, chunk_tokens=budget, overlap_lines=overlap)
    assert got == want
    if budget <= 32:
        assert len(got) > N_DOCS  # small budgets actually split docs


def test_budget_respected_except_single_long_lines(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c\nd e f\ng h i\nj k l"),            # 3 tokens per line
            (1, " ".join(f"t{i}" for i in range(50))),     # one 50-token line
            (2, ""),                                       # empty doc
        ],
        "doc_id long, content string",
    )
    out = chunk_documents(docs, chunk_tokens=6).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: 4 lines × 3 tokens, budget 6 → 2 lines per chunk
    assert [r["n_tokens"] for r in sorted(by_doc[0], key=lambda r: r["chunk_id"])] == [6, 6]
    # doc 1: single over-budget line = its own chunk, never split
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_tokens"] == 50
    # doc 2: one empty chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk"] == ""
    assert all(r["n_chunks"] == len(by_doc[r["doc_id"]]) for r in out)


def test_reconstruction_with_overlap_removed(spark, corpus):
    overlap = 3
    out = chunk_documents(corpus, chunk_tokens=24, overlap_lines=overlap).collect()
    content = {r["doc_id"]: r["content"] for r in corpus.collect()}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        parts, cum, pref, prev_lines = [], 0, 0, []
        for c in chunks:
            body = c["chunk"].split("\n")
            # the prepended overlap is min(overlap, lines before this chunk)
            # and is a literal suffix of the previous chunk
            if pref:
                assert body[:pref] == prev_lines[-pref:]
            core = body[pref:]
            parts.append("\n".join(core))
            cum += len(core)
            prev_lines, pref = body, min(overlap, cum)
        assert "\n".join(parts) == content[doc_id]


def test_shuffle_free_plan(spark):
    # plain local docs: any Exchange in the plan would be the operator's
    # own (the synthetic-corpus generator has its own exchanges)
    docs = spark.createDataFrame(
        [(i, "a b c\nd e f\ng h") for i in range(8)],
        "doc_id long, content string",
    )
    plan = (
        chunk_documents(docs, chunk_tokens=64, overlap_lines=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_bad_knobs(spark, corpus):
    with pytest.raises(ValueError):
        chunk_documents(corpus, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(corpus, overlap_lines=-1)
