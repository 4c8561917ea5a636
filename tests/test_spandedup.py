"""Span-level dedup (operators/spandedup.py).

Pins: Spark ≡ the pure-Python twin byte-for-byte; keep-first (the a-side
doc keeps the passage, the b-side loses it) through the full winnow →
pairs → spans → remove pipeline; untouched docs byte-identical; overlap
handling without pre-merge; min_span_tokens threshold; mixed-case
original text survives with its case intact; partition invariance; no
Python rows in the plan.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.config import TOKEN_RE
from searchenginesimple_spark.operators.spandedup import (
    remove_clone_spans,
    remove_clone_spans_py,
)
from searchenginesimple_spark.operators.winnow import (
    clone_pairs,
    clone_spans,
    winnow_fingerprints,
)

SPAN_SCHEMA = "a_id long, b_id long, side string, start_tok long, end_tok long"


def _rows(df):
    return sorted(
        map(
            tuple,
            df.select(
                "doc_id", "content", "n_tokens_removed", "n_spans_applied"
            ).collect(),
        )
    )


def test_matches_python_twin_and_cut_rule(spark):
    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "x0 alpha beta gamma delta y0 y1"),
        (3, "plain doc three stays whole"),
        (4, ""),
    ]
    # cut tokens 1..4 from doc 2 ("alpha beta gamma delta")
    spans = [(1, 2, "a", 0, 3), (1, 2, "b", 1, 4)]
    ddf = spark.createDataFrame(docs, "doc_id long, content string")
    sdf = spark.createDataFrame(spans, SPAN_SCHEMA)
    got = _rows(remove_clone_spans(ddf, sdf))
    want = remove_clone_spans_py(docs, spans)
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[2][1] == "x0 y0 y1"          # passage gone, rest intact
    assert by_id[2][2] == 4 and by_id[2][3] == 1
    assert by_id[1][1] == docs[0][1]          # a-side keeps the passage
    assert by_id[3] == (3, "plain doc three stays whole", 0, 0)
    assert by_id[4] == (4, "", 0, 0)


def test_overlapping_spans_and_threshold(spark):
    docs = [(7, " ".join(f"t{i}" for i in range(12)))]
    spans = [
        (1, 7, "b", 2, 5),
        (1, 7, "b", 4, 8),     # overlaps the first -> union 2..8
        (1, 7, "b", 10, 10),   # below min_span_tokens=2, ignored
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, content string")
    sdf = spark.createDataFrame(spans, SPAN_SCHEMA)
    got = _rows(remove_clone_spans(ddf, sdf, min_span_tokens=2))
    want = remove_clone_spans_py(docs, spans, min_span_tokens=2)
    assert got == want
    assert got[0][1] == "t0 t1 t9 t10 t11"
    assert got[0][2] == 7 and got[0][3] == 2


def test_case_and_layout_preserved(spark):
    content = "def Foo():\n    Bar = CONST_X + 1\n    return Bar\n"
    docs = [(1, content)]
    spans = [(0, 1, "b", 2, 3)]  # cut tokens "bar", "const_x" (ci positions)
    ddf = spark.createDataFrame(docs, "doc_id long, content string")
    sdf = spark.createDataFrame(spans, SPAN_SCHEMA)
    got = _rows(remove_clone_spans(ddf, sdf))
    want = remove_clone_spans_py(docs, spans)
    assert got == want
    out = got[0][1]
    # surviving text keeps ORIGINAL case and whitespace exactly
    assert out.startswith("def Foo():\n    ")
    assert "return Bar" in out and "CONST_X" not in out


def test_end_to_end_winnow_pipeline(spark):
    """Planted 30-token passage in two docs: after the full mine → span →
    remove pipeline the larger doc_id loses (at least the interior of) the
    passage, the smaller keeps it verbatim, and untouched docs are
    byte-identical."""
    k, w = 5, 4
    run = " ".join(f"shared{i}" for i in range(30))
    docs = [
        (1, " ".join(f"apre{i}" for i in range(10)) + f" {run} tail_a"),
        (2, " ".join(f"bpre{i}" for i in range(20)) + f" {run}"),
        (3, " ".join(f"other{i}" for i in range(40))),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, content string")
    fps = winnow_fingerprints(ddf, k=k, w=w)
    spans = clone_spans(fps, clone_pairs(fps, min_shared=2), k=k)
    out = {r[0]: r for r in _rows(remove_clone_spans(ddf, spans))}

    assert out[1][1] == docs[0][1]            # keep-first: doc 1 untouched
    assert out[3][1] == docs[2][1]
    # winnow boundaries can shave up to w+k-2 tokens at each end, so pin
    # the guaranteed interior of the passage gone from doc 2
    slack = w + k - 2
    interior = [f"shared{i}" for i in range(slack, 30 - slack)]
    assert interior and all(t not in out[2][1] for t in interior)
    assert all(f"bpre{i}" in out[2][1] for i in range(20))  # prefix intact
    assert out[2][2] >= len(interior)

    # twin agreement over the mined spans too
    span_rows = [
        (r["a_id"], r["b_id"], r["side"], r["start_tok"], r["end_tok"])
        for r in spans.collect()
    ]
    assert sorted(out.values()) == remove_clone_spans_py(docs, span_rows)


def test_partition_invariance_and_plan(spark):
    docs = [(i, " ".join(f"w{i}_{j}" for j in range(20))) for i in range(30)]
    spans = [(0, i, "b", 3, 9) for i in range(0, 30, 3)]
    ddf = spark.createDataFrame(docs, "doc_id long, content string")
    sdf = spark.createDataFrame(spans, SPAN_SCHEMA)
    a = _rows(remove_clone_spans(ddf.repartition(1), sdf.repartition(1)))
    b = _rows(remove_clone_spans(ddf.repartition(7), sdf.repartition(3)))
    assert a == b
    plan = (
        remove_clone_spans(ddf, sdf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unicode_misalignment_guard(spark):
    """A doc whose (?i) segmentation disagrees with the lowercase
    segmentation (exotic case mappings like U+0130) is left byte-identical
    instead of mis-cut — the fingerprint token coordinates don't apply."""
    tricky = "İstanbul alpha beta gamma delta epsilon"
    plain = "istanbul alpha beta gamma delta epsilon"
    docs = [(1, tricky), (2, plain)]
    spans = [(0, 1, "b", 1, 2), (0, 2, "b", 1, 2)]
    ddf = spark.createDataFrame(docs, "doc_id long, content string")
    sdf = spark.createDataFrame(
        spans, "a_id long, b_id long, side string, start_tok long, end_tok long"
    )
    out = {r["doc_id"]: r for r in remove_clone_spans(ddf, sdf).collect()}
    # Java (?i) is ASCII-only: 'İ' breaks the token at position 0 while
    # lower() would not -> counts differ -> doc 1 skipped untouched
    assert out[1]["content"] == tricky
    assert out[1]["n_spans_applied"] == 0 and out[1]["n_tokens_removed"] == 0
    # the all-ASCII twin doc cuts normally (tokens 1..2 = alpha beta)
    assert out[2]["content"] == "istanbul gamma delta epsilon"
    assert out[2]["n_tokens_removed"] == 2
