"""Line-match reporting (operators/trigram.py::trigram_search_lines).

Contract: output ≡ a pure-Python grep twin (enumerate(content.split('\\n')),
substring test per line) for every needle and knob — including the
documented seam that a needle spanning lines yields doc hits but no line
rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.operators.trigram import (
    build_trigram_index,
    trigram_search,
    trigram_search_lines,
)
from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

N_DOCS = 200

NEEDLES = [(0, "return"), (1, "loc_7_"), (2, "id"), (3, "zzz_absent")]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = with_doc_ids(docs_df(spark, N_DOCS)).select("doc_id", "content")
    docs = docs.cache()
    docs.count()
    return docs


@pytest.fixture(scope="module")
def index(spark, corpus):
    postings, stats = build_trigram_index(corpus)
    postings, stats = postings.cache(), stats.cache()
    postings.count(), stats.count()
    return postings, stats


def _twin(docs_rows, needles, ci=False, cap=None):
    out = []
    for nid, needle in needles:
        nn = needle.lower() if ci else needle
        for doc_id, content in docs_rows:
            n_doc = 0
            for i, line in enumerate(content.split("\n"), 1):
                if nn in (line.lower() if ci else line):
                    n_doc += 1
                    if cap is not None and n_doc > cap:
                        break
                    out.append((nid, needle, doc_id, i, line))
    return sorted(out)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_lines_match_grep_twin(spark, corpus, index):
    postings, stats = index
    got = trigram_search_lines(corpus, postings, stats,
                               spark.createDataFrame(NEEDLES, "needle_id long, needle string"))
    rows = [tuple(r) for r in corpus.collect()]
    want = _twin(rows, NEEDLES)
    assert _rows(got) == want
    assert len(want) > 0


def test_lines_cap_is_grep_m(spark, corpus, index):
    postings, stats = index
    got = trigram_search_lines(
        corpus, postings, stats,
        spark.createDataFrame(NEEDLES, "needle_id long, needle string"),
        max_lines_per_doc=2,
    )
    rows = [tuple(r) for r in corpus.collect()]
    assert _rows(got) == _twin(rows, NEEDLES, cap=2)


def test_multiline_needle_has_doc_hit_but_no_lines(spark):
    docs = spark.createDataFrame(
        [(0, "alpha\nbeta\n")], "doc_id long, content string"
    )
    postings, stats = build_trigram_index(docs)
    needles = spark.createDataFrame(
        [(0, "alpha\nbeta")], "needle_id long, needle string"
    )
    assert trigram_search(docs, postings, stats, needles).count() == 1
    assert trigram_search_lines(docs, postings, stats, needles).count() == 0


def test_lines_case_insensitive(spark, corpus):
    postings, stats = build_trigram_index(corpus, case_insensitive=True)
    needles = [(0, "RETURN")]
    got = trigram_search_lines(
        corpus, postings, stats,
        spark.createDataFrame(needles, "needle_id long, needle string"),
        case_insensitive=True,
    )
    rows = [tuple(r) for r in corpus.collect()]
    assert _rows(got) == _twin(rows, needles, ci=True)
    assert got.count() > 0
