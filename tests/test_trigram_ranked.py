"""Boosted ranked search (operators/trigram.py::trigram_search_topk_ranked).

Contract: the full (symbol_match, path_match, n_occurrences, doc_id)
ordering is reproduced by an independent pure-Python twin (python ``re``
over the same SYMBOL_PATTERNS + ``str.count`` occurrences) — the operator's
boosts are plain string arithmetic, so the twin is exact, not approximate.
"""

from __future__ import annotations

import re

import pytest

from searchenginesimple_spark.functions.code import SYMBOL_PATTERNS
from searchenginesimple_spark.operators.trigram import (
    build_trigram_index,
    trigram_search_topk_ranked,
)
from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

N_DOCS = 200


@pytest.fixture(scope="module")
def corpus(spark):
    docs = with_doc_ids(docs_df(spark, N_DOCS)).select("doc_id", "path", "content")
    docs = docs.cache()
    docs.count()
    return docs


def _twin(docs_rows, needles, k, ci=False):
    """(doc_id, path, content) rows → the expected ranked output."""
    out = []
    for nid, needle in needles:
        nn = needle.lower() if ci else needle
        scored = []
        for doc_id, path, content in docs_rows:
            c = content.lower() if ci else content
            if nn not in c:
                continue
            occ = c.count(nn)
            pm = int(nn in (path.lower() if ci else path))
            syms = [
                m
                for pat in SYMBOL_PATTERNS.values()
                for m in re.findall(pat, content)
            ]
            sm = int(any(nn in (s.lower() if ci else s) for s in syms))
            scored.append((-sm, -pm, -occ, doc_id, sm, pm, occ))
        scored.sort()
        for r, (_, _, _, doc_id, sm, pm, occ) in enumerate(scored[:k], 1):
            out.append((nid, needle, r, doc_id, sm, pm, occ))
    return sorted(out)


def _run(spark, docs, needles, k, **kw):
    postings, stats = build_trigram_index(
        docs, case_insensitive=bool(kw.get("case_insensitive"))
    )
    ndf = spark.createDataFrame(needles, "needle_id long, needle string")
    return sorted(
        map(
            tuple,
            trigram_search_topk_ranked(
                docs, postings, stats, ndf, k=k, **kw
            ).collect(),
        )
    )


def test_boost_ladder_planted(spark):
    """A definition-site hit outranks a path hit outranks a 5× body hit."""
    rows = [
        (0, "src/alpha.py", "parse parse parse parse parse\n"),
        (1, "src/beta.py", "def parse_thing():\n    return 1\n"),
        (2, "lib/parse_util.js", "x = parse(1)\n"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, path string, content string")
    got = _run(spark, docs, [(0, "parse")], k=10)
    assert [(r[3], r[4], r[5]) for r in sorted(got, key=lambda r: r[2])] == [
        (1, 1, 0),  # symbol match wins
        (2, 0, 1),  # then path match
        (0, 0, 0),  # then the 5-occurrence body-only doc
    ]
    assert got == _twin(rows, [(0, "parse")], k=10)


def test_corpus_ordering_matches_twin(spark, corpus):
    needles = [(0, "return"), (1, "loc_7_"), (2, "def ident"), (3, "zzz_absent")]
    rows = [tuple(r) for r in corpus.collect()]
    assert _run(spark, corpus, needles, k=15) == _twin(rows, needles, k=15)


def test_case_insensitive_twin(spark, corpus):
    needles = [(0, "RETURN"), (1, "DEF IDENT")]
    rows = [tuple(r) for r in corpus.collect()]
    got = _run(spark, corpus, needles, k=10, case_insensitive=True)
    assert got == _twin(rows, needles, k=10, ci=True)
    assert len(got) > 0
