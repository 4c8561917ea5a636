"""Regex-over-trigram-index (operators/trigram_regex.py).

Two layers: pure-Python compiler tests (branch expansion, gap segmentation,
unsupported-subset refusal), then Spark equivalence pins — index path ≡
brute-force regex scan for every pattern and knob, including patterns that
fall back to the scan path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.operators.trigram import build_trigram_index
from searchenginesimple_spark.operators.trigram_regex import (
    compile_branches,
    trigram_regex_bruteforce,
    trigram_regex_search,
)
from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

N_DOCS = 300


# ---------------------------------------------------------------- compiler

def test_literal_pattern_single_branch():
    assert compile_branches("return") == [{"ret", "etu", "tur", "urn"}]


def test_alternation_expands_branches():
    got = compile_branches("(foo|bar)baz")
    assert got is not None and len(got) == 2
    assert {"foo", "oob", "oba", "baz"} in got
    assert {"bar", "arb", "rba", "baz"} in got


def test_gap_splits_segments():
    # trigrams never span a wildcard gap — ., .*, .+, .? all split
    got = compile_branches("abc.*xyz")
    assert got == [{"abc", "xyz"}]
    assert compile_branches("abc.xyz") == [{"abc", "xyz"}]
    assert compile_branches("abc.?xyz") == [{"abc", "xyz"}]


def test_optional_char_expands():
    got = compile_branches("colou?r")
    assert got is not None and len(got) == 2
    assert {"col", "olo", "lou", "our"} in got   # with the u
    assert {"col", "olo", "lor"} in got          # without


def test_char_class_expands():
    got = compile_branches("[ab]cd ")
    assert got is not None and len(got) == 2
    assert {"acd", "cd "} in got and {"bcd", "cd "} in got


@pytest.mark.parametrize(
    "pat",
    [
        "ab*c",        # quantified literal
        "a{2}b",       # counted repeat
        r"\d+foo",     # dialect-divergent escape class
        "^anchored",   # anchor
        "[^a]bc",      # negated class
        "(ab)+cd",     # group quantifier
        "ab",          # every branch trigram-free → unindexable
        "a|b",         # short alternation, no trigrams
    ],
)
def test_unsupported_or_unindexable_returns_none(pat):
    assert compile_branches(pat) is None


def test_branch_explosion_capped():
    assert compile_branches("(a|b)(c|d)(e|f)(g|h)(i|j)(k|l)(m|n)xyz") is None


# ------------------------------------------------------------------ spark

PATTERNS = [
    (0, "return"),                      # plain literal
    (1, "(return|absent_zz) ident"),    # alternation, one live branch
    (2, "loc_.*_3"),                    # gap between rare segments
    (3, "ident_[0-9][0-9][0-9]"),       # class expansion ×1000? no — 3 classes
    (4, r"x = \d"),                     # unsupported escape → scan path
    (5, "zz(qq|ww)zz_nothing"),         # indexable, matches nothing
]
# pattern 3 explodes (10×10×10 > MAX_BRANCHES) → compile None → scan path;
# deliberately kept: the cap must route to scan, not wrong results.


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


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_regex_index_path_equals_bruteforce(spark, corpus, index):
    postings, stats = index
    got = _rows(trigram_regex_search(corpus, postings, stats, PATTERNS))
    want = _rows(trigram_regex_bruteforce(corpus, PATTERNS))
    assert got == want
    by_pat = {i: sum(1 for r in got if r[0] == i) for i, _ in PATTERNS}
    assert by_pat[0] > 50 and by_pat[1] > 0 and by_pat[2] > 0
    assert by_pat[4] > 0          # scan path produces rows too
    assert by_pat[5] == 0


def test_regex_knobs_never_change_results(spark, corpus, index):
    postings, stats = index
    got = _rows(
        trigram_regex_search(
            corpus, postings, stats, PATTERNS, max_trigrams=2, max_df=25
        )
    )
    want = _rows(trigram_regex_bruteforce(corpus, PATTERNS))
    assert got == want


def test_all_hot_branch_routes_to_scan_not_empty(spark, corpus, index):
    postings, stats = index
    # max_df=0 → every trigram is "hot" → every compilable pattern must fall
    # back to scan and still return exact results
    got = _rows(
        trigram_regex_search(corpus, postings, stats, PATTERNS, max_df=0)
    )
    want = _rows(trigram_regex_bruteforce(corpus, PATTERNS))
    assert got == want


def test_union_over_branches_is_distinct(spark, corpus, index):
    """A doc matching BOTH alternation branches must appear once."""
    postings, stats = index
    pats = [(0, "(return|ident_) ")]
    out = trigram_regex_search(corpus, postings, stats, pats)
    assert out.groupBy("needle_id", "doc_id").count().filter("count > 1").count() == 0
