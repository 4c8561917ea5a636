"""Positional postings + phrase query: dense/indexed equivalence, codec
round-trip, pure-Python oracle parity, and the shard-boundary edge."""

from __future__ import annotations

import dataclasses
import random
import re

import numpy as np
import pytest

from searchenginesimple_spark.config import DEFAULT, TOKEN_RE
from searchenginesimple_spark.functions.codec import delta_decode_rows, delta_encode_rows
from searchenginesimple_spark.operators.phrase import (
    build_positional_postings,
    phrase_match_dense,
    phrase_match_indexed,
    tokens_with_pos,
)

CFG = dataclasses.replace(DEFAULT, shard_span=7)  # force multi-shard + boundary docs

VOCAB = ["a", "b", "c", "dd", "ee", "ff"]


def _corpus(n_docs: int, seed: int):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randrange(0, 30))))
        for i in range(n_docs)
    ]


def _oracle(docs, phrases):
    """Pure-Python: token-sequence containment."""
    out = []
    for pid, ph in phrases:
        pt = re.findall(TOKEN_RE, ph.lower())
        if not pt:
            continue
        for did, text in docs:
            dt = re.findall(TOKEN_RE, text.lower())
            if any(dt[i : i + len(pt)] == pt for i in range(len(dt) - len(pt) + 1)):
                out.append((pid, ph, did))
    return sorted(out)


def test_delta_rows_round_trip():
    rng = np.random.default_rng(7)
    for _ in range(20):
        lens = rng.integers(0, 9, size=rng.integers(1, 12))
        flat = np.concatenate(
            [np.cumsum(rng.integers(0, 100, size=n)).astype(np.uint64) for n in lens]
            or [np.empty(0, dtype=np.uint64)]
        )
        enc = delta_encode_rows(flat, lens)
        np.testing.assert_array_equal(delta_decode_rows(enc, lens), flat)


def test_phrase_dense_equals_indexed_and_oracle(spark):
    docs = _corpus(60, seed=5)
    phrases = [
        (0, "a b"), (1, "b a b"), (2, "dd ee ff"), (3, "a"), (4, "a a"),
        (5, ""), (6, "zz_oov"), (7, "a b a"), (8, "ee"),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, content string")
    pdf = spark.createDataFrame(phrases, "phrase_id long, phrase string")
    want = _oracle(docs, phrases)
    dense = sorted(map(tuple, phrase_match_dense(ddf, pdf, CFG).collect()))
    assert dense == want
    pp = build_positional_postings(ddf, CFG)
    idx = sorted(map(tuple, phrase_match_indexed(pp, pdf, CFG).collect()))
    assert idx == want


def test_phrase_does_not_cross_shard_boundary_docs(spark):
    # adjacency is WITHIN a doc; a phrase must never match by stitching the
    # end of doc k to the start of doc k+1 (both in/around one shard span)
    docs = [(6, "x y phrase_start"), (7, "phrase_end z")]  # 6|7 spans shards with span=7
    ddf = spark.createDataFrame(docs, "doc_id long, content string")
    pdf = spark.createDataFrame(
        [(0, "phrase_start phrase_end")], "phrase_id long, phrase string"
    )
    pp = build_positional_postings(ddf, CFG)
    assert phrase_match_indexed(pp, pdf, CFG).count() == 0
    assert phrase_match_dense(ddf, pdf, CFG).count() == 0


def test_positional_postings_shape(spark):
    docs = _corpus(30, seed=11)
    ddf = spark.createDataFrame(docs, "doc_id long, content string")
    pp = build_positional_postings(ddf, CFG).collect()
    tok = {}
    for did, text in docs:
        for pos, t in enumerate(re.findall(TOKEN_RE, text.lower())):
            tok.setdefault((t, did // CFG.shard_span), []).append((did, pos))
    assert {(r["term"], r["shard"]) for r in pp} == set(tok)
    for r in pp:
        pairs = tok[(r["term"], r["shard"])]
        docs_sorted = sorted({d for d, _ in pairs})
        assert r["df"] == len(docs_sorted)
        from searchenginesimple_spark.functions.codec import varbyte_decode

        ids = np.cumsum(varbyte_decode(r["ids"])).astype(int).tolist()
        assert ids == docs_sorted
        counts = varbyte_decode(r["npos"]).astype(int)
        flat = delta_decode_rows(varbyte_decode(r["pos"]), counts).astype(int)
        got = {}
        off = 0
        for d, c in zip(ids, counts):
            got[d] = flat[off : off + c].tolist()
            off += c
        want = {}
        for d, p in sorted(pairs):
            want.setdefault(d, []).append(p)
        assert got == want


def test_phrase_pushdown_plan(spark):
    docs = spark.createDataFrame(_corpus(20, seed=3), "doc_id long, content string")
    pdf = spark.createDataFrame([(0, "a b")], "phrase_id long, phrase string")
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        build_positional_postings(docs, CFG).write.parquet(f"{td}/pp")
        pp = docs.sparkSession.read.parquet(f"{td}/pp")
        plan = phrase_match_indexed(pp, pdf, CFG)._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [In(term" in plan or "term IN" in plan.lower()


def test_phrase_topk_restricts_bm25_candidates(spark):
    from searchenginesimple_spark.operators.bm25 import bm25_topk, build_index_stats
    from searchenginesimple_spark.operators.phrase import (
        build_positional_postings,
        phrase_topk,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),      # phrase "alpha beta" present
            (1, "beta alpha delta"),      # both terms, NOT adjacent in order
            (2, "alpha beta alpha beta"), # phrase twice, higher tf
            (3, "unrelated words here"),
        ],
        "doc_id long, content string",
    )
    idx = build_index_stats(docs, cfg=CFG)
    pdf = spark.createDataFrame([(0, "alpha beta")], "phrase_id long, phrase string")
    pp = build_positional_postings(docs, CFG)
    got = phrase_topk(idx, pp, pdf, CFG).collect()
    phrase_docs = [r["docID"] for r in got]
    assert set(phrase_docs) == {0, 2}  # doc 1 conjunctive-matches but is not a phrase hit

    qdf = spark.createDataFrame([(0, "alpha beta")], "query_id long, query string")
    bm = {r["docID"]: r["score"] for r in bm25_topk(idx, qdf, CFG).collect()}
    assert set(bm) == {0, 1, 2}
    # scores of surviving docs are the plain BM25 scores; ranking re-done
    for r in got:
        assert r["score"] == bm[r["docID"]]
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == [1, 2]


def test_phrase_query_engine_matches_distributed(spark):
    from searchenginesimple_spark.operators.phrase import (
        PhraseQueryEngine,
        build_positional_postings,
        phrase_match_indexed,
    )

    docs = _corpus(80, seed=9)
    phrases = ["a b", "dd ee", "b a b", "zz_oov", "", "a"]
    ddf = spark.createDataFrame(docs, "doc_id long, content string")
    pp = build_positional_postings(ddf, CFG)

    eng = PhraseQueryEngine(pp, CFG)
    got = eng.match(phrases)
    got2 = eng.match(phrases)  # repeat: served from cache, must be identical
    assert got.equals(got2)

    pdf = spark.createDataFrame(
        list(enumerate(phrases)), "phrase_id long, phrase string"
    )
    want = (
        phrase_match_indexed(pp, pdf, CFG)
        .toPandas()
        .sort_values(["phrase_id", "doc_id"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, got.itertuples(index=False))) == list(
        map(tuple, want.itertuples(index=False))
    )

    # tiny cap → distributed fallback, still identical
    eng_small = PhraseQueryEngine(pp, CFG, max_cache_bytes=1)
    got3 = eng_small.match(phrases)
    assert list(map(tuple, got3.itertuples(index=False))) == list(
        map(tuple, want.itertuples(index=False))
    )
