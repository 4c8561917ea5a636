"""Winnowing fingerprints + clone pairs (operators/winnow.py).

Pins: (1) bit-identity of the Spark array-HOF pipeline vs an independent
pure-Python reference on random documents; (2) the SIGMOD'03 coverage
guarantee (every window of w consecutive k-grams contains a selected
position); (3) the (k, w)-guarantee (a shared run of ≥ w+k−1 tokens ⇒ a
shared fingerprint); (4) layout invariance (1 vs 8 partitions); (5) the
clone miner's max_df boilerplate cap; (6) the shuffle-free plan claim.
"""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.config import TOKEN_RE
from searchenginesimple_spark.operators.winnow import (
    WINNOW_POS_CAP,
    WINNOW_R_MOD,
    clone_pairs,
    winnow_fingerprints,
)

POLY_MOD = 2147483647


def _poly31(s: str, mult: int, init: int) -> int:
    h = init
    for ch in s:
        h = (h * mult + ord(ch)) % POLY_MOD
    return h


def _poly62(s: str) -> int:
    return _poly31(s, 31, 7) * (1 << 31) + _poly31(s, 37, 11)


def _ref_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Independent reference: → {(pos, fp)} selected fingerprints."""
    toks = re.findall(TOKEN_RE, text.lower())
    n = len(toks) - k + 1
    if n < 1:
        return set()
    hs = [_poly62(" ".join(toks[i : i + k])) for i in range(n)]
    keys = [
        (hs[i] % WINNOW_R_MOD) * WINNOW_POS_CAP + (WINNOW_POS_CAP - 1 - i)
        for i in range(n)
    ]
    wlen = min(w, n)
    sel = set()
    for q in range(wlen - 1, n):
        key = min(keys[q - wlen + 1 : q + 1])
        pos = WINNOW_POS_CAP - 1 - (key % WINNOW_POS_CAP)
        sel.add((pos, hs[pos]))
    return sel


def _random_docs(n_docs: int, seed: int = 7) -> list[tuple[int, str]]:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(12)]  # small vocab → many hash ties
    docs = []
    for i in range(n_docs):
        n_tok = int(rng.integers(0, 40))
        docs.append((i, " ".join(rng.choice(vocab, size=n_tok))))
    return docs


@pytest.mark.parametrize("k,w", [(3, 4), (5, 4), (2, 1), (4, 9)])
def test_matches_python_reference(spark, k, w):
    docs = _random_docs(60)
    df = spark.createDataFrame(docs, "doc_id long, content string")
    got = {
        (r.doc_id, r.pos, r.fp)
        for r in winnow_fingerprints(df, k=k, w=w, hash_family="poly").collect()
    }
    want = {
        (doc_id, pos, fp)
        for doc_id, text in docs
        for (pos, fp) in _ref_winnow(text, k, w)
    }
    assert got == want


def test_coverage_guarantee(spark):
    """Every full window of w consecutive k-gram positions contains at
    least one selected position (SIGMOD'03 correctness of winnowing)."""
    k, w = 3, 4
    docs = _random_docs(40, seed=11)
    df = spark.createDataFrame(docs, "doc_id long, content string")
    by_doc: dict[int, set[int]] = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        by_doc.setdefault(r.doc_id, set()).add(r.pos)
    for doc_id, text in docs:
        n = len(re.findall(TOKEN_RE, text.lower())) - k + 1
        if n < 1:
            assert doc_id not in by_doc
            continue
        sel = by_doc[doc_id]
        assert sel, f"doc {doc_id}: no fingerprint at all"
        for q in range(w - 1, n):
            window = set(range(q - w + 1, q + 1))
            assert window & sel, f"doc {doc_id}: window ending {q} uncovered"


def test_kw_guarantee_shared_run(spark):
    """Two docs sharing a run of w+k−1 tokens share ≥1 fingerprint."""
    k, w = 4, 5
    run = " ".join(f"shared{i}" for i in range(w + k - 1))
    docs = [
        (1, "alpha beta gamma " + run + " delta epsilon zeta"),
        (2, "one two three four five " + run + " six seven"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, content string")
    fps = winnow_fingerprints(df, k=k, w=w)
    a = {r.fp for r in fps.filter("doc_id = 1").collect()}
    b = {r.fp for r in fps.filter("doc_id = 2").collect()}
    assert a & b


def test_layout_invariance(spark):
    docs = _random_docs(50, seed=3)
    d1 = spark.createDataFrame(docs, "doc_id long, content string").coalesce(1)
    d8 = spark.createDataFrame(docs, "doc_id long, content string").repartition(8)
    r1 = sorted(map(tuple, winnow_fingerprints(d1).collect()))
    r8 = sorted(map(tuple, winnow_fingerprints(d8).collect()))
    assert r1 == r8


def test_short_docs(spark):
    k, w = 5, 4
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d e"), (3, "a b c d e f g")],
        "doc_id long, content string",
    )
    rows = winnow_fingerprints(df, k=k, w=w).collect()
    ids = {r.doc_id for r in rows}
    assert 1 not in ids  # 4 tokens < k → no grams
    # n=1 and n=3 grams (< w): the single short window still selects one
    assert sum(r.doc_id == 2 for r in rows) == 1
    assert sum(r.doc_id == 3 for r in rows) >= 1


def test_clone_pairs_planted(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    docs = [
        (1, base),
        (2, base + " trailing extra tokens here"),  # near-clone of 1
        (3, " ".join(f"other{i}" for i in range(60))),  # unrelated
    ]
    df = spark.createDataFrame(docs, "doc_id long, content string")
    fps = winnow_fingerprints(df, k=5, w=4)
    pairs = clone_pairs(fps, min_shared=2, min_similarity=0.5).collect()
    assert [(p.a_id, p.b_id) for p in pairs] == [(1, 2)]
    assert pairs[0].similarity == 1.0  # doc 1's fps all contained in doc 2


def test_clone_pairs_max_df_cap(spark):
    """A fingerprint present in > max_df docs is boilerplate: pairs whose
    only overlap is boilerplate disappear; genuine pairs survive."""
    header = " ".join(f"lic{i}" for i in range(20))  # shared by ALL docs
    docs = [(i, header + f" body{i}a body{i}b body{i}c body{i}d body{i}e") for i in range(8)]
    docs.append((100, header + " clone body special one two three four five six"))
    docs.append((101, header + " clone body special one two three four five six seven"))
    df = spark.createDataFrame(docs, "doc_id long, content string")
    fps = winnow_fingerprints(df, k=4, w=3)
    pairs = clone_pairs(fps, min_shared=1, max_df=4).collect()
    got = {(p.a_id, p.b_id) for p in pairs}
    assert (100, 101) in got
    # boilerplate-only pairs among docs 0..7 must be gone
    assert not any(a < 8 and b < 8 for a, b in got)


def test_fingerprint_plan_is_map_only(spark):
    """The fingerprint stage must be shuffle-free and Python-free."""
    df = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, content string")
    plan = winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_clone_pairs_plan_single_pipeline(spark):
    """Scale pin: no join anywhere (pairs come from in-row combinations of
    max_df-bounded buckets) and at most 5 exchanges, each computed once —
    the naive self-join shape executed the distinct+window base 4 times."""
    import re

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g h")], "doc_id long, content string"
    )
    plan = clone_pairs(winnow_fingerprints(df))._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) <= 5, plan


def test_clone_spans_recover_planted_passage(spark):
    """A shared 30-token passage planted at different offsets in two docs
    must come back as ONE span per side, covering (at winnow granularity:
    boundaries can shave up to w+k−2 tokens) the planted range."""
    from searchenginesimple_spark.operators.winnow import clone_spans

    k, w = 5, 4
    run = " ".join(f"shared{i}" for i in range(30))
    pre_a = " ".join(f"apre{i}" for i in range(10))   # run at tokens 10..39
    post_a = " ".join(f"apost{i}" for i in range(15))
    pre_b = " ".join(f"bpre{i}" for i in range(20))   # run at tokens 20..49
    docs = [(1, f"{pre_a} {run} {post_a}"), (2, f"{pre_b} {run}")]
    df = spark.createDataFrame(docs, "doc_id long, content string")
    fps = winnow_fingerprints(df, k=k, w=w)
    pairs = clone_pairs(fps, min_shared=2)
    spans = clone_spans(fps, pairs, k=k).collect()
    by_side = {}
    for r in spans:
        assert (r.a_id, r.b_id) == (1, 2)
        by_side.setdefault(r.side, []).append((r.start_tok, r.end_tok, r.n_grams))
    assert len(by_side["a"]) == 1 and len(by_side["b"]) == 1
    sa, ea, _ = by_side["a"][0]
    sb, eb, _ = by_side["b"][0]
    slack = w + k - 2
    assert 10 <= sa <= 10 + slack and 39 - slack <= ea <= 39
    assert 20 <= sb <= 20 + slack and 49 - slack <= eb <= 49


def test_clone_spans_split_on_gap(spark):
    """Two separate shared passages in one pair → two spans per side."""
    from searchenginesimple_spark.operators.winnow import clone_spans

    k, w = 4, 3
    run1 = " ".join(f"one{i}" for i in range(15))
    run2 = " ".join(f"two{i}" for i in range(15))
    mid_a = " ".join(f"amid{i}" for i in range(40))
    mid_b = " ".join(f"bmid{i}" for i in range(25))
    docs = [(1, f"{run1} {mid_a} {run2}"), (2, f"{run1} {mid_b} {run2}")]
    df = spark.createDataFrame(docs, "doc_id long, content string")
    fps = winnow_fingerprints(df, k=k, w=w)
    pairs = clone_pairs(fps, min_shared=2)
    spans = clone_spans(fps, pairs, k=k, max_gap=10).collect()
    for side in ("a", "b"):
        assert sum(r.side == side for r in spans) == 2, spans
