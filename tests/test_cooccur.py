"""Related-terms PMI mining vs hand computation."""

from __future__ import annotations

import math


def test_related_terms_hand_computed(spark):
    from searchenginesimple_spark.operators.bm25 import build_index_stats
    from searchenginesimple_spark.operators.cooccur import related_terms

    # N=4 docs; (a,b) co-occur 3×, (a,c) 1×, (b,c) 1×
    docs = spark.createDataFrame(
        [
            (0, "a b"),
            (1, "a b x"),
            (2, "a b"),
            (3, "a c b_absent"),  # c only with a; b_absent is a distinct term
        ],
        "doc_id long, content string",
    )
    # df: a=4, b=3, c=1, x=1, b_absent=1
    idx = build_index_stats(docs)
    got = {
        (r["term"], r["rank"]): (r["other"], r["n_ab"], r["pmi"])
        for r in related_terms(idx, k=2, min_pairs=1).collect()
    }

    def pmi(n_ab, da, db, n=4):
        return round(math.log(n_ab * n / (da * db)), 6)

    # for a: partners (b: 3/12·4 = 1.0 → pmi=0), (c: 1·4/4 = 1 → 0), (x: 1·4/4=1 → 0),
    #        (b_absent: 1·4/4 → 0) — all pmi 0 → tie-break alphabetical
    assert got[("a", 1)] == ("b", 3, pmi(3, 4, 3))
    assert pmi(3, 4, 3) == 0.0
    assert got[("a", 2)] == ("b_absent", 1, pmi(1, 4, 1))
    # for c: only partners a (pmi 0) and b_absent (1·4/(1·1) → ln4)
    assert got[("c", 1)] == ("b_absent", 1, pmi(1, 1, 1))
    assert got[("c", 1)][2] == round(math.log(4), 6)
    assert got[("c", 2)] == ("a", 1, pmi(1, 1, 4))
    # x pairs only within doc 1: a and b, both pmi ~ ln(4/(4·1))=0 / ln(4/3)
    assert got[("x", 1)] == ("b", 1, pmi(1, 1, 3))


def test_related_terms_skew_cap(spark):
    """One pathological doc with far more distinct terms than the cap: the
    in-operator top-m-by-tf guard bounds its pair fan-out to m²/2 while
    normal docs are untouched, and PMI marginals (df, N) stay uncapped."""
    from searchenginesimple_spark.operators.bm25 import build_index_stats
    from searchenginesimple_spark.operators.cooccur import related_terms

    # doc 0: hot terms h0,h1 appear twice (survive the cap), 50 singleton
    # junk terms; docs 1-3: normal 2-term docs
    junk = " ".join(f"junk{i:02d}" for i in range(50))
    docs = spark.createDataFrame(
        [
            (0, f"h0 h0 h1 h1 {junk}"),
            (1, "h0 h1"),
            (2, "h0 h1"),
            (3, "solo other"),
        ],
        "doc_id long, content string",
    )
    idx = build_index_stats(docs)
    m = 10
    out = related_terms(idx, k=5, min_pairs=1, max_terms_per_doc=m).collect()
    # fan-out bound: doc 0 contributes ≤ C(m,2) pairs, not C(52,2)
    pair_count = {(r["term"], r["other"]) for r in out}
    kept_junk = {t for t, _ in pair_count if t.startswith("junk")}
    # cap keeps h0,h1 (tf=2) + first 8 junk terms by tie-break (term asc)
    assert kept_junk == {f"junk{i:02d}" for i in range(8)}
    got = {(r["term"], r["rank"]): (r["other"], r["n_ab"], r["pmi"]) for r in out}
    # h0/h1 co-occur in docs 0,1,2 → n_ab=3; df uncapped (3 each), N=4
    assert got[("h0", 1)][0:2] == ("h1", 3)
    assert got[("h0", 1)][2] == round(math.log(3 * 4 / (3 * 3)), 6)
    # normal doc pair unaffected by the cap
    assert got[("solo", 1)][0] == "other"
