"""Deterministic sampling + decontamination operators (training-data ops)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.operators.dedup import contamination_counts
from searchenginesimple_spark.operators.sample import stratified_sample

_SCHEMA = "doc_id long, lang string, content string"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, ["en", "de", "fr"][i % 3], f"word_{i} shared tail_{i % 11} end_{i}")
        for i in range(900)
    ]
    return spark.createDataFrame(rows, _SCHEMA).cache()


def test_stratified_sample_is_layout_invariant(spark, docs):
    """The kept set is a pure function of (key, lang) — identical at any
    partitioning (df.sample() is not)."""
    rates = {"en": 0.5, "de": 0.2}
    a = sorted(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(1), rates).select("doc_id").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(13, "lang"), rates).select("doc_id").collect()
    )
    assert a == b and len(a) > 0


def test_stratified_sample_rates_and_default(spark, docs):
    rates = {"en": 0.5, "de": 0.2}
    out = stratified_sample(docs, rates, default_rate=0.0)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # fr has no rate and default 0 → absent entirely
    assert "fr" not in got
    # 300 docs per stratum; hash-gated rates land near the target
    assert got["en"] == pytest.approx(150, abs=40)
    assert got["de"] == pytest.approx(60, abs=30)
    # default_rate=1.0 keeps every unlisted-stratum row
    all_fr = stratified_sample(docs, rates, default_rate=1.0).filter(
        F.col("lang") == "fr"
    )
    assert all_fr.count() == 300


def test_stratified_sample_is_a_filter(spark, docs):
    """Scale shape: no shuffle — the plan is scan + filter only."""
    plan = stratified_sample(docs, {"en": 0.3})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_contamination_counts_matches_bruteforce(spark):
    import re

    rows = [
        (0, "alpha beta gamma delta"),          # benchmark
        (1, "epsilon zeta eta theta"),          # benchmark
        (10, "x alpha beta gamma y"),           # shares 2 distinct 3-grams w/ 0
        (11, "epsilon zeta eta theta"),         # identical to 1 → 2 shared
        (12, "nothing in common here"),         # clean
        (13, "alpha beta gamma delta echo"),    # shares 2 w/ 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    bench = docs.filter(F.col("doc_id") < 10)
    out = {
        r["doc_id"]: r["n_shared"]
        for r in contamination_counts(
            docs.filter(F.col("doc_id") >= 10), bench, n=3
        ).collect()
    }

    def sh3(t):
        toks = re.findall(r"[a-z_][a-z0-9_]*", t.lower())
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    bench_sh = sh3(rows[0][1]) | sh3(rows[1][1])
    want = {}
    for i, t in rows[2:]:
        k = len(sh3(t) & bench_sh)
        if k:
            want[i] = k
    assert out == want and 12 not in out


def test_per_key_cap_deterministic_and_bounded(spark):
    from searchenginesimple_spark.operators.sample import per_key_cap

    rows = [(i, f"src{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = per_key_cap(df, cap=4, group_col="source", order_col="doc_id").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # each group keeps exactly its 4 smallest doc_ids; grp_rank column dropped
    assert all(sorted(v) == sorted(v)[:4] for v in by_src.values())
    assert {k: sorted(v) for k, v in by_src.items()} == {
        f"src{j}": [j, j + 3, j + 6, j + 9] for j in range(3)
    }
    assert "grp_rank" not in per_key_cap(df, 4).columns
    # repartition-invariant
    out2 = per_key_cap(df.repartition(7), cap=4).collect()
    assert sorted(map(tuple, out2)) == sorted(map(tuple, out))
