"""Two-phase bucketed global rank (operators/rank.py) — the build_dict fix.

Properties pinned:
* ids equal row_number() OVER (ORDER BY key) exactly (vs a pandas sort),
  including keys shorter than / sharing the bucket prefix;
* the physical plan contains NO single-partition exchange — the whole point
  of replacing the unpartitioned Window.orderBy;
* build_dict produces the identical (word, count, dict_id) rows it did under
  the global window (the driver oracle `dict` pins this too).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from searchenginesimple_spark.operators.rank import ordered_dense_ids
from searchenginesimple_spark.operators.suggest import build_dict
from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

KEYS = [
    "a", "ab", "abc", "abcd", "abcde", "abce",  # shared + short prefixes
    "b", "ba", "zzzz_long_identifier", "zzzz_long_identifiee",
    "ident_000", "ident_001", "_underscore", "__dunder",
]


def test_matches_global_sort(spark):
    df = spark.createDataFrame([(k,) for k in KEYS], "word string").repartition(7)
    got = {
        r["word"]: r["dict_id"]
        for r in ordered_dense_ids(df, "word", "dict_id").collect()
    }
    want = {k: i + 1 for i, k in enumerate(sorted(KEYS))}
    assert got == want


def test_matches_global_sort_tiny_prefix(spark):
    # prefix_len=1 → heavy bucket sharing; ids must still be the global rank
    df = spark.createDataFrame([(k,) for k in KEYS], "word string").repartition(3)
    got = {
        r["word"]: r["dict_id"]
        for r in ordered_dense_ids(df, "word", "dict_id", prefix_len=1).collect()
    }
    want = {k: i + 1 for i, k in enumerate(sorted(KEYS))}
    assert got == want


def test_no_single_partition_exchange(spark):
    docs = with_doc_ids(docs_df(spark, 120))
    d = build_dict(docs)
    plan = d._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange SinglePartition" not in plan, plan


def test_build_dict_is_global_word_rank(spark):
    docs = with_doc_ids(docs_df(spark, 120)).cache()
    got = sorted(
        (r["word"], r["count"], r["dict_id"]) for r in build_dict(docs).collect()
    )
    import collections

    from searchenginesimple_spark.functions.tokenize import tokenize_py

    cnt: collections.Counter = collections.Counter()
    for r in docs.select("content").collect():
        cnt.update(tokenize_py(r["content"]))
    want = sorted(
        (w, c, i + 1) for i, (w, c) in enumerate(sorted(cnt.items()))
    )
    assert got == want
