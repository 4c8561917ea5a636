from __future__ import annotations

from pyspark.sql import functions as F

from searchenginesimple_spark.functions.tokenize import (
    tokenize_expr,
    tokenize_py,
    tokenize_udf,
)

CASES = [
    ("def foo_bar(x1, y2):\n    return x1 + y2", ["def", "foo_bar", "x1", "y2", "return", "x1", "y2"]),
    ("CamelCaseIdent UPPER_SNAKE", ["camelcaseident", "upper_snake"]),
    ("_private __dunder__ a1b2", ["_private", "__dunder__", "a1b2"]),
    ("123abc starts-with-digit", ["abc", "starts", "with", "digit"]),  # digit-first run: leading digits dropped
    ("", []),
    ("+-*/=<>!&|^%", []),
    ("mixed 中文 tokens", ["mixed", "tokens"]),
]


def test_tokenize_py_golden():
    for text, want in CASES:
        assert tokenize_py(text) == want, text


def test_udf_expr_py_agree(spark):
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(CASES)], "id long, content string")
    got = (
        df.select("id", tokenize_udf("content").alias("u"), tokenize_expr("content").alias("e"))
        .orderBy("id")
        .collect()
    )
    for row, (text, want) in zip(got, CASES):
        assert row["u"] == want, f"udf mismatch on {text!r}"
        assert row["e"] == want, f"expr mismatch on {text!r}"


def test_null_content(spark):
    df = spark.createDataFrame([(1, None)], "id long, content string")
    row = df.select(tokenize_udf("content").alias("u")).collect()[0]
    assert row["u"] == []
