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


# ---------------------------------------------------------------------------
# CJK mode (TOKEN_RE_CJK): identifier runs ∪ single CJK codepoints
# ---------------------------------------------------------------------------

CJK_TEXTS = [
    "搜索引擎 def search(): return 简单",
    "中文\nabc 混合 mixed_ident 文本",
    "pure_ascii only here",
    "",
]


def test_cjk_expr_udf_py_identical(spark):
    from searchenginesimple_spark.config import TOKEN_RE_CJK
    from searchenginesimple_spark.functions.tokenize import (
        make_tokenize_udf,
        tokenize_expr,
        tokenize_py,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CJK_TEXTS)], "doc_id long, content string"
    )
    got_expr = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", tokenize_expr("content", TOKEN_RE_CJK).alias("t")
        ).collect()
    }
    got_udf = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", make_tokenize_udf(TOKEN_RE_CJK)("content").alias("t")
        ).collect()
    }
    for i, t in enumerate(CJK_TEXTS):
        want = tokenize_py(t, TOKEN_RE_CJK)
        assert got_expr[i] == want, (i, got_expr[i], want)
        assert got_udf[i] == want, (i, got_udf[i], want)
    # CJK chars come out as single-codepoint tokens, identifiers as runs
    assert got_expr[0] == ["搜", "索", "引", "擎", "def", "search", "return", "简", "单"]


def test_cjk_bm25_end_to_end(spark):
    """simhash/BM25 paths parameterized over the tokenizer: a Chinese corpus
    indexed in CJK mode answers CJK conjunctive queries; in the default mode
    the same corpus is invisible."""
    import dataclasses

    from searchenginesimple_spark.config import DEFAULT, TOKEN_RE_CJK
    from searchenginesimple_spark.operators.bm25 import bm25_topk, build_index_stats
    from searchenginesimple_spark.sources.corpus import queries_df

    docs = spark.createDataFrame(
        [
            (0, "搜索引擎非常简单"),
            (1, "搜索很快"),
            (2, "def engine(): return fast"),
            (3, "引擎简单"),
        ],
        "doc_id long, content string",
    )
    cfg = dataclasses.replace(DEFAULT, token_re=TOKEN_RE_CJK)
    idx = build_index_stats(docs, cfg=cfg)
    res = bm25_topk(idx, queries_df(spark, ["搜索 引擎"]), cfg).toPandas()
    assert list(res["docID"]) == [0]  # only doc 0 contains 搜,索,引,擎

    # default (code) mode: CJK content tokenizes to nothing → no match
    idx_code = build_index_stats(docs)
    res_code = bm25_topk(idx_code, queries_df(spark, ["搜索 引擎"])).toPandas()
    assert len(res_code) == 0


def test_cjk_simhash_dedup(spark):
    import dataclasses

    from searchenginesimple_spark.config import DEFAULT, TOKEN_RE_CJK
    from searchenginesimple_spark.operators.dedup import simhash_dedup

    docs = spark.createDataFrame(
        [
            (0, "搜索引擎非常简单快速而且好用真的很好用" * 3),
            (1, "搜索引擎非常简单快速而且好用真的很好用" * 3),  # exact dup of 0
            (2, "def totally_different(): return other_thing entirely"),
        ],
        "doc_id long, content string",
    )
    cfg = dataclasses.replace(DEFAULT, token_re=TOKEN_RE_CJK)
    survivors = {r["doc_id"] for r in simhash_dedup(docs, cfg).collect()}
    assert survivors == {0, 2}  # dup 1 dropped; CJK-only doc fingerprinted


def test_subtokens_expr_known_cases(spark):
    import pyspark.sql.functions as F

    from searchenginesimple_spark.functions.tokenize import subtokens_expr

    cases = [
        (0, "parseHTTPResponse", ["parse", "http", "response"]),
        (1, "fooBar_baz", ["foo", "bar", "baz"]),
        (2, "getValue2X", ["get", "value2", "x"]),
        (3, "AConst", ["a", "const"]),
        (4, "__init__", ["init"]),
        (5, "simple", ["simple"]),
        (6, "HTTP", ["http"]),
        (7, "", []),
    ]
    df = spark.createDataFrame([(i, s) for i, s, _ in cases], "id long, s string")
    got = {
        r["id"]: r["subs"]
        for r in df.select("id", subtokens_expr("s").alias("subs")).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_tf_mapside_equals_groupby(spark):
    """The shuffle-free run-length tf must be bit-identical to the
    explode+groupBy tf — including duplicate tokens, CJK, stopword
    filtering, empty and null docs."""
    from pyspark.sql import functions as F

    from searchenginesimple_spark.config import TOKEN_RE_CJK
    from searchenginesimple_spark.operators.bm25 import (
        filter_stopwords,
        tf_mapside,
        tokens_of,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b a c a b"),
            (1, "solo"),
            (2, ""),
            (3, None),
            (4, "the the the of x"),
            (5, "搜索 引擎 搜索 x1 x1"),
            (6, "z " * 500),
        ],
        "doc_id long, content string",
    )
    for token_re in (None, TOKEN_RE_CJK):
        for stops in ((), ("the", "of")):
            kw = {"token_re": token_re} if token_re else {}
            want = sorted(
                map(
                    tuple,
                    filter_stopwords(
                        tokens_of(docs, "content", False, **kw), stops
                    )
                    .groupBy("doc_id", "term")
                    .agg(F.count("*").cast("int").alias("tf"))
                    .collect(),
                )
            )
            for use_udf in (False, True):
                got = sorted(
                    map(
                        tuple,
                        tf_mapside(
                            docs, "content", use_udf, stopwords=stops, **kw
                        ).collect(),
                    )
                )
                assert got == want, (token_re, stops, use_udf)
