"""Trigram substring index (operators/trigram.py).

The operator's contract is output ≡ brute-force scan for EVERY needle and
EVERY knob setting (the index only prunes; verify is exact) — so every test
here pins the index path against ``trigram_search_bruteforce`` on the
deterministic synthetic code corpus, plus plan-shape asserts for the
100×-scale claims (broadcast needle side, no cartesian on the index path).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.operators.trigram import (
    build_trigram_index,
    content_trigrams,
    trigram_search,
    trigram_search_bruteforce,
)
from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

N_DOCS = 300

NEEDLES = [
    (0, "return"),            # hot token
    (1, "return ident"),      # cross-token span
    (2, "loc_7_"),            # file-local identifier prefix (partial ident)
    (3, "absent_zzz_needle"), # no match
    (4, "id"),                # < 3 chars → scan fallback
    (5, "x = 1"),             # short-doc content, punctuation + spaces
]


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


def _needles(spark, rows=NEEDLES):
    return spark.createDataFrame(rows, "needle_id long, needle string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_content_trigrams_windows(spark):
    df = spark.range(1).select(
        content_trigrams(F.lit("abcde")).alias("t"),
        content_trigrams(F.lit("ab")).alias("short"),
        content_trigrams(F.lit("aaaa")).alias("dup"),
    )
    row = df.first()
    assert row["t"] == ["abc", "bcd", "cde"]
    assert row["short"] == []          # no descending-sequence junk
    assert row["dup"] == ["aaa"]       # distinct per doc


def test_build_char_array_form_equals_substring_form(spark):
    """The build's staged char-array trigram generation (O(len) per doc)
    must emit byte-identical postings to the query-side substring form
    (content_trigrams) — including CJK, combining marks, and surrogate-pair
    (emoji) content, where a code-unit/code-point mismatch between
    ``split(content, '')`` and ``substring`` would diverge."""
    texts = [
        "中文搜索引擎测试", "mixé ünïcode ẞ", "emoji 😀😁x😀ab", "ab", "",
        "aaa", "中a文b", "tab\tand\nnewline end", "ααβγ αβγ",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, content string"
    )
    built, _ = build_trigram_index(docs)
    ref = docs.select(
        "doc_id", F.explode(content_trigrams(F.col("content"))).alias("trigram")
    )
    assert built.exceptAll(ref).count() == 0
    assert ref.exceptAll(built).count() == 0
    # ci build folds before windowing, same equality
    built_ci, _ = build_trigram_index(docs, case_insensitive=True)
    ref_ci = docs.select(
        "doc_id",
        F.explode(content_trigrams(F.lower(F.col("content")))).alias("trigram"),
    )
    assert built_ci.exceptAll(ref_ci).count() == 0
    assert ref_ci.exceptAll(built_ci).count() == 0


def test_index_path_equals_bruteforce(spark, corpus, index):
    postings, stats = index
    needles = _needles(spark)
    got = _rows(trigram_search(corpus, postings, stats, needles))
    want = _rows(trigram_search_bruteforce(corpus, needles))
    assert got == want
    # non-vacuous: the hot token and the cross-token span both match docs,
    # the absent needle matches none
    by_needle = {i: sum(1 for r in got if r[0] == i) for i, _ in NEEDLES}
    assert by_needle[0] > 50 and by_needle[1] > 0 and by_needle[2] > 0
    assert by_needle[3] == 0 and by_needle[4] > 0


@pytest.mark.parametrize(
    "knobs",
    [
        {"max_trigrams": 1},                   # maximal pruning
        {"max_trigrams": 3, "max_df": 20},     # hot-drop active
        {"max_df": 0},                         # EVERY trigram hot → all-scan
    ],
)
def test_knobs_never_change_results(spark, corpus, index, knobs):
    postings, stats = index
    needles = _needles(spark)
    got = _rows(trigram_search(corpus, postings, stats, needles, **knobs))
    want = _rows(trigram_search_bruteforce(corpus, needles))
    assert got == want


def test_positions_are_first_occurrence(spark, corpus, index):
    postings, stats = index
    needles = _needles(spark, [(0, "return")])
    out = trigram_search(corpus, postings, stats, needles)
    joined = out.join(corpus, "doc_id").select(
        "pos", F.instr("content", F.lit("return")).alias("want")
    )
    assert joined.filter(F.col("pos") != F.col("want")).count() == 0


def test_index_path_plan_shape(spark, corpus, index):
    """Scale pins: the needle side of the candidate join is broadcast, and
    the index path contains no cartesian product (the only nested-loop join
    allowed is the documented scan fallback, absent for 3+ char needles
    with default knobs)."""
    postings, stats = index
    needles = _needles(spark, [(0, "return ident")])
    plan = trigram_search(
        corpus, postings, stats, needles
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the scan fallback (BroadcastNestedLoopJoin) exists in the union but
    # must sit under an empty anti-joined needle set; the candidate
    # intersection itself is hash-agg + hash-join
    assert "HashAggregate" in plan


def test_needle_trigram_pushdown_reaches_parquet_scan(spark, corpus, index, tmp_path):
    """Scale pin: with postings materialized as parquet, the needle-trigram
    IN-filter must reach the scan (PushedFilters), so row groups without
    needle trigrams are never read — at 10^12 files this is the difference
    between scanning the index and scanning only the needles' slice."""
    from searchenginesimple_spark.operators.trigram import write_trigram_index

    postings, stats = index
    p, s = write_trigram_index(postings, str(tmp_path / "idx"))
    # clustered layout: stats derived from the materialized postings agree
    # with the pre-write stats
    assert (
        s.join(stats.withColumnRenamed("df", "df0"), "trigram")
        .filter("df != df0")
        .count()
        == 0
    )
    assert s.count() == stats.count()
    needles = _needles(spark, [(0, "return ident")])
    plan = trigram_search(
        corpus, p, s, needles
    )._jdf.queryExecution().executedPlan().toString()
    import re as _re

    pushed = _re.findall(r"PushedFilters: \[[^\]]*In\(trigram", plan)
    assert pushed, "needle-trigram IN-filter did not reach the parquet scan"
    # equivalence must survive the parquet round-trip + pushdown
    got = _rows(trigram_search(corpus, p, s, _needles(spark)))
    want = _rows(trigram_search_bruteforce(corpus, _needles(spark)))
    assert got == want


def test_postings_unique_and_df_consistent(spark, corpus, index):
    postings, stats = index
    dup = (
        postings.groupBy("trigram", "doc_id").count().filter("count > 1").count()
    )
    assert dup == 0
    # df in stats is exactly the posting count per trigram
    bad = (
        postings.groupBy("trigram")
        .agg(F.count("*").alias("n"))
        .join(stats, "trigram")
        .filter("n != df")
        .count()
    )
    assert bad == 0


CI_DOCS = [
    (1, "def HttpServer(): RETURN_CODE = OK"),
    (2, "def httpserver(): return_code = ok"),
    (3, "nothing relevant here"),
]
CI_NEEDLES = [(0, "HTTPServer"), (1, "return_code"), (2, "RETURN_CODE = ok")]


def test_case_insensitive_search_equals_ci_scan(spark):
    docs = spark.createDataFrame(CI_DOCS, "doc_id long, content string")
    needles = spark.createDataFrame(CI_NEEDLES, "needle_id long, needle string")
    postings, stats = build_trigram_index(docs, case_insensitive=True)
    got = sorted(
        map(tuple, trigram_search(
            docs, postings, stats, needles, case_insensitive=True
        ).collect())
    )
    want = sorted(
        map(tuple, trigram_search_bruteforce(
            docs, needles, case_insensitive=True
        ).collect())
    )
    assert got == want
    hit_docs = {(r[0], r[2]) for r in got}
    # every needle matches BOTH case variants through the folded index
    assert {(0, 1), (0, 2), (1, 1), (1, 2), (2, 1), (2, 2)} <= hit_docs


def test_case_sensitive_stays_sensitive(spark):
    docs = spark.createDataFrame(CI_DOCS, "doc_id long, content string")
    needles = spark.createDataFrame([(0, "RETURN_CODE")], "needle_id long, needle string")
    postings, stats = build_trigram_index(docs)
    got = trigram_search(docs, postings, stats, needles).collect()
    assert {r["doc_id"] for r in got} == {1}


def test_write_resume_skips_committed_phases(spark, tmp_path):
    import os

    docs = spark.createDataFrame(CI_DOCS, "doc_id long, content string")
    raw, _ = build_trigram_index(docs)
    path = str(tmp_path / "idx")
    from searchenginesimple_spark.operators.trigram import write_trigram_index

    p1, s1 = write_trigram_index(raw, path, resume=True)
    before = sorted(map(tuple, p1.collect()))
    n_stats = s1.count()
    mtimes = {
        f: os.path.getmtime(os.path.join(path, "postings", f))
        for f in os.listdir(f"{path}/postings")
    }
    # a resumed re-run over a COMMITTED index must not rewrite anything
    p2, s2 = write_trigram_index(raw, path, resume=True)
    assert sorted(map(tuple, p2.collect())) == before
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(path, "postings", f)) == t
    # a crash AFTER the postings commit (stats phase uncommitted) resumes
    # at the stats phase without re-shuffling the committed postings
    import shutil

    shutil.rmtree(f"{path}/stats")
    p3, s3 = write_trigram_index(raw, path, resume=True)
    assert sorted(map(tuple, p3.collect())) == before
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(path, "postings", f)) == t
    assert s3.count() == n_stats


def test_topk_ranked_by_occurrences(spark):
    from searchenginesimple_spark.operators.trigram import trigram_search_topk

    docs = spark.createDataFrame(
        [
            (1, "needle one"),
            (2, "needle needle needle three"),
            (3, "needle needle two"),
            (4, "nothing here"),
        ],
        "doc_id long, content string",
    )
    needles = spark.createDataFrame([(0, "needle")], "needle_id long, needle string")
    postings, stats = build_trigram_index(docs)
    got = [
        (r.rank, r.doc_id, r.n_occurrences)
        for r in trigram_search_topk(docs, postings, stats, needles, k=2)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(1, 2, 3), (2, 3, 2)]


def test_topk_matches_python_count(spark):
    """Occurrence arithmetic ≡ str.count on the synthetic corpus, and the
    candidate set inherits the verify guarantee (every counted doc is a
    true match)."""
    from searchenginesimple_spark.operators.trigram import trigram_search_topk
    from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

    docs = with_doc_ids(docs_df(spark, 120)).select("doc_id", "content")
    needles = spark.createDataFrame(
        [(0, "return"), (1, "ident_00"), (2, "zz_absent")],
        "needle_id long, needle string",
    )
    postings, stats = build_trigram_index(docs)
    got = {
        (r.needle_id, r.doc_id): r.n_occurrences
        for r in trigram_search_topk(docs, postings, stats, needles, k=5).collect()
    }
    content = {r["doc_id"]: r["content"] for r in docs.collect()}
    by_needle = {}
    for (nid, did), n in got.items():
        needle = ["return", "ident_00", "zz_absent"][nid]
        assert content[did].count(needle) == n
        by_needle.setdefault(nid, []).append(n)
    assert 2 not in by_needle  # absent needle → no rows
    for nid, counts in by_needle.items():
        top = sorted(
            (content[d].count(["return", "ident_00"][nid]) for d in content),
            reverse=True,
        )[: len(counts)]
        assert sorted(counts, reverse=True) == top  # true top-k by count


def test_build_plan_evaluates_split_once(spark):
    """The JVM engine's O(len)-per-doc property hangs on the char-array
    staging projection surviving CollapseProject: if Catalyst ever inlines
    the split into the window lambda, it re-evaluates per element_at and
    the build goes O(len²) per doc again (~100 s of the pre-r5 143 s
    build).  Pin: exactly ONE split(...) in the optimized postings plan."""
    docs = spark.createDataFrame(
        [(1, "hello world of text")], "doc_id long, content string"
    )
    p, _ = build_trigram_index(docs, engine="jvm")
    plan = p._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1, plan


def test_build_engines_identical(spark):
    """The r6 Arrow/numpy projection must emit the EXACT posting set the
    JVM twin emits — including the non-ASCII fallback path (CJK,
    combining marks, surrogate-pair emoji) and the ci fold (done JVM-side
    in both engines, so keys can never diverge on locale case rules)."""
    texts = [
        "中文搜索引擎测试", "mixé ünïcode ẞ", "emoji 😀😁x😀ab", "ab", "",
        "aaa", "中a文b", "tab\tand\nnewline end", "ααβγ αβγ",
        "plain ascii body with return return",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, content string"
    )
    for ci in (False, True):
        a = sorted(
            map(tuple, build_trigram_index(docs, case_insensitive=ci, engine="arrow")[0].collect())
        )
        j = sorted(
            map(tuple, build_trigram_index(docs, case_insensitive=ci, engine="jvm")[0].collect())
        )
        assert a == j and len(a) > 0


def test_metrics_plan_has_no_expand(spark, tmp_path):
    """The per-file lineage metrics must stay Expand-free: two
    countDistincts in one aggregate make Catalyst Expand every posting
    once per distinct column (3× the index through the shuffle — measured
    54-58 s of an ~80 s 100k build); the split pre-distinct form measured
    2-4 s.  Pin the plan property, and that the exact counts match the
    naive dual-countDistinct result."""
    from pyspark.sql import functions as F

    from searchenginesimple_spark.operators.trigram import (
        _metrics_frame,
        write_trigram_index,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} body_{i} text") for i in range(50)],
        "doc_id long, content string",
    )
    raw, _ = build_trigram_index(docs)
    path = str(tmp_path / "idx")
    write_trigram_index(raw, path, partitions=3)
    pr = spark.read.parquet(f"{path}/postings")

    m = _metrics_frame(pr)
    assert "Expand" not in m._jdf.queryExecution().executedPlan().toString()

    naive = pr.groupBy(F.input_file_name().alias("file")).agg(
        F.count("*").cast("long").alias("n_postings"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.countDistinct("trigram").cast("long").alias("n_trigrams"),
        F.min("trigram").alias("min_trigram"),
        F.max("trigram").alias("max_trigram"),
    )
    cols = ["file", "n_postings", "n_docs", "n_trigrams", "min_trigram", "max_trigram"]
    got = sorted(map(tuple, m.select(*cols).collect()))
    want = sorted(map(tuple, naive.select(*cols).collect()))
    assert got == want


def test_py_trigrams_matches_jvm_expression(spark):
    """The driver-side needle compiler (py_trigrams) must produce exactly
    the JVM content_trigrams set for any string — CJK, emoji (astral /
    surrogate-pair), combining marks, and short/empty edge cases."""
    from searchenginesimple_spark.operators.trigram import py_trigrams

    needles = [
        "", "a", "ab", "abc", "abcd", "aaaa", "return ident",
        "中文字符测试", "日本語のテスト", "héllo wörld",
        "éclair combining", "emoji 😀😁😂 run", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 math",
        "mix中en文maç", "tab\tnew\nline",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(needles)],
                               "i long, s string")
    rows = df.select("i", content_trigrams(F.col("s")).alias("t")).collect()
    jvm = {r["i"]: set(r["t"]) for r in rows}
    for i, s in enumerate(needles):
        assert py_trigrams(s) == jvm[i], (s, py_trigrams(s), jvm[i])
