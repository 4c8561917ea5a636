"""Type-ahead completions from the query log (operators/suggest.py::
popular_completions).

Pins: hand-checked popularity ordering and tie-breaks; normalization;
min_count prune; max_prefix bound; Spark ≡ pure-Python twin on randomized
logs; no Python rows in the plan.
"""

from __future__ import annotations

import random
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from searchenginesimple_spark.operators.suggest import popular_completions


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _twin(queries, k=5, max_prefix=12, min_count=1):
    import re

    counts = Counter(
        re.sub(r"\s+", " ", q.lower()).strip() for q in queries
    )
    counts.pop("", None)
    by_prefix = defaultdict(list)
    for q, c in counts.items():
        if c < min_count:
            continue
        for n in range(1, min(len(q), max_prefix) + 1):
            by_prefix[q[:n]].append((-c, q))
    out = []
    for p, cands in by_prefix.items():
        for rank, (negc, q) in enumerate(sorted(cands)[:k], start=1):
            out.append((p, rank, q, -negc))
    return sorted(out)


def _df(spark, queries):
    return spark.createDataFrame([(q,) for q in queries], "query string")


def test_hand_checked(spark):
    log = ["spark sql"] * 3 + ["spark window"] * 2 + ["spa day"] + ["  Spark   SQL "]
    got = _rows(popular_completions(_df(spark, log), k=2, max_prefix=6))
    want = _twin(log, k=2, max_prefix=6)
    assert got == want
    m = {(p, r): (c, n) for p, r, c, n in got}
    # normalization folds "  Spark   SQL " into "spark sql" (count 4)
    assert m[("spark", 1)] == ("spark sql", 4)
    assert m[("spark", 2)] == ("spark window", 2)
    assert m[("spa", 1)] == ("spark sql", 4)
    # k=2 caps ranks at 2; the deterministic tie-break puts the count-2
    # completion at rank 2 ahead of the count-1 one
    assert m[("spa", 2)] == ("spark window", 2)
    assert ("spa", 3) not in m
    # max_prefix=6 stops the fan-out ("spark w" never appears)
    assert all(len(p) <= 6 for p, _, _, _ in got)


def test_min_count_prunes_typos(spark):
    log = ["common query"] * 5 + ["comon qurey"]
    got = _rows(popular_completions(_df(spark, log), k=3, min_count=2))
    assert got == _twin(log, k=3, min_count=2)
    assert all(c == "common query" for _, _, c, _ in got)


def test_matches_twin_randomized(spark):
    rng = random.Random(11)
    vocab = ["spark", "sql", "scan", "sort", "join", "window", "agg"]
    log = [
        " ".join(rng.sample(vocab, rng.randint(1, 3)))
        for _ in range(300)
    ]
    got = _rows(popular_completions(_df(spark, log), k=3, max_prefix=8))
    assert got == _twin(log, k=3, max_prefix=8)


def test_no_python_in_plan(spark):
    plan = (
        popular_completions(_df(spark, ["a b", "a c"]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # partial top-k: the rank<=k filter pushes a WindowGroupLimit below the
    # shuffle (the per_key_cap pattern)
    assert "WindowGroupLimit" in plan


def test_edge_whitespace_folds(spark):
    """Tab/newline-edged logs fold into one completion (collapse-before-
    trim) — and whitespace-only queries vanish rather than survive as ''."""
    log = ["\tspark sql\n", "spark sql", "spark\t sql", " \t\n ", ""]
    got = _rows(popular_completions(_df(spark, log), k=3, max_prefix=9))
    assert got == _twin(log, k=3, max_prefix=9)
    assert {c for _, _, c, _ in got} == {"spark sql"}
    assert all(n == 3 for _, _, _, n in got)
