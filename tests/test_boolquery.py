"""Boolean query search (operators/boolquery.py).

Contract: output ≡ brute-force boolean scan for EVERY parseable query and
EVERY knob setting (the index only prunes; verify is exact) — the same
oracle rule as trigram_search / trigram_regex_search.  Parser and DNF get
direct unit pins; the search battery runs index path, hot-drop routing,
scan fallback, and case folding against ``boolean_search_bruteforce`` on
the deterministic synthetic code corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.operators.boolquery import (
    MAX_CONJUNCTS,
    _Unsupported,
    boolean_search,
    boolean_search_bruteforce,
    boolean_search_lines,
    boolean_search_topk_ranked,
    explain_search,
    parse_query,
    to_dnf,
)
from searchenginesimple_spark.operators.trigram import build_trigram_index
from searchenginesimple_spark.sources.corpus import docs_df, with_doc_ids

N_DOCS = 300

QUERIES = [
    (0, "return ident"),                     # juxtaposition = AND
    (1, "return OR absent_zzz_needle"),      # OR, one empty side
    (2, "return -loc_7_"),                   # AND NOT
    (3, '"return ident" OR "x = 1"'),        # quoted multi-word atoms
    (4, "-return"),                          # pure negation → scan path
    (5, "(return OR ident) -def"),           # parens + distribution
    (6, "id return"),                        # short atom carried by a long one
    (7, "NOT (return AND ident)"),           # De Morgan
    (8, "id"),                               # all atoms < 3 chars → scan
    (9, "return -return"),                   # contradiction → empty
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


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------- parser


def test_parse_precedence():
    # juxtaposition (AND) binds tighter than OR
    assert parse_query("a b OR c") == (
        "or",
        [("and", [("atom", "a"), ("atom", "b")]), ("atom", "c")],
    )
    # explicit AND ≡ juxtaposition
    assert parse_query("a AND b") == parse_query("a b")
    # NOT ≡ leading '-'
    assert parse_query("NOT a") == parse_query("-a") == ("not", ("atom", "a"))
    # parens override
    assert parse_query("a (b OR c)") == (
        "and",
        [("atom", "a"), ("or", [("atom", "b"), ("atom", "c")])],
    )


def test_parse_atoms():
    # lowercase keywords are atoms (code tokens), interior '-' is literal
    assert parse_query("or") == ("atom", "or")
    assert parse_query("foo-bar") == ("atom", "foo-bar")
    # quoted atoms keep spaces, parens, dashes; escapes unescape
    assert parse_query('"a (b" c') == ("and", [("atom", "a (b"), ("atom", "c")])
    assert parse_query(r'"a\"b\\c"') == ("atom", 'a"b\\c')
    # double negation parses (DNF cancels it)
    assert to_dnf(parse_query("--a")) == [(frozenset({"a"}), frozenset())]


@pytest.mark.parametrize(
    "bad",
    ['"unterminated', '""', "a OR", "(a b", "a)", "- a", "a AND", "", "AND a"],
)
def test_parse_errors(bad):
    with pytest.raises(ValueError):
        parse_query(bad)


def test_dnf_shapes():
    assert to_dnf(parse_query("a -b")) == [(frozenset({"a"}), frozenset({"b"}))]
    # distribution: (a OR b) c → two conjuncts
    assert sorted(to_dnf(parse_query("(a OR b) c"))) == sorted(
        [
            (frozenset({"a", "c"}), frozenset()),
            (frozenset({"b", "c"}), frozenset()),
        ]
    )
    # De Morgan: NOT (a b) → -a OR -b
    assert sorted(to_dnf(parse_query("NOT (a b)"))) == sorted(
        [(frozenset(), frozenset({"a"})), (frozenset(), frozenset({"b"}))]
    )
    # contradiction dropped
    assert to_dnf(parse_query("a -a")) == []


def test_dnf_explosion_raises():
    # 2^7 = 128 conjuncts > MAX_CONJUNCTS
    q = " ".join(f"(w{i}a OR w{i}b)" for i in range(7))
    assert 2**7 > MAX_CONJUNCTS
    with pytest.raises(_Unsupported):
        to_dnf(parse_query(q))


# ---------------------------------------------------------------- search


def test_boolean_search_matches_bruteforce(spark, corpus, index):
    postings, stats = index
    got = boolean_search(corpus, postings, stats, QUERIES)
    want = boolean_search_bruteforce(corpus, QUERIES)
    assert _rows(got) == _rows(want)
    by_qid = {
        r["query_id"]: r["n"]
        for r in got.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    }
    # the battery must exercise real rows: AND/OR/NOT queries match docs,
    # the contradiction matches nothing
    assert by_qid.get(0, 0) > 0 and by_qid.get(5, 0) > 0
    assert 9 not in by_qid


def test_pure_negation_is_complement(spark, corpus, index):
    postings, stats = index
    neg = boolean_search(corpus, postings, stats, [(0, "-return")])
    pos = boolean_search(corpus, postings, stats, [(0, "return")])
    assert neg.count() + pos.count() == N_DOCS
    assert (
        neg.select("doc_id").intersect(pos.select("doc_id")).count() == 0
    )


def test_hot_drop_routing_is_invisible(spark, corpus, index):
    """max_df small enough to hot-drop common trigrams must not change
    results — conjuncts that lose every trigram take the scan path."""
    postings, stats = index
    got = boolean_search(corpus, postings, stats, QUERIES, max_df=5)
    want = boolean_search_bruteforce(corpus, QUERIES)
    assert _rows(got) == _rows(want)


def test_max_trigrams_knob_is_invisible(spark, corpus, index):
    postings, stats = index
    got = boolean_search(corpus, postings, stats, QUERIES, max_trigrams=1)
    want = boolean_search_bruteforce(corpus, QUERIES)
    assert _rows(got) == _rows(want)


def test_case_insensitive_pair(spark, corpus):
    ci_postings, ci_stats = build_trigram_index(corpus, case_insensitive=True)
    queries = [(0, "RETURN -LOC_7_"), (1, '"RETURN IDENT"')]
    got = boolean_search(
        corpus, ci_postings, ci_stats, queries, case_insensitive=True
    )
    want = boolean_search_bruteforce(corpus, queries, case_insensitive=True)
    assert _rows(got) == _rows(want)
    assert got.count() > 0  # folding actually matched lowercase content


def test_field_atoms_parse():
    assert parse_query("lang:py return") == (
        "and",
        [("field", "lang", "py"), ("atom", "return")],
    )
    assert parse_query("-path:vendor") == ("not", ("field", "path", "vendor"))
    # quoting suppresses the prefix; non-field prefixes and bare colons stay atoms
    assert parse_query('"lang:py"') == ("atom", "lang:py")
    assert parse_query("std::vector") == ("atom", "std::vector")
    assert parse_query("lang:") == ("atom", "lang:")
    # quoted field values: the quote would otherwise end the bareword and
    # silently degrade the prefix to a content atom
    assert parse_query('path:"my dir" crypto') == (
        "and",
        [("field", "path", "my dir"), ("atom", "crypto")],
    )
    assert parse_query('-f:"a b"') == ("not", ("field", "f", "a b"))
    assert to_dnf(parse_query("lang:py -path:vendor"))[0] == (
        frozenset({("lang", "py")}),
        frozenset({("path", "vendor")}),
    )


def test_field_atoms_search(spark):
    docs = with_doc_ids(docs_df(spark, N_DOCS))  # keeps repo/path/lang cols
    docs = docs.cache()
    postings, stats = build_trigram_index(docs)
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    lang = sorted(langs)[0]
    queries = [
        (0, f"lang:{lang} return"),         # metadata ∧ content (index path)
        (1, f"lang:{lang.upper()}"),        # field-only conjunct → scan path
        (2, "return -path:7"),              # negated field on candidates
        (3, f"path:0 OR lang:{lang}"),      # field-only OR branch → scan
    ]
    got = boolean_search(docs, postings, stats, queries)
    want = boolean_search_bruteforce(docs, queries)
    assert _rows(got) == _rows(want)
    by_qid = {r[0] for r in got.select("query_id").distinct().collect()}
    assert {0, 1, 2, 3} <= by_qid  # every routing produced rows
    # lang: equality is case-folded even in a case-sensitive search
    n0 = got.filter(F.col("query_id") == 1).count()
    assert n0 == docs.filter(F.lower("lang") == lang.lower()).count()


def test_regex_atoms_parse():
    assert parse_query("re:foo.*bar") == ("regex", "foo.*bar")
    assert parse_query('re:"a b(c|d)"') == ("regex", "a b(c|d)")
    assert parse_query("-re:foo lang:py") == (
        "and",
        [("not", ("regex", "foo")), ("field", "lang", "py")],
    )
    # quoting suppresses the prefix; bare 're:' is a content atom
    assert parse_query('"re:x"') == ("atom", "re:x")
    assert parse_query("re:") == ("atom", "re:")
    # unquoted parenthesized pattern would misparse ('(' is query syntax)
    with pytest.raises(ValueError):
        parse_query("re:(a|b) c")
    assert to_dnf(parse_query("re:foo -re:bar"))[0] == (
        frozenset({("re", "foo")}),
        frozenset({("re", "bar")}),
    )


def test_regex_atoms_search(spark, corpus, index):
    postings, stats = index
    queries = [
        (0, "re:return.ident"),                 # in-subset: own branch trigrams
        (1, 're:"(ident_001|ident_002)" return'),  # branch expansion × content atom
        (2, "re:ident+ return"),                # OUT of subset: sibling indexes it
        (3, "return -re:loc_7_"),               # negated regex, verify-side
        (4, "re:zzz_absent+"),                  # out-of-subset alone → scan path
        (5, 're:"return ident"'),               # quoted pattern with a space
    ]
    got = boolean_search(corpus, postings, stats, queries)
    want = boolean_search_bruteforce(corpus, queries)
    assert _rows(got) == _rows(want)
    by_qid = {r[0] for r in got.select("query_id").distinct().collect()}
    assert {0, 1, 2, 3, 5} <= by_qid and 4 not in by_qid


def test_regex_atoms_case_insensitive(spark, corpus):
    ci_postings, ci_stats = build_trigram_index(corpus, case_insensitive=True)
    # under ci the verify runs against folded content: lowercase patterns
    queries = [(0, "re:return.ident LOC_7_")]
    got = boolean_search(
        corpus, ci_postings, ci_stats, queries, case_insensitive=True
    )
    want = boolean_search_bruteforce(corpus, queries, case_insensitive=True)
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_field_alias_atoms(spark):
    # zoekt's short forms: f:/file: ≡ path:, r: ≡ repo:, l: ≡ lang:
    assert parse_query("f:src/x")[0] == "field" and parse_query("f:src/x")[1] == "f"
    docs = (
        with_doc_ids(docs_df(spark, 80))
        .select("doc_id", "repo", "path", "lang", "content")
        .cache()
    )
    postings, stats = build_trigram_index(docs)
    lang = docs.select("lang").first()["lang"]
    pairs = [
        (f"lang:{lang} return", f"l:{lang} return"),
        ("path:src return", "file:src return"),
        ("path:src return", "f:src return"),
        ("repo:org0 return", "r:org0 return"),
    ]
    for long_q, short_q in pairs:
        a = boolean_search(docs, postings, stats, [(0, long_q)]).select("doc_id")
        b = boolean_search(docs, postings, stats, [(0, short_q)]).select("doc_id")
        assert _rows(a) == _rows(b) and a.count() > 0


def test_sym_atoms_parse():
    assert parse_query("sym:handler") == ("sym", "handler")
    assert parse_query("-sym:main lang:py") == (
        "and",
        [("not", ("sym", "main")), ("field", "lang", "py")],
    )
    # quoting suppresses the prefix; bare 'sym:' is a content atom
    assert parse_query('"sym:x"') == ("atom", "sym:x")
    assert parse_query("sym:") == ("atom", "sym:")
    # quoted value form, mirroring re:"..."
    assert parse_query('sym:"abc"') == ("sym", "abc")
    assert to_dnf(parse_query("sym:foo -sym:bar"))[0] == (
        frozenset({("sym", "foo")}),
        frozenset({("sym", "bar")}),
    )


@pytest.fixture(scope="module")
def sym_corpus(spark):
    """Small code corpus with definition sites AND plain usages, so the
    tests can pin that ``sym:`` demands a DEFINITION, not a mention."""
    rows = []
    for i in range(40):
        lines = [f"ident_{i:03d} return loc_{i}_0", f"y = handler_{i % 5}(1)"]
        if i % 4 == 0:
            lines.append(f"def handler_{i % 5}(x):")
            lines.append("    return x + 1")
        if i % 6 == 0:
            lines.append(f"class Widget{i % 3}:")
        rows.append((i, "\n".join(lines)))
    docs = spark.createDataFrame(rows, "doc_id long, content string").cache()
    docs.count()
    return docs


@pytest.fixture(scope="module")
def sym_index(spark, sym_corpus):
    postings, stats = build_trigram_index(sym_corpus)
    postings, stats = postings.cache(), stats.cache()
    postings.count(), stats.count()
    return postings, stats


def test_sym_atoms_search(spark, sym_corpus, sym_index):
    postings, stats = sym_index
    queries = [
        (0, "sym:handler_1"),            # exact defined name
        (1, "sym:handler"),              # substring over defined names
        (2, "sym:Widget return"),        # AND with a content atom
        (3, "return -sym:handler_0"),    # negated sym, verify-side
        (4, "sym:absent_zzz"),           # defined nowhere
        (5, "handler_1"),                # content atom twin of query 0
    ]
    got = boolean_search(sym_corpus, postings, stats, queries)
    want = boolean_search_bruteforce(sym_corpus, queries)
    assert _rows(got) == _rows(want)
    by_qid = {r[0] for r in got.select("query_id").distinct().collect()}
    assert {0, 1, 2, 3, 5} <= by_qid and 4 not in by_qid
    # definition vs mention: i%5==1 docs all MENTION handler_1 (call
    # sites), but only the i%4==0 ∧ i%5==1 ones also DEFINE it
    n_def = got.filter(F.col("query_id") == 0).count()
    n_mention = got.filter(F.col("query_id") == 5).count()
    assert n_def == sum(1 for i in range(40) if i % 4 == 0 and i % 5 == 1)
    assert n_mention > n_def


def test_sym_atoms_case_insensitive(spark, sym_corpus):
    ci_postings, ci_stats = build_trigram_index(sym_corpus, case_insensitive=True)
    queries = [(0, "sym:WIDGET0"), (1, "sym:widget0")]
    got = boolean_search(
        sym_corpus, ci_postings, ci_stats, queries, case_insensitive=True
    )
    want = boolean_search_bruteforce(sym_corpus, queries, case_insensitive=True)
    assert _rows(got) == _rows(want)
    a = _rows(got.filter(F.col("query_id") == 0).select("doc_id"))
    b = _rows(got.filter(F.col("query_id") == 1).select("doc_id"))
    assert a == b and len(a) > 0


# ------------------------------------------------------- line reporting


def _py_eval(node, content: str, symbols: list[str]) -> bool:
    """Independent pure-Python evaluation of the boolean AST."""
    import re as _re

    kind = node[0]
    if kind == "atom":
        return node[1] in content
    if kind == "regex":
        return _re.search(node[1], content) is not None
    if kind == "sym":
        return any(node[1] in s for s in symbols)
    if kind == "field":
        raise AssertionError("field atoms not used in the line-test queries")
    if kind == "not":
        return not _py_eval(node[1], content, symbols)
    sub = (_py_eval(c, content, symbols) for c in node[1])
    return all(sub) if kind == "and" else any(sub)


def _py_symbols(text: str) -> list[str]:
    import re as _re

    from searchenginesimple_spark.functions.code import SYMBOL_PATTERNS

    out: list[str] = []
    for p in SYMBOL_PATTERNS.values():
        out.extend(m.group(1) for m in _re.finditer(p, text))
    return out


def _py_lines_oracle(rows, queries):
    """(query_id, query, doc_id, line_no, line) per python re — the
    independent twin of boolean_search_lines."""
    from searchenginesimple_spark.operators.boolquery import _positive_leaves

    want = []
    for qid, qs in queries:
        ast = parse_query(qs)
        leaves = sorted(_positive_leaves(ast))
        for doc_id, content in rows:
            if not _py_eval(ast, content, _py_symbols(content)):
                continue
            for ln0, line in enumerate(content.split("\n")):
                hit = False
                for kind, v in leaves:
                    if kind == "atom":
                        hit = "\n" not in v and v in line
                    elif kind == "regex":
                        import re as _re

                        hit = _re.search(v, line) is not None
                    else:
                        hit = any(v in s for s in _py_symbols(line))
                    if hit:
                        break
                if hit:
                    want.append((qid, qs, doc_id, ln0 + 1, line))
    return sorted(want)


def test_boolean_search_lines(spark, sym_corpus, sym_index):
    postings, stats = sym_index
    queries = [
        (0, "return -sym:handler_0"),     # positive leaf: 'return' only
        (1, "sym:Widget OR handler_2"),   # sym + content leaves highlight
        (2, "re:handler_[13] return"),    # regex leaf lines + atom lines
        (3, "-return"),                   # no positive leaf → no line rows
    ]
    got = boolean_search_lines(sym_corpus, postings, stats, queries)
    rows = [(r["doc_id"], r["content"]) for r in sym_corpus.collect()]
    assert sorted(map(tuple, got.collect())) == _py_lines_oracle(rows, queries)
    qids = {r[0] for r in got.select("query_id").distinct().collect()}
    assert {0, 1, 2} <= qids and 3 not in qids
    # grep -m: the cap keeps the FIRST lines per (query, doc)
    capped = boolean_search_lines(
        sym_corpus, postings, stats, queries, max_lines_per_doc=1
    )
    full = {}
    for r in _py_lines_oracle(rows, queries):
        full.setdefault((r[0], r[2]), r)  # first line per (qid, doc)
    assert sorted(map(tuple, capped.collect())) == sorted(full.values())


# ------------------------------------------------------------ boost ladder


@pytest.fixture(scope="module")
def ranked_corpus(spark):
    """(doc_id, path, content): definition sites, call-site usages, and
    paths that sometimes carry the handler name — every boost signal of
    the ladder is planted."""
    rows = []
    for i in range(50):
        lines = [
            f"ident_{i:03d} return loc_{i}_0",
            f"y = handler_{i % 5}(1)",
            "return done",
        ]
        if i % 4 == 0:
            lines += [f"def handler_{i % 5}(x):", "    return x + 1"]
        path = (
            f"src/handler_{i % 5}/f{i}.py" if i % 7 == 0 else f"src/core/f{i}.py"
        )
        rows.append((i, path, "\n".join(lines)))
    docs = spark.createDataFrame(
        rows, "doc_id long, path string, content string"
    ).cache()
    docs.count()
    return rows, docs


def _py_ranked_oracle(rows, queries, k):
    """Independent python-re twin of boolean_search_topk_ranked (ci=False)."""
    import re as _re

    from searchenginesimple_spark.operators.boolquery import _positive_leaves

    out = []
    for qid, qs in queries:
        ast = parse_query(qs)
        leaves = sorted(_positive_leaves(ast))
        scored = []
        for doc_id, path, content in rows:
            syms = _py_symbols(content)
            if not _py_eval(ast, content, syms):
                continue
            occ, pm, sm = 0, 0, 0
            for kind, v in leaves:
                if kind == "atom":
                    occ += content.count(v)
                    pm |= int(v in path)
                    sm |= int(any(v in s for s in syms))
                elif kind == "regex":
                    occ += len(_re.findall(v, content))
                    pm |= int(_re.search(v, path) is not None)
                    sm |= int(any(_re.search(v, s) for s in syms))
                else:  # sym
                    sm |= int(any(v in s for s in syms))
            scored.append((sm, pm, occ, doc_id))
        scored.sort(key=lambda t: (-t[0], -t[1], -t[2], t[3]))
        for rank, (sm, pm, occ, doc_id) in enumerate(scored[:k], 1):
            out.append((qid, qs, rank, doc_id, sm, pm, occ))
    return sorted(out)


def test_boolean_topk_ranked(spark, ranked_corpus):
    rows, docs = ranked_corpus
    postings, stats = build_trigram_index(docs)
    queries = [
        (0, "handler_1"),                  # atom: all three boosts live
        (1, "re:handler_[12] return"),     # regex occurrences + atom occurrences
        (2, "sym:handler_2 OR handler_3"), # sym leaf boosts symbol_match only
        (3, "return -handler_1"),          # negation: no boost from the negated atom
    ]
    for k in (5, 100):
        got = sorted(
            map(tuple, boolean_search_topk_ranked(docs, postings, stats, queries, k=k).collect())
        )
        assert got == _py_ranked_oracle(rows, queries, k)
    # the ladder actually bites: for query 0 the top hit defines handler_1
    top = (
        boolean_search_topk_ranked(docs, postings, stats, queries, k=1)
        .filter(F.col("query_id") == 0)
        .collect()[0]
    )
    assert top["symbol_match"] == 1


def test_boolean_facets(spark):
    from collections import Counter

    from searchenginesimple_spark.operators.boolquery import boolean_search_facets

    docs = (
        with_doc_ids(docs_df(spark, 200))
        .select("doc_id", "repo", "lang", "content")
        .cache()
    )
    postings, stats = build_trigram_index(docs)
    queries = [(0, "return ident"), (1, "lang:py return"), (2, "zzz_absent")]
    got = sorted(
        map(tuple, boolean_search_facets(docs, postings, stats, queries).collect())
    )
    hits = boolean_search_bruteforce(docs, queries).join(
        docs.select("doc_id", "repo", "lang"), "doc_id"
    )
    cnt: Counter = Counter()
    for r in hits.select("query_id", "query", "repo", "lang").collect():
        cnt[(r["query_id"], r["query"], "repo", r["repo"])] += 1
        cnt[(r["query_id"], r["query"], "lang", r["lang"])] += 1
    want = sorted((q, s, f, v, n) for (q, s, f, v), n in cnt.items())
    assert got == want
    assert {r[0] for r in got} == {0, 1}  # the absent query contributes no rows
    # the field-filtered query facets to a single lang bucket
    assert {r[3] for r in got if r[0] == 1 and r[2] == "lang"} == {"py"}


def test_bad_syntax_raises(spark, corpus, index):
    postings, stats = index
    with pytest.raises(ValueError):
        boolean_search(corpus, postings, stats, [(0, "a OR")])


def test_atom_trigram_pushdown_reaches_parquet_scan(spark, corpus, index, tmp_path):
    """Scale pin: with the index materialized as parquet, the driver-side
    atom-trigram universe must reach the postings scan as an IN-filter
    (row-group pruning) — one batch reads only its atoms' index slice."""
    import re as _re

    from searchenginesimple_spark.operators.trigram import write_trigram_index

    postings, stats = index
    p, s = write_trigram_index(postings, str(tmp_path / "idx"))
    plan = (
        boolean_search(corpus, p, s, [(0, "return -ident"), (1, "def OR class")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert _re.findall(r"PushedFilters: \[[^\]]*In\(trigram", plan)
    # equivalence must survive the parquet round-trip + pushdown
    got = boolean_search(corpus, p, s, QUERIES)
    assert _rows(got) == _rows(boolean_search_bruteforce(corpus, QUERIES))


def test_index_path_plan_shape(spark, corpus, index):
    """The 100×-scale claims: needle trigrams broadcast (no shuffle of the
    postings side onto a query key), no cartesian product anywhere on the
    index path, and the trigram IN-filter reaches the postings scan."""
    postings, stats = index
    plan = boolean_search(
        corpus, postings, stats, [(0, "return ident -def")]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_randomized_queries_index_equals_scan(spark):
    """Seeded random walk over the FULL grammar (atoms, fields incl.
    aliases, regex, sym, NOT/AND/OR nesting): one 30-query batch, index
    path ≡ brute-force scan at the default and a hot-dropping max_df —
    the end-to-end twin of the pure-Python DNF property test."""
    import random

    from test_boolquery_property import _render

    rng = random.Random(42)
    WORDS = ["return", "ident", "loc_7_", "id", "zz_absent", "ident_001", "def"]
    REGEXES = ["return.ident", "ident_00[0-9]", "loc_[0-9]+_", "zz+x?"]
    SYMS = ["handler", "f", "zzz"]

    def rand_ast(depth=0):
        r = rng.random()
        if depth >= 3 or r < 0.45:
            k = rng.random()
            if k < 0.55:
                return ("atom", rng.choice(WORDS))
            if k < 0.7:
                return ("field", rng.choice(["lang", "l"]), rng.choice(["py", "js"]))
            if k < 0.88:
                return ("regex", rng.choice(REGEXES))
            return ("sym", rng.choice(SYMS))
        if r < 0.6:
            return ("not", rand_ast(depth + 1))
        kids = [rand_ast(depth + 1) for _ in range(rng.randint(2, 3))]
        return (rng.choice(["and", "or"]), kids)

    docs = (
        with_doc_ids(docs_df(spark, 150))
        .select("doc_id", "lang", "content")
        .cache()
    )
    postings, stats = build_trigram_index(docs)
    queries = [(i, _render(rand_ast())) for i in range(30)]
    for q in queries:
        parse_query(q[1])  # every rendered query must be legal syntax
    want = _rows(boolean_search_bruteforce(docs, queries))
    for max_df in (None, 50):
        got = _rows(
            boolean_search(docs, postings, stats, queries, max_df=max_df)
        )
        assert got == want, f"max_df={max_df}"


# ------------------------------------------------------------ explain


def test_explain_search_routes(spark, corpus, index):
    """explain_search reports the route each query actually takes — the
    routing comes from the same _compile_batch the executor runs, and the
    documented rules hold: pure negation and all-short atoms scan,
    contradictions are empty, everything else indexes."""
    _postings, stats = index
    exp = {r["query_id"]: r.asDict() for r in explain_search(stats, QUERIES).collect()}
    assert exp[0]["path"] == "index"
    assert exp[4]["path"] == "scan"  # pure negation: no positive trigram
    assert exp[8]["path"] == "scan"  # all atoms < 3 chars
    assert exp[9]["path"] == "empty"  # return AND NOT return
    # OR of two quoted atoms expands to two conjuncts; so does
    # (return OR ident) -def after distribution
    assert exp[3]["n_conjuncts"] == 2
    assert exp[5]["n_conjuncts"] == 2
    # scan/empty rows carry no index-path numbers
    assert exp[4]["n_conjuncts"] is None and exp[4]["est_candidates"] is None
    assert exp[9]["est_candidates"] == 0


def test_explain_est_candidates_upper_bounds_matches(spark, corpus, index):
    """est_candidates (Σ per-conjunct rarest-trigram df) upper-bounds the
    verified match count for every index-path query: each conjunct's
    intersection ⊆ its rarest posting list, and verify only removes."""
    postings, stats = index
    exp = {r["query_id"]: r.asDict() for r in explain_search(stats, QUERIES).collect()}
    counts = {
        r["query_id"]: r["n"]
        for r in boolean_search(corpus, postings, stats, QUERIES)
        .groupBy("query_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for qid, r in exp.items():
        if r["path"] == "index":
            assert counts.get(qid, 0) <= r["est_candidates"], (qid, r)
        if r["path"] == "empty":
            assert counts.get(qid, 0) == 0


def test_explain_absent_trigram_bounds_conjunct_at_zero(spark, corpus, index):
    """A conjunct whose rarest required trigram is absent from the index
    is bounded at 0 candidates — an OR with one impossible side estimates
    only the possible side."""
    _postings, stats = index
    only = explain_search(stats, [(0, "absent_zzz_needle")]).collect()[0]
    assert only["path"] == "index" and only["est_candidates"] == 0
    both = explain_search(stats, [(0, "return OR absent_zzz_needle")]).collect()[0]
    ret = explain_search(stats, [(0, "return")]).collect()[0]
    assert both["est_candidates"] == ret["est_candidates"]


def test_explain_hot_drop_reroutes_to_scan(spark, corpus, index):
    """max_df=0 makes every trigram hot → a single-atom query loses all
    its trigrams and routes to the scan path, exactly as boolean_search
    would execute it."""
    _postings, stats = index
    exp = explain_search(stats, [(0, "return")], max_df=0).collect()[0]
    assert exp["path"] == "scan"


def test_explain_max_trigrams_cap_reported(spark, corpus, index):
    """n_trigrams honours the per-conjunct rarest-first cap: a long atom
    with many trigrams reports exactly max_trigrams when capped, and the
    estimate is unchanged by the cap (min df is the first trigram kept)."""
    _postings, stats = index
    q = [(0, '"return ident loc"')]
    full = explain_search(stats, q, max_trigrams=64).collect()[0]
    capped = explain_search(stats, q, max_trigrams=3).collect()[0]
    assert full["n_trigrams"] > 3 and capped["n_trigrams"] == 3
    assert full["est_candidates"] == capped["est_candidates"]


def test_boolean_topk_ranked_priority(spark, ranked_corpus):
    """The optional priority signal: reorders quality ties only (it sits
    below symbol/path/occurrence in the ladder), missing docs rank as 0,
    and the output grows a trailing priority column.  Twin = the python
    oracle with the priority key spliced into the same sort position."""
    rows, docs = ranked_corpus
    postings, stats = build_trigram_index(docs)
    queries = [(0, "return"), (1, "handler_1")]
    # even docs get a signal that INVERTS the doc_id tie-break; odd docs
    # are absent (→ 0)
    prio_rows = [(i, (100 - i) * 10) for i in range(0, 50, 2)]
    prio = spark.createDataFrame(prio_rows, "doc_id long, rank long")
    pmap = dict(prio_rows)

    import re as _re

    from searchenginesimple_spark.operators.boolquery import _positive_leaves

    def twin(k):
        out = []
        for qid, qs in queries:
            ast = parse_query(qs)
            leaves = sorted(_positive_leaves(ast))
            scored = []
            for doc_id, path, content in rows:
                syms = _py_symbols(content)
                if not _py_eval(ast, content, syms):
                    continue
                occ, pm, sm = 0, 0, 0
                for kind, v in leaves:
                    if kind == "atom":
                        occ += content.count(v)
                        pm |= int(v in path)
                        sm |= int(any(v in s for s in syms))
                    elif kind == "regex":
                        occ += len(_re.findall(v, content))
                        pm |= int(_re.search(v, path) is not None)
                        sm |= int(any(_re.search(v, s) for s in syms))
                    else:
                        sm |= int(any(v in s for s in syms))
                pr = pmap.get(doc_id, 0)
                scored.append((sm, pm, occ, pr, doc_id))
            scored.sort(key=lambda t: (-t[0], -t[1], -t[2], -t[3], t[4]))
            for rank, (sm, pm, occ, pr, doc_id) in enumerate(scored[:k], 1):
                out.append((qid, qs, rank, doc_id, sm, pm, occ, pr))
        return sorted(out)

    for k in (5, 100):
        got = sorted(
            map(
                tuple,
                boolean_search_topk_ranked(
                    docs, postings, stats, queries, k=k, priority=prio
                ).collect(),
            )
        )
        assert got == twin(k)
    # the signal actually bit: within the all-match query the top doc is
    # the highest-priority one among the best quality tier, not doc 0
    base = {
        r["doc_id"]: r["rank"]
        for r in boolean_search_topk_ranked(
            docs, postings, stats, [(0, "return")], k=100
        ).collect()
    }
    with_p = {
        r["doc_id"]: r["rank"]
        for r in boolean_search_topk_ranked(
            docs, postings, stats, [(0, "return")], k=100, priority=prio
        ).collect()
    }
    assert base != with_p  # priority reordered at least one tie


def test_boolean_topk_ranked_pagerank_composition(spark, ranked_corpus):
    """End-to-end composition: pagerank_int over a planted doc-id import
    graph feeds the priority signal — the graph family's output is
    directly consumable by the search ranking (the zoekt repo-priority
    shape).  The heavily-imported hub outranks its quality ties."""
    from searchenginesimple_spark.operators.graph import pagerank_int

    rows, docs = ranked_corpus
    postings, stats = build_trigram_index(docs)
    # every doc "imports" doc 42 → doc 42 is the rank hub
    edges = spark.createDataFrame(
        [(i, 42) for i in range(50) if i != 42], "src long, dst long"
    )
    pr = pagerank_int(edges, iterations=3).select(
        F.col("node").alias("doc_id"), "rank"
    )
    out = boolean_search_topk_ranked(
        docs, postings, stats, [(0, "return")], k=100, priority=pr
    ).collect()
    by_doc = {r["doc_id"]: r for r in out}
    hub = by_doc[42]
    # among docs with the same quality tuple, the hub ranks first
    peers = [
        r
        for r in out
        if (r["symbol_match"], r["path_match"], r["n_occurrences"])
        == (hub["symbol_match"], hub["path_match"], hub["n_occurrences"])
    ]
    assert min(peers, key=lambda r: r["rank"])["doc_id"] == 42
    assert hub["priority"] > 0


# ------------------------------------------------------------ case: atom


def test_case_modifier_parses():
    from searchenginesimple_spark.operators.boolquery import parse_query_with_flags

    assert parse_query_with_flags("case:no Return") == (("atom", "Return"), True)
    assert parse_query_with_flags("Return case:yes") == (("atom", "Return"), False)
    assert parse_query_with_flags("case:auto Return") == (("atom", "Return"), None)
    # position-independent, last one wins
    assert parse_query_with_flags("case:no a case:yes")[1] is False
    # a modifier is not a predicate: stripped from the AST entirely
    assert parse_query_with_flags("a case:no b")[0] == (
        "and",
        [("atom", "a"), ("atom", "b")],
    )
    # quoting makes the literal reachable as content
    assert parse_query_with_flags('"case:no"') == (("atom", "case:no"), None)
    # bad value / modifier-only queries are syntax errors
    with pytest.raises(ValueError):
        parse_query_with_flags("case:maybe a")
    with pytest.raises(ValueError):
        parse_query_with_flags("case:no")


@pytest.fixture(scope="module")
def case_corpus(spark):
    rows = [
        (0, "a.py", "def Alpha_Handler(x):\n    return x"),
        (1, "b.py", "def alpha_handler(x):\n    return x"),
        # uppercase DEF: a definition site ONLY after case folding
        (2, "c.py", "DEF Alpha_Handler(X):\n    return X"),
        (3, "d.py", "nothing relevant here"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, path string, content string"
    ).cache()
    docs.count()
    return docs


def test_case_modifier_over_folded_index(spark, case_corpus):
    """Over a ci index: case:yes stays on the INDEX path (folded needle
    trigrams over-approximate exact-case matches; verify settles case) and
    both modes equal the bruteforce twin."""
    postings, stats = build_trigram_index(case_corpus, case_insensitive=True)
    queries = [
        (0, "case:yes Alpha_Handler"),
        (1, "case:no Alpha_Handler"),
        (2, "alpha_handler"),  # batch default (ci) applies
    ]
    got = boolean_search(
        case_corpus, postings, stats, queries, case_insensitive=True
    )
    want = boolean_search_bruteforce(case_corpus, queries, case_insensitive=True)
    assert _rows(got) == _rows(want)
    by_qid = {}
    for r in got.collect():
        by_qid.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_qid[0] == {0, 2}       # exact case: the literal spellings only
    assert by_qid[1] == {0, 1, 2}    # folded: all spellings
    assert by_qid[2] == {0, 1, 2}
    # and the routing report says all three stayed on the index
    exp = {
        r["query_id"]: r["path"]
        for r in explain_search(stats, queries, case_insensitive=True).collect()
    }
    assert exp == {0: "index", 1: "index", 2: "index"}


def test_case_modifier_over_unfolded_index(spark, case_corpus):
    """Over a cs index: case:no cannot trust exact trigram keys — the
    query routes to the scan path (explain says so) and still returns
    case-blind scan-exact results."""
    postings, stats = build_trigram_index(case_corpus, case_insensitive=False)
    queries = [(0, "case:no alpha_handler"), (1, "alpha_handler")]
    got = boolean_search(case_corpus, postings, stats, queries)
    want = boolean_search_bruteforce(case_corpus, queries)
    assert _rows(got) == _rows(want)
    by_qid = {}
    for r in got.collect():
        by_qid.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_qid[0] == {0, 1, 2}  # case-blind despite the cs index
    assert by_qid[1] == {1}        # default exact-case
    exp = {
        r["query_id"]: r["path"] for r in explain_search(stats, queries).collect()
    }
    assert exp == {0: "scan", 1: "index"}


def test_case_modifier_lines_and_ranked(spark, case_corpus):
    """Per-query case modes thread through the results surfaces: line
    highlights fold per query, and the sym: extraction runs fold-then-
    extract for ci queries and raw for exact-case queries."""
    postings, stats = build_trigram_index(case_corpus, case_insensitive=True)
    queries = [(0, "case:yes Alpha_Handler"), (1, "case:no alpha_handler")]
    lines = boolean_search_lines(
        case_corpus, postings, stats, queries, case_insensitive=True
    ).collect()
    got = {(r["query_id"], r["doc_id"], r["line_no"]) for r in lines}
    # exact-case: the literal spellings; folded: every spelling's line
    assert got == {(0, 0, 1), (0, 2, 1), (1, 0, 1), (1, 1, 1), (1, 2, 1)}

    ranked = boolean_search_topk_ranked(
        case_corpus, postings, stats, queries, k=10, case_insensitive=True
    ).collect()
    by = {(r["query_id"], r["doc_id"]): r for r in ranked}
    # doc 0 DEFINES Alpha_Handler (raw and folded); doc 2's uppercase
    # "DEF Alpha_Handler" is a definition site ONLY under fold-then-extract
    # — the exact-case query must NOT see it as a symbol hit, the ci query
    # must
    assert by[(0, 0)]["symbol_match"] == 1
    assert by[(0, 2)]["symbol_match"] == 0
    assert by[(1, 0)]["symbol_match"] == 1
    assert by[(1, 1)]["symbol_match"] == 1
    assert by[(1, 2)]["symbol_match"] == 1
    assert by[(0, 0)]["n_occurrences"] == 1


def test_surfaces_accept_precomputed_hits(spark, ranked_corpus):
    """The results-page reuse hook: facets and the boost-ladder top-k fed
    a precomputed boolean_search match set (hits=) must equal their
    compute-internally output exactly — one match pass can serve every
    surface of a page without changing a single row."""
    from searchenginesimple_spark.operators.boolquery import (
        boolean_search,
        boolean_search_facets,
        boolean_search_topk_ranked,
    )

    rows, docs = ranked_corpus
    docs2 = docs.withColumn("repo", F.concat(F.lit("r"), F.col("doc_id") % 3)).withColumn(
        "lang", F.lit("py")
    )
    postings, stats = build_trigram_index(docs2)
    queries = [
        (0, "handler_1"),
        (1, "re:handler_[12] return"),
        (2, "return -handler_1"),
    ]
    hits = (
        boolean_search(docs2, postings, stats, queries)
        .select("query_id", "query", "doc_id")
        .persist()
    )
    try:
        hits.count()
        got_r = sorted(map(tuple, boolean_search_topk_ranked(
            docs2, postings, stats, queries, k=7, hits=hits).collect()))
        want_r = sorted(map(tuple, boolean_search_topk_ranked(
            docs2, postings, stats, queries, k=7).collect()))
        assert got_r == want_r and got_r
        got_f = sorted(map(tuple, boolean_search_facets(
            docs2, postings, stats, queries, hits=hits).collect()))
        want_f = sorted(map(tuple, boolean_search_facets(
            docs2, postings, stats, queries).collect()))
        assert got_f == want_f and got_f
    finally:
        hits.unpersist()
