"""Symbol-definition extraction (functions/code.py)."""

from __future__ import annotations

from searchenginesimple_spark.functions.code import extract_symbols

SRC = """\
def parse_response(buf):
    return buf

class HttpServer:
    pass

    def handle(self):  # indented method — still a definition site
        pass

function renderPage() { }
void init_index() { }
int main() { }
// def commented_out(
x = "def not_a_definition(either):"
deflate = 1  # 'def' prefix of another identifier must not match
"""


def test_extract_symbols_kinds_and_anchoring(spark):
    df = spark.createDataFrame([(1, SRC)], "doc_id long, content string")
    rows = {(r["kind"], r["symbol"]) for r in extract_symbols(df).collect()}
    assert rows == {
        ("def", "parse_response"),
        ("def", "handle"),
        ("class", "HttpServer"),
        ("function", "renderPage"),
        ("cfunc", "init_index"),
        ("cfunc", "main"),
    }


def test_extract_symbols_is_mapside(spark):
    """Scale pin: the whole extraction is one projection + generate — no
    shuffle (Exchange) in the plan."""
    df = spark.createDataFrame([(1, SRC)], "doc_id long, content string")
    plan = extract_symbols(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


IMPORT_SRC = """\
import os
import java.util.List
from collections.abc import Mapping
#include <stdio.h>
#include "local/header.h"
const x = require('lodash/fp')
let y = require("@scope/pkg-name")
# import commented  -- leading '#' is not whitespace: must not match
y = "import not_an_import"
reimport os  # 'import' inside another identifier must not match
"""


def test_extract_imports_kinds_and_anchoring(spark):
    from searchenginesimple_spark.functions.code import extract_imports

    df = spark.createDataFrame([(1, IMPORT_SRC)], "doc_id long, content string")
    rows = {(r["kind"], r["module"]) for r in extract_imports(df).collect()}
    assert rows == {
        ("import", "os"),
        ("import", "java.util.List"),
        ("from_import", "collections.abc"),
        ("include", "stdio.h"),
        ("include", "local/header.h"),
        ("require", "lodash/fp"),
        ("require", "@scope/pkg-name"),
    }


def test_extract_imports_is_mapside(spark):
    from searchenginesimple_spark.functions.code import extract_imports

    df = spark.createDataFrame([(1, IMPORT_SRC)], "doc_id long, content string")
    plan = extract_imports(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


XREF_DOCS = [
    (1, "def parse_response(buf):\n    return buf\n"),        # defines parse_response
    (2, "x = parse_response(y)\nz = parse_response(x)\n"),     # uses it twice
    (3, "parse_response\n"),                                   # uses it once
    (4, "def other_thing():\n    pass\n"),                     # unrelated def
    (5, "def parse_response(alt):\n    return alt\n"),         # SECOND definition site
]


def test_symbol_references_basic(spark):
    from searchenginesimple_spark.functions.code import symbol_references

    df = spark.createDataFrame(XREF_DOCS, "doc_id long, content string")
    rows = {
        (r.symbol, r.def_doc_id, r.use_doc_id): r.n_uses
        for r in symbol_references(df).collect()
    }
    # both definition sites cross-reference both use docs; tf counted per use doc
    assert rows[("parse_response", 1, 2)] == 2
    assert rows[("parse_response", 1, 3)] == 1
    assert rows[("parse_response", 5, 2)] == 2
    assert rows[("parse_response", 5, 3)] == 1
    # a defining doc referencing the symbol IN ANOTHER def site is a use
    assert ("parse_response", 1, 5) in rows and ("parse_response", 5, 1) in rows
    # self-references excluded; unused symbol produces no rows
    assert not any(d == u for (_, d, u) in rows)
    assert not any(s == "other_thing" for (s, _, _) in rows)


def test_symbol_references_fanout_cap(spark):
    from searchenginesimple_spark.functions.code import symbol_references

    docs = [(0, "def hot_name():\n    pass\n")] + [
        (i, ("hot_name " * i).strip()) for i in range(1, 21)
    ]
    df = spark.createDataFrame(docs, "doc_id long, content string")
    got = symbol_references(df, max_uses_per_symbol=5).collect()
    assert len(got) == 5
    # top-k by n_uses desc: the heaviest users survive
    assert sorted(r.use_doc_id for r in got) == [16, 17, 18, 19, 20]
