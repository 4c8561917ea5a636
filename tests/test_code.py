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
