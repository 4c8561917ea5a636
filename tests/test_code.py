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


# ---------------------------------------------------------------- curation


MIT_TEXT = "MIT License\n\nPermission is hereby granted, free of charge, to any person"
APACHE_TEXT = "Licensed under the Apache License, Version 2.0 (the \"License\");"
GPL_TEXT = "under the terms of the GNU General Public License as published"
LGPL_TEXT = "under the terms of the GNU Lesser General Public License"
BSD_TEXT = "Redistribution and use in source and binary forms, with or without"


def test_detect_license(spark):
    from searchenginesimple_spark.functions.code import detect_license

    rows = [
        (0, f"# {MIT_TEXT}\ndef f(): pass"),
        (1, f"/* {APACHE_TEXT} */\nint main() {{}}"),
        (2, f"// {GPL_TEXT}\n"),
        (3, f"// {LGPL_TEXT}\n"),          # LGPL must NOT report plain gpl
        (4, f"/* {BSD_TEXT} */"),
        (5, "This is free and unencumbered software released into the public domain."),
        (6, "def plain(): return 1"),       # no header → unknown
        (7, f"# {APACHE_TEXT}\n# {MIT_TEXT}"),  # dual: first in priority wins
        (8, "x" * 3000 + MIT_TEXT),        # beyond head_chars → unknown
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    got = {r["doc_id"]: r["license"] for r in detect_license(df).collect()}
    assert got == {
        0: "mit", 1: "apache-2.0", 2: "gpl", 3: "lgpl", 4: "bsd",
        5: "unlicense", 6: "unknown", 7: "apache-2.0", 8: "unknown",
    }


def test_flag_autogenerated(spark):
    from searchenginesimple_spark.functions.code import flag_autogenerated

    rows = [
        (0, "src/app/main.py", "def f(): pass"),
        (1, "vendor/lib/x.py", "def f(): pass"),
        (2, "web/node_modules/a/b.js", "var x"),
        (3, "assets/app.min.js", "var x"),
        (4, "src/gen/pb.go", "// Code generated by protoc-gen-go. DO NOT EDIT.\npackage pb"),
        (5, "src/big.js", "short\n" + "y" * 1500 + "\nend"),
        (6, "src/ok/vendorish.py", "x = 1"),  # 'vendorish' dir must NOT flag
    ]
    df = spark.createDataFrame(rows, "doc_id long, path string, content string")
    got = {
        r["doc_id"]: (r["is_vendored"], r["is_generated"], r["is_minified"])
        for r in flag_autogenerated(df).collect()
    }
    assert got == {
        0: (False, False, False),
        1: (True, False, False),
        2: (True, False, False),
        3: (True, False, False),
        4: (False, True, False),
        5: (False, False, True),
        6: (False, False, False),
    }
    # path-less tables: vendored is constant-false, others still computed
    df2 = spark.createDataFrame(
        [(0, "// DO NOT EDIT\nx")], "doc_id long, content string"
    )
    r = flag_autogenerated(df2, path_col=None).collect()[0]
    assert (r["is_vendored"], r["is_generated"]) == (False, True)


def test_curation_flags_are_mapside(spark):
    """Both curation projections must stay shuffle-free (pre-filters for
    plans/curate.py run over the full 100-TB corpus)."""
    from searchenginesimple_spark.functions.code import (
        detect_license,
        flag_autogenerated,
    )

    df = spark.createDataFrame(
        [(0, "p", "c")], "doc_id long, path string, content string"
    )
    for out in (detect_license(df), flag_autogenerated(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
