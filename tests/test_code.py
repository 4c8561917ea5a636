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
