"""Property-based soundness of the boolean query compiler (hypothesis).

Two invariants, both pure Python (no Spark session):

1. **Round-trip**: any AST rendered to query syntax parses back to the
   same AST — pins the tokenizer/parser (quoting, escapes, precedence,
   field prefixes) against the grammar itself.
2. **DNF ≡ AST**: the DNF the index executes evaluates identically to the
   original boolean on arbitrary documents — the index-side rewrite
   (De Morgan, distribution, contradiction dropping) never changes
   semantics.  This is the compiler half of the operator's "output ≡
   brute-force scan" contract; the Spark half lives in test_boolquery.py.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from searchenginesimple_spark.operators.boolquery import (
    FIELDS,
    _Unsupported,
    parse_query,
    to_dnf,
)

_WORDS = st.text(alphabet="abcxz_0( )\"-:", min_size=1, max_size=6)
_FIELD_VALS = st.text(alphabet="abcxz0.", min_size=1, max_size=4)


def _atom():
    content = st.builds(lambda s: ("atom", s), _WORDS)
    field = st.builds(
        lambda f, v: ("field", f, v),
        st.sampled_from(sorted(FIELDS)),
        _FIELD_VALS,
    )
    return st.one_of(content, field)


def _ast():
    return st.recursive(
        _atom(),
        lambda children: st.one_of(
            st.builds(lambda c: ("not", c), children),
            st.builds(lambda cs: ("and", cs), st.lists(children, min_size=2, max_size=3)),
            st.builds(lambda cs: ("or", cs), st.lists(children, min_size=2, max_size=3)),
        ),
        max_leaves=8,
    )


_PLAIN = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_.")


def _render(node) -> str:
    kind = node[0]
    if kind == "atom":
        s = node[1]
        needs_quote = (
            not s
            or any(c not in _PLAIN for c in s)
            or s in {"AND", "OR", "NOT"}
            or (":" in s and s.partition(":")[0] in FIELDS)
        )
        # '.' and ':' are plain INSIDE a bareword but ':' with a field
        # prefix must be quoted; cheapest safe rule: quote anything
        # outside [A-Za-z0-9_.]
        if ":" in s:
            needs_quote = True
        if needs_quote:
            return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
        return s
    if kind == "field":
        return f"{node[1]}:{node[2]}"
    if kind == "not":
        return "-(" + _render(node[1]) + ")"
    sep = " " if kind == "and" else " OR "
    return sep.join("(" + _render(c) + ")" for c in node[1])


def _eval_ast(node, doc: dict) -> bool:
    kind = node[0]
    if kind == "atom":
        return node[1] in doc["content"]
    if kind == "field":
        f, v = node[1], node[2]
        if f == "lang":
            return v.lower() == doc["lang"].lower()
        return v in doc[f]
    if kind == "not":
        return not _eval_ast(node[1], doc)
    vals = [_eval_ast(c, doc) for c in node[1]]
    return all(vals) if kind == "and" else any(vals)


def _eval_atom(a, doc: dict) -> bool:
    if isinstance(a, str):
        return a in doc["content"]
    f, v = a
    if f == "lang":
        return v.lower() == doc["lang"].lower()
    return v in doc[f]


def _eval_dnf(conjuncts, doc: dict) -> bool:
    return any(
        all(_eval_atom(a, doc) for a in pos)
        and not any(_eval_atom(a, doc) for a in neg)
        for pos, neg in conjuncts
    )


_DOC = st.fixed_dictionaries(
    {
        "content": st.text(alphabet="abcxz_0 (\"-:\n", max_size=40),
        "path": st.text(alphabet="abcxz0./", max_size=12),
        "repo": st.text(alphabet="abcxz0", max_size=8),
        "lang": st.sampled_from(["py", "js", "cc", "go"]),
    }
)


@settings(max_examples=300, deadline=None)
@given(_ast())
def test_render_parse_round_trip(ast):
    assert parse_query(_render(ast)) == ast


@settings(max_examples=300, deadline=None)
@given(_ast(), st.lists(_DOC, min_size=1, max_size=5))
def test_dnf_semantics_equal_ast(ast, docs):
    try:
        conjuncts = to_dnf(ast)
    except _Unsupported:  # capped queries take the scan path, never the DNF
        return
    for doc in docs:
        assert _eval_dnf(conjuncts, doc) == _eval_ast(ast, doc)
