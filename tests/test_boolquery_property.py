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
# regex patterns: literal-ish chars plus '.', '|' — always valid in both
# Python re and Java; rendered in the quoted re:"..." form
_RE_PATS = st.text(alphabet="abcx0_.| ()", min_size=1, max_size=6).filter(
    lambda p: _valid_re(p)
)
_SYM_VALS = st.text(alphabet="abcx_0", min_size=1, max_size=5)


def _valid_re(p: str) -> bool:
    import re as _re

    try:
        _re.compile(p)
        return True
    except _re.error:
        return False


def _atom():
    content = st.builds(lambda s: ("atom", s), _WORDS)
    field = st.builds(
        lambda f, v: ("field", f, v),
        st.sampled_from(sorted(FIELDS)),
        _FIELD_VALS,
    )
    regex = st.builds(lambda p: ("regex", p), _RE_PATS)
    sym = st.builds(lambda v: ("sym", v), _SYM_VALS)
    return st.one_of(content, field, regex, sym)


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
    if kind == "regex":
        return 're:"' + node[1].replace("\\", "\\\\").replace('"', '\\"') + '"'
    if kind == "sym":
        return "sym:" + node[1]
    if kind == "not":
        return "-(" + _render(node[1]) + ")"
    sep = " " if kind == "and" else " OR "
    return sep.join("(" + _render(c) + ")" for c in node[1])


def _symbols(content: str) -> list[str]:
    import re as _re

    from searchenginesimple_spark.functions.code import SYMBOL_PATTERNS

    out: list[str] = []
    for p in SYMBOL_PATTERNS.values():
        out.extend(m.group(1) for m in _re.finditer(p, content))
    return out


def _eval_ast(node, doc: dict) -> bool:
    import re as _re

    kind = node[0]
    if kind == "atom":
        return node[1] in doc["content"]
    if kind == "regex":
        return _re.search(node[1], doc["content"]) is not None
    if kind == "sym":
        return any(node[1] in s for s in _symbols(doc["content"]))
    if kind == "field":
        col, v = FIELDS[node[1]], node[2]
        if col == "lang":
            return v.lower() == doc["lang"].lower()
        return v in doc[col]
    if kind == "not":
        return not _eval_ast(node[1], doc)
    vals = [_eval_ast(c, doc) for c in node[1]]
    return all(vals) if kind == "and" else any(vals)


def _eval_atom(a, doc: dict) -> bool:
    import re as _re

    if isinstance(a, str):
        return a in doc["content"]
    f, v = a
    if f == "re":
        return _re.search(v, doc["content"]) is not None
    if f == "sym":
        return any(v in s for s in _symbols(doc["content"]))
    col = FIELDS[f]
    if col == "lang":
        return v.lower() == doc["lang"].lower()
    return v in doc[col]


def _eval_dnf(conjuncts, doc: dict) -> bool:
    return any(
        all(_eval_atom(a, doc) for a in pos)
        and not any(_eval_atom(a, doc) for a in neg)
        for pos, neg in conjuncts
    )


_DOC = st.fixed_dictionaries(
    {
        # optional planted definition suffix so sym atoms can be True
        "content": st.builds(
            lambda t, d: t + d,
            st.text(alphabet="abcxz_0 (\"-:\n", max_size=40),
            st.sampled_from(["", "\ndef abcx(x):", "\nclass ab_c0:", "\nfunction ba("]),
        ),
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
