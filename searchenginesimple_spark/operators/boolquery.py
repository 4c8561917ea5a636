"""Boolean query search over the trigram index (zoekt's query language core).

Public design: zoekt (github.com/sourcegraph/zoekt) composes substring atoms
with AND / OR / NOT before touching its trigram shards; Cox 2012 describes
the same algebra for the regex→trigram compiler (trigram_regex.py implements
that sibling).  This module gives the SEARCH side of that algebra directly:

    query := term ('OR' term)*
    term  := factor+                        # juxtaposition = AND (zoekt)
    factor:= '-' factor | 'NOT' factor | '(' query ')' | atom
    atom  := bareword | '"' quoted with \\" and \\\\ escapes '"'

Uppercase ``AND`` / ``OR`` / ``NOT`` are keywords; lowercase ``or`` etc.
stay atoms (they are code tokens).  A leading ``-`` negates the factor.

Field-scoped atoms (zoekt's ``file:`` / ``lang:`` / ``repo:`` filters): a
BARE word of the form ``path:x`` / ``repo:x`` / ``lang:x`` filters on the
metadata column instead of content — ``path:``/``repo:`` by substring,
``lang:`` by case-folded equality.  Quoting suppresses the prefix
(``"lang:py"`` searches content for that literal), so code atoms with
colons (``std::vector``) are unaffected.  Field atoms contribute no
trigrams but never poison indexability — a conjunct is indexable as long
as its CONTENT atoms carry a usable trigram; a conjunct with only field
atoms takes the scan path, where the metadata predicate is exactly the
kind Catalyst pushes into the parquet docs scan (partition/row-group
pruning on repo/lang layouts).

Regex atoms (zoekt regex queries inside the algebra): ``re:pattern`` (or
``re:"pat"`` — required when the pattern contains spaces, quotes, or
parentheses, which are query syntax) matches content by ``regexp_like``.  A POSITIVE
regex atom inside the supported subset (trigram_regex.py's Java≡RE2-safe
grammar) contributes per-branch required trigrams — the conjunct is
expanded one-per-branch for INDEX purposes only (verify always runs the
original boolean).  Outside the subset (or negated) the atom contributes
no trigrams but stays exact through the verify; if sibling atoms carry a
trigram the query STILL takes the index path — only a conjunct with no
usable trigram at all routes the query to the scan.  Under
``case_insensitive`` the verify runs patterns against the FOLDED content:
write lowercase patterns (branch trigrams are folded to match the folded
index, which can only widen candidates, never lose them).

Symbol atoms (zoekt's ``sym:`` filter): ``sym:name`` matches documents
that DEFINE a symbol whose name contains ``name`` — the definition-site
extraction is functions/code.py's ctags-style ``SYMBOL_PATTERNS``
(`extract_symbols`), evaluated in-row as one flatten-of-regexp_extract_all
expression, so verify/scan stay pure-JVM map-side.  A defined symbol's
name appears LITERALLY in the content, so a positive ``sym:`` atom
contributes the name's trigrams to its conjunct exactly like a content
atom (the index prunes to docs that even contain the spelling; verify
then demands a definition site) — zoekt evaluates ``sym:`` the same way:
trigram candidates first, symbol-boundary check after.  Quoting suppresses
the prefix; negated ``sym:`` atoms are verify-side like all negations.

Case modifiers (zoekt's ``case:``): ``case:yes`` / ``case:no`` /
``case:auto`` is a query-wide MODE, not a predicate — position-independent,
last one wins, stripped before parsing (``parse_query_with_flags`` returns
it; a query that is only modifiers is a syntax error).  It overrides the
batch-level ``case_insensitive`` default per query.  Routing stays sound
in every combination: trigram needles always fold to match the INDEX's key
folding, so over a folded index an exact-case query still prunes correctly
(folded-needle trigrams over-approximate exact-case occurrences; the exact
verify settles case); the one unsound pairing — a case-insensitive query
over an UNFOLDED index — routes to the scan path, never wrong results.

Execution (index path): the query is converted to DNF — a union of
conjuncts, each ``(positive atoms, negative atoms)``.  A document matches a
conjunct iff it contains every positive atom and no negative atom, so the
conjunct's required-trigram set is the UNION of its positive atoms' trigrams
(a short atom like ``id`` contributes none, but the conjunct stays indexable
through its other atoms); negative atoms never touch the index — negation
only ever *widens* a candidate set, so it is checked in the verify stage,
on candidate-sized data.  Candidates per conjunct are the usual
rarest-first count==n intersection (the trigram_search kernel shape),
unioned across conjuncts, then verified with the FULL boolean expression
over content — the index only prunes, so output ≡ brute-force scan (the
oracle) for every query and every knob setting, exactly like
``trigram_search`` / ``trigram_regex_search``.

Scan fallback (never wrong results, the regex module's rule): a query whose
DNF explodes past ``MAX_CONJUNCTS``, or that has a conjunct with no usable
positive trigram (pure negation, all atoms < 3 chars, or everything
hot-dropped by ``max_df``) evaluates its boolean directly over the doc
store — ALL scan-routed queries of a batch share ONE map-only pass (each
row evaluates every scan query into an array of matched query_ids, one
explode), so fallback cost is a single corpus scan per batch, never one
per query.

Scale story: one postings pass serves the whole batch (driver-side compiled
atoms → trigram-universe IN-filter pushed into the parquet scan, row-group
pruning), one hash-agg for the intersections, verify on candidates only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from searchenginesimple_spark.functions.code import SYMBOL_PATTERNS
from searchenginesimple_spark.operators.trigram_regex import compile_branches

MAX_CONJUNCTS = 64

_KEYWORDS = {"AND", "OR", "NOT"}

# field name → docs column (zoekt: file:/lang:/repo: plus its short forms
# f:/r:/l:).  path/file match by substring, repo by substring, lang by
# case-folded equality (language names are case-blind).  Quoting suppresses
# the prefix, so code atoms that happen to look like `l:x` are reachable
# as `"l:x"` — the same trade zoekt makes.
FIELDS = {
    "path": "path",
    "file": "path",
    "f": "path",
    "repo": "repo",
    "r": "repo",
    "lang": "lang",
    "l": "lang",
}


class _Unsupported(Exception):
    """DNF explosion — the query routes to the scan path, never errors."""


# ---------------------------------------------------------------- parsing


def _scan_quoted(q: str, i: int) -> tuple[str, int]:
    """Scan a double-quoted literal starting at q[i] == '\"' → (text, next)."""
    buf: list[str] = []
    j = i + 1
    n = len(q)
    while j < n and q[j] != '"':
        if q[j] == "\\" and j + 1 < n and q[j + 1] in '"\\':
            buf.append(q[j + 1])
            j += 2
        else:
            buf.append(q[j])
            j += 1
    if j >= n:
        raise ValueError(f"unterminated quote in query: {q!r}")
    if not buf:
        raise ValueError(f"empty quoted atom in query: {q!r}")
    return "".join(buf), j + 1


def _tokenize(q: str) -> list[tuple[str, str]]:
    """→ [(kind, text)] with kinds: atom, kw, '(', ')', '-'."""
    toks: list[tuple[str, str]] = []
    i, n = 0, len(q)
    while i < n:
        ch = q[i]
        if ch in " \t\r\n":
            i += 1
            continue
        if ch in "()":
            toks.append((ch, ch))
            i += 1
            continue
        if ch == '"':
            s, i = _scan_quoted(q, i)
            toks.append(("atom", s))
            continue
        # bareword: runs to whitespace / paren / quote; a LEADING '-' is
        # the negation operator, an interior '-' belongs to the word
        # (kebab-case identifiers are atoms)
        if ch == "-":
            # negation may precede a bareword, a '(' group, or a quoted
            # atom; only whitespace / ')' / end-of-query is dangling
            toks.append(("-", "-"))
            i += 1
            if i >= n or q[i] in " \t\r\n)":
                raise ValueError(f"dangling '-' in query: {q!r}")
            continue
        j = i
        while j < n and q[j] not in ' \t\r\n()"':
            j += 1
        word = q[i:j]
        if word in _KEYWORDS:
            toks.append(("kw", word))
        elif word == "re:" and j < n and q[j] == '"':
            pat, j = _scan_quoted(q, j)
            toks.append(("regex", pat))
        elif word == "re:" and j < n and q[j] == "(":
            # '(' ends a bareword (it is query syntax), so an unquoted
            # parenthesized pattern would silently misparse — demand quotes
            raise ValueError(
                f'parenthesized regex must use the quoted form re:"..." in query: {q!r}'
            )
        elif word.startswith("re:") and len(word) > 3:
            toks.append(("regex", word[3:]))
        elif word == "sym:" and j < n and q[j] == '"':
            name, j = _scan_quoted(q, j)
            toks.append(("sym", name))
        elif word.startswith("sym:") and len(word) > 4:
            toks.append(("sym", word[4:]))
        elif word.startswith("case:") and len(word) > 5:
            v = word[5:]
            if v not in ("yes", "no", "auto"):
                raise ValueError(
                    f"case: takes yes/no/auto, got {v!r} in query: {q!r}"
                )
            toks.append(("case", v))
        elif word[-1:] == ":" and word[:-1] in FIELDS and j < n and q[j] == '"':
            # quoted field value: path:"my dir" (zoekt accepts the same
            # form) — without this branch the quote ends the bareword and
            # the prefix silently degrades to a content atom
            v, j = _scan_quoted(q, j)
            toks.append(("field", (word[:-1], v)))
        elif ":" in word and word.partition(":")[0] in FIELDS and word.partition(":")[2]:
            f, _, v = word.partition(":")
            toks.append(("field", (f, v)))
        else:
            toks.append(("atom", word))
        i = j
    return toks


def parse_query(q: str):
    """→ AST of nested tuples: ('atom', s) | ('not', node) |
    ('and', [nodes]) | ('or', [nodes]).  Raises ValueError on bad syntax
    (user input error — unlike DNF explosion, which is a capacity limit
    and routes to the scan path).  ``case:`` modifiers are stripped (they
    select a matching MODE, not a predicate) — callers that honour them
    use ``parse_query_with_flags``."""
    return parse_query_with_flags(q)[0]


def parse_query_with_flags(q: str):
    """→ (ast, ci_override): the parsed query plus its ``case:`` modifier
    resolved to a per-query case-insensitivity override — ``True`` for
    ``case:no`` (fold), ``False`` for ``case:yes`` (exact), ``None`` for
    ``case:auto`` or no modifier (use the batch default).  ``case:`` is a
    query-wide MODE like zoekt's: position-independent, last one wins,
    never a boolean predicate (a query that is ONLY modifiers is a syntax
    error; quoting makes the literal reachable as content)."""
    toks = _tokenize(q)
    ci_override: bool | None = None
    for kind, v in toks:
        if kind == "case":
            ci_override = {"yes": False, "no": True, "auto": None}[v]
    toks = [t for t in toks if t[0] != "case"]
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def expr():
        nonlocal pos
        nodes = [term()]
        while peek() == ("kw", "OR"):
            pos += 1
            nodes.append(term())
        return nodes[0] if len(nodes) == 1 else ("or", nodes)

    def term():
        nonlocal pos
        nodes = [factor()]
        while True:
            t = peek()
            if t is None or t == ("kw", "OR") or t == (")", ")"):
                break
            if t == ("kw", "AND"):
                pos += 1
                t = peek()
                if t is None or t == ("kw", "OR") or t == (")", ")"):
                    raise ValueError(f"dangling AND in query: {q!r}")
            nodes.append(factor())
        return nodes[0] if len(nodes) == 1 else ("and", nodes)

    def factor():
        nonlocal pos
        t = peek()
        if t is None:
            raise ValueError(f"expected a term in query: {q!r}")
        if t == ("-", "-") or t == ("kw", "NOT"):
            pos += 1
            return ("not", factor())
        if t == ("(", "("):
            pos += 1
            node = expr()
            if peek() != (")", ")"):
                raise ValueError(f"unbalanced '(' in query: {q!r}")
            pos += 1
            return node
        if t[0] == "atom":
            pos += 1
            return ("atom", t[1])
        if t[0] == "field":
            pos += 1
            return ("field", t[1][0], t[1][1])
        if t[0] == "regex":
            pos += 1
            return ("regex", t[1])
        if t[0] == "sym":
            pos += 1
            return ("sym", t[1])
        raise ValueError(f"unexpected {t[1]!r} in query: {q!r}")

    node = expr()
    if pos != len(toks):
        raise ValueError(f"unexpected {toks[pos][1]!r} in query: {q!r}")
    return node, ci_override


# ------------------------------------------------------------------- DNF


def to_dnf(node) -> list[tuple[frozenset[str], frozenset[str]]]:
    """→ [(positive atoms, negative atoms)] — the union of conjuncts.
    Contradictory conjuncts (an atom both required and forbidden) are
    dropped (always false).  Raises _Unsupported past MAX_CONJUNCTS."""
    kind = node[0]
    if kind == "atom":
        return [(frozenset([node[1]]), frozenset())]
    if kind == "field":  # field atoms ride the sets as (field, value) pairs
        return [(frozenset([(node[1], node[2])]), frozenset())]
    if kind == "regex":  # regex atoms as ("re", pattern) pairs
        return [(frozenset([("re", node[1])]), frozenset())]
    if kind == "sym":  # symbol atoms as ("sym", name) pairs
        return [(frozenset([("sym", node[1])]), frozenset())]
    if kind == "not":
        inner = node[1]
        if inner[0] == "atom":
            return [(frozenset(), frozenset([inner[1]]))]
        if inner[0] == "field":
            return [(frozenset(), frozenset([(inner[1], inner[2])]))]
        if inner[0] == "regex":
            return [(frozenset(), frozenset([("re", inner[1])]))]
        if inner[0] == "sym":
            return [(frozenset(), frozenset([("sym", inner[1])]))]
        if inner[0] == "not":
            return to_dnf(inner[1])
        children = [("not", c) for c in inner[1]]
        flipped = "or" if inner[0] == "and" else "and"  # De Morgan
        return to_dnf((flipped, children))
    if kind == "or":
        out: list[tuple[frozenset, frozenset]] = []
        for c in node[1]:
            out.extend(to_dnf(c))
            if len(out) > MAX_CONJUNCTS:
                raise _Unsupported("conjunct explosion")
        return out
    assert kind == "and"
    out = [(frozenset(), frozenset())]
    for c in node[1]:
        cd = to_dnf(c)
        out = [(p1 | p2, n1 | n2) for p1, n1 in out for p2, n2 in cd]
        if len(out) > MAX_CONJUNCTS:
            raise _Unsupported("conjunct explosion")
    return [(p, n) for p, n in out if not (p & n)]


def _ast_column(node, content: Column, case_insensitive: bool) -> Column:
    """The exact-verify expression: the query's boolean over content."""
    kind = node[0]
    if kind == "atom":
        atom = node[1].lower() if case_insensitive else node[1]
        return F.instr(content, F.lit(atom)) > 0
    if kind == "field":
        f, v = node[1], node[2]
        col = F.col(FIELDS[f])
        if FIELDS[f] == "lang":
            return F.lower(col) == v.lower()
        if case_insensitive:
            return F.instr(F.lower(col), F.lit(v.lower())) > 0
        return F.instr(col, F.lit(v)) > 0
    if kind == "regex":  # under ci the content arg is already folded
        return F.regexp_like(content, F.lit(node[1]))
    if kind == "sym":
        # definition-site names extracted in-row (functions/code.py's
        # ctags patterns), matched by substring — under ci the content arg
        # is folded, so names come out folded and the value folds to match
        v = node[1].lower() if case_insensitive else node[1]
        names = F.flatten(
            F.array(
                *[
                    F.regexp_extract_all(content, F.lit(p), F.lit(1))
                    for p in SYMBOL_PATTERNS.values()
                ]
            )
        )
        return F.exists(names, lambda s: F.instr(s, F.lit(v)) > 0)
    if kind == "not":
        return ~_ast_column(node[1], content, case_insensitive)
    op = Column.__and__ if kind == "and" else Column.__or__
    cols = [_ast_column(c, content, case_insensitive) for c in node[1]]
    out = cols[0]
    for c in cols[1:]:
        out = op(out, c)
    return out


def _trigrams(s: str) -> set[str]:
    # one rule, one place: the shared driver-side twin of content_trigrams
    from searchenginesimple_spark.operators.trigram import py_trigrams

    return py_trigrams(s)


def _fields_used(node) -> set[str]:
    if node[0] == "field":
        return {node[1]}
    if node[0] in ("atom", "regex", "sym"):
        return set()
    if node[0] == "not":
        return _fields_used(node[1])
    return set().union(*(_fields_used(c) for c in node[1]))


# ---------------------------------------------------------------- search


def _compile_batch(
    asts: dict,
    queries: list[tuple[int, str]],
    hot: set[str],
    index_folded: bool,
    ci_map: dict[int, bool],
) -> tuple[list[tuple[int, int, str]], list[int], list[int]]:
    """Driver-side routing: every query of the batch compiles to required-
    trigram rows (index path), a scan route, or nothing (contradiction).
    → (req_rows [(query_id, conjunct, trigram)], scan_qids, empty_qids).
    Shared by ``boolean_search`` (which executes the routes) and
    ``explain_search`` (which reports them) so the explanation can never
    drift from the execution.

    Case routing: trigram NEEDLES always fold to match the index's key
    folding (``index_folded``) — over a folded index an exact-case
    (``case:yes``) query still prunes soundly, because the folded needle's
    trigrams appear in folded content wherever the exact needle appears
    (a superset; verify settles case).  The one unsound combination —
    a case-insensitive query over an UNFOLDED index (exact trigram keys
    cannot see differently-cased occurrences) — routes to the scan path,
    never wrong results."""
    req_rows: list[tuple[int, int, str]] = []
    scan_qids: list[int] = []
    empty_qids: list[int] = []
    for qid, _ in queries:
        if ci_map[qid] and not index_folded:
            scan_qids.append(qid)
            continue
        try:
            conjuncts = to_dnf(asts[qid])
        except _Unsupported:
            scan_qids.append(qid)
            continue
        if not conjuncts:  # contradiction: matches nothing, touch nothing
            empty_qids.append(qid)
            continue
        rows: list[tuple[int, int, str]] = []
        indexable = True
        cix = 0  # expanded-conjunct counter (regex atoms expand per branch)
        for pos_atoms, _neg in conjuncts:
            base: set[str] = set()
            branch_sets: list[set[str]] = [set()]
            for a in pos_atoms:
                if isinstance(a, str):  # content atom: all its trigrams
                    base |= _trigrams(a.lower() if index_folded else a)
                elif a[0] == "sym":  # defined names appear literally in content
                    base |= _trigrams(a[1].lower() if index_folded else a[1])
                elif a[0] == "re":  # regex atom: one trigram set PER branch
                    branches = compile_branches(a[1])
                    if branches:
                        if index_folded:
                            branches = [{t.lower() for t in b} for b in branches]
                        branch_sets = [
                            bs | bt for bs in branch_sets for bt in branches
                        ]
                        if len(branch_sets) > MAX_CONJUNCTS:
                            indexable = False
                            break
                # field atoms / out-of-subset regexes carry no trigrams
            if not indexable:
                break
            for bs in branch_sets:
                tris = (base | bs) - hot
                if not tris:  # a no-trigram expansion poisons the union
                    indexable = False
                    break
                rows.extend((qid, cix, t) for t in sorted(tris))
                cix += 1
            if not indexable or cix > MAX_CONJUNCTS:
                indexable = False
                break
        if indexable:
            req_rows.extend(rows)
        else:
            scan_qids.append(qid)
    return req_rows, scan_qids, empty_qids


def explain_search(
    stats: DataFrame,
    queries: list[tuple[int, str]],
    max_trigrams: int = 8,
    max_df: int | None = None,
    case_insensitive: bool = False,
) -> DataFrame:
    """EXPLAIN for the boolean query batch → (query_id, query, path,
    n_conjuncts, n_trigrams, est_candidates): which route each query takes
    and how selective the index will be, WITHOUT touching the corpus —
    the serving-side answer to Spark's own ``.explain`` discipline, for
    the layer Catalyst cannot see (driver-compiled trigram routing).

    * ``path``: ``index`` (trigram-pruned + verify), ``scan`` (DNF
      explosion / no usable trigram — the shared corpus pass), or
      ``empty`` (contradiction: matches nothing, touches nothing).
    * ``n_conjuncts``: expanded conjunct count on the index path (regex
      atoms expand per branch); null otherwise.
    * ``n_trigrams``: distinct trigrams the batch will push into the
      postings scan for this query, after the per-conjunct rarest-first
      ``max_trigrams`` cap; null off the index path.
    * ``est_candidates``: Σ over conjuncts of the rarest required
      trigram's df — an UPPER BOUND on the candidate set the verify stage
      will see (each conjunct's intersection ⊆ its rarest posting list;
      a required trigram absent from the index bounds its conjunct at 0).
      Tests pin ``n_matches ≤ est_candidates`` for every indexable query.

    Routing is computed by the same ``_compile_batch`` the executor uses,
    so the report cannot drift from what ``boolean_search`` actually does.
    Cost: one stats lookup filtered to the batch's trigram universe (tiny,
    driver-collected) — no postings or docs access."""
    spark = stats.sparkSession
    parsed = {qid: parse_query_with_flags(qs) for qid, qs in queries}
    asts = {qid: p[0] for qid, p in parsed.items()}
    ci_map = {
        qid: (p[1] if p[1] is not None else case_insensitive)
        for qid, p in parsed.items()
    }
    hot = (
        {r["trigram"] for r in stats.filter(F.col("df") > max_df).collect()}
        if max_df is not None
        else set()
    )
    req_rows, scan_qids, empty_qids = _compile_batch(
        asts, queries, hot, case_insensitive, ci_map
    )

    universe = sorted({t for _, _, t in req_rows})
    dfs: dict[str, int] = {}
    if universe:
        dfs = {
            r["trigram"]: r["df"]
            for r in stats.filter(F.col("trigram").isin(universe)).collect()
        }

    by_conj: dict[tuple[int, int], list[str]] = {}
    for qid, cix, t in req_rows:
        by_conj.setdefault((qid, cix), []).append(t)

    rows = []
    for qid, qs in queries:
        if qid in empty_qids:
            rows.append((qid, qs, "empty", 0, None, 0))
            continue
        if qid in scan_qids:
            rows.append((qid, qs, "scan", None, None, None))
            continue
        conjs = [tris for (q, _), tris in sorted(by_conj.items()) if q == qid]
        est = 0
        n_used = set()
        for tris in conjs:
            # rarest-first cap — the same (df asc, trigram asc) order the
            # executor's window applies; min df is the first kept
            ranked = sorted(tris, key=lambda t: (dfs.get(t, 0), t))
            kept = ranked[:max_trigrams]
            n_used.update(kept)
            est += dfs.get(kept[0], 0)
        rows.append((qid, qs, "index", len(conjs), len(n_used), est))
    return spark.createDataFrame(
        rows,
        "query_id long, query string, path string, n_conjuncts int, "
        "n_trigrams int, est_candidates long",
    )


def boolean_search(
    docs: DataFrame,
    postings: DataFrame,
    stats: DataFrame,
    queries: list[tuple[int, str]],
    max_trigrams: int = 8,
    max_df: int | None = None,
    content_col: str = "content",
    case_insensitive: bool = False,
) -> DataFrame:
    """→ (query_id, query, doc_id) for every doc whose content satisfies
    the boolean query.  ``queries``: small (query_id, query-string) list,
    parsed driver-side (query compilation is serving-side work).  Raises
    ValueError on malformed query syntax; every PARSEABLE query returns
    scan-exact results regardless of knobs.  ``case_insensitive`` pairs
    with an index built with the same flag (build_trigram_index) and is
    the per-query DEFAULT — a ``case:yes`` / ``case:no`` modifier in a
    query overrides it for that query (see the module docstring for the
    routing rules; a ``case:no`` query over an unfolded index takes the
    scan path)."""
    spark = docs.sparkSession
    parsed = {qid: parse_query_with_flags(qs) for qid, qs in queries}
    asts = {qid: p[0] for qid, p in parsed.items()}
    # per-query effective case mode: a case: modifier overrides the batch
    # default; case_insensitive doubles as "the index keys are folded"
    ci_map = {
        qid: (p[1] if p[1] is not None else case_insensitive)
        for qid, p in parsed.items()
    }

    hot = (
        {r["trigram"] for r in stats.filter(F.col("df") > max_df).collect()}
        if max_df is not None
        else set()
    )
    req_rows, scan_qids, _empty_qids = _compile_batch(
        asts, queries, hot, case_insensitive, ci_map
    )

    # arrow_local_df: broadcasts of the query batch (and of req below)
    # materialize from one JVM Arrow batch instead of a multi-task Python
    # conversion job per broadcast (sources/io.py, r6)
    from searchenginesimple_spark.sources.io import arrow_local_df

    qdf = arrow_local_df(spark, list(queries), "query_id long, query string")
    raw_content = F.col(content_col)

    def _content(qid: int) -> Column:
        return F.lower(raw_content) if ci_map[qid] else raw_content

    results: list[DataFrame] = []

    if req_rows:
        # atoms are compiled driver-side → push the trigram universe into
        # the postings/stats scans (parquet row-group pruning; the wand.py
        # term-IN discipline)
        universe = sorted({t for _, _, t in req_rows})
        postings = postings.filter(F.col("trigram").isin(universe))
        stats = stats.filter(F.col("trigram").isin(universe))
        req = arrow_local_df(
            spark, req_rows, "query_id long, conjunct int, trigram string"
        )
        req = req.join(stats, "trigram", "left").withColumn(
            "df", F.coalesce("df", F.lit(0).cast("long"))
        )
        w = Window.partitionBy("query_id", "conjunct").orderBy(
            F.asc("df"), F.asc("trigram")
        )
        req = (
            req.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= max_trigrams)
            .select("query_id", "conjunct", "trigram")
        )
        n_req = req.groupBy("query_id", "conjunct").agg(
            F.count("*").cast("int").alias("n_req")
        )
        cand = (
            postings.join(F.broadcast(req), "trigram")
            .groupBy("query_id", "conjunct", "doc_id")
            .agg(F.count("*").cast("int").alias("nhit"))
            .join(F.broadcast(n_req), ["query_id", "conjunct"])
            .filter(F.col("nhit") == F.col("n_req"))
            .select("query_id", "doc_id")
            .distinct()  # union over conjuncts
        )
        # exact verify: the FULL boolean (positives AND negatives) per
        # query, as one chained-when over the small driver-side batch —
        # candidates only, so negation costs candidate-sized work
        verify = F.lit(False)
        for qid, _ in queries:
            if qid in asts and any(r[0] == qid for r in req_rows):
                verify = F.when(
                    F.col("query_id") == qid,
                    _ast_column(asts[qid], _content(qid), ci_map[qid]),
                ).otherwise(verify)
        idx_qids = {r[0] for r in req_rows}
        extra = sorted(
            {FIELDS[f] for q in idx_qids for f in _fields_used(asts[q])}
        )
        indexed = (
            cand.join(docs.select("doc_id", content_col, *extra), "doc_id")
            .filter(verify)
            .join(F.broadcast(qdf), "query_id")
            .select("query_id", "query", "doc_id")
        )
        results.append(indexed)

    if scan_qids:
        # ONE shared map-only pass for the whole scan batch: each doc row
        # evaluates every scan query's boolean into an array of matched
        # query_ids, exploded to rows — s fallback queries must never cost
        # s corpus scans
        matched = F.array_compact(
            F.array(
                *[
                    F.when(
                        _ast_column(asts[qid], _content(qid), ci_map[qid]),
                        F.lit(qid).cast("long"),
                    )
                    for qid in scan_qids
                ]
            )
        )
        results.append(
            docs.select("doc_id", F.explode(matched).alias("query_id"))
            .join(F.broadcast(qdf), "query_id")
            .select("query_id", "query", "doc_id")
        )

    if not results:
        return qdf.limit(0).withColumn("doc_id", F.lit(0).cast("long"))
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def _positive_leaves(node, neg: bool = False, out: set | None = None) -> set:
    """Leaves that occur at positive polarity (under an even number of
    NOTs) — the atoms whose occurrences zoekt highlights.  Field atoms are
    metadata, not line content, so they never produce line matches."""
    if out is None:
        out = set()
    kind = node[0]
    if kind == "atom":
        if not neg:
            out.add(("atom", node[1]))
    elif kind in ("regex", "sym"):
        if not neg:
            out.add((kind, node[1]))
    elif kind == "field":
        pass
    elif kind == "not":
        _positive_leaves(node[1], not neg, out)
    else:
        for c in node[1]:
            _positive_leaves(c, neg, out)
    return out


def _leaf_line_column(leaf, line: Column, case_insensitive: bool) -> Column:
    """Does this LINE contain the leaf?  ``line`` is already folded under
    ci.  A multi-line content atom matches no single line (grep
    semantics, same as trigram_search_lines)."""
    kind, v = leaf
    if kind == "atom":
        if "\n" in v:
            return F.lit(False)
        return F.instr(line, F.lit(v.lower() if case_insensitive else v)) > 0
    if kind == "regex":
        return F.regexp_like(line, F.lit(v))
    names = F.flatten(
        F.array(
            *[
                F.regexp_extract_all(line, F.lit(p), F.lit(1))
                for p in SYMBOL_PATTERNS.values()
            ]
        )
    )
    val = v.lower() if case_insensitive else v
    return F.exists(names, lambda s: F.instr(s, F.lit(val)) > 0)


def boolean_search_lines(
    docs: DataFrame,
    postings: DataFrame,
    stats: DataFrame,
    queries: list[tuple[int, str]],
    max_lines_per_doc: int | None = None,
    content_col: str = "content",
    case_insensitive: bool = False,
    **search_kwargs,
) -> DataFrame:
    """grep-style rows → (query_id, query, doc_id, line_no, line): for
    every doc satisfying the boolean query, the 1-based lines that contain
    at least one POSITIVE leaf of that query (zoekt's LineMatch rule —
    negated atoms and metadata field atoms are match conditions, not
    highlights).  A matching doc whose positive leaves are all multi-line
    atoms (or a query with no positive content/regex/sym leaf at all, e.g.
    pure negation or field-only) yields doc hits in ``boolean_search`` but
    no line rows here — documented grep semantics.

    ``max_lines_per_doc`` caps rows per (query, doc) in line order
    (``grep -m``).  Scale shape (r6): line matching runs IN-ROW over the
    verified hits — one (hit ⋈ content) projection stages each matched
    doc's line array, a single array filter keeps the (line, line_no)
    structs the query's positive leaves highlight, and the cap is a plain
    ``slice`` before the explode.  The former explode-join-window shape
    shuffled and sorted every matched LINE through a per-(query, doc)
    row_number window; the array form needs no exchange beyond the
    candidate join (grep-twin equality pinned in tests).
    """
    parsed = {qid: parse_query_with_flags(qs) for qid, qs in queries}
    asts = {qid: p[0] for qid, p in parsed.items()}
    ci_map = {
        qid: (p[1] if p[1] is not None else case_insensitive)
        for qid, p in parsed.items()
    }
    hits = boolean_search(
        docs,
        postings,
        stats,
        queries,
        content_col=content_col,
        case_insensitive=case_insensitive,
        **search_kwargs,
    ).select("query_id", "query", "doc_id")

    def line_pred(line_col: Column) -> Column:
        pred = F.lit(False)
        for qid, _ in queries:
            leaves = sorted(_positive_leaves(asts[qid]))
            if not leaves:
                continue
            ci_q = ci_map[qid]
            folded = F.lower(line_col) if ci_q else line_col
            q_pred = F.lit(False)
            for leaf in leaves:
                q_pred = q_pred | _leaf_line_column(leaf, folded, ci_q)
            pred = F.when(F.col("query_id") == qid, q_pred).otherwise(pred)
        return pred

    staged = hits.join(docs.select("doc_id", content_col), "doc_id").select(
        "query_id",
        "query",
        "doc_id",
        F.split(F.col(content_col), "\n", -1).alias("__lines"),
    )
    numbered = F.zip_with(
        F.col("__lines"),
        F.sequence(F.lit(1), F.size("__lines")),
        lambda l, i: F.struct(l.alias("line"), i.cast("long").alias("ln")),
    )
    ml = F.filter(numbered, lambda p: line_pred(p["line"]))
    if max_lines_per_doc is not None:
        ml = F.slice(ml, 1, max_lines_per_doc)
    return staged.select(
        "query_id", "query", "doc_id", F.explode(ml).alias("m")
    ).select(
        "query_id",
        "query",
        "doc_id",
        F.col("m.ln").alias("line_no"),
        F.col("m.line").alias("line"),
    )


def boolean_search_topk_ranked(
    docs: DataFrame,
    postings: DataFrame,
    stats: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    content_col: str = "content",
    path_col: str = "path",
    case_insensitive: bool = False,
    priority: DataFrame | None = None,
    priority_col: str = "rank",
    hits: DataFrame | None = None,
    **search_kwargs,
) -> DataFrame:
    """zoekt-ordered boolean results → (query_id, query, rank, doc_id,
    symbol_match, path_match, n_occurrences[, priority]): top-k matching
    docs per boolean query, ordered by symbol-definition match > file-path
    match > occurrence count (ties doc_id asc) — trigram_search_topk_ranked's
    boost ladder lifted to the full query algebra.  Boost signals come
    from the query's POSITIVE leaves (the same highlight set as
    boolean_search_lines; negations and field atoms are match conditions,
    not boosts):

    * ``n_occurrences``: Σ over positive content atoms of their substring
      occurrence counts (replace-arithmetic) + Σ over positive regex
      leaves of ``regexp_count``;
    * ``path_match``: any positive content atom occurs in ``path_col``,
      or any positive regex leaf matches it;
    * ``symbol_match``: any positive leaf hits a symbol DEFINED in the doc
      (atoms and ``sym:`` values by substring over the extracted name,
      regex leaves by ``regexp_like``); extraction runs over the folded
      content under ci, matching the ``sym:`` atom's semantics.

    ``priority``: optional per-document importance signal — a
    (doc_id, ``priority_col``) DataFrame, e.g. ``operators/graph.py``'s
    ``pagerank_int`` over the import graph (``functions/code.py``'s
    ``extract_imports`` resolved to doc_ids) — zoekt's repo-priority
    analogue.  It ranks BELOW the match-quality signals and ABOVE the
    doc_id tie-break ("among equally good matches, prefer the document
    more of the corpus depends on"), so it can only reorder quality ties,
    never outrank a symbol or path hit; matched docs absent from
    ``priority`` rank as 0.  When given, the output carries a trailing
    ``priority`` column.  Scale shape: the signal joins the VERIFIED
    match set (candidate-sized), never the corpus.

    Scale shape: boosts are computed on VERIFIED MATCHES only (the join
    and extract_symbols run over candidate-sized data); the per-query
    top-k is the usual map-side WindowGroupLimit.

    ``hits``: optional precomputed match set — a (query_id, query, doc_id)
    frame from ONE ``boolean_search`` call over the same (docs, queries),
    typically persisted.  A results page renders ranked results AND facet
    counts for the same query batch; without this hook each surface
    re-runs the whole match pipeline (postings joins + exact verify).
    Caller contract: same query set, same knobs — the signals here are
    recomputed from the AST either way, only the match set is reused.
    """
    from searchenginesimple_spark.functions.code import extract_symbols

    parsed = {qid: parse_query_with_flags(qs) for qid, qs in queries}
    asts = {qid: p[0] for qid, p in parsed.items()}
    ci_map = {
        qid: (p[1] if p[1] is not None else case_insensitive)
        for qid, p in parsed.items()
    }
    leaves_by_qid = {qid: sorted(_positive_leaves(asts[qid])) for qid, _ in queries}

    if hits is None:
        hits = boolean_search(
            docs,
            postings,
            stats,
            queries,
            content_col=content_col,
            case_insensitive=case_insensitive,
            **search_kwargs,
        )
    hits = hits.select("query_id", "query", "doc_id")
    matched = hits.join(docs.select("doc_id", content_col, path_col), "doc_id")

    occ_expr = F.lit(0).cast("long")
    path_expr = F.lit(False)
    for qid, _ in queries:
        ci_q = ci_map[qid]
        c = F.lower(F.col(content_col)) if ci_q else F.col(content_col)
        p = F.lower(F.col(path_col)) if ci_q else F.col(path_col)
        q_occ = F.lit(0).cast("long")
        q_path = F.lit(False)
        for kind, v in leaves_by_qid[qid]:
            if kind == "atom":
                a = F.lit(v.lower() if ci_q else v)
                q_occ = q_occ + (
                    (F.length(c) - F.length(F.replace(c, a))) / F.length(a)
                ).cast("long")
                q_path = q_path | (F.instr(p, a) > 0)
            elif kind == "regex":
                q_occ = q_occ + F.regexp_count(c, F.lit(v)).cast("long")
                q_path = q_path | F.regexp_like(p, F.lit(v))
            # sym leaves boost via symbol_match only
        occ_expr = F.when(F.col("query_id") == qid, q_occ).otherwise(occ_expr)
        path_expr = F.when(F.col("query_id") == qid, q_path).otherwise(path_expr)
    base = matched.select(
        "query_id",
        "query",
        "doc_id",
        path_expr.cast("int").alias("path_match"),
        occ_expr.alias("n_occurrences"),
    )

    # symbol definitions per case mode: extraction runs over folded content
    # for ci queries and raw content for exact-case queries (fold-then-
    # extract is the ci semantics of the sym: atom), one candidate-sized
    # pass per mode ACTUALLY PRESENT in the batch
    sym_frames: list[DataFrame] = []
    for mode in (False, True):
        mode_qids = [qid for qid, _ in queries if ci_map[qid] == mode]
        if not mode_qids:
            continue
        mode_hits = hits.filter(F.col("query_id").isin(mode_qids))
        mcontent = (
            F.lower(F.col(content_col)) if mode else F.col(content_col)
        )
        mdocs = (
            mode_hits.select("doc_id")
            .distinct()
            .join(docs.select("doc_id", content_col), "doc_id")
            .select("doc_id", mcontent.alias("__content"))
        )
        defs = extract_symbols(mdocs, "__content").select("doc_id", "symbol")
        symp = F.lit(False)
        for qid in mode_qids:
            q_sym = F.lit(False)
            for kind, v in leaves_by_qid[qid]:
                if kind == "regex":
                    q_sym = q_sym | F.regexp_like(F.col("symbol"), F.lit(v))
                else:
                    vv = F.lit(v.lower() if mode else v)
                    q_sym = q_sym | (F.instr(F.col("symbol"), vv) > 0)
            symp = F.when(F.col("query_id") == qid, q_sym).otherwise(symp)
        sym_frames.append(
            mode_hits.select("query_id", "doc_id")
            .join(defs, "doc_id")
            .filter(symp)
            .select("query_id", "doc_id")
            .distinct()
        )
    if not sym_frames:  # empty batch
        sym_frames = [hits.select("query_id", "doc_id").limit(0)]
    sym = sym_frames[0]
    for f in sym_frames[1:]:
        sym = sym.unionByName(f)
    sym = sym.withColumn("symbol_match", F.lit(1))

    ranked = base.join(sym, ["query_id", "doc_id"], "left").withColumn(
        "symbol_match", F.coalesce("symbol_match", F.lit(0)).cast("int")
    )
    order = [
        F.desc("symbol_match"),
        F.desc("path_match"),
        F.desc("n_occurrences"),
    ]
    extra_cols: list = []
    if priority is not None:
        prio = priority.select(
            "doc_id", F.col(priority_col).cast("long").alias("__prio")
        )
        ranked = ranked.join(prio, "doc_id", "left").withColumn(
            "__prio", F.coalesce("__prio", F.lit(0).cast("long"))
        )
        order.append(F.desc("__prio"))
        extra_cols = [F.col("__prio").alias("priority")]
    w = Window.partitionBy("query_id").orderBy(*order, F.asc("doc_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "query",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            "symbol_match",
            "path_match",
            "n_occurrences",
            *extra_cols,
        )
    )


def boolean_search_facets(
    docs: DataFrame,
    postings: DataFrame,
    stats: DataFrame,
    queries: list[tuple[int, str]],
    by: tuple[str, ...] = ("repo", "lang"),
    content_col: str = "content",
    hits: DataFrame | None = None,
    **search_kwargs,
) -> DataFrame:
    """Result facets → (query_id, query, facet, value, n_docs): per query,
    matching-document counts grouped by each metadata column in ``by`` —
    the sidebar aggregation of every code-search UI (zoekt's RepoStats /
    per-repository match counts, Hound's repo buckets).

    Scale shape: one boolean_search pass (already pruned + verified), one
    candidate-sized join to the metadata columns, then ONE hash-agg per
    facet column (map-side partials; the unpivot to (facet, value) rows is
    a map-side stack over the agg output, so adding facet columns never
    adds passes over content).

    ``hits``: optional precomputed (query_id, query, doc_id) match set —
    same contract as boolean_search_topk_ranked: a results page computes
    matches ONCE and feeds every surface."""
    if hits is None:
        hits = boolean_search(
            docs, postings, stats, queries, content_col=content_col,
            **search_kwargs,
        )
    hits = hits.select("query_id", "query", "doc_id")
    meta = hits.join(docs.select("doc_id", *by), "doc_id")
    out = None
    for col in by:
        f = (
            meta.groupBy("query_id", "query", F.col(col).cast("string").alias("value"))
            .agg(F.count("*").alias("n_docs"))
            .select(
                "query_id",
                "query",
                F.lit(col).alias("facet"),
                "value",
                "n_docs",
            )
        )
        out = f if out is None else out.unionByName(f)
    return out


def boolean_search_bruteforce(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    content_col: str = "content",
    case_insensitive: bool = False,
) -> DataFrame:
    """Scan twin (what the oracle runs): evaluate every query's boolean
    over every doc.  Tests pin index path ≡ this for all knob settings."""
    out = None
    for qid, qs in queries:
        ast, ci_override = parse_query_with_flags(qs)
        ci_q = ci_override if ci_override is not None else case_insensitive
        content = (
            F.lower(F.col(content_col)) if ci_q else F.col(content_col)
        )
        r = docs.filter(
            _ast_column(ast, content, ci_q)
        ).select(
            F.lit(qid).cast("long").alias("query_id"),
            F.lit(qs).alias("query"),
            "doc_id",
        )
        out = r if out is None else out.unionByName(r)
    if out is None:
        return docs.sparkSession.createDataFrame(
            [], "query_id long, query string, doc_id long"
        )
    return out
