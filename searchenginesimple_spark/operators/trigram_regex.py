"""Regex search over the trigram index (Cox 2012, the paper's headline).

Public design: R. Cox, "Regular Expression Matching with a Trigram Index"
(swtch.com/~rsc/regexp/regexp4.html) — compile a regex into a boolean query
over trigrams, intersect postings to get a candidate doc set, then run the
real regex engine only over candidates.  This module implements the
restricted-but-sound version: a compiler for a regex subset that expands to
a bounded set of literal *branches* (alternation × optionality), each branch
a sequence of literal segments separated by wildcard gaps; a branch's
required-trigram set is the union of its segments' trigrams, a pattern's
candidates are the UNION over branches of the AND-intersections, and the
final stage verifies with the engine's own regex.  Exactly like
``trigram_search``, the index only prunes — output ≡ brute-force regex scan
(the DuckDB oracle) for every supported pattern, and unsupported patterns
take the scan path rather than guessing.

Supported subset (chosen so Java regex and RE2 agree — no backrefs, no
lookarounds, no flags, no anchors; ``.`` excludes newline in BOTH dialects):

* literal chars and ``\\``-escapes of metacharacters,
* groups ``( … )`` with alternation ``a|b|c`` (nesting ok), top-level
  alternation,
* optionality ``x?`` / ``(…)?`` (expands into with/without branches),
* wildcard gaps ``.``, ``.*``, ``.+`` (segment separators — contribute no
  trigrams, any count),
* simple character classes ``[abc0-9]`` (expanded as alternation; bounded).

Everything else — ``*``/``+``/``{n}`` on a literal, ``\\d``-style classes,
negated classes, anchors — makes ``compile_branches`` return ``None`` and
the pattern runs as a broadcast scan.  Branch expansion is capped
(``MAX_BRANCHES``); a branch with no trigram-bearing segment (all literals
shorter than 3 chars) is unindexable, and since candidates are a UNION over
branches, one unindexable branch sends the whole pattern to the scan path.

Scale story: identical to ``trigram_search`` — the per-branch intersection
is one broadcast join + hash-agg over postings, the union is a distinct on
(pattern_id, doc_id), and the regex engine runs only on the candidate join
with the doc store.  The scan fallback is the documented escape hatch, a
broadcast of a few patterns over a map-only pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_BRANCHES = 64
MAX_CLASS_SIZE = 16

_META = set("\\^$.|?*+()[]{}")

GAP = None  # sentinel inside a branch: wildcard gap between literal segments


class _Unsupported(Exception):
    pass


def _parse_alt(pat: str, i: int, depth: int) -> tuple[list[list], int]:
    """alt := concat ('|' concat)* — returns (branches, next_index); each
    branch is a list of str-literals and GAP sentinels."""
    branches, cur = [], [[]]
    while True:
        if i >= len(pat) or pat[i] == ")":
            if depth == 0 and i < len(pat):
                raise _Unsupported("unbalanced )")
            branches.extend(cur)
            return branches, i
        ch = pat[i]
        if ch == "|":
            branches.extend(cur)
            cur = [[]]
            i += 1
            continue
        piece, i = _parse_item(pat, i, depth)
        # piece: list of alternatives, each a list of literal/GAP atoms
        cur = [b + alt for b in cur for alt in piece]
        if len(cur) > MAX_BRANCHES:
            raise _Unsupported("branch explosion")


def _parse_item(pat: str, i: int, depth: int) -> tuple[list[list], int]:
    """One quantified atom → list of alternative atom-sequences."""
    ch = pat[i]
    if ch == "(":
        sub, j = _parse_alt(pat, i + 1, depth + 1)
        if j >= len(pat) or pat[j] != ")":
            raise _Unsupported("unbalanced (")
        j += 1
        if j < len(pat) and pat[j] == "?":
            return sub + [[]], j + 1
        if j < len(pat) and pat[j] in "*+{":
            raise _Unsupported("group quantifier")
        return sub, j
    if ch == ".":
        j = i + 1
        if j < len(pat) and pat[j] in "*+?":
            # ., .*, .+, .? are all the same to the INDEX: a segment split
            # with no required trigrams (trigrams must never span a
            # variable-width region); the verify regex enforces the width
            j += 1
        return [[GAP]], j
    if ch == "[":
        j = pat.find("]", i + 1)
        if j < 0 or (i + 1 < len(pat) and pat[i + 1] == "^"):
            raise _Unsupported("class")
        chars: list[str] = []
        k = i + 1
        while k < j:
            if k + 2 < j and pat[k + 1] == "-":
                lo, hi = ord(pat[k]), ord(pat[k + 2])
                if hi < lo:
                    raise _Unsupported("bad range")
                chars.extend(chr(c) for c in range(lo, hi + 1))
                k += 3
            else:
                if pat[k] == "\\":
                    raise _Unsupported("escape in class")
                chars.append(pat[k])
                k += 1
            if len(chars) > MAX_CLASS_SIZE:
                raise _Unsupported("class too wide")
        j += 1
        if j < len(pat) and pat[j] in "*+?{":
            raise _Unsupported("class quantifier")
        return [[c] for c in chars], j
    if ch == "\\":
        if i + 1 >= len(pat) or pat[i + 1] not in _META:
            raise _Unsupported("escape class")  # \d, \w, … differ by dialect
        lit, j = pat[i + 1], i + 2
    elif ch in "^$*+?{":
        raise _Unsupported(f"bare {ch}")
    else:
        lit, j = ch, i + 1
    if j < len(pat) and pat[j] == "?":
        return [[lit], []], j + 1
    if j < len(pat) and pat[j] in "*+{":
        raise _Unsupported("literal quantifier")
    return [[lit]], j


def _segments(branch: list) -> list[str]:
    """Collapse a branch's atom list into literal segments split at GAPs."""
    segs, cur = [], []
    for atom in branch:
        if atom is GAP:
            if cur:
                segs.append("".join(cur))
                cur = []
        else:
            cur.append(atom)
    if cur:
        segs.append("".join(cur))
    return segs


def _trigrams(s: str) -> set[str]:
    return {s[i : i + 3] for i in range(len(s) - 2)}


def compile_branches(pattern: str) -> list[set[str]] | None:
    """→ one required-trigram set per branch, or None if the pattern is
    outside the subset / explodes / has an unindexable branch."""
    try:
        branches, i = _parse_alt(pattern, 0, 0)
        if i != len(pattern):
            raise _Unsupported("trailing")
    except _Unsupported:
        return None
    out = []
    for b in branches:
        tris: set[str] = set()
        for seg in _segments(b):
            tris |= _trigrams(seg)
        if not tris:
            return None  # unindexable branch poisons the union
        out.append(tris)
    return out if out else None


def trigram_regex_search(
    docs: DataFrame,
    postings: DataFrame,
    stats: DataFrame,
    patterns: list[tuple[int, str]],
    max_trigrams: int = 8,
    max_df: int | None = None,
    content_col: str = "content",
) -> DataFrame:
    """→ (needle_id, needle, doc_id) for docs whose content matches each
    pattern (partial match, RLIKE semantics).  ``patterns``: small
    (pattern_id, pattern) list, compiled driver-side — query compilation is
    serving-side work, exactly like queries_df construction."""
    spark = docs.sparkSession
    req_rows: list[tuple[int, int, str]] = []          # (pid, branch, trigram)
    scan_pids: list[int] = []
    hot = (
        {r["trigram"] for r in stats.filter(F.col("df") > max_df).collect()}
        if max_df is not None
        else set()
    )
    for pid, pat in patterns:
        branches = compile_branches(pat)
        if branches is None:
            scan_pids.append(pid)
            continue
        usable = [sorted(tris - hot) for tris in branches]
        if any(not u for u in usable):                 # a branch went all-hot
            scan_pids.append(pid)
            continue
        for b, tris in enumerate(usable):
            req_rows.extend((pid, b, t) for t in tris[: max_trigrams * 4])

    pats_df = spark.createDataFrame(patterns, "needle_id long, needle string")
    results = []
    if req_rows:
        # patterns are compiled driver-side, so the trigram universe is
        # already in hand — push it into the postings/stats scans as an
        # IN-filter (Parquet row-group pruning; same discipline as
        # operators/wand.py term-IN pushdown)
        universe = sorted({t for _, _, t in req_rows})
        postings = postings.filter(F.col("trigram").isin(universe))
        stats = stats.filter(F.col("trigram").isin(universe))
        req = spark.createDataFrame(
            req_rows, "needle_id long, branch int, trigram string"
        )
        # rarest-first cap per (pattern, branch), same discipline as
        # trigram_search — df-ranked so hot trigrams add no shuffle volume
        from pyspark.sql import Window

        req = req.join(stats, "trigram", "left").withColumn(
            "df", F.coalesce("df", F.lit(0).cast("long"))
        )
        w = Window.partitionBy("needle_id", "branch").orderBy(
            F.asc("df"), F.asc("trigram")
        )
        req = (
            req.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= max_trigrams)
            .select("needle_id", "branch", "trigram")
        )
        n_req = req.groupBy("needle_id", "branch").agg(
            F.count("*").cast("int").alias("n_req")
        )
        cand = (
            postings.join(F.broadcast(req), "trigram")
            .groupBy("needle_id", "branch", "doc_id")
            .agg(F.count("*").cast("int").alias("nhit"))
            .join(F.broadcast(n_req), ["needle_id", "branch"])
            .filter(F.col("nhit") == F.col("n_req"))
            .select("needle_id", "doc_id")
            .distinct()                                # union over branches
        )
        indexed = cand.join(F.broadcast(pats_df), "needle_id").join(docs, "doc_id")
        results.append(indexed)
    if scan_pids:
        scan_pats = pats_df.filter(F.col("needle_id").isin(scan_pids))
        results.append(docs.join(F.broadcast(scan_pats)))

    out = None
    for r in results:
        r = r.filter(
            F.regexp_like(F.col(content_col), F.col("needle"))
        ).select("needle_id", "needle", "doc_id")
        out = r if out is None else out.unionByName(r)
    if out is None:
        return (
            pats_df.limit(0)
            .withColumn("doc_id", F.lit(0).cast("long"))
            .select("needle_id", "needle", "doc_id")
        )
    return out


def trigram_regex_bruteforce(
    docs: DataFrame, patterns: list[tuple[int, str]], content_col: str = "content"
) -> DataFrame:
    """Scan twin (what the oracle runs): every pattern over every doc."""
    pats_df = docs.sparkSession.createDataFrame(
        patterns, "needle_id long, needle string"
    )
    return (
        docs.join(F.broadcast(pats_df))
        .filter(F.regexp_like(F.col(content_col), F.col("needle")))
        .select("needle_id", "needle", "doc_id")
    )
