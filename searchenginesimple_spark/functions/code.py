"""Source-code symbol extraction (code-payload op, §2-plus).

The north-rule corpus is source code (input_hint: ``(repo, path, commit,
lang, content)``); a code search engine wants definition-site rows — "where
is ``parse_response`` *defined*, not mentioned" — next to the token index.
The reference engine (a prose/CJK searcher) has no equivalent; the public
precedent is ctags-style definition regexes (universal-ctags) and the
symbol atoms of zoekt/livegrep.

One JVM projection per document: ``regexp_extract_all`` per definition
kind, flattened to (doc_id, kind, symbol) rows — codegen'd, no Python, no
shuffle (the explode is map-side).  The patterns are deliberately RE2-safe
(no backrefs/lookarounds) so the DuckDB oracle can run the *identical*
strings, and anchored with ``(?m)^\\s*`` so commented-out definitions
(``// def x(``) don't match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

IDENT = "[A-Za-z_][A-Za-z0-9_]*"

# kind → (pattern with ONE capture group).  Covers the def/class/function
# spellings of the corpus langs (py, js, java/cpp/go-ish C-family heads).
SYMBOL_PATTERNS: dict[str, str] = {
    "def": rf"(?m)^\s*def\s+({IDENT})\s*\(",
    "class": rf"(?m)^\s*class\s+({IDENT})",
    "function": rf"(?m)^\s*function\s+({IDENT})\s*\(",
    "cfunc": rf"(?m)^\s*(?:void|int|long|bool|double|float)\s+({IDENT})\s*\(",
}


# kind → (pattern with ONE capture group) for dependency edges — the other
# half of the ctags duality: what a file PROVIDES (symbols) vs what it
# CONSUMES (imports).  Same RE2-safe discipline; ``import`` covers the
# python/java spelling, ``from_import``/``include``/``require`` the
# py/c-family/js ones.  ``require`` is deliberately NOT line-anchored
# (JS requires are legal mid-expression).
IMPORT_PATTERNS: dict[str, str] = {
    "import": r"(?m)^\s*import\s+([A-Za-z_][A-Za-z0-9_.]*)",
    "from_import": r"(?m)^\s*from\s+([A-Za-z_][A-Za-z0-9_.]*)\s+import",
    "include": r"(?m)^\s*#include\s+[<\"]([A-Za-z0-9_./]+)[>\"]",
    "require": r"require\s*\(\s*['\"]([A-Za-z0-9_./@-]+)['\"]\s*\)",
}


def _extract_by_patterns(
    df: DataFrame, patterns: dict[str, str], content_col: str, out_col: str
) -> DataFrame:
    """Shared shuffle-free projection: per-kind regexp_extract_all →
    flatten → one map-side explode."""
    c = F.col(content_col)

    def kind_structs(kind: str, pattern: str):
        return F.transform(
            F.regexp_extract_all(c, F.lit(pattern), F.lit(1)),
            lambda s: F.struct(F.lit(kind).alias("kind"), s.alias(out_col)),
        )

    all_rows = F.flatten(
        F.array(*[kind_structs(k, p) for k, p in patterns.items()])
    )
    return df.select("doc_id", F.explode(all_rows).alias("s")).select(
        "doc_id", F.col("s.kind").alias("kind"), F.col(f"s.{out_col}").alias(out_col)
    )


def extract_symbols(df: DataFrame, content_col: str = "content") -> DataFrame:
    """→ (doc_id, kind, symbol): one row per definition occurrence, in
    document order within each kind."""
    return _extract_by_patterns(df, SYMBOL_PATTERNS, content_col, "symbol")


def extract_imports(df: DataFrame, content_col: str = "content") -> DataFrame:
    """→ (doc_id, kind, module): one row per import/include/require edge.

    The (doc_id, module) edges are the dependency graph a code-search
    engine aggregates for reverse-dependency ranking ("most-imported
    module"), impact analysis, and vendored-code detection."""
    return _extract_by_patterns(df, IMPORT_PATTERNS, content_col, "module")


def symbol_references(
    docs: DataFrame,
    content_col: str = "content",
    max_uses_per_symbol: int | None = 1000,
) -> DataFrame:
    """Find-usages: → (symbol, def_doc_id, use_doc_id, n_uses) — for every
    defined symbol, the OTHER documents that mention it, ranked by mention
    count.  The canonical code-search cross-reference (zoekt/livegrep's
    symbol search joined with its full-text side).

    Shape at scale: definitions are extracted map-side (extract_symbols)
    and are sparse (a handful per file); usages come from the map-side
    run-length tf kernel (operators/bm25.py::tf_mapside) — so the ONE
    shuffle is the defs⋈tf join on the symbol/term key.  Tokens are
    lowercased by the engine's token spec, so usage matching is
    case-insensitive (documented decision: ``Handler`` and ``handler``
    cross-reference — the token index's semantics, same as search).

    ``max_uses_per_symbol`` caps fan-out IN-OPERATOR (top-k use docs by
    (n_uses desc, use_doc_id asc) per (symbol, def_doc)): a symbol named
    like a stop-word (``get``, ``main``) would otherwise fan every defining
    doc out to the whole corpus — the related_terms lesson
    (operators/cooccur.py), enforced where the skew is created, not
    deferred to callers.
    """
    from searchenginesimple_spark.operators.bm25 import tf_mapside

    defs = (
        extract_symbols(docs, content_col)
        .select(F.col("doc_id").alias("def_doc_id"), F.lower("symbol").alias("term"))
        .distinct()
    )
    tf = tf_mapside(docs, text_col=content_col)
    uses = defs.join(tf, "term").filter(F.col("doc_id") != F.col("def_doc_id"))
    out = uses.select(
        F.col("term").alias("symbol"),
        "def_doc_id",
        F.col("doc_id").alias("use_doc_id"),
        F.col("tf").cast("long").alias("n_uses"),
    )
    if max_uses_per_symbol is not None:
        w = Window.partitionBy("symbol", "def_doc_id").orderBy(
            F.desc("n_uses"), F.asc("use_doc_id")
        )
        out = (
            out.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= max_uses_per_symbol)
            .drop("__rk")
        )
    return out


# ---------------------------------------------------------------- curation


# license kind → detection pattern over the document HEAD, in PRIORITY
# order (first hit wins — a dual-licensed header reports the first listed).
# Patterns are RE2-safe and case-folded by the caller, matching the
# canonical phrases the SPDX license texts actually contain (the same
# phrase-matching shortcut github-linguist/licensee and the BigCode
# pipeline use before full-text scoring).
LICENSE_PATTERNS: tuple[tuple[str, str], ...] = (
    ("apache-2.0", r"licensed under the apache license,? version 2\.0|apache license\s*\n?\s*version 2\.0"),
    ("mit", r"permission is hereby granted, free of charge|mit license"),
    ("lgpl", r"gnu lesser general public license"),
    ("gpl", r"gnu general public license"),
    ("bsd", r"redistribution and use in source and binary forms"),
    ("mpl-2.0", r"mozilla public license,? ?v?\.? ?2\.0"),
    ("unlicense", r"this is free and unencumbered software released into the public domain"),
)

# vendored-path fragments (github-linguist's vendor.yml core set) and
# generated-content markers (linguist generated.rb + the Go convention).
VENDOR_PATH_RE = (
    r"(^|/)(vendor|vendors|node_modules|third[_-]party|thirdparty|external|"
    r"extern|deps|bower_components)/|\.min\.(js|css)$"
)
GENERATED_RE = (
    r"do not edit|@generated|code generated by|auto-?generated|"
    r"automatically generated"
)
# a single source line this long is minified/packed output, not hand-written
MINIFIED_LINE_CHARS = 1000


def detect_license(
    df: DataFrame, content_col: str = "content", head_chars: int = 2048
) -> DataFrame:
    """Add a ``license`` column: the first LICENSE_PATTERNS kind whose
    phrase appears in the case-folded first ``head_chars`` characters,
    else ``'unknown'``.  License headers live at the top of the file, so
    bounding the scan keeps the expression cheap on big files AND avoids
    false hits on license text QUOTED deep inside documentation.

    Pure map-side column expression (chained when over regexp_like) —
    composes as a pre-filter for plans/curate.py:
    ``detect_license(docs).filter(F.col('license').isin(allowed))``."""
    head = F.lower(F.substring(F.col(content_col), 1, head_chars))
    out = F.lit("unknown")
    for kind, pat in reversed(LICENSE_PATTERNS):
        out = F.when(F.regexp_like(head, F.lit(pat)), F.lit(kind)).otherwise(out)
    return df.withColumn("license", out)


def flag_autogenerated(
    df: DataFrame,
    content_col: str = "content",
    path_col: str | None = "path",
    head_chars: int = 2048,
) -> DataFrame:
    """Add ``is_vendored`` / ``is_generated`` / ``is_minified`` flags — the
    three standard "not human-authored first-party code" exclusions of a
    code-LLM corpus (github-linguist's vendored+generated rules; minified =
    any single line ≥ MINIFIED_LINE_CHARS chars).

    ``is_vendored`` needs ``path_col`` (pass None for path-less tables —
    the flag is then always false).  All three are map-side expressions;
    ``is_generated`` scans only the head (markers are header comments)."""
    head = F.lower(F.substring(F.col(content_col), 1, head_chars))
    vend = (
        F.regexp_like(F.lower(F.col(path_col)), F.lit(VENDOR_PATH_RE))
        if path_col is not None
        else F.lit(False)
    )
    minified = F.regexp_like(
        F.col(content_col), F.lit(rf"[^\n]{{{MINIFIED_LINE_CHARS},}}")
    )
    return (
        df.withColumn("is_vendored", vend)
        .withColumn("is_generated", F.regexp_like(head, F.lit(GENERATED_RE)))
        .withColumn("is_minified", minified)
    )
