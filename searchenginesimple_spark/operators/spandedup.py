"""Span-level dedup: cut duplicated PASSAGES out of training documents.

Whole-document dedup (simhash/MinHash, operators/dedup.py) drops one of
two near-identical files; the code-corpus reality is partial duplication —
vendored snippets, license headers, copy-pasted functions — where the
right action is removing the REPEATED SPAN from the later document and
keeping everything else (the "exact substring deduplication" action of
Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better", which cuts duplicated token spans rather than documents; span
discovery here is the winnowing fingerprint pipeline instead of their
suffix array — operators/winnow.py mines the pairs and spans at
corpus scale with the (k, w) locality guarantee).

Keep-first rule: ``clone_spans`` emits per-pair spans with ``a_id < b_id``
(clone_pairs orders every pair); the span survives in the SMALLER doc_id
and is cut from the larger (side "b") — deterministic and
order-independent, the same min-id survivor convention every dedup
operator in this repo uses.

Spark shape — rewrite is a pure map-side projection over array HOFs
(zero Python, zero shuffle beyond the tiny span aggregation):

* spans for each doc collect into one array (span lists are clone-pair
  sized, small); docs without spans skip the rewrite entirely via a
  left join + null check, so the corpus-wide cost is the join, not the
  string work.
* the document interleaves as ``gaps[0] tok_0 gaps[1] tok_1 …
  tok_{n-1} gaps[n]`` where ``toks = regexp_extract_all(content, re)``
  and ``gaps = split(content, re, -1)``; defining ``piece(i) = tok_i +
  gaps[i+1]`` makes removal compositional: cut token ``i`` = drop
  ``piece(i)`` (each removed token takes its FOLLOWING whitespace/
  punctuation with it), so ``new = gaps[0] + Σ_{kept i} piece(i)`` —
  one ``F.aggregate`` fold, overlapping spans need no pre-merge because
  the keep mask is an ``exists`` test per token.  (The fold concatenates
  strings through the accumulator — Catalyst copies it, so worst case is
  O(len²) per REWRITTEN doc; the chunk.py caveat, acceptable because
  only clone-bearing docs pay it.)
* token positions must match the fingerprints', which tokenize
  LOWERCASED text (functions/tokenize.py); rewriting instead applies
  ``(?i)`` + token_re to the ORIGINAL content — the same segmentation
  for any case-folding-stable (e.g. ASCII) token_re — so the surviving
  text keeps its original case exactly.  That equivalence can break on
  exotic case mappings (``İ`` U+0130 lowercases to two codepoints and
  matches ``[a-z]`` only after folding; Java's ``(?i)`` is ASCII-only),
  which would SHIFT every later token index and cut the wrong text — so
  the rewrite is GUARDED: a doc whose ``(?i)`` token count differs from
  its lowercase token count is left byte-identical (0 spans applied)
  rather than mis-cut.  The guard costs one extra regex pass only on
  clone-bearing docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchenginesimple_spark.config import TOKEN_RE


def remove_clone_spans(
    docs: DataFrame,
    spans: DataFrame,
    content_col: str = "content",
    token_re: str = TOKEN_RE,
    min_span_tokens: int = 1,
) -> DataFrame:
    """→ ``docs`` with ``content_col`` rewritten minus duplicated spans,
    plus ``n_spans_applied`` and ``n_tokens_removed`` metric columns
    (0 for untouched docs, whose content is byte-identical to the input).

    ``spans``: ``clone_spans`` output (token-coordinate, inclusive);
    only ``side == "b"`` rows cut (keep-first).  ``min_span_tokens``
    drops shorter spans — Lee et al. cut only spans above a length
    threshold so incidental shared idioms survive.
    """
    if min_span_tokens < 1:
        raise ValueError("min_span_tokens must be >= 1")

    removal = (
        spans.filter(F.col("side") == F.lit("b"))
        .select(
            F.col("b_id").alias("doc_id"),
            F.col("start_tok").alias("s"),
            F.col("end_tok").alias("e"),
        )
        .filter(F.col("e") - F.col("s") + 1 >= min_span_tokens)
        .distinct()
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("s", "e"))).alias("_spans"))
    )

    out = docs.join(removal, "doc_id", "left")
    ci_re = "(?i)" + token_re
    content = F.col(content_col)
    toks = F.regexp_extract_all(content, F.lit(ci_re), F.lit(0))
    gaps = F.split(content, ci_re, -1)

    def covered(i):
        return F.exists(
            F.col("_spans"), lambda sp: (i >= sp["s"]) & (i <= sp["e"])
        )

    idxs = F.sequence(F.lit(0).cast("long"), F.size(toks).cast("long") - 1)
    rebuilt = F.concat(
        F.element_at(gaps, 1),
        F.aggregate(
            idxs,
            F.lit(""),
            lambda acc, i: F.when(covered(i), acc).otherwise(
                F.concat(
                    acc,
                    F.element_at(toks, (i + 1).cast("int")),
                    F.element_at(gaps, (i + 2).cast("int")),
                )
            ),
        ),
    )
    untouched = F.col("_spans").isNull()
    no_toks = F.size(toks) == 0
    # coordinate guard (module docstring): the fingerprint token indices
    # are only valid here if (?i)-on-original segments like lower()
    misaligned = F.size(toks) != F.size(
        F.regexp_extract_all(F.lower(content), F.lit(token_re), F.lit(0))
    )
    skip = untouched | no_toks | misaligned
    new_content = F.when(skip, content).otherwise(rebuilt).alias(content_col)
    n_removed = (
        F.when(skip, F.lit(0).cast("long"))
        .otherwise(F.size(F.filter(idxs, covered)).cast("long"))
        .alias("n_tokens_removed")
    )
    n_spans = (
        F.when(untouched | no_toks | misaligned, F.lit(0))
        .otherwise(F.size("_spans"))
        .cast("int")
        .alias("n_spans_applied")
    )
    keep_cols = [c for c in docs.columns if c != content_col]
    return out.select(*keep_cols, new_content, n_removed, n_spans)


def remove_clone_spans_py(
    doc_rows: list[tuple[int, str]],
    span_rows: list[tuple[int, int, str, int, int]],
    token_re: str = TOKEN_RE,
    min_span_tokens: int = 1,
) -> list[tuple[int, str, int, int]]:
    """Pure-Python twin (the test oracle): identical cut rule over
    (doc_id, content) docs and (a_id, b_id, side, start_tok, end_tok)
    spans → sorted (doc_id, content, n_tokens_removed, n_spans_applied)."""
    import re
    from collections import defaultdict

    by_doc: dict[int, list[tuple[int, int]]] = defaultdict(list)
    seen = set()
    for a_id, b_id, side, s, e in span_rows:
        if side != "b" or e - s + 1 < min_span_tokens:
            continue
        key = (b_id, s, e)
        if key in seen:
            continue
        seen.add(key)
        by_doc[b_id].append((s, e))

    pat = re.compile(token_re, re.IGNORECASE)
    pat_lower = re.compile(token_re)
    out = []
    for doc_id, content in doc_rows:
        spans = by_doc.get(doc_id)
        if spans is None:
            out.append((doc_id, content, 0, 0))
            continue
        toks = pat.findall(content)
        gaps = pat.split(content)
        # coordinate guard — same rule as the Spark expression
        if not toks or len(toks) != len(pat_lower.findall(content.lower())):
            out.append((doc_id, content, 0, 0))
            continue
        keep = [not any(s <= i <= e for s, e in spans) for i in range(len(toks))]
        new = gaps[0] + "".join(
            toks[i] + gaps[i + 1] for i in range(len(toks)) if keep[i]
        )
        out.append((doc_id, new, keep.count(False), len(spans)))
    return sorted(out)
