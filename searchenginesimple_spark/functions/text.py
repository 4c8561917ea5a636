"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side column expressions (whole-stage codegen, no Python) unless noted.
Each has an exact ANSI-SQL mirror in ``__spark_entry__.oracle_sql`` — the
specs are deliberately deterministic so engine and oracle agree bit-for-bit.

These extend the reference's capability surface (SURVEY.md §2.7) with the ops
a 100 TB corpus pipeline needs: quality scoring, language ID, token counting,
document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from searchenginesimple_spark.functions.tokenize import tokenize_expr

# Tiny marker lexicons for the n-gram/stopword language heuristic.  The spec
# is the deterministic scoring rule, not lexicon quality: score(lang) =
# #tokens in marker set; argmax, ties broken by language code ascending,
# zero-evidence docs → 'und'.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is", "to", "in"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "es": ["el", "la", "de", "que", "y", "es"],
    "fr": ["le", "la", "les", "de", "et", "est"],
}

STOPWORDS = ["the", "a", "of", "and", "is", "to", "in", "for", "on"]


def quality_features(text_col: Column, toks: Column | None = None) -> dict[str, Column]:
    """Deterministic quality-score features over a text column.

    n_chars, n_tokens, avg_token_len, stopword_ratio, alpha_ratio — the
    length/punct/stopword family used for corpus filtering.

    ``toks``: optional pre-tokenized array column.  The tokenizer regex is
    the features' dominant cost; a caller combining several feature
    families (plans/curate.py's quality stage) stages ``tokenize_expr``
    into ONE projection column and passes it here so the regex runs once
    per row instead of once per feature family (HOF-bearing projections
    fall out of whole-stage codegen, so Catalyst's subexpression
    elimination does not merge the repeated calls).  Same spec either way.
    """
    if toks is None:
        toks = tokenize_expr(text_col)
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_alpha = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", ""))
    tok_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return {
        "n_chars": F.length(text_col).cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_token_len": F.round(
            F.when(n_tokens > 0, tok_chars.cast("double") / n_tokens).otherwise(F.lit(0.0)),
            6,
        ),
        "stopword_ratio": F.round(
            F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0)), 6
        ),
        "alpha_ratio": F.round(
            F.when(F.length(text_col) > 0, n_alpha.cast("double") / F.length(text_col)).otherwise(
                F.lit(0.0)
            ),
            6,
        ),
    }


def lang_id(text_col: Column) -> Column:
    """Marker-token language heuristic → lang code ('und' if no evidence)."""
    toks = tokenize_expr(text_col)
    scores = []
    for lang in sorted(LANG_MARKERS):
        arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append((lang, score))
    # argmax with tie-break on lang code ascending: fold left, strict >
    best_lang, best_score = F.lit("und"), F.lit(0)
    for lang, score in scores:
        take = score > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, score).otherwise(best_score)
    return best_lang


FP_MOD = 2_147_483_647  # 2^31 − 1
FP_BASE = 31


def fingerprint_expr(text_col: Column) -> Column:
    """Polynomial rolling hash over the token sequence (order-sensitive).

    h = fold(tokens, 0, (acc, t) → (acc·31 + tokhash(t)) mod (2³¹−1)) with
    tokhash(t) = 17·len(t) + ascii(t[0]) — chosen to be expressible
    identically in ANSI SQL (the production variant would swap tokhash for
    xxhash64; the fold shape is the operator).
    """
    toks = tokenize_expr(text_col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * FP_BASE + F.length(t) * 17 + F.ascii(F.substring(t, 1, 1)))
        % F.lit(FP_MOD),
    )


POLY_MOD = 2147483647  # 2^31 − 1


def polyhash31_expr(s: Column, mult: int = 31, init: int = 0) -> Column:
    """31-bit polynomial character hash, pure JVM fold — chosen because the
    identical fold runs in ANSI SQL (DuckDB ``list_reduce`` over codepoints),
    making every operator built on it oracle-verifiable.

        h = fold(chars(s), init, (acc, c) → (acc·mult + codepoint(c)) mod (2³¹−1))
    """
    chars = F.filter(F.split(s, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(init).cast("long"),
        lambda acc, c: (acc * F.lit(mult) + F.ascii(c)) % F.lit(POLY_MOD),
    )


def polyhash62_expr(s: Column) -> Column:
    """62-bit string hash: two independent 31-bit polynomial halves
    (mult 31/init 7 ‖ mult 37/init 11) packed as h₁·2³¹ + h₂ < 2⁶².

    The SQL-expressible stand-in for the engine-internal 64-bit FNV-1a
    (functions/simhash.py) wherever a fingerprint must be reproduced by the
    DuckDB oracle bit-for-bit.
    """
    return polyhash31_expr(s, 31, 7) * F.lit(1 << 31) + polyhash31_expr(s, 37, 11)


# BPE-ish pre-tokenizer classes (GPT-2-style, simplified to be expressible
# identically in Spark's Java regex and DuckDB's RE2): letter runs, digit
# runs, and non-space-non-alnum punctuation runs.
BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def token_counts(text_col: Column) -> dict[str, Column]:
    """Whitespace + BPE-ish token counting (training-data op).

    n_ws: whitespace-delimited word count; n_bpe: count of BPE-ish
    pre-tokenizer pieces (letter / digit / punct runs) — the unit a subword
    tokenizer would split further; both pure JVM regexp expressions.
    """
    ws = F.filter(F.split(text_col, r"\s+"), lambda t: F.length(t) > 0)
    bpe = F.regexp_extract_all(text_col, F.lit(BPE_RE), 0)
    return {
        "n_ws": F.size(ws).cast("long"),
        "n_bpe": F.size(bpe).cast("long"),
    }


def extract_p_text(html_col: Column) -> Column:
    """HTML ``<p>`` body extraction (reference ``Page.hpp:166-187``):
    pull every ``<p …>…</p>`` body, strip residual tags and ``&nbsp;``,
    join with single spaces.  Pure JVM regexp expressions (codegen'd);
    RE2-compatible pattern so the DuckDB oracle runs it verbatim.

    INTENTIONAL deviations from the reference's byte behavior (which matches
    only bare ``<p>``, deletes ``&nbsp`` without a space, and concatenates
    bodies with no separator): attributes on ``<p>`` are accepted, ``&nbsp;``
    becomes a space, and bodies join with a space — real-world-HTML fixes in
    the spirit of SURVEY.md §2.1's "semantics, not byte-transcription" rule.
    The DuckDB oracle mirrors THIS spec, as it does for every other
    documented divergence.
    """
    bodies = F.regexp_extract_all(html_col, F.lit(r"(?s)<p[^>]*>(.*?)</p>"), 1)
    cleaned = F.transform(
        bodies,
        lambda b: F.regexp_replace(F.regexp_replace(b, "<[^>]*>", ""), "&nbsp;?", " "),
    )
    return F.concat_ws(" ", cleaned)


def repetition_features(text_col: Column, toks: Column | None = None) -> dict[str, Column]:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1 family), adapted
    to token streams: distinct-token ratio, most-frequent-token fraction, and
    most-frequent-bigram fraction.  High top-fractions flag boilerplate /
    keyword-stuffed / degenerate docs for corpus filtering.

    Pure JVM array lambdas — per-doc O(n log n) with no shuffle, the right
    trade for bounded-length docs (an explode+groupBy would shuffle the
    full token stream to compute a per-doc scalar).  Exact DuckDB mirror
    via list_transform/list_filter (oracle_sql).

    ``toks``: optional pre-tokenized array column (see quality_features).
    """
    if toks is None:
        toks = tokenize_expr(text_col)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))

    def _top_frac(arr: Column, m: Column) -> Column:
        # Max occurrence count == max run length of the SORTED array — the
        # r6 rewrite of the former transform(distinct, u -> size(filter(
        # arr, t == u))) nest, which was O(distinct·n) INTERPRETED lambda
        # evals per doc (HOFs never enter whole-stage codegen) and measured
        # as ~76 s of the ~94 s curate quality stage at 50k docs (guide
        # §1.2: fix the per-task work once the shape is right).  This form
        # is O(n) lambda evals: native-sort, zip the sorted array with its
        # shifted self into an equal-to-predecessor mask, then one
        # aggregate() fold tracks (current run, best run).  Lambdas touch
        # ONLY their own arguments — element_at(<derived array>, i) inside
        # a lambda would re-evaluate the sort per element (the tf_mapside
        # trap).  Output is bit-identical (same integer max, same
        # rounding), so the FROZEN oracle SQL's transform/filter mirror
        # still matches hash-for-hash.
        srt = F.array_sort(arr)
        same = F.zip_with(
            F.slice(srt, 1, F.greatest(m - 1, F.lit(0))),
            F.slice(srt, 2, F.greatest(m - 1, F.lit(0))),
            lambda a, b: (a == b).cast("int"),
        )
        top = F.aggregate(
            same,
            F.struct(F.lit(1).alias("cur"), F.lit(1).alias("best")),
            lambda acc, x: F.struct(
                F.when(x == 1, acc["cur"] + 1).otherwise(F.lit(1)).alias("cur"),
                F.greatest(
                    acc["best"],
                    F.when(x == 1, acc["cur"] + 1).otherwise(F.lit(1)),
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        )
        return F.round(
            F.when(m > 0, top.cast("double") / m).otherwise(F.lit(0.0)), 6
        )

    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return {
        "n_tokens": n.cast("long"),
        "distinct_ratio": F.round(
            F.when(n > 0, n_distinct.cast("double") / n).otherwise(F.lit(0.0)), 6
        ),
        "top_token_frac": _top_frac(toks, n),
        "top_bigram_frac": _top_frac(bigrams, F.size(bigrams)),
    }


# PII patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookarounds.  Scrub order: emails first (an email
# can contain digit runs an IP pattern could partially claim), then IPv4.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_features(text_col: Column) -> dict[str, Column]:
    """PII redaction (training-data op): count + scrub emails and IPv4s.

    Detection is regex-recall-oriented (e.g. 999.0.0.1 matches — standard for
    corpus scrubbing, where over-redaction is the safe side).  Pure JVM
    regexp expressions; Spark's regexp_replace is global, mirrored with
    DuckDB's 'g' flag.
    """
    n_emails = F.size(F.regexp_extract_all(text_col, F.lit(PII_EMAIL_RE), 0))
    scrubbed_mail = F.regexp_replace(text_col, PII_EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(scrubbed_mail, F.lit(PII_IPV4_RE), 0))
    return {
        "n_emails": n_emails.cast("long"),
        "n_ips": n_ips.cast("long"),
        "scrubbed": F.regexp_replace(scrubbed_mail, PII_IPV4_RE, "<IP>"),
    }


def query_snippet(
    text_col: str, query_col: str, width: int = 80, token_re: str | None = None
) -> Column:
    """Query-centred result snippet: a ``width``-char window of the document
    around the EARLIEST occurrence of any query token (the highlight window a
    search frontend shows under each hit; the reference returns whole
    ``content``, ``WebPageQuery.hpp:119-138`` — this is the summarization its
    gateway would do).

    Spec (deterministic, SQL-mirrorable): pos = min over query tokens of
    their first 1-based position in lower(text), 0-misses dropped; window
    starts at max(1, pos − width/2).  Pure JVM (SQL lambda expressions —
    ``locate`` accepts column args in SQL form, unlike the Python wrapper).
    """
    import re as _re

    from searchenginesimple_spark.config import TOKEN_RE as _DEFAULT_RE

    re_ = token_re or _DEFAULT_RE
    # the expression is assembled as SQL text: escape the regex literal and
    # backtick-quote the identifiers so a quote in token_re (or a column
    # name needing quoting) cannot break or inject into the parsed SQL
    re_lit = re_.replace("\\", "\\\\").replace("'", "\\'")
    for ident in (text_col, query_col):
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", ident):
            raise ValueError(f"query_snippet: invalid column name {ident!r}")
    text_q, query_q = f"`{text_col}`", f"`{query_col}`"
    half = width // 2
    return F.expr(
        f"""substr({text_q},
               greatest(1,
                 coalesce(
                   array_min(filter(
                     transform(regexp_extract_all(lower({query_q}), '{re_lit}', 0),
                               t -> locate(t, lower({text_q}))),
                     p -> p > 0)),
                   1) - {half}),
               {width})"""
    )


def shingles(text_col: Column, n: int = 5) -> Column:
    """Distinct token n-gram shingles as array<string> (for Jaccard/MinHash).

    JVM-side: transform over token index range + array_distinct.
    """
    toks = tokenize_expr(text_col)
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - 1, F.lit(-1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.when(k > 0, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))
