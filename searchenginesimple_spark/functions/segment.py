"""Dictionary-based CJK segmentation (forward maximum matching).

The reference is a *Chinese* search engine whose tokenizer is cppjieba
MIX-mode dictionary segmentation (``include/Page/Page.hpp:288``,
``include/Dictionary/SplitTool.hpp:7-11``): multi-character Chinese words are
emitted as single tokens.  The engine's default CJK mode
(``config.TOKEN_RE_CJK``) is single-codepoint unigrams — self-consistent but
word-blind.  This module adds the idiomatic Spark equivalent of the
dictionary mode: **forward maximum matching (FMM)** over a broadcast
wordlist, Arrow-batched.

Spec (shared verbatim by the pandas UDF, the pure-Python twin, and the
DuckDB recursive-CTE oracle in ``__spark_entry__.py``):

1. lowercase the text, scan runs matching ``token_re | [一-龥]+``;
2. identifier runs are emitted whole (the code-payload token spec);
3. each CJK run is segmented left→right: at every position take the LONGEST
   dictionary word starting there (lengths ``min(maxlen, remaining) … 2``),
   else emit the single codepoint and advance one — the classic FMM rule,
   deterministic for a fixed dictionary.

Scale: the dictionary rides a Spark broadcast (one copy per executor, not
per task); the UDF is Arrow-batched.  The inner loop is per-text Python —
the same shape as jieba itself — and runs only on corpora that opt into the
dictionary mode; the identifier fast path stays all-JVM.

Measured envelope (r5, BASELINE.md): ≈90k docs/s ≈ 31 M chars/s
steady-state on 16 threads over a 339-char-avg mixed-CJK corpus — ~2.5×
slower than the all-JVM unigram default (≈150-240k docs/s on the same
input).  Routing a 100× corpus through the dictionary mode is therefore a
known, linear cost (~11 h per 10⁹ docs per 16-thread executor), not an
unmeasured cliff.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from searchenginesimple_spark.config import TOKEN_RE

# Deterministic default wordlist for tests/driver entries (a real deployment
# broadcasts a full dictionary file via ``make_fmm_udf(words=...)``).  Chosen
# to exercise every FMM rule: a 4-char word that shadows its 2-char prefixes
# (搜索引擎 vs 搜索/引擎), 3-char vs 2-char prefix competition (数据库/数据,
# 分布式), and plain 2-char words.
DEFAULT_CJK_WORDS: tuple[str, ...] = (
    "搜索引擎", "搜索", "引擎", "简单", "中文",
    "文本", "数据库", "数据", "分布式", "索引",
)

_CJK_LO, _CJK_HI = "一", "龥"


def fmm_segment_py(run: str, words: frozenset[str], maxlen: int) -> list[str]:
    """Segment ONE CJK run by forward maximum matching — the spec twin used
    by the oracle comparison tests."""
    out: list[str] = []
    i, n = 0, len(run)
    while i < n:
        for ln in range(min(maxlen, n - i), 1, -1):
            w = run[i : i + ln]
            if w in words:
                out.append(w)
                i += ln
                break
        else:
            out.append(run[i])
            i += 1
    return out


def fmm_tokenize_py(
    text: str, words=DEFAULT_CJK_WORDS, token_re: str = TOKEN_RE
) -> list[str]:
    """Full tokenizer twin: identifier runs whole + FMM-segmented CJK runs."""
    ws = frozenset(words)
    maxlen = max((len(w) for w in ws), default=1)
    pat = re.compile(f"{token_re}|[{_CJK_LO}-{_CJK_HI}]+")
    out: list[str] = []
    for m in pat.findall((text or "").lower()):
        if m and _CJK_LO <= m[0] <= _CJK_HI:
            out.extend(fmm_segment_py(m, ws, maxlen))
        else:
            out.append(m)
    return out


def make_fmm_udf(words=DEFAULT_CJK_WORDS, token_re: str = TOKEN_RE, broadcast=None):
    """Arrow-batched FMM tokenizer UDF.

    ``broadcast`` (optional): a ``SparkContext.broadcast`` of the word
    sequence — the at-scale shape (a 100k-word dictionary ships once per
    executor).  Without it the (small) ``words`` tuple is closure-captured.
    """
    pat = re.compile(f"{token_re}|[{_CJK_LO}-{_CJK_HI}]+")
    if broadcast is None:
        wordset = frozenset(words)
        maxlen = max((len(w) for w in wordset), default=1)

    @pandas_udf(T.ArrayType(T.StringType()))
    def _fmm(content: pd.Series) -> pd.Series:
        if broadcast is not None:
            ws = frozenset(broadcast.value)
            ml = max((len(w) for w in ws), default=1)
        else:
            ws, ml = wordset, maxlen

        def seg_one(text: str) -> list[str]:
            out: list[str] = []
            for m in pat.findall(text.lower()):
                if m and _CJK_LO <= m[0] <= _CJK_HI:
                    out.extend(fmm_segment_py(m, ws, ml))
                else:
                    out.append(m)
            return out

        return content.fillna("").map(seg_one)

    return _fmm


def fmm_pattern(words=DEFAULT_CJK_WORDS, token_re: str = TOKEN_RE) -> str:
    """The WHOLE FMM tokenizer as one Java regex: ``token_re`` first (the
    identifier fast path — disjoint first-char set from CJK), then the
    dictionary words sorted longest-first, then the single-CJK-codepoint
    fallback.

    Why this IS forward maximum matching: Java regex alternation is
    leftmost-ALTERNATIVE (first listed alternative that matches at the
    current position wins), and ``regexp_extract_all`` resumes scanning
    immediately after each match — so at every position the longest
    dictionary word starting there is taken, else one codepoint, which is
    exactly ``fmm_segment_py``'s loop.  Run boundaries need no special
    handling: dictionary words are pure-CJK (enforced here), so a match can
    never span a non-CJK character, and the unigram fallback keeps the
    scanner from skipping any CJK char mid-run.

    Words shorter than 2 chars or containing non-CJK chars are dropped —
    the Python twin can never use them either (its ``range(.., 1, -1)``
    skips length 1; non-CJK words can't occur inside a CJK run)."""
    usable = sorted(
        {w for w in words if len(w) >= 2 and all(_CJK_LO <= c <= _CJK_HI for c in w)},
        key=lambda w: (-len(w), w),
    )
    alts = "".join(re.escape(w) + "|" for w in usable)
    return f"{token_re}|{alts}[{_CJK_LO}-{_CJK_HI}]"


def fmm_tokens_jvm(
    col: Column, words=DEFAULT_CJK_WORDS, token_re: str = TOKEN_RE
) -> Column:
    """All-JVM FMM twin — no Python in the hot path, bit-identical to the
    Arrow UDF (identity pytest + hypothesis property in tests/test_segment.py).

    Scale note (measured, BASELINE.md): Java regex tries the alternatives
    linearly — O(dict size) per position vs the UDF's O(maxlen) hash probes
    — so the JVM twin wins only for SMALL dictionaries (~2.6× at the 10-word
    default, roughly break-even at ~100 words, 4× SLOWER at 1k, 18× at 5k).
    ``fmm_tokens`` applies that threshold automatically; a jieba-scale
    dictionary stays on the broadcast UDF.  Pattern is built driver-side
    once and ships as a literal."""
    from pyspark.sql import functions as F

    return F.regexp_extract_all(
        F.lower(F.coalesce(col, F.lit(""))), F.lit(fmm_pattern(words, token_re)), 0
    )


# measured break-even between the linear regex alternation and the hash-set
# UDF on this host class (BASELINE.md: jvm/udf docs/s — 10 words: 370k/145k;
# 100: 94k/114k; 1k: 23k/98k; 5k: 5.4k/119k)
FMM_JVM_MAX_WORDS = 100


def fmm_tokens(
    col: Column,
    words=DEFAULT_CJK_WORDS,
    token_re: str = TOKEN_RE,
    spark=None,
) -> Column:
    """Engine-selecting FMM tokenizer: the all-JVM regex twin for
    dictionaries up to ``FMM_JVM_MAX_WORDS`` (where it is faster AND keeps
    the plan Python-free), the Arrow UDF beyond (hash probes beat linear
    alternation there — broadcast via ``spark`` when given, so a 100k-word
    dictionary ships once per executor, not per task).  Both engines are
    bit-identical by test, so the switch is invisible downstream."""
    if len(set(words)) <= FMM_JVM_MAX_WORDS:
        return fmm_tokens_jvm(col, words=words, token_re=token_re)
    bc = spark.sparkContext.broadcast(tuple(words)) if spark is not None else None
    return make_fmm_udf(words=words, token_re=token_re, broadcast=bc)(col)


def fmm_case_sql(rest_expr: str, words=DEFAULT_CJK_WORDS) -> str:
    """The FMM longest-match step as a SQL expression over ``rest_expr`` —
    shared with the DuckDB recursive-CTE oracle so engine and oracle run the
    SAME dictionary rule.  Longest length first, single-char fallback last."""
    by_len: dict[int, list[str]] = {}
    for w in words:
        by_len.setdefault(len(w), []).append(w)
    branches = []
    for ln in sorted(by_len, reverse=True):
        if ln < 2:
            continue
        in_list = ", ".join(f"'{w}'" for w in sorted(by_len[ln]))
        branches.append(
            f"CASE WHEN substr({rest_expr}, 1, {ln}) IN ({in_list}) "
            f"THEN substr({rest_expr}, 1, {ln}) END"
        )
    branches.append(f"substr({rest_expr}, 1, 1)")
    return "coalesce(" + ", ".join(branches) + ")"
