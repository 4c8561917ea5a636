"""Code-aware tokenization.

Replaces the reference's jieba HMM cut + per-token class filter + case
transform + stopword filter (``include/Page/Page.hpp:283-309``,
``include/Dictionary/Dictionary.hpp:90-116``, query side
``include/Page/WebPageQuery.hpp:140-160``) with one declarative spec suited to
the source-code payload (BASELINE.json input_hint): lowercase the content and
extract identifier-shaped token runs ``[a-z_][a-z0-9_]*``.  Operators,
punctuation and digits-first runs are dropped — the analogue of the
reference's token-class filter (keep CJK/alpha, drop the rest).

Two interchangeable implementations, verified identical in tests:

* ``tokenize_expr`` — pure JVM column expression (``regexp_extract_all``),
  whole-stage-codegen'd, zero Python; the fast path.
* ``tokenize_udf`` — Arrow-batched pandas UDF (no per-row Python — pandas
  ``str`` ops are columnar), the north rule's "vectorized pandas/Arrow UDFs"
  tokenization shape.  The build defaults to the JVM path (measured 20-25 %
  faster end-to-end: no Arrow hop for the token stream); this one stays
  selectable via ``use_pandas_udf=True`` and is the shape every OTHER
  Python stage (posting encode, simhash, codecs) always uses.

Stopword filtering is a separate composable step (the reference applies it at
build time but NOT on the query path — Page.hpp:294 vs WebPageQuery.hpp:140-160
— we preserve that asymmetry at the pipeline layer, not here).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from searchenginesimple_spark.config import TOKEN_RE


def tokenize_expr(content: Column | str, token_re: str = TOKEN_RE) -> Column:
    """JVM-side tokenizer: ``regexp_extract_all(lower(content), token_re)``."""
    col = F.col(content) if isinstance(content, str) else content
    # idx=0 → whole match (the patterns have no capture groups)
    return F.regexp_extract_all(F.lower(col), F.lit(token_re), F.lit(0))


def make_tokenize_udf(token_re: str = TOKEN_RE):
    """Arrow-batched tokenizer UDF for an arbitrary token spec.

    ``Series.str`` operations run columnar over the Arrow batch — this is the
    "vectorized pandas UDF, no per-row Python" path the north rule requires.
    """

    @pandas_udf(T.ArrayType(T.StringType()))
    def _tokenize(content: pd.Series) -> pd.Series:
        return content.fillna("").str.lower().str.findall(token_re)

    return _tokenize


# default-spec instance (the common path — avoids re-registering per call)
tokenize_udf = make_tokenize_udf()


def subtokens_expr(content: Column | str, keep_re: str = r"[a-z][a-z0-9]*") -> Column:
    """Code-identifier SUBtoken split: camelCase, PascalCase, UPPER-acronym
    and snake_case identifiers decompose into their word parts
    (``parseHTTPResponse`` → [parse, http, response]; ``fooBar_baz`` →
    [foo, bar, baz]) — what lets a source-code index match ``response``
    inside ``parseHTTPResponse``, the payload-specific analogue of the
    reference's jieba word segmentation (Page.hpp:288).

    Spec (RE2-compatible — no lookarounds — so the DuckDB oracle runs the
    identical chain): break ACRONYM|Word boundaries (``([A-Z]+)([A-Z][a-z])``
    → ``$1 $2``), then lower|Upper boundaries (``([a-z0-9])([A-Z])``), then
    lowercase and extract ``keep_re`` runs (underscores/digits-first runs act
    as separators).  Pure JVM, codegen'd.
    """
    col = F.col(content) if isinstance(content, str) else content
    spaced = F.regexp_replace(col, r"([A-Z]+)([A-Z][a-z])", r"$1 $2")
    spaced = F.regexp_replace(spaced, r"([a-z0-9])([A-Z])", r"$1 $2")
    return F.regexp_extract_all(F.lower(spaced), F.lit(keep_re), F.lit(0))


def tokenize_py(text: str, token_re: str = TOKEN_RE) -> list[str]:
    """Single-string tokenizer for the pure-Python oracle — same spec."""
    import re

    return re.findall(token_re, (text or "").lower())
