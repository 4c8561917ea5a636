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
  ``str`` ops are columnar), mandated by the north rule's "vectorized
  pandas/Arrow UDFs" tokenization stage and kept as the default build path.

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


def tokenize_expr(content: Column | str) -> Column:
    """JVM-side tokenizer: ``regexp_extract_all(lower(content), TOKEN_RE)``."""
    col = F.col(content) if isinstance(content, str) else content
    # idx=0 → whole match (the pattern has no capture groups)
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), F.lit(0))


@pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(content: pd.Series) -> pd.Series:
    """Arrow-batched tokenizer; same spec as ``tokenize_expr``.

    ``Series.str`` operations run columnar over the Arrow batch — this is the
    "vectorized pandas UDF, no per-row Python" path the north rule requires.
    """
    return content.fillna("").str.lower().str.findall(TOKEN_RE)


def tokenize_py(text: str) -> list[str]:
    """Single-string tokenizer for the pure-Python oracle — same spec."""
    import re

    return re.findall(TOKEN_RE, (text or "").lower())
