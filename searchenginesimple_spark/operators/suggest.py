"""Query-suggestion operators (reference's KeyServer/Dictionary path, SURVEY §3.3).

* dictionary build — ``DictProducer::buildDict`` (Dictionary.hpp:171-218):
  per-zone token count + global sorted merge → here one groupBy + row_number.
* char index — ``creatIndex`` (Dictionary.hpp:220-224,131-145):
  codepoint → set of dict ids → explode + collect_set.
* suggestion — ``KeyRecommander`` (KeyRecommander.hpp:95-113): candidate
  union via char index, codepoint Levenshtein, min-heap top-10 → candidate
  join + built-in ``levenshtein`` + window top-k (distance asc, word asc —
  canonicalized tie-break, the reference heap is insertion-order-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from searchenginesimple_spark.operators.bm25 import tokens_of
from searchenginesimple_spark.operators.rank import ordered_dense_ids


def build_dict(
    docs: DataFrame,
    text_col: str = "content",
    stopwords: tuple[str, ...] = (),
    token_re: str | None = None,
) -> DataFrame:
    """(word, count, dict_id) — dict_id = row_number over word order.

    The global word rank is computed with the two-phase prefix-bucketed rank
    (operators/rank.py), NOT an unpartitioned ``Window.orderBy`` — at corpus
    scale the identifier vocabulary is billions of rows and a single-task
    global window is the exact scale bug ``with_doc_ids`` already avoids.

    ``stopwords`` mirrors the reference's dictionary-build stop filter
    (Dictionary.hpp:101,112) — applied to the vocabulary (post-aggregation,
    vocab-sized) rather than per token, same result cheaper.
    """
    from searchenginesimple_spark.config import TOKEN_RE

    counts = (
        tokens_of(docs, text_col, token_re=token_re or TOKEN_RE)
        .groupBy(F.col("term").alias("word"))
        .agg(F.count("*").cast("long").alias("count"))
    )
    if stopwords:
        counts = counts.filter(~F.col("word").isin(list(stopwords)))
    return ordered_dense_ids(counts, "word", "dict_id")


def build_char_index(dictionary: DataFrame) -> DataFrame:
    """(cp:int, dict_ids:array<long> sorted) — ASCII codepoint → dict entries.

    The reference indexes unicode codepoints (Dictionary.hpp:137-143); the
    code-token vocabulary is ASCII so ``ascii()`` (first-char codepoint)
    over exploded single chars is exact here.
    """
    chars = dictionary.select(
        "dict_id",
        F.explode(F.filter(F.split(F.col("word"), ""), lambda c: c != F.lit(""))).alias("ch"),
    ).select("dict_id", F.ascii("ch").alias("cp"))
    return (
        chars.distinct()
        .groupBy("cp")
        .agg(F.sort_array(F.collect_set("dict_id")).alias("dict_ids"))
    )


def suggest_topk(
    dictionary: DataFrame,
    char_index: DataFrame,
    queries: DataFrame,
    k: int = 10,
    query_col: str = "word",
) -> DataFrame:
    """(query_word, rank, word, dist) — top-k dictionary words by edit distance.

    Candidates: dict words sharing ≥ 1 codepoint with the query
    (KeyRecommander.hpp:101-105) — an explode + broadcast join against the
    char index, then exact ``levenshtein`` and a per-query window top-k.
    """
    q = queries.select(F.col(query_col).alias("query_word")).distinct()
    q_chars = q.select(
        "query_word",
        F.explode(F.filter(F.split(F.col("query_word"), ""), lambda c: c != F.lit(""))).alias("ch"),
    ).select("query_word", F.ascii("ch").alias("cp")).distinct()
    cand = (
        q_chars.join(F.broadcast(char_index), "cp")
        .select("query_word", F.explode("dict_ids").alias("dict_id"))
        .distinct()
        .join(dictionary, "dict_id")
        .withColumn("dist", F.levenshtein(F.col("query_word"), F.col("word")))
    )
    w = Window.partitionBy("query_word").orderBy(F.asc("dist"), F.asc("word"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_word",
            F.col("rank").cast("int").alias("rank"),
            "word",
            F.col("dist").cast("int").alias("dist"),
        )
    )


def popular_completions(
    clicks: DataFrame,
    k: int = 5,
    max_prefix: int = 12,
    min_count: int = 1,
    query_col: str = "query",
) -> DataFrame:
    """→ (prefix, rank, completion, count): type-ahead completions mined
    from the click/query log — the popularity signal the reference's
    edit-distance suggester (suggest_topk) lacks.  A serving layer
    broadcasts this table and answers a keystroke with one prefix lookup.

    Scale shape: events COLLAPSE to (query, count) first (one hash agg over
    the log — the only corpus-sized shuffle), the prefix fan-out then runs
    over DISTINCT queries only and is bounded by ``max_prefix`` rows per
    query (in-row ``sequence`` + ``substring``, map-side), and the
    per-prefix top-k window ships at most k rows per prefix per map task
    (rank <= k triggers the partial WindowGroupLimit, the per_key_cap
    pattern).  ``min_count`` prunes one-off queries (typos) before the
    fan-out.  Normalization: lower + collapse ALL whitespace runs (tabs,
    newlines included) to single spaces, THEN trim — collapse-before-trim,
    or a tab-edged query keeps a space padding that splits its popularity
    count.  The serving lookup must normalize its prefix the same way.
    """
    if k < 1 or max_prefix < 1:
        raise ValueError("k and max_prefix must be >= 1")
    norm = F.trim(F.regexp_replace(F.lower(F.col(query_col)), r"\s+", " "))
    counts = (
        clicks.select(norm.alias("completion"))
        .filter(F.length("completion") > 0)
        .groupBy("completion")
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") >= min_count)
    )
    prefixes = counts.select(
        "completion",
        "count",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.least(F.length("completion"), F.lit(max_prefix))
                ),
                lambda n: F.substring(F.col("completion"), 1, n.cast("int")),
            )
        ).alias("prefix"),
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("count"), F.asc("completion"))
    return (
        prefixes.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("prefix", F.col("rank").cast("int").alias("rank"), "completion", "count")
    )
