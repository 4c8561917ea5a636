"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each (same column names —
the driver hash-compares values after sorting columns by name).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT, TOKEN_RE
from searchenginesimple_spark.operators.bm25 import (
    bm25_topk,
    build_index_stats,
    tokens_of,
)
from searchenginesimple_spark.sources.documents import load_documents, load_table

# Fixed query set over the driver `documents` vocabulary (31 terms; `dup` is
# the planted rare term).  Covers: common/rare single terms, 2–4 term
# conjunctions, duplicate-token weighting, OOV pruning, fully-OOV short
# circuit, hot terms (FIXTURES.md §2 coverage matrix).
DRIVER_QUERY_SET: list[str] = [
    "spark",
    "dup",
    "spark window",
    "hash join batch",
    "merge sort window scan",
    "dup vector",
    "spark spark window",
    "spark zz_out_of_vocab",
    "zz_out_of_vocab",
    "the a",
]

_SQL_TOK = f"""
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
  FROM documents
)"""

_SQL_QUERIES_VALUES = ", ".join(
    f"({i}, '{q}')" for i, q in enumerate(DRIVER_QUERY_SET)
)


def _queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, q) for i, q in enumerate(DRIVER_QUERY_SET)],
        schema="query_id long, query string",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k over sf0.001 documents for the fixed query set."""
    docs = load_documents(spark, "/root/testdata/sf0.001")
    idx = build_index_stats(docs)
    return bm25_topk(idx, _queries_df(spark))


# --------------------------------------------------------------------------
# queries() / oracle_sql() — one entry per operator
# --------------------------------------------------------------------------


def _q_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF hash-agg (SURVEY §2.4; reference Page.hpp:296,306)."""
    docs = load_documents(spark, sf_dir)
    return tokens_of(docs).groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )


def _q_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DF distinct-agg (SURVEY §2.4; reference Page.hpp:317)."""
    docs = load_documents(spark, sf_dir)
    idx = build_index_stats(docs)
    return idx.term_stats.select("term", F.col("df").cast("long").alias("df"))


def _q_term_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 IDF per term (SURVEY §2.4 IDF+weight; scorer per §7)."""
    docs = load_documents(spark, sf_dir)
    idx = build_index_stats(docs)
    return idx.term_stats.select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.round("idf", 6).alias("idf"),
    )


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc length stats (BM25 norm input; reference L2-norm analogue Page.hpp:323-333)."""
    docs = load_documents(spark, sf_dir)
    idx = build_index_stats(docs)
    return idx.doc_stats.select("doc_id", F.col("dlen").cast("long").alias("dlen"))


def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship BM25 conjunctive top-k (SURVEY §2.3/§2.4/§2.5 composition)."""
    docs = load_documents(spark, sf_dir)
    idx = build_index_stats(docs)
    return bm25_topk(idx, _queries_df(spark))


def _q_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive doc intersection as a join+count (WebPageQuery.hpp:62-84)."""
    docs = load_documents(spark, sf_dir)
    terms = ["spark", "window"]
    tf = tokens_of(docs).groupBy("doc_id", "term").count()
    return (
        tf.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.count("*").alias("nmatch"))
        .filter(F.col("nmatch") == len(terms))
        .select("doc_id")
    )


def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash; lowest doc_id survives (SURVEY §2.6)."""
    docs = load_documents(spark, sf_dir)
    return (
        docs.withColumn("sha256", F.sha2(F.col("content"), 256))
        .groupBy("sha256")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").cast("long").alias("n_copies"))
        .select("sha256", "doc_id", "n_copies")
    )


def _q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (training-data op): total + distinct tokens per doc."""
    docs = load_documents(spark, sf_dir)
    return (
        tokens_of(docs)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.countDistinct("term").cast("long").alias("n_distinct"),
        )
    )


def _q_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k (SURVEY §2.5): top-5 orders by revenue per o_orderpriority."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "o_orderpriority",
            F.col("rank").cast("int").alias("rank"),
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tf": _q_tf,
        "df": _q_df,
        "term_idf": _q_term_idf,
        "doc_stats": _q_doc_stats,
        "bm25_topk": _q_bm25_topk,
        "conjunctive": _q_conjunctive,
        "exact_dedup": _q_exact_dedup,
        "token_count": _q_token_count,
        "topk_window": _q_topk_window,
    }


_BM25_SQL = f"""
WITH {_SQL_TOK},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, sum(tf) AS dlen FROM tf GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dlen) AS avgdl FROM dl),
dfv AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q(query_id, query) AS (VALUES {_SQL_QUERIES_VALUES}),
qtok AS (
  SELECT query_id, query,
         unnest(regexp_extract_all(lower(query), '{TOKEN_RE}')) AS term
  FROM q
),
qtf AS (SELECT query_id, query, term, count(*) AS qtf
        FROM qtok GROUP BY query_id, query, term),
qidx AS (SELECT qtf.*, dfv.df FROM qtf JOIN dfv USING (term)),
qn AS (SELECT query_id, count(*) AS n_terms FROM qidx GROUP BY query_id),
contrib AS (
  SELECT qi.query_id, qi.query, t.doc_id,
         qi.qtf * ln((s.n_docs - qi.df + 0.5) / (qi.df + 0.5) + 1.0)
           * (t.tf * ({DEFAULT.k1} + 1.0))
           / (t.tf + {DEFAULT.k1} * (1.0 - {DEFAULT.b} + {DEFAULT.b} * dl.dlen / s.avgdl))
           AS c
  FROM qidx qi
  JOIN tf t USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
),
scored AS (
  SELECT query_id, query, doc_id, round(sum(c), 6) AS score, count(*) AS nmatch
  FROM contrib GROUP BY query_id, query, doc_id
),
conj AS (
  SELECT s.* FROM scored s JOIN qn USING (query_id) WHERE s.nmatch = qn.n_terms
),
ranked AS (
  SELECT query, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM conj
)
SELECT query, rank::int AS rank, doc_id::bigint AS "docID", score::double AS score
FROM ranked WHERE rank <= {DEFAULT.top_k}
"""


def oracle_sql() -> dict[str, str]:
    return {
        "tf": f"WITH {_SQL_TOK} SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term",
        "df": f"""WITH {_SQL_TOK},
            tf AS (SELECT doc_id, term FROM tok GROUP BY doc_id, term)
            SELECT term, count(*) AS df FROM tf GROUP BY term""",
        "term_idf": f"""WITH {_SQL_TOK},
            tf AS (SELECT doc_id, term FROM tok GROUP BY doc_id, term),
            dl AS (SELECT doc_id FROM tf GROUP BY doc_id),
            stats AS (SELECT count(*) AS n_docs FROM dl)
            SELECT term, count(*) AS df,
                   round(ln((any_value(s.n_docs) - count(*) + 0.5) / (count(*) + 0.5) + 1.0), 6) AS idf
            FROM tf CROSS JOIN stats s GROUP BY term""",
        "doc_stats": f"""WITH {_SQL_TOK}
            SELECT doc_id, count(*) AS dlen FROM tok GROUP BY doc_id""",
        "bm25_topk": _BM25_SQL,
        "conjunctive": f"""WITH {_SQL_TOK},
            tf AS (SELECT doc_id, term FROM tok WHERE term IN ('spark','window')
                   GROUP BY doc_id, term)
            SELECT doc_id FROM tf GROUP BY doc_id HAVING count(*) = 2""",
        "exact_dedup": """
            SELECT sha256(text) AS sha256, min(doc_id) AS doc_id, count(*) AS n_copies
            FROM documents GROUP BY sha256(text)""",
        "token_count": f"""WITH {_SQL_TOK}
            SELECT doc_id, count(*) AS n_tokens, count(DISTINCT term) AS n_distinct
            FROM tok GROUP BY doc_id""",
        "topk_window": """
            WITH ranked AS (
              SELECT o_orderpriority, o_orderkey,
                     round(o_totalprice, 2) AS o_totalprice,
                     row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
              FROM orders
            )
            SELECT o_orderpriority, rank::int AS rank, o_orderkey, o_totalprice
            FROM ranked WHERE rank <= 5""",
    }
