"""Adapter: driver testdata ``documents`` table → the engine's docs shape.

The driver's synthetic tables (TESTDATA.md) carry
``documents(doc_id:int64, text:string, lang:string, source:string, n_chars:int64)``;
the engine's canonical input is the input_hint shape with a ``content`` column
and a ``doc_id`` assigned by the build.  The adapter just renames/selects so
every operator runs unchanged on either source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id:long, content:string, lang, source, n_chars)."""
    return load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").alias("content"),
        "lang",
        "source",
        "n_chars",
    )
