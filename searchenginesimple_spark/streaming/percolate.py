"""Percolation: standing boolean queries over a document stream.

The inverse of search — queries are REGISTERED up front, documents flow
past them, and each arriving doc is reported against every query it
satisfies (Elasticsearch's percolator; zoekt/grep-style "watch" alerts).
A search engine over a live 10¹²-file corpus needs this for
subscriptions ("tell me when code matching `lang:py crypto -vendor`
lands") without re-running the query against the whole index.

Spark-first shape: the registered query set is a driver-side constant
(query compilation is serving-side work, exactly like
operators/boolquery.py), so each micro-batch is ONE map-only pass — every
query's full boolean compiled into a single chained column expression
over the batch (boolean_search_bruteforce, the operator's own scan twin).
No index is built per batch: a micro-batch is small by definition, and
the scan twin is plan-identical to what the batch operator's verify stage
runs, so streaming output ≡ batch boolean_search over the same docs (the
repo's standing batch≡streaming discipline — sessionize, trigram deltas).

Effectively-exactly-once: matches land in a per-batch subdirectory named
by batch_id with mode=overwrite — a retried micro-batch overwrites its
own partial output (the idempotent-foreachBatch recipe shared with
streaming/index.py); results become visible atomically at _SUCCESS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from searchenginesimple_spark.operators.boolquery import (
    boolean_search_bruteforce,
    parse_query,
)


def stream_percolate(
    doc_stream: DataFrame,
    queries: list[tuple[int, str]],
    out_path: str,
    checkpoint: str,
    content_col: str = "content",
    case_insensitive: bool = False,
    available_now: bool = True,
):
    """Start the percolation query → (query_id, query, doc_id) parquet
    rows under ``out_path/batch=<id>/`` per micro-batch.

    ``queries``: the registered (query_id, query-string) set — parsed
    eagerly so a malformed standing query fails at REGISTRATION, not
    inside a running stream.  Returns the StreamingQuery.
    """
    for _, qs in queries:  # fail fast, driver-side
        parse_query(qs)

    def _match(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        matches = boolean_search_bruteforce(
            batch_df,
            queries,
            content_col=content_col,
            case_insensitive=case_insensitive,
        )
        matches.write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id:010d}"
        )

    writer = doc_stream.writeStream.foreachBatch(_match).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_percolated(spark, out_path: str) -> DataFrame:
    """All matches emitted so far (committed batches only — a partial
    batch directory without _SUCCESS is rewritten on retry)."""
    return (
        spark.read.option("basePath", out_path)
        .parquet(f"{out_path}/batch=*")
        .drop("batch")
    )
