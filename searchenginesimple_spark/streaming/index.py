"""Streaming index maintenance: keep the trigram index fresh from a
stream of new/changed documents.

The batch LSM path (operators/trigram.py::append_trigram_delta) already
has the right unit of work — "index these changed docs into one shard,
touch nothing else" — so the streaming form is exactly ``foreachBatch``
over a document stream, one delta shard per micro-batch.  Queries pick
the shards up through ``read_trigram_index`` with no coordination: a
shard becomes visible atomically when its ``_SUCCESS`` marker commits.

Effectively-exactly-once without a transactional sink: the shard
directory is NAMED BY batch_id and written with mode=overwrite, so a
micro-batch that is retried after a crash overwrites its own partial
output instead of duplicating it — the standard idempotent-foreachBatch
recipe (Structured Streaming guarantees batch_id stability across
retries from the checkpoint).  Even a duplicated shard would be harmless
to RESULTS (read_trigram_index distincts the union and the exact verify
prunes), costing only scan volume — the same verify-backed soundness
argument as the batch path.

The reference engine rebuilds its whole index offline (SURVEY.md §3.1);
this module is the §2.9-plus continuous-ingest path a 10¹²-file corpus
needs (compaction cadence stays a batch concern:
compact_trigram_index when deltas accumulate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from searchenginesimple_spark.operators.trigram import append_trigram_delta


def stream_trigram_deltas(
    doc_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    content_col: str = "content",
    case_insensitive: bool = False,
    available_now: bool = True,
):
    """Start the maintenance query: one delta shard per micro-batch.

    ``doc_stream``: streaming DataFrame of (doc_id, <content_col>) —
    new or replaced documents.  ``available_now=True`` drains what exists
    and stops (the bounded-run form every streaming twin in this repo
    uses; pass False for a continuous query).  Returns the StreamingQuery.
    """

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_trigram_delta(
            batch_df,
            index_path,
            f"stream-{batch_id:010d}",
            content_col=content_col,
            case_insensitive=case_insensitive,
        )

    writer = doc_stream.writeStream.foreachBatch(_append).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
