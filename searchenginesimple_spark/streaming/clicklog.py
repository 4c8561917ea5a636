"""Click-log event stream (reference's Kafka produce/consume, SURVEY.md §2.9).

The reference's only streaming surface is a fire-and-forget Kafka produce of
click-jump events (``src/Server/WebServer.cc:205-233``, topic
``SearchResultsJump``) and a tutorial fetch/commit consumer
(``WebServer.cc:64-146``).  There are no watermarks/windows/state in the
reference, so the core engine is batch-only; this module provides the
Structured Streaming equivalent for parity plus the windowed aggregation a
real click log needs.

Kafka needs an external broker + the spark-sql-kafka package, neither present
in this sandbox — the transformations are defined against any streaming
DataFrame and tested with the file source end-to-end (the ``streaming_clicks``
driver entry in ``__spark_entry__.py`` and tests/test_entry_contract.py).
``read_clicklog_kafka`` is two lines of production source wiring around
``parse_click_payload``, which is itself covered by tests/test_clicklog.py on
a batch DataFrame with the exact Kafka wire schema (value:binary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CLICK_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("query", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def parse_click_payload(raw: DataFrame) -> DataFrame:
    """Kafka wire frame (value:binary JSON) → typed click events.

    Works identically on a streaming or batch DataFrame carrying the Kafka
    source schema's ``value`` column — tested on a batch frame
    (tests/test_clicklog.py) since no broker exists in this sandbox.
    Malformed payloads parse to all-null structs (from_json PERMISSIVE mode),
    mirroring the reference's silent skip of undecodable messages.
    """
    return raw.select(
        F.from_json(F.col("value").cast("string"), CLICK_SCHEMA).alias("e")
    ).select("e.*")


def kafka_source_options(
    brokers: str,
    topic: str = "SearchResultsJump",
    starting_offsets: str = "earliest",
) -> dict[str, str]:
    """The exact Kafka source option set (contract-tested without a broker,
    tests/test_clicklog.py).  ``starting_offsets='earliest'`` mirrors the
    reference's resume-from-committed-offset behavior on a FRESH checkpoint
    (WebServer.cc:127-146 reads its offset files before consuming); once a
    checkpoint exists Spark ignores this and resumes from its own offsets —
    the same commit semantics, owned by the checkpoint instead of manual
    ``kafka.<topic>.<part>.<offset>`` files."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def read_clicklog_kafka(
    spark: SparkSession,
    brokers: str,
    topic: str = "SearchResultsJump",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Production source wiring: Kafka topic → parsed click events.

    Offsets/commits are Spark's checkpoint, replacing the reference's manual
    ``kafka.<topic>.<part>.<offset>`` files (WebServer.cc:127-146).  Requires
    the spark-sql-kafka package + a broker; everything below the source
    lines is ``parse_click_payload``, e2e-covered on the built-in SOCKET
    streaming source (tests/test_clicklog.py) so the only untested seam is
    the broker itself.
    """
    raw = (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(brokers, topic, starting_offsets))
        .load()
    )
    return parse_click_payload(raw)


def clicks_per_window(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window click counts per url with late-data watermark.

    Works identically on a streaming or batch DataFrame with (url, ts).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "url")
        .agg(F.count("*").alias("clicks"))
        .select(F.col("w.start").alias("window_start"), "url", "clicks")
    )


def events_per_window(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window event analytics: (window_start, event_type, n,
    sum_value) — the streaming twin of the driver's batch ``events_window``
    entry (same grouping and aggregates; for tumbling windows aligned to the
    epoch, ``window(ts, '1 hour').start`` ≡ ``date_trunc('hour', ts)``, so a
    closed streaming window's row is bit-equal to the batch row over the
    same events — pinned in tests/test_clicklog.py).

    Works identically on a streaming or batch DataFrame with
    (ts, event_type, value); `write_clicklog` sinks it append-mode (closed
    windows only) with exactly-once checkpointing.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def trending_topk(
    counts: DataFrame,
    k: int = 3,
    item_col: str = "item",
    count_col: str = "n",
) -> DataFrame:
    """Top-k items per completed window → (window_start, rank, item, n).

    Input = windowed counts (window_start, <item_col>, <count_col>) from
    either the batch aggregation or a streaming windowed-count SINK —
    ranking WITHIN a window needs the window complete, so in streaming the
    rank runs as a batch pass over the append-mode sink (only closed windows
    land there; tests/test_clicklog.py pins batch ≡ streaming-sink results).
    Ties break on item ascending; the rank ≤ k filter gets the same partial
    WindowGroupLimit as per_key_cap — ≤ k rows per window per map task enter
    the shuffle.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc(count_col), F.asc(item_col)
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "window_start", F.col("rank").cast("int").alias("rank"),
            item_col, count_col,
        )
    )


def write_clicklog(
    counts: DataFrame, path: str, checkpoint: str, trigger_once: bool = True
):
    """Sink: append windowed counts to parquet with exactly-once checkpointing."""
    w = (
        counts.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
