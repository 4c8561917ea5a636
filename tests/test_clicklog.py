"""Click-log streaming module coverage (streaming/clicklog.py).

The Kafka SOURCE cannot run in this sandbox (no broker, no spark-sql-kafka
jar); everything downstream of the two source lines is exercised here:

* ``parse_click_payload`` on a batch DataFrame with the exact Kafka wire
  schema (key/value binary, topic/partition/offset) — valid JSON, malformed
  JSON, and null payloads;
* ``clicks_per_window`` + ``write_clicklog`` end-to-end over a file-source
  stream (also covered by the ``streaming_clicks`` driver entry).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from searchenginesimple_spark.streaming.clicklog import (
    clicks_per_window,
    parse_click_payload,
    write_clicklog,
)


def _wire_df(spark, payloads: list[bytes | None]):
    """Batch frame with the Kafka source schema's value column."""
    rows = [(bytearray(p) if p is not None else None,) for p in payloads]
    return spark.createDataFrame(rows, "value binary")


def test_parse_click_payload_valid(spark):
    msgs = [
        json.dumps({"url": f"http://x/{i}", "query": f"q{i}", "ts": "2024-01-01 00:00:0%d" % i}).encode()
        for i in range(3)
    ]
    got = parse_click_payload(_wire_df(spark, msgs)).orderBy("url").collect()
    assert [r["url"] for r in got] == ["http://x/0", "http://x/1", "http://x/2"]
    assert [r["query"] for r in got] == ["q0", "q1", "q2"]
    assert all(r["ts"] is not None for r in got)


def test_parse_click_payload_malformed_and_null(spark):
    msgs = [b"{not json", None, json.dumps({"url": "u", "query": "q", "ts": "2024-01-01 00:00:00"}).encode()]
    got = parse_click_payload(_wire_df(spark, msgs)).collect()
    assert len(got) == 3  # permissive: bad rows become all-null, not dropped
    ok = [r for r in got if r["url"] == "u"]
    assert len(ok) == 1
    bad = [r for r in got if r["url"] is None]
    assert len(bad) == 2 and all(r["query"] is None for r in bad)


def test_clicklog_file_stream_end_to_end(spark, tmp_path):
    ev = spark.createDataFrame(
        [
            ("u1", "2024-01-01 00:05:00"),
            ("u1", "2024-01-01 00:07:00"),
            ("u2", "2024-01-01 00:20:00"),
            # sentinel far ahead pushes the watermark past every real window
            ("__sentinel__", "2025-01-01 00:00:00"),
        ],
        "url string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ev.write.mode("overwrite").parquet(str(tmp_path / "in"))

    stream = spark.readStream.schema("url string, ts timestamp").parquet(str(tmp_path / "in"))
    counts = clicks_per_window(stream, window="10 minutes", watermark="1 minute")
    q = write_clicklog(counts, str(tmp_path / "out"), str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination()

    got = {
        (str(r["window_start"]), r["url"]): r["clicks"]
        for r in spark.read.parquet(str(tmp_path / "out"))
        .filter(F.col("url") != "__sentinel__")
        .collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", "u1"): 2,
        ("2024-01-01 00:20:00", "u2"): 1,
    }


def test_trending_topk_streaming_sink_equals_batch(spark, tmp_path):
    """Windowed counts stream to an append-mode sink (closed windows only);
    trending_topk ranked over the sink must equal the batch rank over the
    same closed windows."""
    import pandas as pd
    import pyspark.sql.functions as F

    from searchenginesimple_spark.streaming.clicklog import (
        trending_topk,
        write_clicklog,
    )

    src = tmp_path / "src"
    src.mkdir()
    rows = []
    # two complete 10-min windows + one in-flight window (withheld by append mode)
    for minute, item in [
        (1, "a"), (2, "a"), (3, "b"), (5, "a"), (7, "c"),      # w0: a=3 b=1 c=1
        (11, "b"), (12, "b"), (14, "a"), (16, "b"),            # w1: b=3 a=1
        (21, "z"), (22, "z"),                                  # w2: in-flight
    ]:
        rows.append((item, f"2024-01-01 00:{minute:02d}:00"))
    pdf = pd.DataFrame({"url": [r[0] for r in rows],
                        "ts": pd.to_datetime([r[1] for r in rows])})
    spark.createDataFrame(pdf).write.parquet(str(src / "b0"))

    stream = spark.readStream.schema("url string, ts timestamp").parquet(str(src / "*"))
    from searchenginesimple_spark.streaming.clicklog import clicks_per_window

    q = write_clicklog(
        clicks_per_window(stream, "10 minutes", "0 minutes"),
        str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    sink = spark.read.parquet(str(tmp_path / "out"))
    got = sorted(
        map(tuple, trending_topk(sink, k=2, item_col="url", count_col="clicks").collect())
    )

    batch = (
        spark.createDataFrame(pdf)
        .filter(F.col("ts") < "2024-01-01 00:20:00")   # the closed windows
        .groupBy(F.date_trunc("minute", F.expr("timestampadd(MINUTE, -minute(ts) % 10, ts)")).alias("window_start"), "url")
        .agg(F.count("*").alias("clicks"))
    )
    want = sorted(
        map(tuple, trending_topk(batch, k=2, item_col="url", count_col="clicks").collect())
    )
    assert got == want
    # hand-check: w0 top-2 = a(3), b(1) [b < c tie on item]; w1 = b(3), a(1)
    by_rank = {(str(r[0]), r[1]): (r[2], r[3]) for r in got}
    assert by_rank[("2024-01-01 00:00:00", 1)] == ("a", 3)
    assert by_rank[("2024-01-01 00:00:00", 2)] == ("b", 1)
    assert by_rank[("2024-01-01 00:10:00", 1)] == ("b", 3)
    assert by_rank[("2024-01-01 00:10:00", 2)] == ("a", 1)


def test_events_window_streaming_sink_equals_batch(spark, tmp_path):
    """The driver's batch `events_window` entry and the streaming
    events_per_window twin must agree: stream synthetic events through the
    watermarked windowed agg into the append-mode sink and compare against
    the batch date_trunc aggregation over the same closed windows."""
    import pandas as pd

    from searchenginesimple_spark.streaming.clicklog import (
        events_per_window,
        write_clicklog,
    )

    rows = [
        ("click", "2024-01-01 00:10:00", 1.25),
        ("click", "2024-01-01 00:40:00", 2.50),
        ("view", "2024-01-01 00:59:59", 0.125),
        ("click", "2024-01-01 01:15:00", 4.0),
        ("view", "2024-01-01 01:30:00", 8.0),
        # sentinel far ahead pushes the watermark past every real window
        ("__sentinel__", "2025-01-01 00:00:00", 0.0),
    ]
    pdf = pd.DataFrame(
        {
            "event_type": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "value": [r[2] for r in rows],
        }
    )
    src = tmp_path / "in"
    spark.createDataFrame(pdf).write.parquet(str(src))

    stream = spark.readStream.schema(
        "event_type string, ts timestamp, value double"
    ).parquet(str(src))
    q = write_clicklog(
        events_per_window(stream, window="1 hour", watermark="1 minute"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    sink = (
        spark.read.parquet(str(tmp_path / "out"))
        .filter(F.col("event_type") != "__sentinel__")
    )
    got = sorted(map(tuple, sink.collect()))

    batch = (
        spark.createDataFrame(pdf)
        .filter(F.col("event_type") != "__sentinel__")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    want = sorted(map(tuple, batch.collect()))
    assert got == want
    assert len(got) == 4  # (2 hours × 2 types)


def test_kafka_source_option_contract():
    """Pin the exact Kafka wiring (subscribe / bootstrap / offsets) so the
    only untested seam is the broker itself (no broker in this sandbox)."""
    from searchenginesimple_spark.streaming.clicklog import kafka_source_options

    opts = kafka_source_options("b1:9092,b2:9092")
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "SearchResultsJump",
        "startingOffsets": "earliest",
    }
    assert kafka_source_options("h:1", topic="t2", starting_offsets="latest")[
        "subscribe"
    ] == "t2"


def test_clicklog_socket_stream_end_to_end(spark):
    """parse_click_payload over a REAL streaming socket source: the same
    code path a Kafka frame takes (value column → from_json), with an
    actual network hop instead of the file source."""
    import json
    import socket
    import threading
    import time

    from searchenginesimple_spark.streaming.clicklog import parse_click_payload

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    payloads = [
        {"url": "/hit/1", "query": "spark", "ts": "2024-01-01 00:00:01"},
        {"url": "/hit/2", "query": "index", "ts": "2024-01-01 00:00:02"},
    ]

    def serve():
        conn, _ = srv.accept()
        try:
            for p in payloads:
                conn.sendall((json.dumps(p) + "\n").encode())
            conn.sendall(b"this is not json\n")
            time.sleep(8)
        finally:
            conn.close()
            srv.close()

    threading.Thread(target=serve, daemon=True).start()
    raw = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    q = (
        parse_click_payload(raw)
        .writeStream.format("memory")
        .queryName("clicks_sock")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT url, query FROM clicks_sock WHERE url IS NOT NULL"
            ).collect()
            if len(rows) >= 2:
                break
            time.sleep(1)
        got = sorted((r["url"], r["query"]) for r in rows)
        assert got == [("/hit/1", "spark"), ("/hit/2", "index")][0:len(got)] or \
               got == sorted([("/hit/1", "spark"), ("/hit/2", "index")])
        assert len(rows) == 2, f"expected 2 parsed clicks, saw {rows}"
    finally:
        q.stop()
