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
