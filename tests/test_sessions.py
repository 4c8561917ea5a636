"""Sessionization: batch operator semantics + streaming stateful operator
(applyInPandasWithState) agreement with the batch twin."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import functions as F

from searchenginesimple_spark.operators.sessions import sessionize

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ev(user, minutes, value=1.0, eid=None):
    return (eid if eid is not None else 0, T0 + timedelta(minutes=minutes), user, value)


EVENTS = [
    # user 1: two sessions (gap 45 min > 30)
    _ev(1, 0, 1.0, 0), _ev(1, 10, 2.0, 1), _ev(1, 25, 3.0, 2),
    _ev(1, 70, 4.0, 3), _ev(1, 80, 5.0, 4),
    # user 2: one long session riding 29-min gaps
    _ev(2, 0, 1.5, 5), _ev(2, 29, 1.5, 6), _ev(2, 58, 1.5, 7),
    # user 3: single event
    _ev(3, 5, 9.0, 8),
]
SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _events_df(spark, rows=EVENTS):
    return spark.createDataFrame(rows, SCHEMA)


def test_batch_sessionize_semantics(spark):
    got = {
        (r["user_id"], r["session_id"]): (
            r["session_start"], r["session_end"], r["n_events"], r["sum_value"]
        )
        for r in sessionize(_events_df(spark), gap_minutes=30).collect()
    }
    m = lambda x: T0 + timedelta(minutes=x)  # noqa: E731
    assert got == {
        (1, 1): (m(0), m(25), 3, 6.0),
        (1, 2): (m(70), m(80), 2, 9.0),
        (2, 1): (m(0), m(58), 3, 4.5),
        (3, 1): (m(5), m(5), 1, 9.0),
    }


def test_streaming_sessions_match_batch(spark, tmp_path):
    """Drive the applyInPandasWithState operator through three availableNow
    rounds (data → sentinel advances watermark → empty round fires the
    event-time timeouts) and compare the closed sessions to the batch op."""
    from searchenginesimple_spark.streaming.sessions import sessionize_stream

    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    df0 = _events_df(spark)
    df0.write.mode("overwrite").parquet(in_dir)

    def run_round():
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        counts = sessionize_stream(stream, gap_minutes=30, watermark="1 minute")
        q = (
            counts.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_round()
    # sentinel events push the watermark a year ahead (two rounds so the
    # timeout fires in a batch that observes the advanced watermark)
    for i, mins in enumerate([60 * 24 * 365, 60 * 24 * 365 + 60]):
        spark.createDataFrame(
            [(10_000 + i, T0 + timedelta(minutes=mins), 999, 0.0)], SCHEMA
        ).write.mode("append").parquet(in_dir)
        run_round()

    got = (
        spark.read.parquet(out_dir)
        .filter(F.col("user_id") != 999)
        .toPandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    want = (
        sessionize(df0, gap_minutes=30)
        .toPandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
