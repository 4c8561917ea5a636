"""Event sessionization — the classic stateful clickstream operator the
reference's click-log consumer (``WebServer.cc:64-146``) would need next.

Batch path (here): pure window/aggregate DataFrame ops — a session is a
maximal run of a user's events with inter-event gaps ≤ ``gap``:

    new_session = ts − lag(ts) > gap            (per user, event-time order)
    session_idx = running sum of new_session    (same window)
    → groupBy(user, session_idx): start/end/n/sum

Scale shape: both the window and the aggregation partition by ``user_id`` —
shuffle once by user, no global ordering anywhere; per-user event counts
bound task memory (power users are data skew AQE's skew-join/agg handles).

Streaming path: ``streaming/sessions.py`` implements the same semantics
incrementally with ``applyInPandasWithState`` + event-time timeout; its
output must agree with this batch operator (pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """→ (user_id, session_id, session_start, session_end, n_events[, sum_value]).

    ``session_id`` is the 1-based index of the session within the user's
    event-time order (deterministic: ordering ties broken by the full sort
    key ``(ts, event_id)`` when present).
    """
    order_cols = [F.col(ts_col)]
    if "event_id" in events.columns:
        order_cols.append(F.col("event_id"))
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    gap_us = gap_minutes * 60 * 1_000_000  # integer µs: exact in any engine

    def _us(c):  # parquet may carry TIMESTAMP_NTZ; session tz is UTC
        return F.unix_micros(c.cast("timestamp"))

    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull() | (_us(F.col(ts_col)) - _us(prev_ts) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_sess = events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
    ]
    if value_col and value_col in events.columns:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return with_sess.groupBy(user_col, "session_id").agg(*aggs)
