"""Streaming sessionization: custom stateful operator via
``applyInPandasWithState`` (the Structured-Streaming primitive for operators
Spark lacks built-in — SURVEY.md §2.9 / task brief).

Semantics match ``operators/sessions.py::sessionize`` exactly: a session is a
maximal run of a user's events with inter-event gaps ≤ gap.  Incremental
shape per user key:

* state = (session_id, session_start, last_ts, n_events, sum_value) of the
  OPEN session;
* each micro-batch folds its (event-time-sorted) events into the state,
  EMITTING every session it closes (gap exceeded);
* an event-time timeout (watermark + gap past last_ts) closes and emits the
  final session of an idle user — without it the last session would be held
  forever, the standard streaming-sessionization pitfall.

Late events older than the watermark are dropped by the watermark operator
upstream, same policy as the windowed click counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_id long, session_start timestamp, "
    "session_end timestamp, n_events long, sum_value double"
)
STATE_SCHEMA = (
    "session_id long, session_start timestamp, last_ts timestamp, "
    "n_events long, sum_value double"
)


def _session_fn(gap_minutes: int):
    gap_s = gap_minutes * 60.0

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[tuple] = []
        if state.hasTimedOut:
            sid, start, last, n, sv = state.get
            out.append((user_id, sid, start, last, n, round(sv, 4)))
            state.remove()
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "session_id", "session_start",
                    "session_end", "n_events", "sum_value",
                ],
            )
            return

        ev = pd.concat(list(pdfs), ignore_index=True)
        ev = ev.sort_values(
            ["ts", "event_id"] if "event_id" in ev.columns else ["ts"]
        )
        if state.exists:
            sid, start, last, n, sv = state.get
        else:
            sid, start, last, n, sv = 0, None, None, 0, 0.0
        for ts, val in zip(ev["ts"], ev["value"]):
            if last is not None and (ts - last).total_seconds() > gap_s:
                out.append((user_id, sid, start, last, n, round(sv, 4)))
                start, n, sv = None, 0, 0.0
            if start is None:
                sid += 1
                start = ts
            last = ts
            n += 1
            sv += float(val)
        state.update((sid, start, last, n, sv))
        # event-time timeout: close the open session once the watermark
        # passes last_ts + gap (epoch ms for setTimeoutTimestamp)
        state.setTimeoutTimestamp(int(last.timestamp() * 1000) + int(gap_s * 1000))
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "session_id", "session_start",
                "session_end", "n_events", "sum_value",
            ],
        )

    return fn


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 minute"
) -> DataFrame:
    """streaming events(user_id, ts, value[, event_id]) → closed sessions.

    Output rows appear when a session CLOSES (next-session event arrives or
    the event-time timeout fires) — the append-mode contract.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
