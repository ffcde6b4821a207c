"""Custom stateful streaming operator: per-user SESSIONIZATION via
``applyInPandasWithState`` (arbitrary keyed state + event-time timeout).

The windowed aggregations in streaming/events.py cover what built-in
operators express; session windows with an inactivity GAP are the
canonical case they cannot (a session's end depends on the data, not the
clock grid), and the reference's batch analog is the user_sessions gap
analysis (queries.py q_user_sessions). Semantics:

* events for one user sorted by event time; consecutive events with
  ts-delta <= gap belong to one session;
* a session CLOSES (emits one row, append mode) when either
  (a) a later event for the same user arrives more than `gap` after the
      session's last event — closed in-stream, same micro-batch, or
  (b) the event-time WATERMARK passes last_event + gap — closed by the
      state timeout (GroupStateTimeout.EventTimeTimeout), which is what
      bounds state for users who simply stop: state size tracks ACTIVE
      users inside the watermark horizon, not stream length.

Scale shape: state is (3 int64) per active user, partitioned by user_id
across executors by the state-store shuffle; each micro-batch touches
only keys with new rows or expiring timers. Late rows behind the
watermark are dropped by the engine before the operator sees them.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# (session_start_us, last_event_us, n_events) — epoch micros as int64;
# state structs carry scalars, timestamps are re-hydrated on emit
SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_US = 1_000_000


def _emit(user_id: int, start_us: int, last_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
        }
    )


def make_session_func(gap_seconds: int):
    """Builds the applyInPandasWithState function for a given gap."""
    gap_us = gap_seconds * _US

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _emit(user_id, start_us, last_us, n)
            return
        ts: list[Any] = []
        for pdf in pdfs:
            # micros since epoch, int64 — exact session arithmetic
            ts.append(pdf["ts"].astype("datetime64[us]").astype("int64"))
        events = pd.concat(ts).sort_values().to_numpy()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = int(events[0]), int(events[0]), 0
        for t in events:
            t = int(t)
            if t - last_us > gap_us:
                yield _emit(user_id, start_us, last_us, n)
                start_us, n = t, 0
            last_us = t
            n += 1
        state.update((start_us, last_us, n))
        # close via timeout once the watermark passes last + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)

    return fn


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """events(ts, user_id, ...) stream → append-mode closed sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_func(gap_seconds),
            outputStructType=SESSION_OUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessionize(
    spark,
    events_path: str,
    out_path: str,
    checkpoint: str,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = 1,
) -> None:
    """availableNow backfill: stream the events directory through the
    sessionizer into an append-mode parquet sink; resumes from the
    checkpoint exactly-once like streaming/events.run_windowed_counts."""
    from twinspect_spark.streaming.events import read_event_stream

    stream = read_event_stream(
        spark, events_path, max_files_per_trigger=max_files_per_trigger
    )
    q = (
        sessionize(stream, gap_seconds, watermark)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
