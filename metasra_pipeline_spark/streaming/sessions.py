"""Custom stateful streaming operators over event streams.

Two scale paths Structured Streaming offers for event analytics:

- ``windowed_event_counts``: watermark + tumbling-window aggregation —
  late data handled by the engine, state pruned automatically at the
  watermark.  Fully built-in (no Python in the hot path).
- ``sessionize``: gap-based sessionization as a CUSTOM stateful
  operator via ``applyInPandasWithState`` — per-key session state
  (start, last-seen, count) lives in the state store, survives
  restarts through the checkpoint, and closed sessions are emitted as
  soon as a later event proves the gap elapsed.  This is the pattern
  for any reference operator Spark lacks natively: Arrow-batched
  per-key state, not a row-at-a-time UDF.

State size is O(active keys), not O(events): each key holds one
(session_start, last_ts, n_events) triple.  At 10^12 events the state
store shards by key across executors exactly like a shuffle.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", IntegerType()),
])

# state: (session_start_us, last_ts_us, n_events)
_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", IntegerType()),
])


def windowed_event_counts(stream: DataFrame, window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Tumbling-window event counts per event_type with late-data
    handling: rows later than ``watermark`` behind the max seen event
    time are dropped and window state is pruned — bounded state at any
    input volume."""
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events"))


def sessionize(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: consecutive events of a user belong to
    one session while inter-event gaps stay under ``gap_minutes``; a
    larger gap closes the session, which is emitted with its span and
    event count.  The open trailing session stays in the state store
    (checkpoint-durable) until a later event — possibly batches or
    restarts later — closes it."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key: Any, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(v) for v in
                         pd.to_datetime(pdf["ts"]).astype("int64") // 1_000)
        ts_us.sort()
        if not ts_us and not state.exists:
            return
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = ts_us[0], ts_us[0], 0
        closed: list[tuple[int, int, int, int]] = []
        for t in ts_us:
            if n > 0 and t - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n))
                start_us, n = t, 0
            last_us = t
            n += 1
        state.update((start_us, last_us, n))
        if closed:
            yield pd.DataFrame({
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1] * 1_000) for c in closed],
                "session_end": [pd.Timestamp(c[2] * 1_000) for c in closed],
                "n_events": [c[3] for c in closed],
            })

    return (stream
            .groupBy("user_id")
            .applyInPandasWithState(
                fn,
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_sessionize_available_now(sessions: DataFrame, out_dir: str,
                                 checkpoint_dir: str) -> None:
    """Drain available input once; closed sessions append to parquet,
    open-session state persists in the checkpoint for the next run."""
    q = (sessions.writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
