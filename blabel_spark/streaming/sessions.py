"""Streaming turn analytics: watermarked windowed aggregation + a custom
stateful sessionizer via ``applyInPandasWithState``.

The reference is strictly batch (SURVEY §2.9), but a live transcript
corpus arrives as an unbounded stream of turns; these are the idiomatic
Structured Streaming counterparts of the batch window queries
(`queries.q_sessionize` / `q_user_first_event`):

* ``windowed_turn_counts`` — tumbling event-time windows with a
  watermark, so late turns inside the lateness bound still aggregate and
  state is bounded;
* ``sessionize_stream`` — gap-based conversation sessionization as an
  explicit stateful operator: per-conversation state (session start, last
  event time, turn count) lives in the state store, sessions close either
  when a gap arrives in-stream or when the event-time timeout fires, and
  state survives restarts through the stream checkpoint.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_turns", IntegerType()),
])
_STATE_SCHEMA = StructType([
    StructField("start_ms", LongType()),
    StructField("last_ms", LongType()),
    StructField("n", IntegerType()),
])


def windowed_turn_counts(turns: DataFrame, window: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Per-(window, role) turn counts with an event-time watermark —
    late turns within the bound aggregate correctly, older ones are
    dropped and window state is reclaimed.  Works on batch frames too
    (the watermark is a no-op there), which is how the oracle test pins
    the aggregation semantics."""
    return (turns.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "role")
            .agg(F.count("*").alias("n_turns"),
                 F.approx_count_distinct("conv_id").alias("n_convs"))
            .select(F.col("w.start").alias("window_start"), "role",
                    "n_turns", "n_convs"))


def _ms(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000_000)


def sessionize_stream(turns: DataFrame, gap_seconds: int = 1800,
                      watermark: str = "30 minutes") -> DataFrame:
    """Gap-based sessionization as a custom stateful operator
    (applyInPandasWithState): one state row per conversation; a session
    row is emitted when a gap ≥ ``gap_seconds`` is observed, and the
    trailing session is flushed by the event-time timeout once the
    watermark passes it."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    gap_ms = gap_seconds * 1000

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        conv_id = key[0]

        def emit(start_ms: int, last_ms: int, n: int) -> pd.DataFrame:
            return pd.DataFrame({
                "conv_id": [conv_id],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(last_ms, unit="ms")],
                "n_turns": [n],
            })

        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield emit(start_ms, last_ms, n)
            return

        ts_all = sorted(
            _ms(t) for pdf in pdfs for t in pdf["ts"] if t is not None)
        start_ms, last_ms, n = state.get if state.exists else (None, None, 0)
        for t in ts_all:
            if last_ms is not None and t - last_ms >= gap_ms:
                yield emit(start_ms, last_ms, n)
                start_ms, n = t, 0
            if start_ms is None:
                start_ms = t
            last_ms = t
            n += 1
        if last_ms is not None:
            state.update((start_ms, last_ms, n))
            state.setTimeoutTimestamp(last_ms + gap_ms)

    return (turns.withWatermark("ts", watermark)
            .groupBy("conv_id")
            .applyInPandasWithState(
                fn, SESSION_SCHEMA, _STATE_SCHEMA, "append",
                GroupStateTimeout.EventTimeTimeout))
