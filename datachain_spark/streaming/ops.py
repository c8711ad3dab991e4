"""Streaming operators: watermarked windowed aggregation and a custom
stateful operator (applyInPandasWithState).

The reference has NO streaming surface (SURVEY.md §1.1: incrementality is
batch replay of diffs); these are the Structured Streaming primitives the
Spark-first rebuild gains for free + the custom stateful path for
operators Spark lacks built-in.

Both operators work on a streaming OR batch DataFrame of events
(ts timestamp, user_id long, event_type string, value double) — the
batch path is used by tests/oracles, the streaming path by readStream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time tumbling/sliding window aggregation with a watermark for
    late data (append-mode capable on a stream)."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
            "total",
        )
    )


SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
    ]
)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType(), True),
        T.StructField("last_ms", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def _session_fn(gap_ms: int):
    """Custom stateful session operator: closes a session when event-time
    gap exceeds gap_ms (or on timeout in streaming mode). State is one
    (start, last, count) triple per user."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(last_ms, unit="ms")],
                    "n_events": [n],
                }
            )
            return
        ts_ms: list[int] = []
        for pdf in pdfs:
            ts_ms.extend(int(t.value // 1_000_000) for t in pd.to_datetime(pdf["ts"]))
        ts_ms.sort()
        start_ms, last_ms, n = state.get if state.exists else (None, None, 0)
        closed = []
        for t in ts_ms:
            if start_ms is None:
                start_ms, last_ms, n = t, t, 1
            elif t - last_ms > gap_ms:
                closed.append((start_ms, last_ms, n))
                start_ms, last_ms, n = t, t, 1
            else:
                last_ms, n = t, n + 1
        state.update((start_ms, last_ms, n))
        state.setTimeoutDuration(gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return fn


def sessionize_stateful(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Sessionization as a custom stateful streaming operator
    (applyInPandasWithState): emits CLOSED sessions; open sessions close on
    processing-time timeout. STREAMING ONLY (Spark restricts
    applyInPandasWithState to streams) — the batch equivalent is the
    lag+cumsum sessionize query (__spark_entry__.sessionize)."""
    gap_ms = _parse_duration_ms(gap)
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_ms),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _parse_duration_ms(s: str) -> int:
    n, unit = s.split()
    mult = {"millisecond": 1, "second": 1000, "minute": 60_000, "hour": 3_600_000}[
        unit.rstrip("s")
    ]
    return int(n) * mult
