"""Custom stateful streaming operator: per-user sessionization.

The reference has NO streaming operators (SURVEY §2.10) — this is a
beyond-parity extension: the incremental version of the batch
``events_sessionize`` query (queries/relational.py), built on
``applyInPandasWithState`` (Arrow-batched per-group state, the PySpark
primitive for custom stateful operators).

Semantics: events for one user belong to the same session while the gap
between consecutive events is ≤ 30 minutes.  An EVENT-time timeout
(watermark passes session_end + gap) flushes idle sessions — fully
deterministic, no wall clock — so state per user is O(1) (open-session
aggregate only, never the events) and total state is bounded by (active
users within the watermark horizon) — the 100 TB-safe shape.
Out-of-order rows within a micro-batch are handled by sorting the batch;
cross-batch reordering is bounded by the watermark delay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_seq", LongType()),
        StructField("n_events", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("total_value", DoubleType()),
    ]
)

# state row: (session_seq, n_events, start_us, end_us, total_value)
STATE_SCHEMA = StructType(
    [
        StructField("session_seq", LongType()),
        StructField("n_events", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds


def sessionize_stream(events: DataFrame, watermark_delay: str = "0 seconds") -> DataFrame:
    """events stream (ts, event_id, user_id, value) → closed sessions.

    Emits a session when a newer event proves it closed, or when the
    watermark passes session_end + gap (event-time timeout).  Grouping
    shuffles once on user_id; per-group state is one 5-field row.
    """
    gap_us = GAP_US

    # defined inline so cloudpickle ships it BY VALUE — executor python
    # workers don't have this package importable.
    def sessionize_group(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            seq, n, start_us, end_us, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_seq": [seq],
                    "n_events": [n],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "total_value": [total],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            seq, n, start_us, end_us, total = state.get
        else:
            seq, n, start_us, end_us, total = 0, 0, 0, 0, 0.0

        closed = []
        for ts, value in zip(rows["ts"], rows["value"]):
            ts_us = ts.value // 1000  # pandas ns → µs
            if n > 0 and ts_us - end_us > gap_us:
                closed.append((seq, n, start_us, end_us, total))
                seq, n, start_us, total = seq + 1, 0, ts_us, 0.0
            if n == 0:
                start_us = ts_us
            n += 1
            end_us = ts_us
            total += float(value)

        state.update((seq, n, start_us, end_us, total))
        # event-time timeout: fire once the watermark passes end + gap
        # (clamped above the current watermark, which may already have
        # advanced past it within this batch)
        timeout_ms = max(
            (end_us + gap_us) // 1000, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_seq": [c[0] for c in closed],
                    "n_events": [c[1] for c in closed],
                    "session_start": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[3], unit="us") for c in closed],
                    "total_value": [c[4] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
