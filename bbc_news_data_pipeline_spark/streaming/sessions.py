"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY ST-family extension; the reference has
no streaming engine, and Spark has no built-in session operator with
arbitrary per-session aggregates — this is the canonical escape hatch).

Semantics match the batch sessionizer (plans/relational.q21): events of a
user belong to one session while consecutive gaps are ≤ ``gap_s``; a
larger gap (or state timeout) closes the session.

Scale notes: state is one row per OPEN session per user — bounded by
active-user cardinality, not stream length. The grouping shuffle is on
``user_id`` (the same key the batch window uses); event-time timeout via
the watermark closes idle sessions so state cannot leak. Batches arrive
as pandas DataFrames per user — per-group volume is bounded upstream by
the micro-batch trigger, not by total history.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _sessionize_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_s: int,
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch into open-session state; emit every
    CLOSED session. Called once per (user, micro-batch)."""
    (user_id,) = key

    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
        return

    ts_us = (
        pd.concat([pdf["ts"] for pdf in pdfs])
        .sort_values()
        .astype("datetime64[us]")  # normalize ns/us Arrow variants
        .astype("int64")
        .tolist()
    )
    if state.exists:
        start_us, last_us, n = state.get
        pending = ts_us
    else:
        start_us, last_us, n = ts_us[0], ts_us[0], 1
        pending = ts_us[1:]

    gap_us = gap_s * 1_000_000
    closed: list[tuple[int, int, int]] = []
    for t in pending:
        if t - last_us > gap_us:
            closed.append((start_us, last_us, n))
            start_us, last_us, n = t, t, 1
        else:
            last_us, n = t, n + 1

    state.update((start_us, last_us, n))
    state.setTimeoutTimestamp(last_us // 1000 + gap_s * 1000)  # ms epoch
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )


def sessionize_stream(events: DataFrame, gap_s: int = 1800, watermark: str = "1 hour") -> DataFrame:
    """events(user_id, ts, ...) stream → closed-session rows.

    Event-time timeout: a session closes ``gap_s`` after its last event
    once the watermark passes — identical closure rule to the batch
    ``lag(ts) > gap`` sessionizer.
    """

    def fn(key, pdfs, state):
        yield from _sessionize_group(key, pdfs, state, gap_s)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
