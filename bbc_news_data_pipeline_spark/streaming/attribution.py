"""Custom stateful streaming operator: real-time last-touch attribution
with ``applyInPandasWithState`` (SURVEY ST-family extension; the batch
triple-model counterpart is plans/timeseries_plans.q239).

Semantics: per user, every non-purchase event updates a one-row "last
touch" state; every purchase event emits one attribution row crediting
the channel of the most recent prior touch (ties at the same timestamp
broken by event_id — the same total order the batch oracle uses), or
the literal ``'direct'`` when no touch precedes it.

Ordering contract: rows are processed in (ts, event_id) order WITHIN
each (user, micro-batch) group, and micro-batches are assumed
time-ordered per user (the standard in-order-per-key delivery of a
partitioned log; the availableNow drains in plans/streaming_plans.py
re-emit history in file order, and the cross-batch pytest feeds
time-split files with maxFilesPerTrigger=1). Violations are
OBSERVABLE, not silent (round-8 ADVICE fix): any row arriving with an
event time strictly before the state's stored last-touch time is
counted in a per-user ``ooo_count`` monotonicity counter, and every
emitted attribution row carries the cumulative count as ``ooo_seen``
— a downstream consumer (or test) asserting ``ooo_seen == 0`` proves
the in-order delivery contract held, while a replayed/misordered feed
shows up as a nonzero count instead of a silently diverged credit.

Scale notes: state is ONE fixed-width row per user ever seen — bounded
by user cardinality, not stream length, and never grows with event
volume (the contract that matters at 100 TB: no per-event state). The
grouping shuffle is on ``user_id``; emission is one row per purchase.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ATTR_SCHEMA = StructType(
    [
        StructField("conv_id", LongType()),
        StructField("channel", StringType()),
        StructField("value", DoubleType()),
        # cumulative count of out-of-order rows seen for this user — 0
        # whenever the in-order-per-key delivery contract held
        StructField("ooo_seen", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("last_id", LongType()),
        StructField("channel", StringType()),
        StructField("ooo_count", LongType()),
    ]
)


def _attribute_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch through the last-touch state; emit one
    row per purchase. Called once per (user, micro-batch)."""
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        state.remove()
        return

    stored = state.get if state.exists else None
    last = stored[:3] if stored is not None else None  # (last_us, last_id, channel)
    ooo = int(stored[3]) if stored is not None and stored[3] is not None else 0
    floor_us = last[0] if last is not None else None
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch["_us"] = batch["ts"].astype("datetime64[us]").astype("int64")
    # Monotonicity audit: rows ordered BEFORE the state's stored last
    # touch under the (ts, event_id) total order violate the cross-batch
    # in-order delivery contract — count them so a misordered replay is
    # observable downstream. Ties on ts compare event_id (round-8 ADVICE:
    # an equal-ts row with a smaller event_id is equally out of order).
    if floor_us is not None:
        ooo += int(
            (
                (batch["_us"] < floor_us)
                | ((batch["_us"] == floor_us) & (batch["event_id"] < last[1]))
            ).sum()
        )
    batch = batch.sort_values(["_us", "event_id"], kind="mergesort")

    out_id, out_ch, out_v = [], [], []
    for _us, eid, etype, value in zip(
        batch["_us"], batch["event_id"], batch["event_type"], batch["value"]
    ):
        if etype == "purchase":
            out_id.append(int(eid))
            out_ch.append(last[2] if last is not None else "direct")
            out_v.append(float(value))
        else:
            last = (int(_us), int(eid), str(etype))
    if last is not None:
        state.update(last + (ooo,))
    yield pd.DataFrame(
        {
            "conv_id": out_id,
            "channel": out_ch,
            "value": out_v,
            "ooo_seen": [ooo] * len(out_id),
        }
    )


def attribute_stream(events: DataFrame) -> DataFrame:
    """Streaming last-touch attribution: one output row per purchase.

    Input schema: event_id, ts, user_id, event_type, value (the events
    table). State: one (last_us, last_id, channel) row per user.
    """
    return (
        events.select("event_id", "ts", "user_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _attribute_group,
            outputStructType=ATTR_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
