"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (north-star T-extension; the streaming form
of E8 `sessionize_events`, plans/windows.py).

Built-in streaming covers time-window aggregation and key dedup; a
gap-based session — whose boundary depends on the *previous event of
the same key*, not on wall-clock windows — needs per-key state. The
operator keeps exactly one open session per user in the state store and
emits one row per session *touched* in each micro-batch (update-style
output: a session reappears with later end/count if a later batch
extends it; downstream keeps the latest row per (user_id,
session_start) — the same contract as update-mode aggregation).

Scale shape: state is O(active users) × one small tuple; each
micro-batch shuffles only on user_id (the groupBy key); event order
within a batch is restored in-memory per key (bounded by the trigger's
batch size, not the stream's length). GroupStateTimeout is event-
processing-based so idle keys do not leak state forever.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_MIN = 30

#: emitted per touched session (update semantics)
SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("session_value", DoubleType()),
    ]
)

#: state tuple: open session of this user
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """One user's micro-batch events + carried open session → session
    rows. Value sums are kept in integer cents so replay/merge order
    cannot drift floating point."""
    (user_id,) = key
    batches = list(pdfs)
    if not batches:
        yield pd.DataFrame({f.name: [] for f in SESSION_SCHEMA.fields})
        return
    events = pd.concat(batches, ignore_index=True)
    events = events.sort_values(["ts", "event_id"], kind="mergesort")

    if state.exists:
        start_us, end_us, n_events, value_cents = state.get
        sessions = [[start_us, end_us, n_events, value_cents]]
    else:
        sessions = []

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    for ts, value in zip(events["ts"], events["value"]):
        ts_us = int(ts.value // 1_000)  # pandas Timestamp ns → us
        cents = int(round(float(value) * 100))
        if sessions and ts_us - sessions[-1][1] <= gap_us:
            cur = sessions[-1]
            # a cross-batch late event may precede the open session's
            # start: the session must extend backwards too, or the
            # emitted [start, end] interval excludes a counted event
            cur[0] = min(cur[0], ts_us)
            cur[1] = max(cur[1], ts_us)
            cur[2] += 1
            cur[3] += cents
        else:
            sessions.append([ts_us, ts_us, 1, cents])

    # last session stays open in state; all touched sessions are emitted
    state.update(tuple(sessions[-1]))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": [pd.Timestamp(s[0], unit="us") for s in sessions],
            "session_end": [pd.Timestamp(s[1], unit="us") for s in sessions],
            "n_events": [s[2] for s in sessions],
            "session_value": [s[3] / 100.0 for s in sessions],
        }
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Attach the stateful sessionizer to a streaming events frame
    (columns: user_id, event_id, ts, value)."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            # NoTimeout: these queries run bounded (availableNow); a
            # 24/7 deployment would use EventTimeTimeout + watermark to
            # evict idle users' open sessions
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
