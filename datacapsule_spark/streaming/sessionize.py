"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState (the SURVEY §2.10 "custom stateful operator"
slot — the reference has no streaming, so this is engine breadth for
incremental pipelines, not reference parity).

Semantics: per user, events closer than `gap` seconds chain into one
session; a watermark-driven timeout flushes a session once no event
can extend it. Emits one row per closed session:
(user_id, session_start, session_end, n_events, total_value).

The same pure-Python fold (`_fold_session`) is used by the batch
oracle in tests, mirroring the shared-module pattern of the extractor.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_events", IntegerType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)

# state: (start_ms, end_ms, n_events, total_value)
STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType(), False),
        StructField("end_ms", LongType(), False),
        StructField("n", IntegerType(), False),
        StructField("total", DoubleType(), True),
    ]
)


def fold_sessions(events: list[tuple[int, float]], gap_s: float) -> list[tuple]:
    """Pure-Python oracle: events = [(ts_ms, value)] sorted → closed
    sessions [(start_ms, end_ms, n, total)]. Shared with tests."""
    sessions = []
    cur = None
    for ts, v in sorted(events):
        if cur is None:
            cur = [ts, ts, 1, v or 0.0]
        elif ts - cur[1] <= gap_s * 1000:
            cur[1] = ts
            cur[2] += 1
            cur[3] += v or 0.0
        else:
            sessions.append(tuple(cur))
            cur = [ts, ts, 1, v or 0.0]
    if cur is not None:
        sessions.append(tuple(cur))
    return sessions


def sessionize(events: DataFrame, gap_s: float = 1800.0) -> DataFrame:
    """Streaming DF (ts timestamp, user_id long, value double) →
    closed-session stream. Requires a watermark upstream; sessions
    close via event-time timeout = watermark + gap."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, end_ms, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                }
            )
            return
        rows: list[tuple[int, float]] = []
        for pdf in pdfs:
            for ts, v in zip(pdf["ts"], pdf["value"]):
                rows.append((int(pd.Timestamp(ts).value // 10**6), float(v or 0.0)))
        if state.exists:
            start_ms, end_ms, n, total = state.get
            rows.append((end_ms, 0.0))  # seed continuity marker
            folded = fold_sessions(rows, gap_s)
            # merge the seed back: first folded session containing end_ms
            out = []
            for s in folded:
                if s[0] <= end_ms <= s[1]:
                    out.append(
                        (min(start_ms, s[0]), s[1], n + s[2] - 1, total + s[3])
                    )
                else:
                    out.append(s)
            folded = out
        else:
            folded = fold_sessions(rows, gap_s)
        # all but the last session are closed; the last stays in state
        closed, live = folded[:-1], folded[-1]
        state.update((int(live[0]), int(live[1]), int(live[2]), float(live[3])))
        state.setTimeoutTimestamp(int(live[1]) + int(gap_s * 1000))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s[0], unit="ms") for s in closed],
                    "session_end": [pd.Timestamp(s[1], unit="ms") for s in closed],
                    "n_events": [s[2] for s in closed],
                    "total_value": [round(s[3], 6) for s in closed],
                }
            )

    from pyspark.sql import functions as F

    prepared = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy("user_id")
    )
    return prepared.applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
