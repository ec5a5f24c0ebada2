"""Custom stateful streaming operator #2: ordered-funnel depth per
user via applyInPandasWithState (§2.10 breadth, like sessionize.py).

Semantics match operators/funnel.py exactly: a user's depth is the
longest prefix of `steps` present as a strictly-increasing-timestamp
subsequence of their events. A row (user_id, depth, reached_ts) is
emitted once the event-time watermark passes the user's last relevant
event + horizon — i.e. when no in-watermark late event can still
change the answer.

Late-data correctness is the interesting part: the greedy frontier is
ORDER-SENSITIVE — a late event with an early timestamp can lower an
earlier step's frontier and unlock matches the already-advanced state
had rejected. The state therefore keeps, per step, the sorted
candidate times (not just the running frontier), re-running the
greedy on every batch. The lists are pruned with the one rule that is
safe under arbitrary in-watermark lateness: once the greedy CHOOSES
time f_i for step i, any candidate > f_i for that step can never be
chosen later (earlier frontiers only ever move DOWN as new events
arrive, so each step's viable region only grows downward and min()
only decreases) — so lists stay bounded by the churn below the
frontier, not the event count.

`greedy_depth` is the shared pure-Python core (state update AND the
pytest oracle), mirroring the extractor's shared-module pattern.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("depth", IntegerType(), False),
        StructField("reached_ts", TimestampType(), True),
    ]
)

# state: per-step sorted candidate times (ms) + last event ms
STATE_SCHEMA = StructType(
    [
        StructField("times", ArrayType(ArrayType(LongType())), False),
        StructField("last_ms", LongType(), False),
    ]
)


def greedy_depth(times: list[list[int]]) -> tuple[int, int | None]:
    """(depth, frontier_ms_of_deepest_step). times[i] = candidate ms
    for step i (any order). Greedy earliest-valid == exists-ordered-
    subsequence (exchange argument, pinned in operators/funnel)."""
    t = None
    depth = 0
    for cand in times:
        viable = [x for x in cand if t is None or x > t]
        if not viable:
            break
        t = min(viable)
        depth += 1
    return depth, t


def _prune(times: list[list[int]]) -> list[list[int]]:
    """Keep each step's candidates that could still be chosen: all
    candidates <= the step's currently chosen frontier (chosen values
    only decrease as earlier frontiers decrease); unreached steps keep
    everything."""
    t = None
    broken = False
    out = []
    for cand in times:
        cand = sorted(set(cand))
        if broken:
            # past the first unreached step nothing is choosable YET —
            # any candidate may become viable when earlier frontiers
            # improve, so keep everything
            out.append(cand)
            continue
        viable = [x for x in cand if t is None or x > t]
        if viable:
            f = min(viable)
            out.append([x for x in cand if x <= f])
            t = f
        else:
            out.append(cand)
            broken = True
    return out


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    horizon_s: float = 3600.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming DF (ts timestamp, user_id long, event_type string) →
    (user_id, depth, reached_ts) emitted at event-time timeout
    (watermark past last relevant event + horizon_s). Only events
    whose type is in `steps` reach the state (pre-filtered)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    step_idx = {s: i for i, s in enumerate(steps)}

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            times, _last = state.get
            depth, t = greedy_depth([list(l) for l in times])
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "depth": [depth],
                    "reached_ts": [
                        pd.Timestamp(t, unit="ms") if t is not None else pd.NaT
                    ],
                }
            )
            return
        if state.exists:
            stored, last_ms = state.get
            times = [list(l) for l in stored]
        else:
            times = [[] for _ in steps]
            last_ms = 0
        for pdf in pdfs:
            for ts, typ in zip(pdf["ts"], pdf["event_type"]):
                ms = int(pd.Timestamp(ts).value // 10**6)
                times[step_idx[typ]].append(ms)
                last_ms = max(last_ms, ms)
        times = _prune(times)
        state.update((times, int(last_ms)))
        state.setTimeoutTimestamp(int(last_ms) + int(horizon_s * 1000))

    from pyspark.sql import functions as F

    prepared = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .where(F.col("event_type").isin(list(steps)))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
    )
    return prepared.applyInPandasWithState(
        update,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
