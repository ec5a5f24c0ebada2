"""Custom stateful streaming operator #2: ordered-funnel depth per
user via applyInPandasWithState (§2.10 breadth, like sessionize.py).

SESSIONIZED funnel semantics: within one activity span, a user's
depth is the longest prefix of `steps` present as a strictly-
increasing-timestamp subsequence of their events — exactly
operators/funnel.py's rule. A row (user_id, depth, reached_ts) is
emitted once the event-time watermark passes the user's last relevant
event + horizon_s; the state is then cleared, so a user who reappears
AFTER such a gap starts a fresh funnel and emits again (one row per
activity span, like sessionize emits one row per session). The batch
operator is the infinite-horizon case: streaming == batch exactly
when each user's relevant events fall within one horizon-bounded span
(the shape the equivalence pytest pins); across spans the streaming
answer is per-span by design, not a bug.

Late-data correctness is the interesting part: the greedy frontier is
ORDER-SENSITIVE — a late event with an early timestamp can lower an
earlier step's frontier and unlock matches the already-advanced state
had rejected. The state therefore keeps, per step, the sorted
candidate times (not just the running frontier), re-running the
greedy on every batch. Two prune rules, both safe under arbitrary
in-watermark lateness:

1. once the greedy CHOOSES time f_i for step i, any candidate > f_i
   for that step can never be chosen later (earlier frontiers only
   ever move DOWN as new events arrive, so each step's viable region
   only grows downward and min() only decreases);
2. at steps AFTER the first EMPTY step at-or-after the break point,
   candidates <= the current watermark can never be chosen: the empty
   step can only be filled by a future event, future events carry
   ts >= watermark, and the later step's chosen time must strictly
   exceed that ts. Two refinements make this bound tight for EVERY
   broken chain (not only chains broken at an empty step): (a) a
   break step holding only non-viable candidates (all <= frontier t)
   counts as empty once wm >= t — reviving such a candidate needs an
   earlier frontier to drop below it, which (chasing the frontier
   chain down to step 0, where stored candidates are all <= their
   step's frontier <= t by rule 1) requires a NEW event with ts < t,
   forbidden by the watermark; (b) a post-break step whose candidates
   were ALL watermark-pruned counts as empty for the steps after it.
   Together these bound state for users doing later steps without an
   earlier one (endless clicks, no view), which rule 1 alone would
   keep forever.

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


def _prune(
    times: list[list[int]], wm_ms: int | None = None
) -> list[list[int]]:
    """Keep each step's candidates that could still be chosen (module
    docstring rules 1 and 2). wm_ms is the current event-time
    watermark; None disables rule 2 (kept permissive for tests)."""
    t = None
    broken = False
    seen_empty = False
    out = []
    for cand in times:
        cand = sorted(set(cand))
        if broken:
            if seen_empty and wm_ms is not None:
                # rule 2: choosable only via a future (>= wm) event at
                # the empty step, so anything <= wm is dead weight
                cand = [x for x in cand if x > wm_ms]
            out.append(cand)
            if not cand:
                # an empty (or fully-pruned) step at-or-after the break
                # arms rule 2 for every later step, even when the break
                # step itself still holds non-viable candidates
                seen_empty = True
            continue
        viable = [x for x in cand if t is None or x > t]
        if viable:
            f = min(viable)
            out.append([x for x in cand if x <= f])
            t = f
        else:
            if cand and wm_ms is not None and t is not None and wm_ms >= t:
                # break step holds only non-viable candidates (all <= t).
                # Reviving one needs an earlier frontier to drop below it,
                # which (chasing the frontier chain down to step 0) needs a
                # NEW event with ts < t; the watermark forbids ts < wm, so
                # with wm >= t they are dead — the step is effectively
                # empty and rule 2 arms for the later steps
                cand = []
            out.append(cand)
            broken = True
            seen_empty = not cand
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
        try:
            wm = state.getCurrentWatermarkMs()
        except Exception:  # no watermark configured
            wm = None
        times = _prune(times, wm_ms=wm if wm else None)
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
