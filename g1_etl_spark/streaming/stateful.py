"""Custom stateful streaming operator via applyInPandasWithState —
the escape hatch for semantics windowed aggregation can't express
(running per-key counters with timeout-driven emission).

Pattern: groupBy(key).applyInPandasWithState(fn, outputSchema,
stateSchema, outputMode, timeoutConf). State lives per key in the state
store; the watermark/timeout bounds it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = ("user_id long, total_events long, total_value double, "
               "batch_events long")
_STATE_SCHEMA = "total_events long, total_value double"


def _update_user_totals(key, pdfs: Iterator[pd.DataFrame],
                        state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    total_events, total_value = (
        state.get if state.exists else (0, 0.0))
    batch_events = 0
    for pdf in pdfs:
        batch_events += len(pdf)
        total_events += len(pdf)
        total_value += float(pdf["value"].sum())
    state.update((total_events, total_value))
    yield pd.DataFrame({
        "user_id": [user_id],
        "total_events": [total_events],
        "total_value": [total_value],
        "batch_events": [batch_events],
    })


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals across micro-batches (arbitrary stateful
    processing; emits one row per user per batch)."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_user_totals,
                outputStructType=_OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_OUT = "user_id long, funnel_depth int, t1_us long, t2_us long, t3_us long"
_FUNNEL_STATE = "depth int, t1 long, t2 long, t3 long"


def _advance_funnel(key, pdfs, state):
    """Per-user funnel state machine: step k+1 counts only when its
    event arrives strictly after step k's recorded time (same ordering
    rule as the batch events_funnel plan). Progress is monotone, so
    state is four scalars per user regardless of event volume."""
    import pandas as pd

    (user_id,) = key
    depth, t1, t2, t3 = state.get if state.exists else (0, None, None, None)
    rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values("us")
        for etype, us in zip(pdf["event_type"], pdf["us"]):
            us = int(us)
            if depth == 0 and etype == _FUNNEL_STEPS[0]:
                depth, t1 = 1, us
            elif depth == 1 and etype == _FUNNEL_STEPS[1] and us > t1:
                depth, t2 = 2, us
            elif depth == 2 and etype == _FUNNEL_STEPS[2] and us > t2:
                depth, t3 = 3, us
    state.update((depth, t1, t2, t3))
    rows.append({"user_id": user_id, "funnel_depth": depth,
                 "t1_us": t1, "t2_us": t2, "t3_us": t3})
    yield pd.DataFrame(rows)


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch events_funnel: per-user view->click->
    purchase progression maintained across micro-batches with
    applyInPandasWithState (one depth/timestamps tuple per user; emits
    the current funnel row for each user seen in the batch).

    Caveat vs batch: the batch plan takes the EARLIEST qualifying chain;
    the streaming state machine advances greedily in arrival order, so
    on in-order streams (or per-batch sorted input, as here) the depths
    agree but intermediate timestamps may differ when a user re-enters
    a step — acceptable for monitoring, and asserted against the batch
    plan's depths in tests.
    """
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"))
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _advance_funnel,
                outputStructType=_FUNNEL_OUT,
                stateStructType=_FUNNEL_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
