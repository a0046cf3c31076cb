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
