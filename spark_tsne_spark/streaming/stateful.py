"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windowed/session aggregations (``streaming/windows.py``)
cover the declarative cases; this module is the engine's escape hatch
for arbitrary per-key streaming state — the Structured Streaming
analogue of the reference's driver-held iteration state. The operator
below keeps a running per-user aggregate with an event-time timeout:
state lives per key in the state store, is updated Arrow-batch-at-a-
time, and is finalized (emitted + removed) when the watermark passes
the inactivity deadline.

Scale notes: state is keyed (hash-partitioned) so it shards across
executors; the watermark bounds both state size and timeout firing;
Arrow batching keeps the Python boundary cheap.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, finalized boolean"
)
STATE_SCHEMA = "n long, s double"


def running_user_stats(
    events: DataFrame,
    watermark: str = "2 hours",
    inactivity_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Per-user running (count, Σvalue) with event-time finalization.

    Emits a running row per key per micro-batch (``finalized=false``)
    and a final row when the key times out (``finalized=true``), after
    which its state is dropped — the custom-operator twin of a session
    aggregation, demonstrating arbitrary user state where the built-in
    operators don't fit.
    """

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "sum_value": [s],
                    "finalized": [True],
                }
            )
            return
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(wm, 0) + inactivity_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [s],
                "finalized": [False],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
