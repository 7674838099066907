"""Custom stateful streaming operators (applyInPandasWithState).

Beyond-reference §2.J extension: arbitrary per-key state machines over
the event stream — the Structured Streaming path for logic windowed
aggregates can't express (running distinct-ish counters, decayed
scores, per-user rate limits).

State is per-key and partition-local (Spark shuffles by key first);
memory is bounded by (keys × state size) per executor, and GroupState
timeouts evict idle keys — the knobs that keep this runnable on an
unbounded 100 TB stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_stats(
    events: DataFrame,
    user_column: str = "user_id",
    value_column: str = "value",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Running per-user (n_events, sum_value, max_value) maintained in
    GroupState; emits the updated row per micro-batch.

    ``idle_timeout_ms`` evicts idle users via processing-time timeout.
    NB processing-time timeouts make the scheduler fire timeout-only
    micro-batches, so ``processAllAvailable`` no longer quiesces —
    production queries with timeouts should use ``awaitTermination``;
    leave ``None`` for bounded replays/tests."""
    out_schema = f"{user_column} long, n_events long, sum_value double, max_value double"
    state_schema = "n long, s double, m double"
    with_timeout = idle_timeout_ms is not None

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if with_timeout and state.hasTimedOut:
            state.remove()
            return
        n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in batches:
            vals = pdf[value_column].dropna()
            n += len(pdf)
            s += float(vals.sum())
            if len(vals):
                m = max(m, float(vals.max()))
        state.update((n, s, m))
        if with_timeout:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                user_column: [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "max_value": [m if m != float("-inf") else None],
            }
        )

    return (
        events.groupBy(user_column)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if with_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
