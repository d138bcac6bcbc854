"""Custom stateful streaming operator — applyInPandasWithState (B8).

Running per-user purchase totals: the canonical "custom aggregate the
built-in windows can't express" (cross-batch running state emitted per
micro-batch, with an optional inactivity-timeout flush). State is one small
tuple per user — bounded by key cardinality, the same state-size discipline
as the watermarked windows.

Timeout semantics note (learned the hard way): ProcessingTimeTimeout makes a
trigger(availableNow) run WAIT for wall-clock to advance before it can
retire timed-out state, so replay-style runs hang until the timeout elapses.
Default is therefore NoTimeout (replay/batch parity); pass `timeout_ms` only
in continuously-running deployments where inactivity flushes are wanted.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_purchases bigint, total_value double, flushed boolean"
)
STATE_SCHEMA = "n bigint, total double"


def running_purchase_totals(
    events: DataFrame, timeout_ms: int | None = None
) -> DataFrame:
    """events stream -> one row per user per micro-batch with the running
    (count, total). With `timeout_ms`, a user going quiet for that long gets
    a final flushed=true row and their state cleared."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if timeout_ms is not None and state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "n_purchases": n, "total_value": total, "flushed": True}]
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            purchases = pdf[pdf["event_type"] == "purchase"]
            n += len(purchases)
            total += float(purchases["value"].sum())
        state.update((n, total))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [{"user_id": user_id, "n_purchases": n, "total_value": total, "flushed": False}]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
