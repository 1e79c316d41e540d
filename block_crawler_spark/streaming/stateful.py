"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's extension point is "implement a Consumer and register it on
the bus" (SURVEY §2.10); the Structured Streaming analog for *stateful*
consumers is ``applyInPandasWithState``: per-key state that survives across
micro-batches with explicit timeout control.

``running_user_stats`` keeps a running (n_events, total_value_cents,
last_event_id) per user over an events stream — the streaming form of the
``evt_token_state_fold`` batch query, and the pattern any incremental
entity-state consumer (e.g. a per-collection floor-price tracker) follows.
Values are tracked in integer cents so state never accumulates float error.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("total_cents", LongType(), False),
        StructField("last_event_id", LongType(), False),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_cents", LongType(), False),
        StructField("last_event_id", LongType(), False),
    ]
)


def _update_user(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key
    n, total, last = state.get if state.exists else (0, 0, -1)
    for pdf in pdfs:
        n += len(pdf)
        total += int(round(pdf["value"].astype(float).mul(100).round()).sum())
        last = max(last, int(pdf["event_id"].max()))
    state.update((n, total, last))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "total_cents": total, "last_event_id": last}]
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running stats with cross-batch state (update output mode)."""
    return (
        events_stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
