"""Custom stateful streaming operator via ``applyInPandasWithState``:
arbitrary per-key state the built-in windowed/session aggregations
can't express (running counters, custom eviction, ML feature state).

The example operator keeps a running (count, value-cents) total per
user across micro-batches and emits the updated total each batch —
the streaming twin of ``groupBy(user).agg(count, sum)``, with state
explicitly owned by the operator. At scale, state lives in the state
store (RocksDB-backed on a real cluster), partitioned by key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_cents bigint"
STATE_SCHEMA = "n bigint, cents bigint"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100).fillna(0).astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals with explicit state; emits the current
    total for every user seen in each micro-batch (update semantics)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
