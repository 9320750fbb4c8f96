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


SESSION_OUT = (
    "user_id bigint, session_start_us bigint,"
    " session_end_us bigint, n_events bigint"
)
SESSION_STATE = "start_us bigint, last_us bigint, n bigint"


def _update_sessions(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int = 1_800_000_000,
) -> Iterator[pd.DataFrame]:
    rows = []
    if state.hasTimedOut:
        # watermark passed last_seen + gap with no new events: the
        # session is definitively closed — emit and clear
        if state.exists:
            s, l, n = state.get
            rows.append((key[0], s, l, n))
        state.remove()
    else:
        # Fold the stored session and the batch's events together as
        # INTERVALS (event t = [t, t, 1], state = [start, last, n]) and
        # sweep in start order. This makes late-but-in-watermark data
        # correct in both directions (ADVICE r9): an event within gap
        # BEFORE the stored start extends the session backward
        # (start = min), and an event more than gap before it forms its
        # own earlier session — closed inline here, because the stored
        # session is its gap-exceeding successor. (As with any inline
        # close, an even later batch could in principle carry an event
        # belonging to an already-emitted session; holding every closed
        # session until the watermark passes would need list-valued
        # state — out of scope for this single-session-state operator.)
        iv = [
            (int(t), int(t), 1) for pdf in pdfs for t in pdf["ts_us"]
        ]
        if state.exists:
            iv.append(tuple(state.get))
        iv.sort()
        cur: list[int] | None = None
        for s2, l2, n2 in iv:
            if cur is None:
                cur = [s2, l2, n2]
            elif s2 - cur[1] > gap_us:
                rows.append((key[0], cur[0], cur[1], cur[2]))
                cur = [s2, l2, n2]
            else:
                cur[1] = max(cur[1], l2)
                cur[2] += n2
        if cur is not None:
            state.update((cur[0], cur[1], cur[2]))
            # EventTimeTimeout expects epoch MILLISECONDS
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_us // 1000)
    yield pd.DataFrame(
        rows,
        columns=["user_id", "session_start_us", "session_end_us", "n_events"],
    )


def closed_user_sessions(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """CLOSED session emitter — the canonical ``applyInPandasWithState``
    + EventTimeTimeout shape the built-in ``session_window`` aggregate
    cannot express: a session row is emitted EXACTLY ONCE, either when
    a later event arrives past the gap (inline close) or when the
    WATERMARK passes last_seen + gap with no successor (timeout close)
    — the at-most-once downstream contract a billing/alerting consumer
    needs, vs. session_window's per-window aggregate updates. Emits
    (user_id, session_start_us, session_end_us, n_events), append mode.

    Late-but-in-watermark data is folded as intervals (r10): an event
    within gap BEFORE the stored session start extends it backward;
    an event more than gap before it opens its own earlier session,
    closed inline. Sessions still open when the stream pauses stay in
    the state store (RocksDB-backed on a cluster) and close on a later
    run — state is the operator's, not the trigger's. Input needs
    ``user_id`` +
    ``ts_utc`` (TIMESTAMP, the streaming reader's column); event time
    rides integer µs inside the operator."""
    import functools

    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts_utc", watermark)
        .select(
            "user_id", F.unix_micros("ts_utc").alias("ts_us"), "ts_utc"
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            functools.partial(
                _update_sessions, gap_us=gap_seconds * 1_000_000
            ),
            outputStructType=SESSION_OUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
