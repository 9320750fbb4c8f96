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


DIVERSITY_OUT = (
    "user_id bigint, n_events bigint, n_types int,"
    " gini_simpson double, inv_simpson double"
)
DIVERSITY_STATE = "types array<string>, counts array<bigint>"


def _update_diversity(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    counts: dict[str | None, int] = {}
    if state.exists:
        types, ns = state.get
        counts = {t: int(c) for t, c in zip(types, ns)}
    for pdf in pdfs:
        # dropna=False: the batch twin's groupBy keeps NULL event_type
        # as its own group, so the stream must too (a null key round-
        # trips the array<string> state as a null element)
        for t, c in pdf["event_type"].value_counts(dropna=False).items():
            t = None if pd.isna(t) else t
            counts[t] = counts.get(t, 0) + int(c)
    state.update((list(counts), [counts[t] for t in counts]))
    n = sum(counts.values())
    s2 = sum(c * c for c in counts.values())
    if s2 == 0:  # no events ever ingested for this key: nothing to say
        return
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "n_types": [len(counts)],
            "gini_simpson": [(n * n - s2) / (n * n)],
            "inv_simpson": [(n * n) / s2],
        }
    )


def running_user_diversity(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``olap_event_diversity`` query (r12):
    per-user event-type counts live in the state store as parallel
    (type, count) arrays — exact integers, unbounded history — and each
    micro-batch emits the user's UPDATED Gini-Simpson / inverse-Simpson
    diversity (update semantics). The divisions happen only at emit
    time over exact integer moments, so after any batch split the
    emitted row for a user equals the batch query over everything
    ingested so far (pinned in tests)."""
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_diversity,
            outputStructType=DIVERSITY_OUT,
            stateStructType=DIVERSITY_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SESSION_OUT = (
    "user_id bigint, session_start_us bigint,"
    " session_end_us bigint, n_events bigint"
)
# List-valued state (r11): EVERY session not yet provably final stays
# in state — the open one AND any gap-closed predecessors the watermark
# has not passed. A session [s, l] is emitted only once the watermark
# exceeds l + gap: from then on no admissible event (ts >= watermark)
# can merge into it, so emission is exactly-once AND correct under any
# late-but-in-watermark arrival order. This removes the r10 inline-
# close anomaly (an already-emitted session receiving a still-later
# in-watermark event) and the ADVICE r10 crash class (storing a
# timeout at or behind the current watermark): anything whose timeout
# would not be in the future is emitted immediately instead.
SESSION_STATE = (
    "starts array<bigint>, lasts array<bigint>, ns array<bigint>"
)


def _update_sessions(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int = 1_800_000_000,
) -> Iterator[pd.DataFrame]:
    # Fold the held sessions and the batch's events together as
    # INTERVALS (event t = [t, t, 1], session = [start, last, n]) and
    # sweep in start order — late-but-in-watermark data is correct in
    # both directions: an event within gap BEFORE a held start extends
    # it backward (start = min), one more than gap before it forms its
    # own earlier session. On a timeout invocation pdfs is empty and
    # this reduces to re-evaluating the held sessions against the
    # advanced watermark.
    iv = [(int(t), int(t), 1) for pdf in pdfs for t in pdf["ts_us"]]
    if state.exists:
        iv.extend(
            (int(s), int(l), int(n)) for s, l, n in zip(*state.get)
        )
    iv.sort()
    merged: list[list[int]] = []
    for s2, l2, n2 in iv:
        if merged and s2 - merged[-1][1] <= gap_us:
            merged[-1][1] = max(merged[-1][1], l2)
            merged[-1][2] += n2
        else:
            merged.append([s2, l2, n2])
    # A session is final iff watermark (ms) strictly exceeds every µs
    # instant that could still merge into it: last + gap < wm * 1000.
    wm_us = state.getCurrentWatermarkMs() * 1000
    rows = [
        (key[0], s, l, n) for s, l, n in merged if l + gap_us < wm_us
    ]
    keep = [t for t in merged if t[1] + gap_us >= wm_us]
    if keep:
        state.update(
            (
                [t[0] for t in keep],
                [t[1] for t in keep],
                [t[2] for t in keep],
            )
        )
        # EventTimeTimeout expects epoch MILLISECONDS; fire as soon as
        # the earliest held session can become final. keep guarantees
        # last + gap >= wm_us, so the timeout is strictly in the future.
        state.setTimeoutTimestamp(
            min(t[1] + gap_us for t in keep) // 1000 + 1
        )
    else:
        state.remove()
    yield pd.DataFrame(
        rows,
        columns=["user_id", "session_start_us", "session_end_us", "n_events"],
    )


def closed_user_sessions(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """CLOSED session emitter — the canonical ``applyInPandasWithState``
    + EventTimeTimeout shape the built-in ``session_window`` aggregate
    cannot express: a session row is emitted EXACTLY ONCE, when the
    WATERMARK passes its end + gap — the point after which no
    admissible event can extend or merge into it — giving the
    at-most-once downstream contract a billing/alerting consumer
    needs, vs. session_window's per-window aggregate updates. Emits
    (user_id, session_start_us, session_end_us, n_events), append mode.

    Late-but-in-watermark data is folded as intervals over the LIST of
    held sessions (r11): an event within gap BEFORE a held start
    extends it backward; one more than gap before it opens its own
    earlier session, held until the watermark finalizes it — so even a
    gap-closed session can still absorb later in-watermark stragglers
    before emission. Sessions still open when the stream pauses stay
    in the state store (RocksDB-backed on a cluster) and close on a
    later run — state is the operator's, not the trigger's. Input
    needs ``user_id`` + ``ts_utc`` (TIMESTAMP, the streaming reader's
    column); event time rides integer µs inside the operator."""
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


FUNNEL_OUT = "user_id bigint, level int"
FUNNEL_STATE = "types array<string>, uss array<bigint>"
_FUNNEL_WINDOW_US = 86_400_000_000  # 24h, matching olap_window_funnel


def _funnel_level(
    types: list, uss: list, window_us: int = _FUNNEL_WINDOW_US
) -> int:
    """Deepest signup→view→purchase chain strictly increasing in time
    and completing within ``window_us`` of the chain's signup — the
    exists-over-all-anchors semantics of the batch twin. For a fixed
    signup, the EARLIEST admissible view maximizes the remaining
    purchase interval, so one bisect per stage suffices (O(S log n)
    per user, no triple loop)."""
    import bisect

    sig = sorted(u for t, u in zip(types, uss) if t == "signup")
    if not sig:
        return 0
    views = sorted(u for t, u in zip(types, uss) if t == "view")
    purch = sorted(u for t, u in zip(types, uss) if t == "purchase")
    level = 1
    for t1 in sig:
        hi = t1 + window_us
        i = bisect.bisect_right(views, t1)
        if i < len(views) and views[i] <= hi:
            level = 2
            t2 = views[i]
            j = bisect.bisect_right(purch, t2)
            if j < len(purch) and purch[j] <= hi:
                return 3
    return level


def _update_funnel(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    types: list = []
    uss: list = []
    if state.exists:
        st, su = state.get
        types, uss = list(st), [int(x) for x in su]
    for pdf in pdfs:
        for t, u in zip(pdf["event_type"], pdf["us"]):
            if t in ("signup", "view", "purchase"):
                types.append(t)
                uss.append(int(u))
    state.update((types, uss))
    level = _funnel_level(types, uss)
    if level == 0:
        return  # never signed up: invisible, like the batch twin
    yield pd.DataFrame({"user_id": [key[0]], "level": [level]})


def running_window_funnel(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``olap_window_funnel`` query (r13):
    per-user funnel-relevant events accumulate in the state store as
    parallel (type, µs) arrays — recomputing the level from the full
    per-user history each batch makes the emission EXACT under any
    arrival order (levels are monotone in the event set, so the final
    emission per user equals the batch query; pinned in tests). State
    is bounded by funnel-relevant events per user, not stream length.
    """
    from pyspark.sql import functions as F

    return (
        events.select(
            "user_id",
            "event_type",
            F.unix_micros("ts_utc").alias("us"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=FUNNEL_OUT,
            stateStructType=FUNNEL_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
