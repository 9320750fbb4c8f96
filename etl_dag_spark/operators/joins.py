"""Time-series join operators Spark lacks as built-ins: as-of join and
range (interval) join.

As-of join — "for each left row, the latest right row at or before its
timestamp, per key" — is composed from a union + one window pass:
tag both sides, sort each key group by (time, side), and carry the last
non-null right payload forward. That is ONE shuffle by key and one
sort — the canonical distributed formulation (a per-key merge of two
time-sorted streams), with none of the O(left × right) blowup of a
naive inequality join. At 100 TB both sides shuffle-partition on the
key and each group streams through sorted — skew on hot keys is
handled by AQE.

Range join stays a plain equi-join on the key with the interval
predicate as a post-join filter — Catalyst evaluates it inside the
sort-merge join, so the cost is the equi-join's, not a cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def join_dim(
    fact: DataFrame,
    dim: DataFrame,
    cond: Column | str | list[str],
    *,
    bounded: bool,
    how: str = "inner",
) -> DataFrame:
    """Join a fact frame to a dimension, broadcasting ONLY when the
    dimension is *provably bounded* — its row count independent of data
    scale (nation, region, a generated date dim, a fixed country map,
    a top-k/HAVING-survivor frame, per-partition offset rows).

    An explicit ``F.broadcast()`` hint BYPASSES Spark's size check: on
    a table that grows with scale factor (part, customer, supplier, a
    distinct-key set of a fact column) the plan does not degrade to
    sort-merge at 100 TB — it OOMs the executors. For those sides pass
    ``bounded=False`` and leave the strategy to the optimizer: statistics
    plus AQE still choose broadcast whenever the side actually fits
    (``spark.sql.autoBroadcastJoinThreshold``), and fall back to
    shuffle join when it does not. ``tests/test_plans.py``
    (test_no_broadcast_hint_on_scaled_tables) asserts no registered plan
    hints an SF-scaled scan.
    """
    return fact.join(F.broadcast(dim) if bounded else dim, cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_order: str | None = None,
) -> DataFrame:
    """For every left row: the right row with the greatest ``right_ts``
    ≤ ``left_ts`` in the same ``key`` group (backward as-of join, the
    DuckDB/pandas ``merge_asof`` default). Left rows with no earlier
    right row keep NULL payloads.

    ``right_order`` breaks ties among right rows sharing a timestamp
    (the greatest value wins); pass a unique id for determinism.

    Returns all of ``left``'s columns plus ``payload_cols``.
    """
    left_cols = left.columns  # must include ``key``; right shares the name
    l2 = left.select(
        *left_cols,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__ord"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
    )
    r2 = right.select(
        *[
            F.col(key).alias(c)
            if c == key
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        (F.col(right_order) if right_order is not None else F.lit(0))
        .cast("long")
        .alias("__ord"),
        *payload_cols,
    )
    unioned = l2.unionByName(r2)
    # right rows sort before left rows at equal __t (0 < 1) → "at or
    # before" is inclusive; __ord breaks right-side timestamp ties
    w = (
        Window.partitionBy(key)
        .orderBy("__t", "__is_left", "__ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left_cols,
        "__is_left",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    return carried.where(F.col("__is_left") == 1).drop("__is_left")


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_order: str | None = None,
) -> DataFrame:
    """For every left row: the right row NEAREST in time (either
    direction) in the same ``key`` group — the sensor-fusion variant of
    :func:`asof_join` (kdb's ``aj`` is backward-only; aligning two
    irregular instrument feeds wants nearest-in-absolute-time).
    Ties at equal |Δt| prefer the EARLIER (backward) right row; among
    right rows sharing a timestamp, backward picks the greatest
    ``right_order``, forward the least (deterministic both ways).

    Returns ``left``'s columns + ``payload_cols`` + ``__delta``
    (matched ``right_ts`` − ``left_ts``, signed; NULL when the key
    group has no right rows at all).

    Scale shape: the same ONE union + ONE key-partitioned window sort
    as asof_join — the backward candidate is ``last(ignorenulls)``
    over the preceding frame and the forward candidate
    ``first(ignorenulls)`` over the following frame of the SAME sort
    (CollapseWindow: one sort, two frames), then a per-row arbitration
    expression. Never a range/cross join — heavy-key users cost
    O(rows log rows), not O(rows²)."""
    left_cols = left.columns
    l2 = left.select(
        *left_cols,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__ord"),
        F.lit(None).cast("long").alias("__rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
    )
    r2 = right.select(
        *[
            F.col(key).alias(c)
            if c == key
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        (F.col(right_order) if right_order is not None else F.lit(0))
        .cast("long")
        .alias("__ord"),
        F.col(right_ts).cast("long").alias("__rt"),
        *payload_cols,
    )
    unioned = l2.unionByName(r2)
    # right(0) sorts before left(1) at equal __t → an exactly-equal
    # timestamp lands in the BACKWARD frame (Δ = 0)
    order = [F.col("__t"), F.col("__is_left"), F.col("__ord")]
    wb = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        *left_cols,
        "__t",
        "__is_left",
        F.last("__rt", ignorenulls=True).over(wb).alias("__bt"),
        F.first("__rt", ignorenulls=True).over(wf).alias("__ft"),
        *[F.last(c, ignorenulls=True).over(wb).alias(f"__b_{c}") for c in payload_cols],
        *[F.first(c, ignorenulls=True).over(wf).alias(f"__f_{c}") for c in payload_cols],
    ).where(F.col("__is_left") == 1)
    bd = F.col("__t").cast("long") - F.col("__bt")  # ≥ 0
    fd = F.col("__ft") - F.col("__t").cast("long")  # > 0
    use_back = F.col("__bt").isNotNull() & (
        F.col("__ft").isNull() | (bd <= fd)
    )
    return carried.select(
        *left_cols,
        *[
            F.when(use_back, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")).alias(c)
            for c in payload_cols
        ],
        F.when(use_back, -bd)
        .otherwise(F.when(F.col("__ft").isNotNull(), fd))
        .cast("long")
        .alias("__delta"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    ts_right: str,
    lower: Column,
    upper: Column,
    how: str = "left",
) -> DataFrame:
    """Join right rows whose ``ts_right`` falls in [lower, upper) of the
    matching left row (interval containment per key)."""
    cond = (
        (F.col(key_left) == F.col(key_right))
        & (F.col(ts_right) >= lower)
        & (F.col(ts_right) < upper)
    )
    return left.join(right, cond, how)
