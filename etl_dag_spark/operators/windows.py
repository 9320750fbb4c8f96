"""Window/ranking/sessionization operators.

Covers the reference's BI window surface (BI_Questions.sql:12-24 RANK
top-N; :27-37 monthly trend) plus running totals, moving averages, and
gap-based sessionization.

Scale notes inline — the headline one: a global ``RANK() OVER (ORDER BY
…)`` is a single-partition sort, so top-N is computed with a
TakeOrderedAndProject threshold first and the rank window only runs on
the ≤N survivors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_with_rank(
    aggregated: DataFrame, amount_col: str, n: int = 5
) -> DataFrame:
    """Rows whose ``amount_col`` ranks in the global top-``n`` (ties
    included), with a ``top_rank`` column — reference BI question 2.

    Instead of a global window sort (one partition holding every
    customer), fetch the n-th largest value via orderBy().limit(n) —
    Spark plans that as TakeOrderedAndProject (per-partition heap +
    driver merge of n rows) — then filter to >= threshold and rank only
    the survivors (≤ n + ties rows).
    """
    kth = aggregated.select(amount_col).orderBy(F.col(amount_col).desc()).limit(n)
    threshold = kth.agg(F.min(amount_col).alias("__thr"))
    survivors = aggregated.join(F.broadcast(threshold)).where(
        F.col(amount_col) >= F.col("__thr")
    ).drop("__thr")
    w = Window.orderBy(F.col(amount_col).desc())
    return (
        survivors.withColumn("top_rank", F.rank().over(w).cast("int"))
        .where(F.col("top_rank") <= n)
    )


def month_key(col: Column | str) -> Column:
    """'yyyy-MM' wall-clock month bucket (portable across engines for
    naive timestamps)."""
    return F.date_format(col, "yyyy-MM")


def trailing_months_filter(df: DataFrame, ts_col: str, months: int = 12) -> DataFrame:
    """Keep rows in the trailing ``months`` calendar months ending at the
    month of the latest timestamp — the reference's trailing-12-month
    trend (BI_Questions.sql:34-35) made deterministic by anchoring at
    MAX(ts) instead of CURRENT_DATE.

    The anchor is a 1-row aggregate broadcast-joined in (no collect), so
    the plan is fully lazy and re-runs correctly on new data.
    """
    anchor = df.agg(
        month_key(F.add_months(F.max(ts_col), -(months - 1))).alias("__from_month")
    )
    return (
        df.join(F.broadcast(anchor))
        .where(month_key(ts_col) >= F.col("__from_month"))
        .drop("__from_month")
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "INTERVAL 30 MINUTE",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    user's previous event exceeds ``gap``.

    One shuffle (by user) feeds both windows; the interval comparison is
    wall-clock (no epoch conversion), so it is timezone-agnostic.
    → (user_id, session_id, n_events, session_start, session_end)
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    with_flag = events.withColumn(
        "__new_session",
        F.when(prev_ts.isNull() | (F.col(ts_col) > prev_ts + F.expr(gap)), 1).otherwise(0),
    )
    with_id = with_flag.withColumn(
        "session_id", F.sum("__new_session").over(w).cast("bigint")
    )
    return with_id.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )
