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


def per_group_top_k(
    df: DataFrame,
    group_col: str,
    order: list[Column],
    k: int,
    rank_col: str = "group_rank",
    salt_col: Column | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Exactly the ``k`` first rows per group under ``order``, with
    their 1-based rank — ``row_number() OVER (PARTITION BY group ORDER
    BY order) <= k`` — computed skew-safely in two phases.

    A plain per-group window puts EVERY row of a group through one
    task, so one hot group (a crawl's top host can be 1% of a 100 TB
    corpus) serializes the stage. Phase 1 splits each group into
    ``n_salts`` deterministic sub-groups and keeps each sub-group's
    local top-k (any global top-k row is necessarily in its salt
    bucket's top-k), bounding phase 2's per-group input at
    ``k × n_salts`` rows regardless of group size. The final rank is
    identical to the single-window formulation, so oracles stay exact.

    ``order`` must be a total order within a group for determinism;
    ``salt_col`` defaults to a hash-modulus of the last order column (any
    deterministic row-level expression works — correctness never
    depends on salt balance, only phase-1 pruning efficiency does).
    """
    # pmod is already non-negative; abs(hash) would ANSI-overflow on
    # the one hash value equal to Integer.MIN_VALUE
    salt = salt_col if salt_col is not None else F.pmod(F.hash(order[-1]), F.lit(n_salts))
    w1 = Window.partitionBy(group_col, "__salt").orderBy(*order)
    pre = (
        df.withColumn("__salt", salt)
        .withColumn("__lrn", F.row_number().over(w1))
        .where(F.col("__lrn") <= k)
        .drop("__salt", "__lrn")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return pre.withColumn(rank_col, F.row_number().over(w2).cast("int")).where(
        F.col(rank_col) <= k
    )


def _ranged_row_number(
    df: DataFrame,
    order: list[Column],
    num_partitions: int | None = None,
    pin: bool = True,
    value_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Shared core of :func:`global_row_number` / :func:`exact_ntile` /
    :func:`global_running_sum`: range-repartition on the sort key
    (range partition i holds keys strictly below partition i+1's, so
    partition id IS the coarse rank) and rank locally within each
    partition. Returns the locally-ranked frame (``__pid``, ``__lrn``)
    plus the per-partition statistics — every piece a later step needs
    to assemble exact global ranks without ever sorting the data
    through one task.

    With ``value_col``, additionally computes the local inclusive
    running sum ``__lcs`` in the SAME window pass (CollapseWindow
    merges the two expressions — one sort), and the returned stats
    frame carries ``__pc`` = per-partition SUM(value_col) instead of
    the row count, so :func:`global_running_sum` rides this pinned
    placement rather than duplicating an unpinned copy of it.
    """
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(*order)
    local = ranged.withColumn("__lrn", F.row_number().over(w))
    if value_col is not None:
        local = local.withColumn(
            "__lcs",
            F.sum(value_col).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    # PIN the ranked frame before anything consumes it twice:
    # repartitionByRange picks its boundaries by SAMPLING, and the
    # sample depends on the upstream row placement, which a shuffled
    # aggregate does not guarantee stable across re-evaluations. The
    # per-partition counts (broadcast-side job) and the local ranks
    # (main job) would then be computed under DIFFERENT boundaries —
    # offsets no longer match ranks and assembled global ranks can
    # exceed N (observed: NTILE(4) emitting bucket 5 at sf0.1,
    # nondeterministically). The lazy local checkpoint materializes the
    # placement exactly once; every job after it reads the same rows in
    # the same partitions. (Checkpointing the SF-scaled parent is the
    # sanctioned pattern — the broadcast hints downstream sit on
    # aggregates ABOVE this frame, so the hint audit still sees their
    # bounding Aggregate nodes.) ``pin=False`` exposes the raw lineage
    # so tests can assert the structural properties the checkpoint
    # hides from explain(): range-partitioned exchange, __pid-local
    # window, never a single-partition global sort.
    if pin:
        local = local.localCheckpoint(eager=False)
    stat = F.count(F.lit(1)) if value_col is None else F.sum(value_col)
    counts = local.groupBy("__pid").agg(stat.alias("__pc"))
    return local, counts


def _partition_offsets(counts: DataFrame) -> DataFrame:
    """Exclusive prefix-sum of per-partition counts → (__pid, __off).

    Computed with a broadcast self-join over the ≤|cluster partitions|
    count rows (O(P²) pairs, P ≈ 32) instead of an unpartitioned
    window, so no stage in the plan is a single-partition sort — the
    plan-snapshot test asserts exactly that.
    """
    a, b = counts.alias("a"), counts.alias("b")
    return (
        a.join(F.broadcast(b), F.col("b.__pid") < F.col("a.__pid"), "left")
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(F.coalesce(F.sum(F.col("b.__pc")), F.lit(0)).cast("bigint").alias("__off"))
    )


def global_row_number(
    df: DataFrame,
    order: list[Column],
    rn_col: str = "global_rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY order)`` without a
    single-partition sort: local rank within range partitions plus the
    broadcast exclusive prefix-sum of partition sizes. Every shuffle is
    keyed; the only global structure that moves is one count per
    partition. Ties across the order key stay deterministic only if the
    caller's ``order`` is a total order (add a key column tie-break).
    """
    local, counts = _ranged_row_number(df, order, num_partitions)
    return (
        local.join(F.broadcast(_partition_offsets(counts)), "__pid")
        .withColumn(rn_col, (F.col("__off") + F.col("__lrn")).cast("bigint"))
        .drop("__pid", "__lrn", "__off")
    )


def global_running_sum(
    df: DataFrame,
    order: list[Column],
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive ``sum(value) OVER (ORDER BY order ROWS UNBOUNDED
    PRECEDING)`` without a single-partition sort — the prefix-sum twin
    of :func:`global_row_number`: range-partition on the order key, sum
    locally, and add the broadcast exclusive prefix-sum of per-partition
    value totals. ``order`` must be a total order for determinism.
    Rides the PINNED :func:`_ranged_row_number` core (value_col mode):
    the ranged frame is consumed by two jobs (partition totals for the
    broadcast offsets, plus the main read), and an unpinned
    repartitionByRange can sample DIFFERENT boundaries per job —
    offsets added to cumsums computed under other boundaries corrupt
    the running totals nondeterministically (the exact_ntile bucket-5
    bug class; see the pin comment in the core).
    """
    local, totals = _ranged_row_number(df, order, num_partitions, value_col=value_col)
    return (
        local.join(F.broadcast(_partition_offsets(totals)), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__lcs")).cast("bigint"))
        .drop("__pid", "__lrn", "__lcs", "__off")
    )


def exact_ntile(
    df: DataFrame,
    n: int,
    order: list[Column],
    out_col: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY order)`` with the same
    distributed shape as :func:`global_row_number` — SQL NTILE is a
    pure function of the global row number r and total count N (the
    first N mod n buckets take ⌈N/n⌉ rows, the rest ⌊N/n⌋), so once r
    is assembled from local ranks + broadcast offsets, the bucket is a
    row-local integer expression. N rides in on a broadcast 1-row
    aggregate of the same partition counts; no stage sorts more than
    one range partition's rows.
    """
    local, counts = _ranged_row_number(df, order, num_partitions)
    total = counts.agg(F.sum("__pc").cast("bigint").alias("__n"))
    r = F.col("__off") + F.col("__lrn")

    def idiv(a: Column, b: Column) -> Column:
        # exact integer floor-div: Spark's `/` is double division, so
        # subtract the remainder first — (a − a%b)/b is an integer that
        # doubles represent exactly for any realistic row count (< 2⁵³)
        return ((a - a % b) / b).cast("bigint")

    def iceil(a: Column, b: Column) -> Column:
        return idiv(a + b - 1, b)

    q = idiv(F.col("__n"), F.lit(n))
    rem = (F.col("__n") % n).cast("bigint")
    in_big = r <= rem * (q + 1)
    # the small-bucket branch is never evaluated when q = 0 (rem = N
    # puts every row in a big bucket); greatest() keeps it total anyway
    big_bucket = iceil(r, q + 1)
    small_bucket = rem + iceil(r - rem * (q + 1), F.greatest(q, F.lit(1)))
    return (
        local.join(F.broadcast(_partition_offsets(counts)), "__pid")
        .join(F.broadcast(total))
        .withColumn(out_col, F.when(in_big, big_bucket).otherwise(small_bucket).cast("int"))
        .drop("__pid", "__lrn", "__off", "__n")
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


def exact_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: dict[str, float],
) -> DataFrame:
    """Exact linear-interpolated percentiles per group, one shuffle.

    Engines disagree on the float expression inside their native
    percentile_cont (last-ulp differences), so the interpolation is
    spelled out — ``lo + (hi - lo) * frac`` on doubles — and the DuckDB
    oracle uses the same literal formula, making results bit-identical.
    Rank + pick + interpolate is a single window sort followed by one
    aggregate: the same cost envelope as the built-in.

    ``qs``: output column name → quantile in [0, 1].
    → (group_col, *qs keys)
    """
    w = Window.partitionBy(group_col).orderBy(value_col)
    wg = Window.partitionBy(group_col)
    ranked = df.select(
        group_col,
        F.col(value_col).cast("double").alias("__v"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wg).alias("__n"),
    )
    aggs = []
    for name, q in qs.items():
        t = (F.col("__n") - 1).cast("double") * F.lit(q)
        lo_rn = F.floor(t) + 1
        frac = t - F.floor(t).cast("double")
        lo = F.max(F.when(F.col("__rn") == lo_rn, F.col("__v")))
        hi = F.max(F.when(F.col("__rn") == lo_rn + 1, F.col("__v")))
        fr = F.max(F.when(F.col("__rn") == lo_rn, frac))
        aggs.append((lo + (F.coalesce(hi, lo) - lo) * fr).alias(name))
    return ranked.groupBy(group_col).agg(*aggs)


def percentile_oracle_sql(
    table: str, group_col: str, value_expr: str, qs: dict[str, float]
) -> str:
    """DuckDB twin of :func:`exact_percentiles` — same interpolation
    formula text, so the float ops match term for term."""
    cols = []
    for name, q in qs.items():
        # bare 0.9 parses as DECIMAL in DuckDB — cast keeps both engines
        # in double arithmetic so the interpolation is bit-identical
        qd = f"CAST({q!r} AS DOUBLE)"
        cols.append(
            f"max(CASE WHEN __rn = floor((__n - 1) * {qd}) + 1 THEN __v END) + "
            f"(coalesce(max(CASE WHEN __rn = floor((__n - 1) * {qd}) + 2 THEN __v END), "
            f"max(CASE WHEN __rn = floor((__n - 1) * {qd}) + 1 THEN __v END)) - "
            f"max(CASE WHEN __rn = floor((__n - 1) * {qd}) + 1 THEN __v END)) * "
            f"max(CASE WHEN __rn = floor((__n - 1) * {qd}) + 1 THEN "
            f"(__n - 1) * {qd} - floor((__n - 1) * {qd}) END) AS {name}"
        )
    return f"""
WITH __ranked AS (
  SELECT {group_col},
         CAST({value_expr} AS DOUBLE) AS __v,
         row_number() OVER (PARTITION BY {group_col} ORDER BY CAST({value_expr} AS DOUBLE)) AS __rn,
         count(*) OVER (PARTITION BY {group_col}) AS __n
  FROM {table}
)
SELECT {group_col}, {", ".join(cols)}
FROM __ranked GROUP BY {group_col}
"""


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
