"""Cross-source quantile normalization — the batch-effect correction a
multi-source corpus needs before its per-source quality/length signals
are comparable (Bolstad et al. 2003, "A comparison of normalization
methods", the microarray-era recipe that survives verbatim in modern
data curation: map every source's score distribution onto the POOLED
distribution by quantile rank, so "top 10% within src A" and "top 10%
within src B" land on the same scale).

Definition used here (exact, integer-only): within each group, rank
rows by (value, id) — r of n_g; the normalized value is the pooled
corpus value whose global rank is ``1 + (r−1)·(N−1) DIV max(n_g−1,
1)`` (endpoint-preserving integer interpolation: a group's min maps to
the pooled min, its max to the pooled max). No float accumulates:
ranks are BIGINTs, the mapping is one integer multiply/divide (both
operands non-negative, so truncating and flooring division agree
across engines), and the output is a VALUE from the pooled column.

Scale shape: the per-group rank is an ordinary partitioned window; the
ONE global structure — the pooled ranking — rides the pinned
range-partitioned :func:`~etl_dag_spark.operators.windows.
global_row_number` (never a single-task sort), and the final
assignment is an equi-join on the computed pooled rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_dag_spark.operators import windows as win


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    out_col: str = "norm_value",
) -> DataFrame:
    """Append ``out_col``: the pooled-distribution value at each row's
    within-group quantile rank. Input columns are preserved; ties order
    by (value, id) so both the group and pooled rankings are total."""
    for c in (group_col, value_col, id_col):
        if c not in df.columns:
            raise ValueError(f"quantile_normalize: {c!r} not in {df.columns}")
    wg = Window.partitionBy(group_col).orderBy(value_col, id_col)
    ranked = df.withColumn("__r", F.row_number().over(wg).cast("bigint")).withColumn(
        "__ng", F.count(F.lit(1)).over(Window.partitionBy(group_col)).cast("bigint")
    )
    pooled = win.global_row_number(
        df.select(F.col(value_col).alias("__pv"), F.col(id_col)),
        [F.col("__pv"), F.col(id_col)],
        "__p",
    ).select("__p", "__pv")
    total = df.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    target = ranked.crossJoin(F.broadcast(total)).withColumn(
        "__p",
        (
            F.lit(1)
            + F.expr("(__r - 1) * (__n - 1) DIV greatest(__ng - 1, 1)")
        ).cast("bigint"),
    )
    return (
        target.join(pooled, "__p")
        .withColumn(out_col, F.col("__pv"))
        .drop("__r", "__ng", "__n", "__p", "__pv")
    )
