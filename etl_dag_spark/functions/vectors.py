"""Vector math over ``array<float>`` embedding columns as pure Column
expressions (JVM-side lambda functions — no Python, no UDF).

Accumulation is strictly sequential left-to-right in double precision,
which makes results bit-reproducible across runs and engines (the DuckDB
oracle twin uses an explicit sequential ``list_reduce`` for the same
reason).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return F.transform(v, lambda x: x.cast("double"))


def dot_column(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_column(a: Column | str) -> Column:
    return F.sqrt(dot_column(a, a))


def cosine_column(a: Column | str, b: Column | str) -> Column:
    denom = norm_column(a) * norm_column(b)
    return dot_column(a, b) / F.nullif(denom, F.lit(0.0))


def dot_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Unrolled fixed-dimension dot product.

    Bit-identical to :func:`dot_column` (same left-to-right double
    accumulation starting from 0.0) but expands to a flat Add/Multiply
    tree of ``get``s — plain codegen-able expressions instead of
    interpreted higher-order lambdas, ~2 orders of magnitude faster in
    pair-join hot paths.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return acc


def norm_fixed(a: Column | str, dim: int) -> Column:
    return F.sqrt(dot_fixed(a, a, dim))


def dim_of(df, vec_col: str) -> int:
    """Array length of ``vec_col`` (peeked from one row — parquet has no
    fixed-size-list in Spark's schema). Tiny driver-side job, run once
    per plan build."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None:
        raise ValueError(f"cannot infer dimension of empty/null column {vec_col}")
    return int(row["d"])


def dot_sql(a_expr: str, b_expr: str) -> str:
    """Sequential double-precision dot product in DuckDB SQL."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a_expr}) + 1), "
        f"i -> CAST({a_expr}[i] AS DOUBLE) * CAST({b_expr}[i] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def cosine_sql(a_expr: str, b_expr: str) -> str:
    return (
        f"({dot_sql(a_expr, b_expr)} / "
        f"nullif(sqrt({dot_sql(a_expr, a_expr)}) * sqrt({dot_sql(b_expr, b_expr)}), 0.0))"
    )
