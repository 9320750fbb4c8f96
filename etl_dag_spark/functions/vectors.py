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
