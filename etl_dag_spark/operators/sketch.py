"""Count-min sketch as pure Column algebra (no UDFs, no driver state).

The CMS is the mergeable fixed-memory frequency summary every
streaming/telemetry stack keeps next to its exact counts (heavy-hitter
monitoring, per-key rate limiting): ``depth`` independent hash rows ×
``width`` counters; an item's estimate is the MIN of its ``depth``
cells, which can only over-estimate (collisions add, never subtract).

Spark-first shape: building the sketch is ``depth`` hash positions
exploded per key → one map-side-combined groupBy to AT MOST
``depth × width`` rows — a bounded-size result no matter the corpus
(that constant bound is what makes the sketch broadcastable and
mergeable: sketches of two corpus halves sum cell-wise to the sketch
of the union, proven in tests/test_sketch.py). Estimation joins the
(bounded) sketch back to the probe keys broadcast-side.

Hashes are the engine-portable md5 scheme (CLAUDE.md): Spark
``conv(substring(md5(x),1,8),16,10)`` ≡ DuckDB
``('0x'||substr(md5(x),1,8))::BIGINT`` — both yield the same unsigned
32-bit value, so a DuckDB oracle can replay the sketch bit-for-bit
(queries.py::text_countmin_hitters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pos32(prefix_expr: str, key_expr: str, width: int) -> Column:
    """Row ``prefix``'s hash position of ``key`` in [0, width)."""
    return F.expr(
        f"pmod(CAST(conv(substring(md5(concat({prefix_expr}, ':', {key_expr})), 1, 8),"
        f" 16, 10) AS BIGINT), {width})"
    )


def pos32_sql(prefix_expr: str, key_expr: str, width: int) -> str:
    """DuckDB twin of :func:`_pos32` (operands are unsigned 32-bit, so
    plain ``%`` matches Spark's ``pmod``)."""
    return (
        f"(('0x' || substr(md5({prefix_expr} || ':' || {key_expr}), 1, 8))::BIGINT"
        f" % {width})"
    )


def countmin_build(
    counted: DataFrame,
    key_col: str = "key",
    count_col: str = "c",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Fold a (key, count) frame into its CMS cell table.

    → (row INT, pos BIGINT, cell BIGINT), ≤ depth×width rows. Input is
    the already-aggregated per-key count frame (aggregate first — the
    sketch of counts equals the sketch of the raw stream, and the
    explode then fans out vocabulary-sized, not corpus-sized, data).
    """
    rows = counted.select(
        F.col(key_col).alias("key"),
        F.col(count_col).cast("bigint").alias("c"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).withColumn("pos", _pos32("CAST(row AS STRING)", "key", width))
    return (
        rows.groupBy(F.col("row").cast("int").alias("row"), "pos")
        .agg(F.sum("c").alias("cell"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimate each probe key's count from the sketch: min over its
    ``depth`` cells; a key whose cells were never touched estimates 0.

    The sketch side is bounded by construction (depth×width) and is
    explicitly broadcast — this is the one place a forced hint is
    *provably* safe, the bound being a constant of the operator, not a
    data statistic.
    """
    pr = probes.select(F.col(key_col).alias("key")).withColumn(
        "row", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    )
    pr = pr.withColumn("pos", _pos32("CAST(row AS STRING)", "key", width)).withColumn(
        "row", F.col("row").cast("int")
    )
    return (
        pr.join(F.broadcast(sketch), ["row", "pos"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cell"), F.lit(0))).cast("bigint").alias("cms_estimate"))
    )


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with the same (depth, width)
    — CMS(A ∪ B) == merge(CMS(A), CMS(B)), the property that lets every
    executor (or every ingest batch) sketch locally and combine."""
    return (
        a.unionByName(b)
        .groupBy("row", "pos")
        .agg(F.sum("cell").cast("bigint").alias("cell"))
    )


def countmin_join_size(a: DataFrame, b: DataFrame, depth: int = 4) -> DataFrame:
    """Equi-join cardinality estimate from two sketches built with the
    same (depth, width): |A ⋈ B| ≈ min over rows of Σ_pos a.cell·b.cell
    — the count-min inner-product estimator (Cormode & Muthukrishnan
    2005, §4.3). Always ≥ the true join size (collisions only add), and
    the row-wise MIN of ``depth`` independent estimates tightens it —
    the optimizer-statistics primitive for predicting a shuffle's
    output without running it.

    → 1 row (est BIGINT). Pure integer arithmetic on two ≤ depth×width
    cell tables: the estimate is deterministic and the whole plan is a
    broadcast-sized join + one aggregate."""
    prod = (
        a.select("row", "pos", F.col("cell").alias("ca"))
        .join(
            b.select("row", "pos", F.col("cell").alias("cb")), ["row", "pos"]
        )
        .groupBy("row")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("rowest"))
    )
    return prod.agg(F.min("rowest").cast("bigint").alias("est"))
