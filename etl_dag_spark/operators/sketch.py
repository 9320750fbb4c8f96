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


# ------------------------------------------------------- HyperLogLog

def hll_registers(
    keys: DataFrame,
    key_col: str = "key",
    p: int = 8,
    salt: str = "hll",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog register table as pure Column algebra (Flajolet et
    al. 2007): → (register INT, max_rho INT), ≤ 2^p rows.

    The 32-bit portable hash splits into the top ``p`` bits (register
    index) and the low ``w = 32−p`` bits (the rank source); rho = the
    leading-zero count of the low bits + 1, computed WITHOUT log():
    ``w − (length(bin(v)) − 1)`` — both engines' ``bin()`` renders an
    integer with no leading zeros, so the expression is exact integer/
    string algebra and a DuckDB oracle replays every register
    bit-for-bit (float log2 at a power-of-two boundary could misround
    differently per engine; string length cannot).

    Scale shape: one narrow projection + a map-side-combined groupBy to
    AT MOST 2^p rows — like the CMS, the sketch's size is a constant of
    the operator, so it is always broadcastable and the register table
    of two corpus halves folds to the union's by per-register MAX
    (commutative + associative + idempotent — even replayed batches
    cannot corrupt it, unlike the CMS's additive fold).

    ``group_cols`` gives the GROUP BY form (one sketch per group — the
    Druid/BigQuery sketch-aggregate shape): output is ≤ groups × 2^p
    rows, still map-side combined in one pass over the input.
    """
    g = list(group_cols or [])
    w = 32 - p
    h = F.expr(
        f"CAST(conv(substring(md5(concat('{salt}:', key)), 1, 8), 16, 10) AS BIGINT)"
    )
    rows = keys.select(
        *g, F.col(key_col).cast("string").alias("key")
    ).select(*g, h.alias("__h"))
    rows = rows.select(
        *g,
        F.expr(f"CAST(__h DIV {1 << w} AS INT)").alias("register"),
        F.expr(f"__h % {1 << w}").alias("__v"),
    ).select(
        *g,
        "register",
        F.when(F.col("__v") > 0, F.lit(w) - (F.length(F.expr("bin(__v)")) - 1))
        .otherwise(F.lit(w + 1))
        .cast("int")
        .alias("__rho"),
    )
    return rows.groupBy(*g, "register").agg(F.max("__rho").alias("max_rho"))


def hll_registers_sql(
    from_clause: str,
    key_expr: str,
    p: int = 8,
    salt: str = "hll",
    group_exprs: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`hll_registers` (same md5 hash, same bin()
    rank algebra): a complete SELECT yielding ([groups,] register,
    max_rho)."""
    g = list(group_exprs or [])
    w = 32 - p
    h = f"(('0x' || substr(md5('{salt}:' || {key_expr}), 1, 8))::BIGINT)"
    gsel = "".join(f"{e}, " for e in g)
    gby = ", ".join(str(i + 1) for i in range(len(g) + 1))
    return f"""
SELECT {gsel}CAST(h // {1 << w} AS INT) AS register,
       CAST(max(CASE WHEN h % {1 << w} > 0
                     THEN {w} - (length(bin(h % {1 << w})) - 1)
                     ELSE {w + 1} END) AS INT) AS max_rho
FROM (SELECT {gsel}{h} AS h FROM {from_clause})
GROUP BY {gby}
"""


def kmv_hash(key_col: str, salt: str = "kmv") -> Column:
    """Engine-portable 32-bit hash of a string key (the CLAUDE.md md5
    scheme) — the value space [0, 2^32) every KMV estimate divides by."""
    return F.expr(
        f"CAST(conv(substring(md5(concat('{salt}:', {key_col})), 1, 8),"
        " 16, 10) AS BIGINT)"
    )


def kmv_sketch(
    keys: DataFrame, key_col: str = "key", k: int = 128, salt: str = "kmv"
) -> DataFrame:
    """K-minimum-values sketch (Bar-Yossef et al. 2002): the k SMALLEST
    distinct hash values of the key set → (hv BIGINT), ≤ k rows.

    This is the third sketch family member: the CMS answers frequency,
    the HLL answers |A|, the KMV answers |A|, |A ∪ B| AND — uniquely —
    |A ∩ B|/Jaccard, because bottom-k sets compose: every element of
    bottom-k(S_A ∪ S_B) lies below A's k-th smallest hash, so its
    membership in A is decided by S_A alone (no rescan of A).

    Scale shape: the distinct is a map-side-combined aggregate (shuffle
    volume = distinct hashes, the same class as any COUNT(DISTINCT));
    the trailing sort+limit is TakeOrderedAndProject — a per-partition
    k-heap, never a global sort. Selection is deterministic (distinct
    values, total order), so a DuckDB oracle replays the sketch
    bit-for-bit.
    """
    return (
        keys.select(kmv_hash(key_col, salt).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def kmv_sketch_sql(
    from_clause: str, key_expr: str, k: int = 128, salt: str = "kmv"
) -> str:
    """DuckDB twin of :func:`kmv_sketch`: a SELECT yielding (hv)."""
    h = f"(('0x' || substr(md5('{salt}:' || {key_expr}), 1, 8))::BIGINT)"
    return (
        f"SELECT DISTINCT {h} AS hv FROM {from_clause} ORDER BY 1 LIMIT {k}"
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 128) -> DataFrame:
    """bottom-k of the union of two same-k sketches — exactly equal to
    the sketch of A ∪ B (bottom-k(bottom-k(A) ∪ bottom-k(B)) ==
    bottom-k(A ∪ B); pinned in tests/test_sketch.py)."""
    return a.unionByName(b).distinct().orderBy("hv").limit(k)


def kmv_est_sql(m_expr: str, kth_expr: str, k: int) -> str:
    """The KMV distinct-count estimator as a SQL string valid in BOTH
    engines over a sketch's (row count m, k-th smallest hash value):
    (k−1) · 2^32 / h_k, or exactly m when the set had fewer than k
    distinct hashes (the sketch holds ALL of them). One float division
    over integer inputs — correctly rounded identically in both
    engines; every literal explicitly DOUBLE (DuckDB bare-decimal
    gotcha)."""
    return (
        f"CASE WHEN {m_expr} < {k} THEN CAST({m_expr} AS DOUBLE)"
        f" ELSE CAST({k - 1} AS DOUBLE) * CAST(4294967296 AS DOUBLE)"
        f" / CAST({kth_expr} AS DOUBLE) END"
    )


def kmv_estimate(sketch: DataFrame, k: int = 128) -> DataFrame:
    """Fold a sketch to its 1-row estimate frame → (m BIGINT,
    kth BIGINT, est DOUBLE). Bounded by construction (aggregate of a
    ≤ k-row frame)."""
    return sketch.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.max("hv").cast("bigint").alias("kth"),
    ).withColumn("est", F.expr(kmv_est_sql("m", "kth", k)))


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-register MAX of two register tables built with the same
    (p, salt) — HLL(A ∪ B) == merge(HLL(A), HLL(B)); max is also
    idempotent, so replaying a batch is harmless."""
    return a.unionByName(b).groupBy("register").agg(
        F.max("max_rho").alias("max_rho")
    )


def _hll_est_from_regs(regs: dict, p: int) -> float:
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    s = sum(2.0 ** -regs.get(j, 0) for j in range(m))
    est = alpha * m * m / s
    zeros = m - len([v for v in regs.values() if v > 0])
    if est <= 2.5 * m and zeros > 0:
        import math

        est = m * math.log(m / zeros)
    return est


def hll_estimate(registers: DataFrame, p: int = 8) -> float:
    """Distinct-count estimate from a register table: the standard HLL
    estimator with the small-range (linear counting) correction. The
    register table is ≤ 2^p rows by construction, so collecting it is a
    bounded driver materialization — the float arithmetic happens ONCE
    on the driver, never inside a distributed (order-dependent) sum.
    """
    return _hll_est_from_regs(
        {r.register: r.max_rho for r in registers.collect()}, p
    )


def hll_estimate_by_group(
    registers: DataFrame, group_cols: list[str], p: int = 8
) -> dict:
    """Per-group estimates from a grouped register table → {group_key
    tuple: estimate}. Bounded: ≤ groups × 2^p rows collected."""
    groups: dict = {}
    for r in registers.collect():
        gk = tuple(r[c] for c in group_cols)
        groups.setdefault(gk, {})[r.register] = r.max_rho
    return {gk: _hll_est_from_regs(regs, p) for gk, regs in groups.items()}


# ------------------------------------------- quantile sample sketch


def quantile_sample_sketch(
    rows: DataFrame,
    group_col: str,
    value_col: str,
    key_expr_sql: str,
    k: int = 256,
    salt: str = "qsk",
) -> DataFrame:
    """Mergeable bottom-k VALUE sample — the quantile member of the
    sketch family (CMS = frequency, HLL/KMV = cardinality, this =
    distribution): per group, the ``k`` rows whose engine-portable
    uniform hash of ``key_expr_sql`` is smallest, RETAINING the value
    → (g, v BIGINT, hv BIGINT), ≤ k rows per group.

    A bottom-k-by-uniform-hash set is a uniform random sample of the
    group's rows (the classic sampling quantile summary — Manku et al.
    1998/1999 lineage; "Mergeable Summaries", Agarwal et al. 2012 §3,
    prove the merged bottom-k stays uniform), so the q-quantile of the
    sample estimates the q-quantile of the data with rank error
    O(1/sqrt(k)) — and unlike GK/KLL compactors the construction is a
    pure deterministic Column program: a DuckDB oracle replays the
    sketch BIT-FOR-BIT (hash → bottom-k → merge → rank), which the
    random-compactor sketches cannot offer.

    Scale shape: one window top-k per group (rank + filter — a k-heap
    per partition after the group shuffle, the per_group_top_k idiom);
    shuffle volume is the source rows once. Merging sketches from N
    shards is a union + re-bottom-k over ≤ N·k rows per group — the
    distributed-aggregation shape that lets 1000 executors each sketch
    a shard and one reduce produce the global quantiles."""
    from pyspark.sql import Window

    h = F.expr(
        f"CAST(conv(substring(md5(concat('{salt}:', {key_expr_sql})), 1, 8),"
        " 16, 10) AS BIGINT)"
    )
    s = rows.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("long").alias("v"),
        h.alias("hv"),
    )
    w = Window.partitionBy("g").orderBy("hv", "v")
    return (
        s.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def quantile_sample_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Merge two quantile sample sketches: union then re-bottom-k on the
    same (hv, v) order — closed under merge because the k smallest
    hashes of A ∪ B are a subset of A's k smallest plus B's k smallest."""
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("hv", "v")
    return (
        a.unionByName(b)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def quantile_sample_estimate(
    sketch: DataFrame,
    quantiles: tuple[tuple[int, int], ...] = ((1, 2), (9, 10), (99, 100)),
    names: tuple[str, ...] = ("p50", "p90", "p99"),
) -> DataFrame:
    """Quantile estimates from a (merged) sketch: the ceil(q·n)-th
    smallest sample VALUE, ranks in exact integer arithmetic
    ((num·n + den − 1) DIV den — no float, engine-portable) →
    (g, n_sample BIGINT, <name> BIGINT ...)."""
    from pyspark.sql import Window

    m = sketch.withColumn(
        "n_s", F.count(F.lit(1)).over(Window.partitionBy("g"))
    ).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("g").orderBy("v", "hv")),
    )
    aggs = [F.max("n_s").cast("bigint").alias("n_sample")]
    for (num, den), nm in zip(quantiles, names):
        r = F.expr(f"CAST(({num} * n_s + {den} - 1) DIV {den} AS BIGINT)")
        aggs.append(
            F.max(F.when(F.col("rn") == r, F.col("v"))).cast("bigint").alias(nm)
        )
    return m.groupBy("g").agg(*aggs)
