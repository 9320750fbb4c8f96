"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exactness baseline. Query set is
  broadcast (queries are few), the corpus is scanned once — at 100 TB
  this is one pass, embarrassingly parallel, no shuffle of the corpus.
- Hyperplane-LSH top-k: the scale path. Signatures bucket the corpus so
  each query only scores its bucket; recall vs brute force is measured
  in tests (IVF-style coarse quantization would slot in the same shape).
- Cosine near-dup pairs: all-pairs above a threshold; the candidate
  step is the part you'd replace with LSH buckets at scale.

All math is Column-expression double arithmetic with strict sequential
accumulation → bit-reproducible, no UDFs.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_dag_spark.functions.vectors import cosine_column, dot_column


def brute_force_topk(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for rows matching ``query_filter``.

    → (query_id, neighbor_id, rank, sim); rank by (sim rounded to 6dp
    DESC, neighbor_id ASC) so ordering is reproducible under any
    physical plan.
    """
    q = embeddings.where(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    sim = F.round(cosine_column("__qv", "__cv"), 6)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup).

    → (vec_id_a, vec_id_b, sim), a < b. All-pairs is exact and fine up
    to ~10⁵ vectors per executor-block; beyond that the candidate step
    becomes :func:`lsh_topk`-style bucketing.
    """
    a = embeddings.select(F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("__va"))
    b = embeddings.select(F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("__vb"))
    sim = F.round(cosine_column("__va", "__vb"), 6)
    return (
        a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
    )


def _hyperplanes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    # Box-Muller from the seeded PRNG → deterministic gaussian planes
    planes = []
    for _ in range(n_planes):
        plane = []
        for _ in range(dim):
            u1 = max(rng.random(), 1e-12)
            u2 = rng.random()
            plane.append(math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2))
        planes.append(plane)
    return planes


def lsh_bucket_column(vec_col: Column | str, n_planes: int, dim: int, seed: int = 42) -> Column:
    """Random-hyperplane signature packed into one int (0..2^n_planes)."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    planes = _hyperplanes(n_planes, dim, seed)
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot_column(vec, plane_arr) >= 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(0)
        bucket = bucket + bit
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: queries only score corpus rows in the
    same hyperplane bucket. 2^n_planes buckets ⇒ candidate set shrinks
    ~2^n_planes× while same-bucket vectors are the angularly-close ones.

    → (query_id, neighbor_id, rank, sim) — same contract as
    :func:`brute_force_topk`; recall is measured in tests.
    """
    bucket = lsh_bucket_column(vec_col, n_planes, dim, seed)
    tagged = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v"), bucket.alias("__bkt")
    )
    q = tagged.where(query_filter).select(
        F.col("vec_id").alias("query_id"), F.col("__v").alias("__qv"), "__bkt"
    )
    c = tagged.select(F.col("vec_id").alias("neighbor_id"), F.col("__v").alias("__cv"), "__bkt")
    sim = F.round(cosine_column("__qv", "__cv"), 6)
    scored = (
        c.join(F.broadcast(q), "__bkt")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )
