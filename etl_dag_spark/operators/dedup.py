"""Document deduplication operators: exact, n-gram Jaccard (exact
near-dup), MinHash+LSH and SimHash (approximate near-dup).

These extend the reference's surface for LLM-training-data pipelines.
Scale design notes:

- Exact dedup is a hash-groupBy on a 128-bit fingerprint — one shuffle
  of (hash, id), never the document bodies.
- N-gram Jaccard generates candidates from an inverted shingle index
  (explode → self-join on shingle). Exact, but candidate volume is
  quadratic in per-shingle document frequency, so hot shingles can be
  capped (``max_shingle_freq``) — at web scale you ALWAYS cap.
- MinHash/LSH bounds candidate volume by banding signatures: shuffle is
  linear in docs × bands, and verification joins only within buckets.
  This is the 100 TB path; n-gram Jaccard is its exactness oracle.
- Everything is built-in Column expressions (xxhash64, zip_with,
  aggregate) — no Python UDFs anywhere.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_dag_spark.functions.text import (
    md5_fingerprint_column,
    shingles_column,
    tokens_column,
)

# ------------------------------------------------------------ exact dedup


def exact_dedup(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct text: (fingerprint, doc_id=min id, n_copies).

    Reference analogy: the truncate-and-load dedup a warehouse would do
    on a natural key; here the key is the content fingerprint.
    """
    return (
        documents.groupBy(md5_fingerprint_column(text_col).alias("fingerprint"))
        .agg(
            F.min(id_col).cast("bigint").alias(id_col),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
    )


# ---------------------------------------------------- exact n-gram Jaccard


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via an inverted shingle index.

    → (doc_id_a, doc_id_b, jaccard) with doc_id_a < doc_id_b and
    jaccard ≥ threshold. Jaccard is |∩| / (|A|+|B|−|∩|) over DISTINCT
    word n-grams — a single integer division, so the value is
    bit-identical across engines.
    """
    sh = documents.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.explode(shingles_column(text_col, n)).alias("s"),
    )
    if max_shingle_freq is not None:
        freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
        sh = sh.join(freq.where(F.col("__df") <= max_shingle_freq).select("s"), "s")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(na, "doc_id_a")
        .join(nb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------ MinHash/LSH

_MERSENNE_P = (1 << 61) - 1
_HASH_SPACE = 1 << 31


def _perm_coeffs(k: int, seed: int) -> tuple[list[int], list[int]]:
    rng = random.Random(seed)
    return (
        [rng.randrange(1, _HASH_SPACE) for _ in range(k)],
        [rng.randrange(0, _HASH_SPACE) for _ in range(k)],
    )


def minhash_signature(
    text: Column | str, n: int = 3, k: int = 64, seed: int = 42
) -> Column:
    """k-permutation MinHash signature (array<bigint>) over word n-gram
    shingles. Shingles hash through xxhash64 (JVM, vectorized) reduced to
    31 bits, permutations are (a·x+b) mod 2^61−1 — all within int64 so
    ANSI mode never overflows.
    """
    a_coef, b_coef = _perm_coeffs(k, seed)
    a_arr = F.array(*[F.lit(a) for a in a_coef])
    b_arr = F.array(*[F.lit(b) for b in b_coef])
    hx = F.transform(
        shingles_column(text, n),
        lambda s: F.pmod(F.xxhash64(s), F.lit(_HASH_SPACE)),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.array_min(
            F.transform(hx, lambda x: F.pmod(a_arr[j] * x + b_arr[j], F.lit(_MERSENNE_P)))
        ),
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int = 1000,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard verification.

    → (doc_id_a, doc_id_b, jaccard) — same contract as
    :func:`ngram_jaccard_pairs`, but candidates come from LSH band
    buckets, so the shuffle is O(docs × bands) instead of the inverted
    index's O(docs × shingles). With k=64, bands=16 (r=4) the collision
    probability at jaccard 0.8 is ≈ 1−(1−0.8⁴)¹⁶ ≈ 0.9997.
    """
    rows_per_band = k // bands
    sig = minhash_signature(text_col, n=n, k=k, seed=seed)
    docs = documents.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        shingles_column(text_col, n).alias("sh"),
        sig.alias("sig"),
    ).where(F.size("sh") > 0)

    banded = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("sig", i * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # cap pathological buckets (stop-phrase storms) — required at scale
    w = Window.partitionBy("band", "bucket")
    banded = banded.withColumn("__bsz", F.count(F.lit(1)).over(w)).where(
        F.col("__bsz") <= max_bucket_size
    ).drop("__bsz")

    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_id_a"), F.col("r.doc_id").alias("doc_id_b"))
        .distinct()
    )

    sh_a = docs.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"))
    sh_b = docs.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(sh_a, "doc_id_a")
        .join(sh_b, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified


# --------------------------------------------------------------- SimHash


def simhash_bands(text: Column | str, bands: int = 4, bits_per_band: int = 16) -> Column:
    """SimHash as an array of ``bands`` × ``bits_per_band``-bit ints.

    Bit i of the hash is the sign of Σ_tokens (2·bit_i(xxhash64(tok))−1).
    Banding directly (instead of one 64-bit int) avoids int64 sign-bit
    overflow under ANSI mode and is the layout LSH needs anyway.
    """
    toks = tokens_column(text)
    th = F.transform(toks, lambda t: F.xxhash64(t))
    total_bits = bands * bits_per_band
    bitsums = F.aggregate(
        th,
        F.array_repeat(F.lit(0).cast("long"), total_bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(total_bits - 1)),
                lambda i: (F.bit_get(h, i) * 2 - 1).cast("long"),
            ),
            lambda x, y: x + y,
        ),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.aggregate(
            F.sequence(F.lit(0), F.lit(bits_per_band - 1)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.when(
                F.get(bitsums, b * bits_per_band + i) > 0,
                F.pow(F.lit(2.0), i).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
    )


def simhash_pairs(
    documents: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    bits_per_band: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int = 2000,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share at least one identical
    band (any pair with hamming ≤ bands−1 is guaranteed to collide by
    pigeonhole), verified by full hamming distance ≤ ``max_hamming``.

    → (doc_id_a, doc_id_b, hamming)
    """
    docs = documents.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        simhash_bands(text_col, bands, bits_per_band).alias("sh"),
    )
    banded = docs.select(
        "doc_id",
        "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(i.alias("band"), F.get(F.col("sh"), i).alias("bucket")),
            )
        ).alias("bb"),
    ).select("doc_id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    w = Window.partitionBy("band", "bucket")
    banded = banded.withColumn("__bsz", F.count(F.lit(1)).over(w)).where(
        F.col("__bsz") <= max_bucket_size
    ).drop("__bsz")

    l, r = banded.alias("l"), banded.alias("r")
    hamming = F.aggregate(
        F.zip_with(
            F.col("l.sh"),
            F.col("r.sh"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_id_a"),
            F.col("r.doc_id").alias("doc_id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
