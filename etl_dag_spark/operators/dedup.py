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
    shingle_rows,
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
    sh = shingle_rows(documents, n=n, id_col=id_col, text_col=text_col)
    if max_shingle_freq is not None:
        freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
        sh = sh.join(freq.where(F.col("__df") <= max_shingle_freq).select("s"), "s")
    # the inverted index feeds three consumers (sizes + both join sides):
    # materialize it once instead of recomputing the shingle subtree per
    # branch (at cluster scale: persist/stage-cache the index)
    sh = sh.localCheckpoint(eager=False)
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


def minhash_signatures(
    documents: DataFrame,
    n: int = 3,
    k: int = 64,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """k-permutation MinHash signatures as ``k`` long columns h0..h{k-1}.

    Shape: explode distinct word n-gram shingles → xxhash64 reduced to
    31 bits → ``groupBy(doc_id)`` with k ``min()`` aggregates, one per
    permutation (a·x+b) mod 2^61−1 (all within int64, ANSI-safe).

    Everything is whole-stage-codegen (hash + min aggregates) — no
    interpreted lambda per permutation. At scale the map-side partial
    aggregation collapses each doc's shingles to k longs locally, so
    the shuffle volume is O(docs × k), the same as the signatures
    themselves. Docs with fewer than ``n`` tokens have no shingles and
    drop out (they cannot be near-dups under this measure).
    """
    a_coef, b_coef = _perm_coeffs(k, seed)
    sh_rows = shingle_rows(
        documents, n=n, id_col=id_col, text_col=text_col, distinct=False
    ).select("doc_id", F.pmod(F.xxhash64("s"), F.lit(_HASH_SPACE)).alias("h"))
    mins = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_MERSENNE_P))).alias(f"h{j}")
        for j, (a, b) in enumerate(zip(a_coef, b_coef))
    ]
    return sh_rows.groupBy("doc_id").agg(*mins)


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
    sig = minhash_signatures(
        documents, n=n, k=k, seed=seed, id_col=id_col, text_col=text_col
    )
    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"h{j}").cast("string")
                        for j in range(i * rows_per_band, (i + 1) * rows_per_band)
                    ],
                )
            ).alias("bucket"),
        )
        for i in range(bands)
    ]
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
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

    sh_arrays = (
        shingle_rows(documents, n=n, id_col=id_col, text_col=text_col, distinct=False)
        .groupBy("doc_id")
        .agg(F.collect_set("s").alias("sh"))  # collect_set dedupes itself
    )
    sh_a = sh_arrays.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh_arrays.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"))
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


# ------------------------------------------------- near-dup clustering


def cluster_pairs(
    pairs: DataFrame,
    documents: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components over near-dup ``pairs`` → one cluster id per
    document (the min doc_id in its component) and a keep flag for the
    canonical representative — the step that turns pairwise similarity
    into an actual deduplicated corpus.

    Iterative min-label propagation: each round every node adopts the
    smallest label among itself and its neighbors; fixpoint in
    O(component diameter) rounds (near-dup components are tiny — chains
    of copies — so this is 2-3 rounds in practice). Labels live in a
    (node, label) frame shuffled by node; edges are symmetrized once.
    No driver-side graph state.

    → (doc_id, cluster_id, is_canonical)
    """
    edges = (
        pairs.select(F.col("doc_id_a").alias("u"), F.col("doc_id_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_id_b").alias("u"), F.col("doc_id_a").alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = documents.select(
        F.col(id_col).cast("bigint").alias("node"),
        F.col(id_col).cast("bigint").alias("label"),
    ).localCheckpoint(eager=False)
    prev_sum = None
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        # labels only ever decrease, so the label sum is a strictly
        # monotone convergence witness: one scalar aggregate per round
        # (carried in a driver variable) instead of an old-vs-new join
        new_sum = new_labels.agg(F.sum("label")).first()[0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(f"components did not converge in {max_iter} rounds")
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("is_canonical"),
    )


# --------------------------------------------------------------- SimHash


def simhash_signatures(
    documents: DataFrame,
    bands: int = 4,
    bits_per_band: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash as ``bands`` long columns b0..b{bands-1}, each holding a
    ``bits_per_band``-bit slice of the hash.

    Bit i of the hash is the sign of Σ_tokens (2·bit_i(xxhash64(tok))−1).
    Shape: explode tokens → 64 ``sum()`` bit-counter aggregates per doc
    (codegen hash-agg, map-side partial — shuffle is O(docs × bits)) →
    assemble band ints with plain arithmetic. Banding into multiple ints
    (instead of one 64-bit int) avoids int64 sign-bit overflow under
    ANSI mode and is the layout LSH needs anyway. Tokenization always
    yields ≥1 token (empty text → one empty-string token), so no doc
    drops out of the groupBy.
    """
    total_bits = bands * bits_per_band
    tok_rows = documents.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.explode(tokens_column(text_col)).alias("t"),
    ).select("doc_id", F.xxhash64("t").alias("h"))
    sums = [
        F.sum((F.bit_get(F.col("h"), F.lit(i)) * 2 - 1).cast("long")).alias(f"s{i}")
        for i in range(total_bits)
    ]
    bitsums = tok_rows.groupBy("doc_id").agg(*sums)
    band_cols = []
    for b in range(bands):
        band = F.lit(0).cast("long")
        for i in range(bits_per_band):
            band = band + F.when(
                F.col(f"s{b * bits_per_band + i}") > 0, F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        band_cols.append(band.alias(f"b{b}"))
    return bitsums.select("doc_id", *band_cols)


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
    sig = simhash_signatures(
        documents, bands=bands, bits_per_band=bits_per_band,
        id_col=id_col, text_col=text_col,
    )
    band_structs = [
        F.struct(F.lit(i).alias("band"), F.col(f"b{i}").alias("bucket"))
        for i in range(bands)
    ]
    banded = sig.select(
        "doc_id",
        *[F.col(f"b{i}") for i in range(bands)],
        F.explode(F.array(*band_structs)).alias("bb"),
    ).select(
        "doc_id",
        *[F.col(f"b{i}") for i in range(bands)],
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )
    w = Window.partitionBy("band", "bucket")
    banded = banded.withColumn("__bsz", F.count(F.lit(1)).over(w)).where(
        F.col("__bsz") <= max_bucket_size
    ).drop("__bsz")

    l, r = banded.alias("l"), banded.alias("r")
    hamming = F.lit(0).cast("long")
    for i in range(bands):
        hamming = hamming + F.bit_count(
            F.col(f"l.b{i}").bitwiseXOR(F.col(f"r.b{i}"))
        ).cast("long")
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
