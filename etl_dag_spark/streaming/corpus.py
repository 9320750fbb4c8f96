"""Streaming corpus ingest: the LLM-training-data cleaning operators
applied as a Structured Streaming pipeline — the shape of a continuous
crawl-ingest feed, where documents arrive as files (at 100 TB: Kafka
topics) and quality/langid/PII annotation happens at stream speed.

Every transformation here is STATELESS (pure Column expressions from
``functions.text`` / the PII chain), so stream output equals the batch
twin row-for-row on the same input — asserted in
``tests/test_streaming_corpus.py``. Stateful corpus steps (dedup,
clustering) stay batch/micro-batch: exact dedup of an unbounded corpus
needs a keyed store (the events streaming module demonstrates the
bounded-state variant via ``dropDuplicatesWithinWatermark``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENT_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def read_document_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def clean_documents(docs: DataFrame) -> DataFrame:
    """Shared batch/stream cleaning stage: language-ID, token count,
    repetition-free quality gate (cheap single-pass variant: top-word
    fraction only), and PII scrubbing. Narrow, codegen, no shuffle —
    identical semantics whether ``docs`` is a batch frame or a stream.
    """
    from etl_dag_spark.functions.text import langid_column, token_count_column
    from etl_dag_spark.queries import _EMAIL_RE, _NUM_RE, _URL_RE

    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _URL_RE,
            "<URL>",
        ),
        _NUM_RE,
        "<NUM>",
    )
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source",
        clean.alias("clean_text"),
        langid_column("text").alias("lang_pred"),
        token_count_column("text").alias("n_tokens"),
    ).where(F.col("n_tokens") >= 10)


def stream_incremental_dedup(
    docs_stream: DataFrame,
    store_table: str,
    out_dir: str,
    checkpoint_dir: str,
    store_path: str | None = None,
    **dedup_kwargs,
) -> "pyspark.sql.streaming.StreamingQuery":
    """The stateful corpus step this module's header deferred: streaming
    near-dup dedup with UNBOUNDED history, via ``foreachBatch`` over the
    persisted signature store of
    :func:`etl_dag_spark.operators.dedup.incremental_minhash_dedup`.

    ``dropDuplicatesWithinWatermark`` (events module) bounds its state
    by time — right for telemetry, wrong for a crawl where a duplicate
    may arrive months later. Here every micro-batch joins against the
    bucketed on-disk store (state size ∝ corpus × bands, on disk, not
    in executor memory), appends its survivors' signatures, and writes
    surviving documents to ``out_dir``. Batch-split invariance of the
    underlying operator (tests/test_incremental_dedup.py) is exactly
    the property that makes the result independent of micro-batch
    boundaries — asserted stream-vs-batch in
    tests/test_streaming_corpus.py.
    """
    from etl_dag_spark.operators.dedup import incremental_minhash_dedup

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        decisions = incremental_minhash_dedup(
            batch_df, store_table, path=store_path, **dedup_kwargs
        )
        (
            batch_df.join(decisions.where(F.col("keep")).select("doc_id"), "doc_id")
            .write.mode("append")
            .parquet(out_dir)
        )

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_line_dedup(
    docs_stream: DataFrame,
    store_table: str,
    out_dir: str,
    checkpoint_dir: str,
    n: int = 3,
    max_df: int = 10,
    store_path: str | None = None,
    n_store_buckets: int = 16,
) -> "pyspark.sql.streaming.StreamingQuery":
    """Streaming CCNet line suppression with CUMULATIVE corpus line
    frequencies — the streaming twin of
    ``operators.dedup.suppress_boilerplate_lines``, with the same
    persisted-store shape as :func:`stream_incremental_dedup`: a cookie
    banner that only becomes recognizable as boilerplate after enough
    batches must be suppressed from then on, so frequency state is
    unbounded history, not a watermark-bounded buffer.

    Per micro-batch: (a) the batch's line counts APPEND to a bucketed
    parquet store as deltas (log-structured — no full-store rewrite per
    batch; the read-side groupBy folds deltas and is Exchange-free on
    the bucketed line key; compaction is an offline concern), then (b)
    the batch's documents are cleaned against the counts INCLUDING this
    batch and appended to ``out_dir``. Decisions are as-of arrival time
    — earlier outputs are not retroactively re-cleaned, which is
    exactly the semantics of a production ingest feed. A single-batch
    stream therefore equals the one-shot batch operator, and the
    store's folded counts always equal the batch operator's frequency
    table over everything ingested (both pinned in
    tests/test_streaming_corpus.py)."""
    from etl_dag_spark.functions.text import chunk_token_lines
    from etl_dag_spark.operators.dedup import (
        _ensure_bucketed_store,
        reassemble_kept_lines,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        lines = chunk_token_lines(batch_df, n=n).localCheckpoint(eager=False)
        _ensure_bucketed_store(
            spark, store_table, "line STRING, cnt BIGINT", ["line"],
            n_store_buckets, store_path,
        )
        (
            lines.groupBy("line")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .write.mode("append")
            .bucketBy(n_store_buckets, "line")
            .format("parquet")
            .saveAsTable(store_table)
        )
        cum = spark.table(store_table).groupBy("line").agg(
            F.sum("cnt").alias("__df")
        )
        flagged = (
            lines.join(cum, "line")
            .withColumn("__thr", F.lit(int(max_df)).cast("bigint"))
            .withColumn("__keep", F.col("__df") <= F.col("__thr"))
        )
        reassemble_kept_lines(flagged).write.mode("append").parquet(out_dir)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_countmin(
    docs_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 256,
) -> "pyspark.sql.streaming.StreamingQuery":
    """Cumulative count-min sketch over a streaming corpus — the
    fixed-memory frequency summary an ingest feed keeps next to its
    exact batch counts (operators/sketch.py; heavy-hitter monitoring
    without a vocabulary-sized state store).

    Per micro-batch: the batch's token counts fold into a batch sketch
    (≤ depth×width rows) whose cell deltas land by OVERWRITE into a
    deterministic ``batch=<id>`` directory — log-structured, no
    read-modify-write, safe under ANY file arrival order because sketch
    merge is cell-wise addition (commutative + associative;
    merge(halves) == whole is pinned in tests/test_sketch.py), and
    replay-idempotent even though addition is not: foreachBatch is
    at-least-once, and a re-delivered batch rewrites the identical
    deltas in place instead of appending them twice.
    :func:`read_countmin_store` folds the deltas back to one sketch,
    which equals the one-shot batch sketch of everything ingested —
    pinned in tests/test_streaming_corpus.py.

    Scale shape: state on disk is ≤ depth×width rows PER BATCH (a few
    KB), the one streaming-state story in this repo whose size is a
    constant of the operator rather than a function of the corpus.
    """
    import os

    from etl_dag_spark.functions.text import tokens_column
    from etl_dag_spark.operators.sketch import countmin_build

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cnt = (
            batch_df.select(F.explode(tokens_column("text")).alias("key"))
            .groupBy("key")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        countmin_build(cnt, depth=depth, width=width).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(store_path, f"batch={batch_id}"))

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_countmin_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Fold a :func:`stream_countmin` delta store to the current sketch:
    (row, pos, cell), ≤ depth×width rows — cell-wise sum IS the sketch
    merge, so the fold equals ``countmin_merge`` over every batch."""
    return (
        spark.read.parquet(store_path)
        .groupBy("row", "pos")
        .agg(F.sum("cell").cast("bigint").alias("cell"))
    )


def stream_hll(
    docs_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    p: int = 8,
) -> "pyspark.sql.streaming.StreamingQuery":
    """Cumulative HyperLogLog over a streaming corpus's distinct tokens
    (operators/sketch.py::hll_registers) — distinct-cardinality
    tracking with ≤2^p rows of state, the register-table twin of
    :func:`stream_countmin`.

    Per micro-batch the batch's register table APPENDS to a parquet
    store; :func:`read_hll_store` folds with per-register MAX. Unlike
    the CMS's additive fold, MAX is also IDEMPOTENT — a replayed or
    double-delivered batch cannot corrupt the sketch, so this store
    needs no exactly-once guarantee from the sink at all.
    """
    from etl_dag_spark.functions.text import tokens_column
    from etl_dag_spark.operators.sketch import hll_registers

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        keys = batch_df.select(F.explode(tokens_column("text")).alias("key"))
        hll_registers(keys, p=p).coalesce(1).write.mode("append").parquet(store_path)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_hll_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Fold a :func:`stream_hll` delta store to the current register
    table: per-register MAX == hll_merge over every batch."""
    return (
        spark.read.parquet(store_path)
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def stream_kmv(
    docs_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    k: int = 128,
) -> "pyspark.sql.streaming.StreamingQuery":
    """Cumulative KMV (bottom-k) sketch over a streaming corpus's
    distinct tokens (operators/sketch.py::kmv_sketch) — the streaming
    twin that keeps SET-ALGEBRA estimates (|A∪B|, |A∩B|/Jaccard
    against any other KMV store) live during ingest, which the HLL
    store cannot provide.

    Per micro-batch the batch's ≤k-row sketch APPENDS; the fold
    (:func:`read_kmv_store` — bottom-k of the union) is the sketch
    merge, and like the HLL's MAX it is IDEMPOTENT over replayed
    batches (re-unioning the same hashes changes nothing), so the
    store needs no exactly-once sink. State on disk ≤ k rows per
    batch — a constant of the operator."""
    from etl_dag_spark.functions.text import tokens_column
    from etl_dag_spark.operators.sketch import kmv_sketch

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        keys = batch_df.select(F.explode(tokens_column("text")).alias("key"))
        kmv_sketch(keys, k=k).write.mode("append").parquet(store_path)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_kmv_store(spark: SparkSession, store_path: str, k: int = 128) -> DataFrame:
    """Fold a :func:`stream_kmv` delta store to the current sketch:
    bottom-k of the distinct union == kmv_merge over every batch."""
    return spark.read.parquet(store_path).distinct().orderBy("hv").limit(k)


def stream_quantile_sketch(
    docs_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    k: int = 256,
    group_col: str = "lang",
) -> "pyspark.sql.streaming.StreamingQuery":
    """Cumulative mergeable quantile sample sketch over a streaming
    corpus (operators/sketch.py::quantile_sample_sketch) — the
    streaming twin of #124c: keeps per-language DOCUMENT-LENGTH
    quantile estimates live during ingest (the distribution monitor a
    corpus pipeline gates on: a feed whose p90 length collapses is a
    scraper failure, visible batches before a mean would move).

    Per micro-batch the batch's ≤k-rows-per-group sketch APPENDS; the
    fold (:func:`read_quantile_store` — bottom-k of the distinct
    union per group) IS the sketch merge, idempotent over replayed
    batches like the KMV store (re-unioning identical (g, v, hv) rows
    changes nothing), so the store needs no exactly-once sink. State
    on disk ≤ k rows per group per batch."""
    from etl_dag_spark.functions.text import token_count_column
    from etl_dag_spark.operators.sketch import quantile_sample_sketch

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rows = batch_df.select(
            F.col(group_col),
            token_count_column("text").alias("v"),
            F.col("doc_id"),
        )
        quantile_sample_sketch(
            rows, group_col, "v", "CAST(doc_id AS STRING)", k=k
        ).coalesce(1).write.mode("append").parquet(store_path)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_quantile_store(
    spark: SparkSession, store_path: str, k: int = 256
) -> DataFrame:
    """Fold a :func:`stream_quantile_sketch` delta store to the current
    sketch: per-group bottom-k of the distinct union == the merge of
    every batch sketch; feed to ``quantile_sample_estimate`` for the
    live percentiles."""
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("hv", "v")
    return (
        spark.read.parquet(store_path)
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def stream_weighted_sample(
    docs_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    k: int = 100,
    salt: str = "wsamp",
) -> "pyspark.sql.streaming.StreamingQuery":
    """Streaming exact-k WEIGHTED reservoir (Efraimidis–Spirakis
    A-Res) — the continuous-ingest twin of ``etl_weighted_sample``: a
    length/quality-proportional sample of everything ingested so far,
    kept live while the corpus streams in. Works because A-Res keys
    are CONTENT-DERIVED (salted md5 of doc_id → uniform → −ln(u)/w),
    not RNG state: the k smallest keys of a union equal the k smallest
    of (bottom-k(A) ∪ B), so per micro-batch the batch's OWN bottom-k
    rows (≤k, a constant of the operator) simply APPEND to the store
    and the fold (:func:`read_weighted_sample_store` — bottom-k of the
    distinct union) is the reservoir merge. Growing the corpus only
    EVICTS members, never reshuffles them — the append-stability the
    batch sampler pins in tests/test_weighted_sample.py.

    Like the KMV store (and unlike the additive CMS/moment folds) the
    fold is IDEMPOTENT over replayed batches — a re-delivered document
    reproduces the identical key and ``distinct`` collapses it — so
    this store needs no exactly-once guarantee from the sink at all.
    Equality with the one-shot batch sample is pinned in
    tests/test_streaming_corpus.py."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from etl_dag_spark.queries import weighted_sample_keys

        keyed = batch_df.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            weighted_sample_keys(
                batch_df, F.col("n_chars").cast("double"), salt=salt
            ).alias("ares_key"),
        )
        keyed.orderBy("ares_key", "doc_id").limit(k).write.mode("append").parquet(
            store_path
        )

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_weighted_sample_store(
    spark: SparkSession, store_path: str, k: int = 100
) -> DataFrame:
    """Fold a :func:`stream_weighted_sample` delta store to the current
    reservoir: bottom-k by A-Res key of the distinct union == the
    one-shot weighted sample of everything ingested."""
    return (
        spark.read.parquet(store_path)
        .distinct()
        .orderBy("ares_key", "doc_id")
        .limit(k)
    )


def stream_versioned_ingest(
    docs_stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    optimize_every: int | None = None,
    optimize_target_files: int = 8,
    zorder_by: list[str] | None = None,
) -> "pyspark.sql.streaming.StreamingQuery":
    """Streaming ingest into the snapshot-versioned table
    (``sources/versions.py``) — the versioned-lake sink: every
    micro-batch commits ONE append snapshot tagged
    ``txn_id=f"batch-{batch_id}"`` under a ``writer_id`` derived from
    this stream's CHECKPOINT (the stream's durable identity across
    restarts), so a batch replayed after a crash (foreachBatch
    re-delivers the last uncommitted batch) is a manifest-level no-op —
    exactly-once enforced by the TABLE's commit protocol, not by the
    sink's filesystem luck. This is the Delta streaming-sink ``txn``
    idempotence trick: the manifest's per-writer txn map means the
    replay check survives interleaved commits from OTHER writers, and
    two streams sharing one table never mask each other's ``batch-0``
    (both failure modes of the pre-r9 tip-only check). Every batch
    boundary is a time-travelable snapshot: a poisoned feed rolls back
    by reading version N−1; the data files a replayed attempt orphaned
    are invisible to every reader and reclaimed by vacuum.

    ``optimize_every=N`` — AUTO-OPTIMIZE (r10): after every Nth
    micro-batch, compact the tip (``zorder_by`` → OPTIMIZE ZORDER with
    manifest stats) so the table never accumulates unbounded
    small-file debris — the Delta auto-compaction maintenance loop.
    The OPTIMIZE commit carries its own ``txn_id=f"optimize-{batch_id}"``
    under a SEPARATE ``<writer>:optimize`` identity: the per-writer txn
    map holds only each writer's LAST token, so sharing the ingest
    writer would let a replayed append slip past its own check after an
    interleaved OPTIMIZE. A crash between append and OPTIMIZE replays
    both — the append no-ops, the OPTIMIZE (early-checked against the
    tip) runs exactly once. The OPTIMIZE lands as ``op="optimize"``
    (row-preserving, Delta's ``dataChange=false``), so downstream
    incremental consumers using ``read_version_delta`` / ``cdc_rows``
    keep working across every compaction boundary."""
    from etl_dag_spark.sources.versions import compact_version, write_version

    writer = f"stream:{os.path.abspath(checkpoint_dir)}"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_version(
            batch_df,
            table_path,
            op="append",
            txn_id=f"batch-{batch_id}",
            writer_id=writer,
        )
        if optimize_every and (batch_id + 1) % optimize_every == 0:
            compact_version(
                batch_df.sparkSession,
                table_path,
                target_files=optimize_target_files,
                zorder_by=zorder_by,
                txn_id=f"optimize-{batch_id}",
                writer_id=f"{writer}:optimize",
            )

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_merge_ingest(
    updates_stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    order_col: str,
    latest_wins: bool = True,
    stats_cols: list[str] | None = None,
) -> "pyspark.sql.streaming.StreamingQuery":
    """Streaming CDC-UPSERT ingest into the snapshot-versioned table —
    the streaming twin of ``sources/versions.py::merge_version`` and
    the Delta `foreachBatch` + MERGE pattern (r11): every micro-batch
    of keyed updates lands as ONE ``op="merge"`` snapshot commit that
    rewrites only the files holding updated keys and shares every
    untouched file with the parent. The default ``latest_wins=True``
    gives event-time semantics — the greatest ``order_col`` wins per
    key regardless of arrival order, so an out-of-order or replayed
    CDC feed converges to the same table.

    Exactly-once rides the same per-writer txn protocol as
    ``stream_versioned_ingest``: each commit is tagged
    ``txn_id=f"merge-{batch_id}"`` under a checkpoint-derived
    ``writer_id``, so a crash-replayed batch is a manifest-level no-op.
    Every batch boundary is a time-travelable snapshot, and
    ``cdc_rows(v-1, v)`` shows exactly that batch's upserts reading
    only the touched files."""
    from etl_dag_spark.sources.versions import merge_version

    writer = f"stream-merge:{os.path.abspath(checkpoint_dir)}"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_version(
            batch_df.sparkSession,
            table_path,
            batch_df,
            key_cols=key_cols,
            order_col=order_col,
            latest_wins=latest_wins,
            stats_cols=stats_cols,
            txn_id=f"merge-{batch_id}",
            writer_id=writer,
        )

    return (
        updates_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_cdc_ingest(
    cdc_stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    order_col: str,
    op_col: str = "op",
    stats_cols: list[str] | None = None,
) -> "pyspark.sql.streaming.StreamingQuery":
    """Streaming FULL-CDC ingest — the tombstone-aware twin of
    ``stream_merge_ingest`` (r11): every micro-batch of Debezium-style
    rows (``op_col`` ∈ {'I','U','D'}) lands as ONE snapshot commit via
    ``sources/versions.py::apply_cdc_version`` — upserts replace, D
    tombstones REMOVE their keys, per key the greatest ``order_col``
    wins (equal-instant delete beats the upsert), and only the files
    holding batch keys are rewritten. This is the shape a replicated
    OLTP table needs: an upsert-only sink (stream_merge_ingest) can
    never converge to a source that deletes rows.

    Exactly-once rides the per-writer txn protocol: commits are tagged
    ``txn_id=f"cdc-{batch_id}"`` under a checkpoint-derived writer, so
    a crash-replayed batch is a manifest-level no-op. Every batch
    boundary is a time-travelable snapshot; ``cdc_rows(v-1, v)`` shows
    exactly that batch's inserts/updates/deletes from the touched-file
    diff."""
    from etl_dag_spark.sources.versions import apply_cdc_version

    writer = f"stream-cdc:{os.path.abspath(checkpoint_dir)}"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_cdc_version(
            batch_df.sparkSession,
            table_path,
            batch_df,
            key_cols=key_cols,
            order_col=order_col,
            op_col=op_col,
            stats_cols=stats_cols,
            txn_id=f"cdc-{batch_id}",
            writer_id=writer,
        )

    return (
        cdc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_category_counts(
    docs_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    category_col: str = "lang",
) -> "pyspark.sql.streaming.StreamingQuery":
    """Cumulative category histogram over a streaming corpus — the
    state behind a DRIFT MONITOR: as documents stream in, each
    micro-batch's category counts land as deltas (deterministic
    ``batch=<id>`` overwrite — replay-idempotent like the CMS/moment
    stores) and :func:`read_category_store` folds them to the
    distribution observed so far. Feeding the fold plus any reference
    histogram into the #63b χ² arithmetic turns it into a live
    ingest-drift alarm ('today's crawl stopped looking like the
    corpus') without ever re-scanning history. State per batch ≤
    |categories| rows — a constant of the schema."""
    import os

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            batch_df.groupBy(F.col(category_col).alias("category"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            # bounded frame (≤ |categories| rows): one task, one file
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(store_path, f"batch={batch_id}"))
        )

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_category_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Fold a :func:`stream_category_counts` delta store to the current
    histogram: per-category SUM == histogram merge over every batch."""
    return (
        spark.read.parquet(store_path)
        .groupBy("category")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )


def drift_chisq_report(observed: DataFrame, reference: DataFrame) -> DataFrame:
    """Pearson χ² of an observed category histogram against a reference
    one — the batch #63b arithmetic applied to any two (category, n)
    frames (e.g. the streaming store's fold vs a frozen baseline).
    Categories absent from one side count 0 there via a full outer
    join; expected counts scale the reference to the observed total.
    → (category, n_ref, n_obs, expected_obs, chisq_contrib), bounded by
    |categories|."""
    ref = reference.select(
        "category", F.col("n").cast("bigint").alias("n_ref")
    )
    obs = observed.select(
        "category", F.col("n").cast("bigint").alias("n_obs")
    )
    j = (
        ref.join(obs, "category", "full_outer")
        .select(
            "category",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        )
    )
    tot = j.agg(
        F.sum("n_ref").cast("bigint").alias("tot_ref"),
        F.sum("n_obs").cast("bigint").alias("tot_obs"),
    )
    exp = F.col("n_ref").cast("double") / F.col("tot_ref") * F.col("tot_obs")
    return (
        j.join(F.broadcast(tot))
        .withColumn("expected_obs", exp)
        .withColumn(
            "chisq_contrib",
            F.when(
                F.col("n_ref") > 0,
                (F.col("n_obs").cast("double") - exp)
                * (F.col("n_obs").cast("double") - exp)
                / exp,
            ).otherwise(F.lit(float("inf"))),  # novel category = hard alarm
        )
        .select("category", "n_ref", "n_obs", "expected_obs", "chisq_contrib")
    )


def stream_host_cap(
    docs_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    cap: int = 40,
    id_col: str = "doc_id",
    host_col: str = "source",
) -> "pyspark.sql.streaming.StreamingQuery":
    """Streaming per-host document cap — the ingest twin of the batch
    ``etl_host_cap`` gate (#78; r12). The cap-smallest content hashes
    per host are a MERGEABLE summary — topk(A ∪ B) = topk(topk(A) ∪
    topk(B)) under the (hv, doc_id) total order — so the skyline/KMV
    delta-store recipe applies: each micro-batch lands its own per-host
    top-``cap`` under ``batch=<id>`` (overwrite → replay-idempotent),
    and :func:`read_host_cap_store` folds the union with one more
    per-host rank. The store holds ≤ cap × hosts rows per batch; no
    batch ever sees a whole hot host (per_group_top_k's salted
    two-phase pre-prune). The hash rank is the batch gate's exact
    md5 ordering, so the fold equals ``etl_host_cap`` over everything
    ingested — survivors are append-stable across batch splits."""
    from etl_dag_spark.operators import windows as win

    hv = F.expr(
        f"CAST(conv(substring(md5(CAST({id_col} AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        local = win.per_group_top_k(
            batch_df.select(
                F.col(id_col).cast("bigint").alias("doc_id"),
                F.col(host_col).alias("source"),
                hv.alias("hv"),
            ),
            "source",
            [F.col("hv"), F.col("doc_id")],
            cap,
            rank_col="host_rank",
        ).select("doc_id", "source", "hv")
        local.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_path, f"batch={batch_id}")
        )

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_host_cap_store(
    spark: SparkSession, store_path: str, cap: int = 40
) -> DataFrame:
    """Fold a :func:`stream_host_cap` store to the exact global
    survivors: one per-host rank over the union of per-batch local
    survivors (the stored ``hv`` makes the fold hash-free). →
    (doc_id, source, host_rank), equal to the batch gate over every
    ingested document. A store whose stream saw zero non-empty batches
    folds to an empty frame (the operator's schema is static)."""
    from etl_dag_spark.operators import windows as win

    if not (
        os.path.isdir(store_path)
        and any(d.startswith("batch=") for d in os.listdir(store_path))
    ):
        return spark.createDataFrame(
            [], "doc_id bigint, source string, host_rank int"
        )
    u = spark.read.parquet(store_path).drop("batch")
    return win.per_group_top_k(
        u, "source", [F.col("hv"), F.col("doc_id")], cap, rank_col="host_rank"
    ).select("doc_id", "source", "host_rank")


def decontaminate_batch(
    docs: DataFrame,
    eval_shingles: DataFrame,
    n: int = 4,
    min_common: int = 2,
    containment_num: int = 1,
    containment_den: int = 2,
) -> DataFrame:
    """Per-document contamination verdict against a STATIC eval shingle
    set — the per-doc decision core shared by the streaming guard and
    its batch-equality pin. ``eval_shingles`` is (eval_doc_id, s);
    a doc is dropped when ANY eval doc shares ≥ ``min_common`` n-grams
    with it OR contains ≥ num/den of that eval doc's shingles (integer
    cross-multiplication — no float-boundary rows). The decision is
    doc-local given the eval set, so any batch split yields identical
    verdicts. → input columns + (n_eval_hits, dropped)."""
    from etl_dag_spark.functions.text import shingle_rows

    sh = shingle_rows(docs, n=n)
    esz = eval_shingles.groupBy("eval_doc_id").agg(
        F.count(F.lit(1)).alias("n_ev")
    )
    pairs = (
        sh.join(eval_shingles, "s")
        .groupBy("doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
        .join(esz, "eval_doc_id")
    )
    hits = (
        pairs.where(
            (F.col("n_common") >= min_common)
            | (
                F.lit(containment_den) * F.col("n_common")
                >= F.lit(containment_num) * F.col("n_ev")
            )
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_eval_hits"))
    )
    return (
        docs.join(hits, "doc_id", "left")
        .withColumn(
            "n_eval_hits", F.coalesce(F.col("n_eval_hits"), F.lit(0).cast("bigint"))
        )
        .withColumn("dropped", F.col("n_eval_hits") > 0)
    )


def stream_decontaminate(
    docs_stream: DataFrame,
    eval_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    n: int = 4,
    min_common: int = 2,
) -> "pyspark.sql.streaming.StreamingQuery":
    """Streaming decontamination guard (r12) — the ingest twin of the
    batch removal pipeline (#101b): benchmark/eval shingles are STATIC
    for the life of the stream (the realistic shape: eval suites change
    by release, the crawl never stops), each micro-batch's documents
    are verdict-ed against them with :func:`decontaminate_batch`, and
    only clean docs land under ``out_dir/batch=<id>`` (overwrite — an
    at-least-once replay rewrites the identical rows instead of
    duplicating them, the module's store idempotence recipe; per-doc
    decisions are doc-local, so the union over batches equals the
    one-shot batch run). The eval side stays a small static frame
    joined per batch (stream-static shape); candidate volume is
    bounded by batch-shingles ⋈ eval-shingles, never corpus × eval."""
    from etl_dag_spark.functions.text import shingle_rows

    ev = (
        shingle_rows(eval_docs, n=n)
        .select(F.col("doc_id").alias("eval_doc_id"), "s")
        .localCheckpoint(eager=True)  # static: computed once, not per batch
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        verdict = decontaminate_batch(
            batch_df, ev, n=n, min_common=min_common
        )
        verdict.where(~F.col("dropped")).drop(
            "n_eval_hits", "dropped"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
