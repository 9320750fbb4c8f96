"""Streaming last-touch attribution (twin of `olap_attribution_last_touch`).

Batch attribution asof-joins every purchase against the full click
history; an ingest feed can't rescan history per micro-batch. Same
store discipline as the other unbounded-history twins
(streaming/corpus.py, streaming/entities.py): per batch, the batch's
per-user LATEST click appends to a user-bucketed parquet store (a
log-structured delta — never a full-store rewrite), and purchases
attribute against the read-time fold of that store unioned with the
batch's own clicks.

Why keeping only the per-user latest click per batch is lossless for
last-touch: under the time-ordered-arrival contract (micro-batch N's
events all precede batch N+1's), every future purchase is at-or-after
the whole current batch, so a user's older in-batch clicks can never
out-rank the latest one for ANY future purchase. Within the batch
itself, the full click set participates via the asof join, so
intra-batch ordering is exact.

Replay safety (foreachBatch is at-least-once): the store fold is an
argmax per user over (c_us, event_id) — MAX is idempotent, so a
replayed delta append cannot move it; a replayed batch therefore sees
the identical candidate set and emits byte-identical attribution rows,
which `read_attributions` collapses by purchase event_id. Out-of-order
batches degrade to arrival-time semantics (a click arriving after its
purchase's batch cannot retro-attribute — earlier emits stand), the
same contract as stream_line_dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_dag_spark.operators.dedup import _ensure_bucketed_store
from etl_dag_spark.operators.joins import asof_join

#: shared with the batch registry query — one lookback constant
ATTR_WINDOW_US = 7 * 86_400 * 1_000_000


def attribution_base(events: DataFrame) -> DataFrame:
    """The stateless prep stage shared verbatim by the batch query and
    the stream: typed JSON campaign extract, µs event time, exact
    cents. ``events`` needs event_id / user_id / event_type / value /
    props plus either ``ts_ns`` (batch loader) or ``ts_utc`` (stream
    source) — both reduce to the same integer µs (`unix_micros` reads
    the stored instant; the session tz only affects rendering)."""
    us = (
        F.expr("ts_ns DIV 1000")
        if "ts_ns" in events.columns
        else F.unix_micros("ts_utc")
    )
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        us.alias("us"),
        F.coalesce(F.floor(F.col("value") * 100).cast("bigint"), F.lit(0)).alias(
            "cents"
        ),
        F.pmod(F.from_json("props", "k bigint")["k"], F.lit(8))
        .cast("int")
        .alias("campaign"),
    )


def attribute_purchases(
    purchases: DataFrame, clicks: DataFrame, window_us: int = ATTR_WINDOW_US
) -> DataFrame:
    """Last-touch verdict for each purchase row against a click
    candidate set — the asof carry plus the lookback gate, shared by
    batch and stream so the two cannot drift. ``purchases`` needs
    (event_id, user_id, p_us, cents); ``clicks`` (user_id, us,
    event_id, campaign, c_us)."""
    att = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="p_us",
        right_ts="us",
        payload_cols=["campaign", "c_us"],
        right_order="event_id",
    )
    return att.select(
        "event_id",
        "user_id",
        "p_us",
        "cents",
        F.when(
            F.col("c_us").isNull() | (F.col("p_us") - F.col("c_us") > window_us),
            F.lit("none"),
        )
        .otherwise(F.concat(F.lit("c"), F.col("campaign").cast("string")))
        .alias("campaign"),
    )


_STORE_SCHEMA = "user_id BIGINT, c_us BIGINT, click_id BIGINT, campaign INT"


def read_last_clicks(spark: SparkSession, store_table: str) -> DataFrame:
    """Fold the delta store to the per-user latest click (greatest
    (c_us, click_id) — idempotent under replayed deltas). The window
    partitions on the store's bucket key, so the fold rides the
    bucketed scan without a shuffle."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("c_us").desc(), F.col("click_id").desc()
    )
    return (
        spark.table(store_table)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def stream_attribute_last_touch(
    events_stream: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    store_table: str = "last_click_store",
    store_path: str | None = None,
    window_us: int = ATTR_WINDOW_US,
    n_buckets: int = 8,
):
    """Continuously attribute streamed purchases; returns the
    StreamingQuery. Attribution rows (purchase event_id, user_id,
    p_us, cents, campaign, batch_id) append to ``out_path``."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        _ensure_bucketed_store(
            spark, store_table, _STORE_SCHEMA, ["user_id"], n_buckets, path=store_path
        )
        base = attribution_base(batch_df).localCheckpoint()  # two consumers
        clicks_b = base.where(F.col("event_type") == "click").select(
            "user_id",
            F.col("us").alias("c_us"),
            F.col("event_id").alias("click_id"),
            "campaign",
        )
        purchases_b = base.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", F.col("us").alias("p_us"), "cents"
        )

        # candidates: folded historical latest per user ∪ the batch's
        # own clicks (full set — intra-batch ordering must be exact)
        hist = read_last_clicks(spark, store_table)
        cand = hist.unionByName(clicks_b).select(
            "user_id",
            F.col("c_us").alias("us"),
            F.col("click_id").alias("event_id"),
            "campaign",
            "c_us",
        )
        (
            attribute_purchases(purchases_b, cand, window_us)
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            .write.mode("append")
            .parquet(out_path)
        )

        # delta append AFTER the attribution read (the store read above
        # must not see this batch's clicks twice); per-user latest only
        # — lossless for future batches under time-ordered arrival
        wb = Window.partitionBy("user_id").orderBy(
            F.col("c_us").desc(), F.col("click_id").desc()
        )
        delta = (
            clicks_b.withColumn("__rn", F.row_number().over(wb))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        delta.write.mode("append").bucketBy(n_buckets, "user_id").format(
            "parquet"
        ).saveAsTable(store_table)

    return (
        events_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_attributions(spark: SparkSession, out_path: str) -> DataFrame:
    """Replay-tolerant read of the attribution output: one row per
    purchase (replayed deliveries are byte-identical — keep the
    greatest batch_id deterministically)."""
    w = Window.partitionBy("event_id").orderBy(F.col("batch_id").desc())
    return (
        spark.read.parquet(out_path)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "batch_id")
    )
