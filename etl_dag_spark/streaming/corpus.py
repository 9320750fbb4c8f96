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
