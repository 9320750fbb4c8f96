"""Streaming corpus-clean equals its batch twin (SURVEY §2e 34g)."""

from __future__ import annotations

import pytest

from etl_dag_spark.sources.tables import load_table
from etl_dag_spark.streaming.corpus import clean_documents, read_document_stream
from etl_dag_spark.streaming.events import run_to_memory

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def doc_stream_src(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("docs_stream"))
    (
        load_table(spark, SF_DIR, "documents")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def test_stream_corpus_clean_equals_batch(spark, doc_stream_src):
    stream = clean_documents(read_document_stream(spark, doc_stream_src))
    run_to_memory(stream, "corpus_clean_stream", mode="append")
    got = {
        r.doc_id: (r.clean_text, r.lang_pred, r.n_tokens, r.source)
        for r in spark.table("corpus_clean_stream").collect()
    }
    want = {
        r.doc_id: (r.clean_text, r.lang_pred, r.n_tokens, r.source)
        for r in clean_documents(spark.read.parquet(doc_stream_src)).collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_corpus_clean_is_incremental(spark, doc_stream_src):
    stream = clean_documents(read_document_stream(spark, doc_stream_src))
    q = (
        stream.writeStream.format("memory")
        .queryName("corpus_clean_batches")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.lastProgress["batchId"] >= 2
