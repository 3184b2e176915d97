"""Streaming corpus ingestion: documents stream → quality scoring → keyed table.

The LLM-pipeline quality classifier (operators/llm_pipeline5.py) run as a
Structured Streaming stage: ``readStream`` over a documents directory, the
same whole-stage-codegen scoring expressions, then the exactly-once
``foreachBatch`` upsert sink (streaming/sinks.py — idempotent batch-id-stamped
instants). This is the streaming half of the corpus pipeline: new document
drops land in the scored corpus table incrementally, and a batch rebuild of
the same table is bit-identical (stream-batch equivalence by construction —
both paths share ``with_quality_columns``).

Scale stance: the scoring stage is per-row expression work (no shuffle, no
state); the only stateful piece is the sink's keyed upsert, which shuffles
O(micro-batch), never O(table). File-source listing is incremental
(``maxFilesPerTrigger`` controls batch sizing at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hudi_examples_spark.operators.llm_pipeline5 import with_quality_columns
from hudi_examples_spark.streaming.sinks import stream_upsert_sink
from hudi_examples_spark.table import Table

#: schema of the driver's documents tables (TESTDATA.md)
DOCS_DDL = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

#: the scored-corpus table schema (what the stream writes)
SCORED_DDL = "doc_id BIGINT, lang STRING, n_words BIGINT, q_num BIGINT, band STRING"


def scored_docs_stream(spark: SparkSession, docs_dir: str, max_files: int | None = None) -> DataFrame:
    """``readStream`` over a documents parquet directory with quality columns
    appended — a streaming DataFrame ready for any sink."""
    reader = spark.readStream.schema(DOCS_DDL)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.parquet(docs_dir)
    return with_quality_columns(stream).select(
        "doc_id", "lang", "n_words", "q_num", "band"
    )


def stream_corpus_quality(
    spark: SparkSession,
    docs_dir: str,
    table: Table,
    checkpoint_dir: str,
    trigger: dict | None = None,
    max_files: int | None = None,
):
    """Start the scored-corpus ingestion; returns the StreamingQuery.

    ``trigger={"availableNow": True}`` drains the current directory contents
    and stops — the batch-rebuild-equivalent mode used in tests.
    ``max_files`` forces micro-batch sizing (maxFilesPerTrigger) so a drain
    exercises multiple exactly-once sink commits instead of one.
    """
    scored = scored_docs_stream(spark, docs_dir, max_files=max_files)
    return stream_upsert_sink(
        scored,
        table,
        checkpoint_dir,
        sink_name="corpus_quality",
        trigger=trigger or {"availableNow": True},
    )
