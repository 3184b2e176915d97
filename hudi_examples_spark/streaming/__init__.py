"""Structured Streaming surface (SURVEY §2.11).

- :func:`stream_upsert_sink` — ``foreachBatch`` upsert into a Table; each micro-batch
  is one timeline instant (exactly-once ≈ idempotent instant per batch id).
- :func:`incremental_source` — micro-batch loop over new table commits (the
  ``READ_AS_STREAMING`` / ``read.start-commit`` surface).
- :func:`rate_datagen` — Flink-datagen-style synthetic source on Spark's rate source.
- passthroughs for watermarks/windows (absent in the reference, free in Spark).
"""

from hudi_examples_spark.streaming.sinks import stream_upsert_sink
from hudi_examples_spark.streaming.sources import incremental_source, rate_datagen

__all__ = ["stream_upsert_sink", "incremental_source", "rate_datagen"]
