"""Structured Streaming surface (SURVEY §2.11).

- :func:`stream_upsert_sink` — ``foreachBatch`` upsert into a Table; each micro-batch
  is one timeline instant (exactly-once ≈ idempotent instant per batch id).
- :func:`incremental_source_by_completion` — the DEFAULT micro-batch loop over
  new table commits, cursored on COMPLETION time (round 9): under non-blocking
  concurrency a begin-id cursor provably drops a commit that begins early but
  publishes late; the completion cursor makes publish order the cursor order.
  :func:`cdc_source` (change events) and the higher-level consumers
  (``pipe_table_to_table``, ``IncrementalRollup``) ride the same cursor.
- :func:`incremental_source` — the begin-id cursor form of the
  ``READ_AS_STREAMING`` / ``read.start-commit`` surface. Kept for parity and
  for the in-repo demonstration of its NBCC timeline hole
  (tests/test_stream_batch_equivalence.py); new consumers should use the
  completion-cursor variant.
- :func:`rate_datagen` — Flink-datagen-style synthetic source on Spark's rate source.
- passthroughs for watermarks/windows (absent in the reference, free in Spark).
"""

from hudi_examples_spark.streaming.sinks import stream_upsert_sink
from hudi_examples_spark.streaming.sources import (
    cdc_source,
    incremental_source,
    incremental_source_by_completion,
    rate_datagen,
)

__all__ = [
    "stream_upsert_sink",
    "incremental_source",
    "incremental_source_by_completion",
    "cdc_source",
    "rate_datagen",
]
