"""Streaming upsert sink: micro-batch → one timeline instant.

Parity: DeltaStreamer continuous mode (``DeltaStreamerExample.scala:12-65``) and the
Flink streaming writer with checkpoint-based exactly-once
(``HudiDataStreamWriter.java:63-82``). Spark-first shape: ``writeStream.foreachBatch``
applying ``Table.upsert``/``write_cdc``; exactly-once comes from recording the
(sink_name, batch_id) in the commit's timeline metadata and skipping replayed batches
after checkpoint recovery — idempotent instants, the same trick Hudi plays with
checkpoint metadata in deltacommits.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from hudi_examples_spark.table import ConcurrentWriteConflict, Table


def _already_applied(table: Table, sink_name: str, batch_id: int) -> bool:
    for inst in table.timeline.completed_data_instants():
        m = inst.meta
        if m.get("sink_name") == sink_name and m.get("stream_batch_id") == batch_id:
            return True
    return False


def make_batch_handler(
    table: Table,
    sink_name: str = "stream",
    op_col: str | None = None,
    compact_every: int | None = 5,
    pre_commit_validator: Callable[[DataFrame], None] | None = None,
    partial: bool = False,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch handler (exposed separately so tests and non-streaming
    micro-batch loops can drive it directly).

    ``compact_every``: MOR inline-compaction cadence in delta commits — the
    NUM_COMMITS trigger of ``DeltaStreamerExample.scala:52-55``.
    ``pre_commit_validator``: M21 hook — raise to abort the batch before commit.
    ``partial``: route batches through ``Table.update_partial`` — the stream
    carries only (keys + precombine + changed columns), the column-level MOR
    merge composes them, and inline compaction periodically resolves the
    partial chains back to full rows. The streaming shape for CDC feeds that
    publish per-column deltas of wide tables.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if _already_applied(table, sink_name, batch_id):
            return
        if pre_commit_validator is not None:
            pre_commit_validator(batch_df)
        # the (sink, batch_id) identity stamp rides IN the commit's metadata —
        # atomic with the instant publish (a crash can no longer land between
        # commit and stamp, which would have replayed the batch; keyed-table
        # replay was idempotent anyway, but now the window is gone) and one
        # timeline write + zero timeline re-scans per micro-batch instead of
        # a post-commit instant rewrite (r11, guide §6: fewer metadata
        # round-trips per commit cycle)
        stamp = {"sink_name": sink_name, "stream_batch_id": batch_id}
        if partial:
            table.update_partial(batch_df, extra_meta=stamp)
        elif op_col is not None and op_col in batch_df.columns:
            table.write_cdc(batch_df, op_col, extra_meta=stamp)
        else:
            table.upsert(batch_df, extra_meta=stamp)
        if (
            compact_every
            and table.config.table_type == "mor"
            and table.should_compact(compact_every)
        ):
            try:
                table.compact()
            except ConcurrentWriteConflict:
                # another process's service won the race — compaction is
                # best-effort maintenance, so skip and let the next batch's
                # trigger retry rather than failing the streaming query
                pass

    return handle


def stream_upsert_sink(
    stream_df: DataFrame,
    table: Table,
    checkpoint_dir: str,
    sink_name: str = "stream",
    op_col: str | None = None,
    trigger: dict | None = None,
    compact_every: int | None = 5,
):
    """T2/T3: continuous ingestion — returns the started StreamingQuery."""
    handler = make_batch_handler(table, sink_name, op_col, compact_every)
    writer = (
        stream_df.writeStream.foreachBatch(handler)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
