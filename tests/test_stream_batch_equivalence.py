"""Stream–batch equivalence and watermark semantics.

Structured Streaming's promise is that a windowed aggregation over a stream
converges to the batch answer over the same data. We assert it literally:
the sf events table streamed through a file source (chunked, multiple
micro-batches) must produce byte-identical window counts to the batch
groupBy-window — and, separately, that a watermark actually drops data that
arrives later than the allowed lateness (append-mode emission semantics).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from hudi_examples_spark.sources.readers import load_sf_table
from hudi_examples_spark.streaming.sources import windowed_counts
from tests.conftest import SF_SMALL


def test_stream_window_counts_equal_batch(spark, tmp_path):
    """events chunked into 4 parquet files → file stream → windowed counts
    (complete mode) == batch window aggregation, row for row."""
    events = load_sf_table(spark, SF_SMALL, "events").select("event_id", "ts", "event_type")
    src = str(tmp_path / "chunks")
    # 4 chunks with interleaved timestamps — the stream sees time out of order
    events.withColumn("chunk", (F.col("event_id") % 4).cast("int")).write.partitionBy(
        "chunk"
    ).parquet(src)

    stream = (
        spark.readStream.schema("event_id BIGINT, ts TIMESTAMP, event_type STRING")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src + "/chunk=*")
    )
    agg = windowed_counts(stream, "ts", "1 hour", "1 minute")
    q = (
        agg.select(F.col("window.start").alias("ws"), "n")
        .writeStream.format("memory")
        .queryName("sbe_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = {(r["ws"], r["n"]) for r in spark.table("sbe_counts").collect()}
    batch = {
        (r["ws"], r["n"])
        for r in events.groupBy(F.window("ts", "1 hour").alias("window"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
        .collect()
    }
    assert streamed == batch, (
        f"stream-batch divergence: only-stream={streamed - batch} only-batch={batch - streamed}"
    )


def _drop_json(path: str, name: str, rows, mtime: float):
    """Write a chunk with an explicit modification time — the file source orders
    batches by mtime, and same-millisecond writes would make the order (and the
    watermark progression) nondeterministic."""
    fp = os.path.join(path, name)
    with open(fp, "w") as f:
        for event_id, ts in rows:
            f.write(json.dumps({"event_id": event_id, "ts": ts}) + "\n")
    os.utime(fp, (mtime, mtime))


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Append-mode watermark semantics: a row older than (max_ts - delay) when
    its window has already been finalized must NOT appear in the output."""
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    # batch 1: two rows in the 10:00 window; batch 2 jumps to 12:00 (watermark
    # advances past 10:05); batch 3 triggers the eviction+emission of the
    # closed 10:00 window (Spark finalizes state one batch after the watermark
    # passes, and within a batch it merges BEFORE evicting — drop-by-watermark
    # is best-effort, so the late row must arrive after the finalizing batch);
    # batch 4 is the LATE row for the already-finalized 10:00 window.
    import time as _time

    t0 = _time.time()
    _drop_json(src, "b0.json", [(1, "2024-01-01 10:00:30"), (2, "2024-01-01 10:01:00")], t0)
    _drop_json(src, "b1.json", [(3, "2024-01-01 12:00:00")], t0 + 60)
    _drop_json(src, "b2.json", [(5, "2024-01-01 12:01:00")], t0 + 120)
    _drop_json(src, "b3.json", [(4, "2024-01-01 10:00:45")], t0 + 180)

    stream = (
        spark.readStream.schema("event_id BIGINT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    agg = windowed_counts(stream, "ts", "5 minutes", "10 minutes")
    q = (
        agg.select(F.col("window.start").cast("string").alias("ws"), "n")
        .writeStream.format("memory")
        .queryName("late_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r["ws"]: r["n"] for r in spark.table("late_counts").collect()}
    # the 10:00 window was finalized with count 2 — the late row (event 4)
    # arrived after finalization and must not re-open or re-emit the window
    assert out.get("2024-01-01 10:00:00") == 2, f"got {out}"
    assert len([w for w in out if w == "2024-01-01 10:00:00"]) == 1


def test_stream_session_window_equals_batch(spark, tmp_path):
    """Session windows (5-min gap) over a chunked stream == batch session
    aggregation — covers the session_window operator under streaming."""
    events = load_sf_table(spark, SF_SMALL, "events").select("user_id", "ts").filter(
        F.col("user_id") < 50
    )
    src = str(tmp_path / "sess_chunks")
    events.withColumn("chunk", (F.col("user_id") % 3).cast("int")).write.partitionBy(
        "chunk"
    ).parquet(src)

    stream = (
        spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/chunk=*")
    )
    # watermark wider than the data's time span: unlike the tumbling-window
    # complete-mode operator, the session-merge operator DOES drop rows below
    # the watermark, and the chunks deliver time out of order — the subject
    # here is cross-batch session merging, not lateness (covered above)
    agg = (
        stream.withWatermark("ts", "400 days")
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.select("user_id", F.col("w.start").alias("ws"), "n")
        .writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = {(r["user_id"], r["ws"], r["n"]) for r in spark.table("sess_counts").collect()}
    batch = {
        (r["user_id"], r["ws"], r["n"])
        for r in events.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("ws"), "n")
        .collect()
    }
    assert streamed == batch
