"""Streaming layer: foreachBatch upsert sink, exactly-once replay, incremental
pipe, file-stream ingestion, rate datagen, windowed aggregation."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from hudi_examples_spark.streaming.sinks import make_batch_handler, stream_upsert_sink
from hudi_examples_spark.streaming.sources import (
    incremental_source,
    pipe_table_to_table,
    rate_datagen,
    windowed_counts,
)
from tests.test_table_cow import TRIPS_SCHEMA, make_table, trips_df


def test_batch_handler_upsert_and_idempotent_replay(spark, tmp_path):
    """T1: replayed batch ids (checkpoint recovery) must not double-apply."""
    tbl = make_table(spark, tmp_path)
    handler = make_batch_handler(tbl, sink_name="s1")
    handler(trips_df(spark), 0)
    assert tbl.count() == 8
    batch = trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 50.0, "san_francisco")])
    handler(batch, 1)
    assert tbl.read().filter("uuid='334e26e9'").collect()[0]["fare"] == 50.0
    n_commits = len(tbl.timeline.completed_data_instants())
    handler(batch, 1)  # replay same batch id — must be a no-op
    assert len(tbl.timeline.completed_data_instants()) == n_commits
    assert tbl.count() == 8


def test_cdc_handler(spark, tmp_path):
    tbl = make_table(spark, tmp_path)
    handler = make_batch_handler(tbl, sink_name="cdc", op_col="_op")
    ins = trips_df(spark).withColumn("_op", F.lit("I"))
    handler(ins, 0)
    cdc = spark.createDataFrame(
        [(1695115999911, "c8abbe79", "rider-J", "driver-T", 17.85, "chennai", "D")],
        TRIPS_SCHEMA + ", _op STRING",
    )
    handler(cdc, 1)
    assert tbl.count() == 7


def test_mor_inline_compaction_trigger(spark, tmp_path):
    """DeltaStreamerExample.scala:52-55: compaction every N delta commits."""
    tbl = make_table(spark, tmp_path, table_type="mor")
    handler = make_batch_handler(tbl, sink_name="s2", compact_every=3)
    for i in range(4):
        handler(
            trips_df(spark, [(1695159649087 + i, f"uuid-{i}", "r", "d", float(i), "chennai")]), i
        )
    actions = [i.action for i in tbl.timeline.completed_data_instants()]
    assert "replacecommit" in actions, f"expected inline compaction, got {actions}"
    assert tbl.count() == 4


def test_incremental_pipe_table_to_table(spark, tmp_path):
    """M12/T4: Hudi2Hudi — downstream table follows upstream through polling."""
    src = make_table(spark, tmp_path / "src")
    dst = make_table(spark, tmp_path / "dst")
    src.insert(trips_df(spark))
    handler = make_batch_handler(dst, sink_name="pipe")
    assert pipe_table_to_table(src, dst, handler, n_polls=2) == 1
    assert dst.count() == 8
    src.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 66.0, "san_francisco")]))
    poll_applied = pipe_table_to_table(src, dst, handler, n_polls=1, start_ct=dst_latest(src, dst))
    assert dst.read().filter("uuid='334e26e9'").collect()[0]["fare"] != 19.10 or poll_applied


def dst_latest(src, dst):
    # resume from the last src COMPLETION stamp already reflected in dst: here
    # the first commit (pipe_table_to_table cursors on completion time, r9)
    insts = src.timeline.completed_data_instants()
    return insts[0].committed_at or 0.0


def test_incremental_source_poll_semantics(spark, tmp_path):
    src = make_table(spark, tmp_path)
    poll = incremental_source(src)
    assert poll() is None  # empty table
    src.insert(trips_df(spark))
    first = poll()
    assert first is not None and first.count() == 8
    assert poll() is None  # nothing new
    src.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 12.0, "san_francisco")]))
    second = poll()
    assert [r["uuid"] for r in second.collect()] == ["334e26e9"]


def test_file_stream_into_table(spark, tmp_path):
    """T2/T3 end-to-end: file source → writeStream.foreachBatch → table commits."""
    src_dir = str(tmp_path / "incoming")
    os.makedirs(src_dir)
    tbl = make_table(spark, tmp_path)

    def drop_file(name, rows):
        with open(os.path.join(src_dir, name), "w") as f:
            for ts, uuid, rider, driver, fare, city in rows:
                f.write(
                    json.dumps(
                        {"ts": ts, "uuid": uuid, "rider": rider, "driver": driver,
                         "fare": fare, "city": city}
                    )
                    + "\n"
                )

    drop_file("b0.json", [(1, "s-1", "r", "d", 10.0, "chennai"), (2, "s-2", "r", "d", 20.0, "chennai")])
    stream = spark.readStream.schema(TRIPS_SCHEMA).json(src_dir)
    q = stream_upsert_sink(
        stream, tbl, str(tmp_path / "ckpt"), sink_name="file_ingest",
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    assert tbl.count() == 2
    # second file, second run (new availableNow query, same checkpoint)
    drop_file("b1.json", [(3, "s-1", "r", "d", 99.0, "chennai"), (4, "s-3", "r", "d", 30.0, "chennai")])
    q2 = stream_upsert_sink(
        spark.readStream.schema(TRIPS_SCHEMA).json(src_dir), tbl, str(tmp_path / "ckpt"),
        sink_name="file_ingest", trigger={"availableNow": True},
    )
    q2.awaitTermination(120)
    assert tbl.count() == 3
    assert tbl.read().filter("uuid='s-1'").collect()[0]["fare"] == 99.0


def test_rate_datagen_and_windowed_counts(spark, tmp_path):
    """S11 + T6: rate source with synthesized columns into a windowed agg sink."""
    gen = rate_datagen(
        spark,
        rows_per_second=500,
        columns={
            "uuid": F.concat(F.lit("u-"), F.col("value").cast("string")),
            "fare": (F.col("value") % 100).cast("double"),
        },
    )
    agg = windowed_counts(gen, "timestamp", "10 seconds", "5 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("rate_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            q.processAllAvailable()
            if spark.sql("select sum(n) as s from rate_counts").collect()[0]["s"]:
                break
            time.sleep(1)
        total = spark.sql("select sum(n) as s from rate_counts").collect()[0]["s"]
        assert total and total > 0
    finally:
        q.stop()


def test_cdc_source_emits_ops(spark, tmp_path):
    """Streaming CDC feed: polls yield I/U/D events with before/after images."""
    from hudi_examples_spark.streaming.sources import cdc_source

    tbl = make_table(spark, tmp_path)
    tbl.insert(trips_df(spark))
    poll = cdc_source(tbl)
    first = poll()
    assert first is not None and {r["op"] for r in first.collect()} == {"I"}
    assert poll() is None  # offset advanced, no new commits
    tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 88.0, "san_francisco")]))
    tbl.delete(spark.createDataFrame([("c8abbe79",)], "uuid STRING"))
    batch = poll().collect()
    ops = {r["key"]: r["op"] for r in batch}
    assert ops["334e26e9"] == "U" and ops["c8abbe79"] == "D"
    after = {r["key"]: r["after"] for r in batch}
    assert after["334e26e9"]["fare"] == 88.0 and after["c8abbe79"] is None


def test_stream_corpus_quality_equals_batch(spark, tmp_path):
    """Streaming corpus scoring (readStream → quality columns → exactly-once
    upsert sink) must produce a table identical to the batch quality query —
    stream-batch equivalence for the LLM corpus pipeline."""
    from hudi_examples_spark.operators.llm_pipeline5 import text_quality_score
    from hudi_examples_spark.sources.readers import load_sf_table
    from hudi_examples_spark.streaming.corpus import SCORED_DDL, stream_corpus_quality
    from hudi_examples_spark.table import Table, TableConfig
    from tests.conftest import SF_SMALL

    docs_dir = str(tmp_path / "docs_in")
    load_sf_table(spark, SF_SMALL, "documents").write.parquet(docs_dir)
    tbl = Table.create(
        spark,
        str(tmp_path / "scored"),
        SCORED_DDL,
        TableConfig(record_key=["doc_id"], precombine="q_num"),
    )
    q = stream_corpus_quality(
        spark, docs_dir, tbl, str(tmp_path / "ckpt"), trigger={"availableNow": True}
    )
    q.awaitTermination(120)

    got = {r["doc_id"]: (r["n_words"], r["q_num"], r["band"]) for r in tbl.read().collect()}
    want = {
        r["doc_id"]: (r["n_words"], r["q_num"], r["band"])
        for r in text_quality_score(spark, SF_SMALL).collect()
    }
    assert got == want

    # restart with the same checkpoint: no new files → no new instants (idempotent)
    n_instants = len(tbl.timeline.completed_data_instants())
    q2 = stream_corpus_quality(
        spark, docs_dir, tbl, str(tmp_path / "ckpt"), trigger={"availableNow": True}
    )
    q2.awaitTermination(120)
    assert len(tbl.timeline.completed_data_instants()) == n_instants


def test_partial_update_stream_handler(spark, tmp_path):
    """Streaming partial updates: per-column delta batches compose through the
    column-level MOR merge, replayed batch ids are skipped (exactly-once),
    and inline compaction resolves the partial chains."""
    from hudi_examples_spark.table import Table, TableConfig

    tbl = Table.create(
        spark,
        str(tmp_path / "pt"),
        "id STRING, a STRING, b BIGINT, ts BIGINT",
        TableConfig(record_key=["id"], precombine="ts", table_type="mor"),
    )
    tbl.insert(
        spark.createDataFrame(
            [(f"k{i}", f"a{i}", i, 1) for i in range(10)],
            "id STRING, a STRING, b BIGINT, ts BIGINT",
        )
    )
    handler = make_batch_handler(tbl, sink_name="pstream", partial=True, compact_every=2)
    handler(spark.createDataFrame([("k1", 100, 2)], "id STRING, b BIGINT, ts BIGINT"), 0)
    handler(spark.createDataFrame([("k1", "AA", 3)], "id STRING, a STRING, ts BIGINT"), 1)
    handler(spark.createDataFrame([("k1", 100, 2)], "id STRING, b BIGINT, ts BIGINT"), 0)  # replay
    r = tbl.read().filter("id = 'k1'").first()
    assert (r["a"], r["b"], r["ts"]) == ("AA", 100, 3)
    assert tbl.read().count() == 10
    # the replayed batch 0 must not have produced a fourth data instant
    assert (
        sum(1 for i in tbl.timeline.completed_data_instants() if i.meta.get("sink_name") == "pstream")
        == 2
    )
