"""Kafka-semantics surrogate (streaming/topic.py): offsets, groups, redelivery.

Parity: DeltaStreamerExample.scala:36-38 (auto.offset.reset, group.id),
Kafka2HudiPipeline.java:88-98 (group offset resume).
"""

from __future__ import annotations

from hudi_examples_spark.streaming.topic import FileTopic

DDL = "k STRING, v BIGINT"


def _rows(spark, lo, hi):
    return spark.createDataFrame([(f"k{i % 7}", i) for i in range(lo, hi)], DDL)


def test_offsets_dense_and_key_sticky(spark, tmp_path):
    t = FileTopic(spark, str(tmp_path / "t"), DDL, n_partitions=4)
    t.produce(_rows(spark, 0, 40), key_col="k")
    t.produce(_rows(spark, 40, 80), key_col="k")
    df, _end = t.consume("g0")
    rows = df.collect()
    assert len(rows) == 80
    # offsets dense per partition across batches
    by_part: dict[int, list[int]] = {}
    for r in rows:
        by_part.setdefault(r["partition"], []).append(r["offset"])
    assert sum(len(v) for v in by_part.values()) == 80
    for p, offs in by_part.items():
        assert sorted(offs) == list(range(len(offs))), f"partition {p} offsets dense from 0"
    # same key always lands in the same partition (per-key order preserved)
    key_parts = {}
    for r in rows:
        key_parts.setdefault(r["k"], set()).add(r["partition"])
    assert all(len(ps) == 1 for ps in key_parts.values())


def test_group_commit_resume_and_redelivery(spark, tmp_path):
    t = FileTopic(spark, str(tmp_path / "t"), DDL, n_partitions=2)
    t.produce(_rows(spark, 0, 10))
    df1, end1 = t.consume("g")
    assert df1.count() == 10
    # no commit → redelivered in full (at-least-once)
    df1b, _ = t.consume("g")
    assert df1b.count() == 10
    t.commit("g", end1)
    # committed → caught up
    df2, end2 = t.consume("g")
    assert df2.count() == 0
    assert df2.columns == df1.columns, "empty and non-empty consumes agree on column order"
    t.produce(_rows(spark, 10, 25))
    df3, end3 = t.consume("g")
    got = {r["v"] for r in df3.collect()}
    assert got == set(range(10, 25)), "only the new batch is delivered"
    t.commit("g", end3)


def test_auto_offset_reset_latest(spark, tmp_path):
    t = FileTopic(spark, str(tmp_path / "t"), DDL, n_partitions=2)
    t.produce(_rows(spark, 0, 20))
    df, end = t.consume("fresh", auto_offset_reset="latest")
    assert df.count() == 0, "latest: backlog skipped"
    t.commit("fresh", end)
    t.produce(_rows(spark, 20, 30))
    df2, _ = t.consume("fresh", auto_offset_reset="latest")
    assert {r["v"] for r in df2.collect()} == set(range(20, 30))


def test_independent_groups_and_manifest_pruning(spark, tmp_path):
    t = FileTopic(spark, str(tmp_path / "t"), DDL, n_partitions=2)
    t.produce(_rows(spark, 0, 10))
    _df, end = t.consume("a")
    t.commit("a", end)
    t.produce(_rows(spark, 10, 20))
    # group b starts from earliest regardless of a's position
    dfb, _ = t.consume("b")
    assert dfb.count() == 20
    # caught-up group a reads only the second batch's files (manifest pruning:
    # the first batch's ranges are entirely below a's committed offsets)
    pruned = [
        b["seq"]
        for b in t.meta["batches"]
        if any(r[1] > (t.committed("a") or {}).get(int(p), 0) for p, r in b["ranges"].items())
    ]
    assert pruned == [2]


def test_topic_feeds_keyed_table(spark, tmp_path):
    """End-to-end: topic → consume → exactly-once-style upsert into a keyed
    table, committing offsets only after the table commit (the DeltaStreamer
    checkpoint-in-commit-metadata pattern)."""
    from hudi_examples_spark.table import Table, TableConfig

    t = FileTopic(spark, str(tmp_path / "t"), DDL, n_partitions=2)
    tbl = Table.create(
        spark,
        str(tmp_path / "tbl"),
        "k STRING, v BIGINT",
        TableConfig(record_key=["k"], precombine="v"),
    )
    t.produce(_rows(spark, 0, 40), key_col="k")
    df, end = t.consume("ingest")
    tbl.upsert(df.select("k", "v"))
    t.commit("ingest", end)
    assert tbl.read().count() == 7  # 7 distinct keys, precombine keeps max v
    top = {r["k"]: r["v"] for r in tbl.read().collect()}
    assert top["k0"] == 35 and top["k6"] == 34


def _producer_proc(base: str, lo: int, out) -> None:
    from pyspark.sql import SparkSession

    from hudi_examples_spark.streaming.topic import FileTopic

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"topic-producer-{lo}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    try:
        t = FileTopic(spark, base, DDL, n_partitions=4)
        for b in range(3):
            rows = [(f"k{i % 7}", i) for i in range(lo + b * 20, lo + b * 20 + 20)]
            t.produce(spark.createDataFrame(rows, DDL), key_col="k")
        out.put(("ok", lo))
    finally:
        spark.stop()


def test_concurrent_producers_lose_nothing(spark, tmp_path):
    """Two real producer processes interleave produce() calls into one topic:
    the produce lock must serialize the meta read-modify-write so every batch
    gets a unique seq, the ends add up, and every record survives."""
    import multiprocessing as mp

    base = str(tmp_path / "multi")
    FileTopic(spark, base, DDL, n_partitions=4)  # create the topic
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_producer_proc, args=(base, 0, q)),
        ctx.Process(target=_producer_proc, args=(base, 1000, q)),
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=300)
        assert p.exitcode == 0
    assert {q.get()[0] for _ in range(2)} == {"ok"}

    t = FileTopic(spark, base, DDL, n_partitions=4)
    seqs = [b["seq"] for b in t.meta["batches"]]
    assert len(seqs) == 6 and len(set(seqs)) == 6, seqs  # no lost/duplicate batches
    assert sum(t.end_offsets().values()) == 120  # every record accounted for
    df, _end = t.consume("g-all")
    rows = df.collect()
    assert len(rows) == 120
    assert {r["v"] for r in rows} == set(range(0, 60)) | set(range(1000, 1060))
    # dense offsets per partition even under interleaved producers
    by_part: dict[int, list[int]] = {}
    for r in rows:
        by_part.setdefault(r["partition"], []).append(r["offset"])
    for p_, offs in by_part.items():
        assert sorted(offs) == list(range(len(offs))), f"partition {p_} offsets dense"
