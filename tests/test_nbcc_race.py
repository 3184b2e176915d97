"""A REAL out-of-order-completion race (not a stamp swap): two writer
processes upsert the same key with equal precombine; writer A mints its
instant first but is held at the publish gate (before the brief timeline
lock — MOR log appends skip publish OCC, so the timeline write IS their
commit point) until writer B (minted later) has published. Completion-time semantics must make A — the
causally newest commit — the winner, and the history must register as
completion-divergent."""

from __future__ import annotations

import multiprocessing as mp
import os
import time

from hudi_examples_spark.table import Table, TableConfig

SCHEMA = "k BIGINT, val STRING, v INT"


def _writer_a(base: str, a_minted: str, b_published: str, out) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("nbcc-a")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    try:
        from hudi_examples_spark.table import core

        orig = core.Table._publish_with_index_guard

        def held_publish(self, inst):
            # gate BEFORE the publish path touches the timeline lock —
            # holding the lock while waiting would block B's publish too
            if inst.action == "deltacommit":
                with open(a_minted, "w") as f:
                    f.write(inst.instant)  # tell B our (earlier) instant exists
                deadline = time.time() + 60
                while not os.path.exists(b_published) and time.time() < deadline:
                    time.sleep(0.05)
            return orig(self, inst)

        core.Table._publish_with_index_guard = held_publish
        from hudi_examples_spark.table import Table as T

        t = T(spark, base)
        inst = t.upsert(
            spark.createDataFrame([(1, "minted-first-published-last", 2)], SCHEMA)
        )
        out.put(("a", inst))
    finally:
        spark.stop()


def _writer_b(base: str, a_minted: str, b_published: str, out) -> None:
    from pyspark.sql import SparkSession

    from hudi_examples_spark.table import Table

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("nbcc-b")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    try:
        deadline = time.time() + 60
        while not os.path.exists(a_minted) and time.time() < deadline:
            time.sleep(0.05)  # A's instant is minted and gated: ours will be later
        t = Table(spark, base)
        inst = t.upsert(
            spark.createDataFrame([(1, "minted-last-published-first", 2)], SCHEMA)
        )
        with open(b_published, "w") as f:
            f.write(inst)  # release A's gate AFTER our commit landed
        out.put(("b", inst))
    finally:
        spark.stop()


def test_real_race_resolves_by_completion(spark, tmp_path):
    t = Table.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        TableConfig(record_key=["k"], precombine="v", table_type="mor"),
    )
    t.insert(spark.createDataFrame([(1, "base", 1), (2, "keep", 1)], SCHEMA))
    a_minted = str(tmp_path / "a_minted")
    b_published = str(tmp_path / "b_published")

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    pa = ctx.Process(target=_writer_a, args=(t.base, a_minted, b_published, q))
    pb = ctx.Process(target=_writer_b, args=(t.base, a_minted, b_published, q))
    pa.start()
    pb.start()
    for p in (pa, pb):
        p.join(timeout=300)
        assert p.exitcode == 0
    res = dict(q.get() for _ in range(2))
    ia, ib = res["a"], res["b"]
    assert ia < ib, "A must have minted first for the race to mean anything"

    t2 = Table(spark, t.base)
    stamps = {
        i.instant: i.committed_at for i in t2.timeline.completed_data_instants()
    }
    assert stamps[ia] > stamps[ib], "A must have published after B"
    assert t2.timeline.completion_order() is not None
    rows = {r["k"]: r["val"] for r in t2.read().collect()}
    assert rows[1] == "minted-first-published-last"  # completion order wins
    assert rows[2] == "keep"
    # compaction bakes the same answer
    t2.compact()
    assert {
        r["k"]: r["val"] for r in Table(spark, t.base).read().collect()
    }[1] == "minted-first-published-last"
