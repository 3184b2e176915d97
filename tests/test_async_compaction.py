"""Async compaction: the schedule/execute split (Hudi's ``compaction.requested``
plan + standalone HoodieCompactor executor).

The property under test: a plan cut at time T and executed at time T+k is
correct no matter what log appends landed in between — post-schedule logs
survive the execution as live logs over the new base, and the merged read
equals what inline compaction at the same point would produce.
"""

from __future__ import annotations

from hudi_examples_spark.sql import Engine
from hudi_examples_spark.table.core import Table
from tests.test_table_cow import assert_same, make_table, trips_df


def _reopen(spark, tbl):
    return Table(spark, tbl.base)


def test_schedule_then_execute_matches_inline(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 88.0, "san_francisco")]))
    plan = tbl.schedule_compaction()
    assert plan is not None
    assert [i.instant for i in tbl.pending_compactions()] == [plan]
    before = tbl.read()
    out = tbl.run_compaction()
    assert out is not None and out != plan
    assert tbl.pending_compactions() == []
    assert_same(tbl.read(), before)
    # planned logs resolved: every live file is base now
    files, _ = tbl.timeline.live_files()
    assert all(a != "deltacommit" for _, (_, a) in files.items())


def test_post_schedule_appends_survive_execution(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 88.0, "san_francisco")]))
    plan = tbl.schedule_compaction()
    # writers keep going AFTER the plan is cut
    tbl.upsert(trips_df(spark, [(9999999999999, "e96c4396", "r2", "d2", 55.0, "san_francisco")]))
    tbl.delete(spark.createDataFrame([("c8abbe79",)], "uuid STRING"))
    expected = tbl.read()
    assert tbl.run_compaction(plan) is not None
    got = tbl.read()
    assert_same(got, expected)
    # the post-schedule log files are STILL live logs (not swept by the plan)
    files, _ = tbl.timeline.live_files()
    assert any(a == "deltacommit" for _, (_, a) in files.items())
    assert got.filter("uuid='e96c4396'").collect()[0]["fare"] == 55.0
    assert got.filter("uuid='c8abbe79'").count() == 0
    # and a follow-up inline compaction resolves them on top of the new base
    assert tbl.compact() is not None
    assert_same(tbl.read(), expected)


def test_post_schedule_delete_of_compacted_key(spark, tmp_path):
    # tombstone lands after the plan for a key whose versions are IN the plan:
    # the compacted base row must still die at read time (commit ordering)
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 88.0, "san_francisco")]))
    plan = tbl.schedule_compaction()
    tbl.delete(spark.createDataFrame([("334e26e9",)], "uuid STRING"))
    assert tbl.run_compaction(plan) is not None
    assert tbl.read().filter("uuid='334e26e9'").count() == 0
    assert tbl.count() == 7


def test_stale_plan_discarded_when_files_replaced(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 88.0, "san_francisco")]))
    plan = tbl.schedule_compaction()
    # a competing inline compactor resolves the same logs first
    assert tbl.compact() is not None
    expected = tbl.read()
    assert tbl.run_compaction() is None  # plan voided, discarded
    assert tbl.pending_compactions() == []
    assert_same(tbl.read(), expected)
    assert plan is not None


def test_stale_plan_discarded_after_rollback(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    inst = tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 88.0, "san_francisco")]))
    tbl.schedule_compaction()
    tbl.rollback(inst)  # the planned log file is no longer live
    expected = tbl.read()
    assert tbl.run_compaction() is None
    assert tbl.pending_compactions() == []
    assert_same(tbl.read(), expected)


def test_late_publisher_voids_plan(spark, tmp_path):
    # an instant MINTED before the plan but PUBLISHED after it (a slow writer)
    # must void the plan: its rows could predate a tombstone epoch inside the
    # plan, and compacting the tombstone away would resurrect them
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    from hudi_examples_spark.table.timeline import Instant, new_instant

    early = new_instant()  # minted now...
    tbl.delete(spark.createDataFrame([("334e26e9",)], "uuid STRING"))
    plan = tbl.schedule_compaction()
    assert plan is not None
    # ...published only after the plan was cut (simulated slow writer): an
    # empty deltacommit is enough — the guard is instant-id based
    tbl.timeline.write(Instant(early, "deltacommit", [], [], {"operation": "upsert"}))
    assert tbl.run_compaction() is None
    assert tbl.pending_compactions() == []


def test_run_services_executes_pending_plan(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 88.0, "san_francisco")]))
    plan = tbl.schedule_compaction()
    expected = tbl.read()
    report = tbl.run_services(compact_after=9999)  # policy compaction off
    assert report["compaction_plan_executed"] is not None
    assert tbl.pending_compactions() == []
    assert_same(tbl.read(), expected)
    assert plan is not None


def test_plan_survives_archival(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 88.0, "san_francisco")]))
    plan = tbl.schedule_compaction()
    for i in range(6):
        tbl.upsert(trips_df(spark, [(9999999999999 + i, "e96c4396", "r", "d", 50.0 + i, "san_francisco")]))
    tbl.archive_timeline(retain_instants=2)
    assert [i.instant for i in tbl.pending_compactions()] == [plan]
    # the plan's own files predate the boundary but are still live, so the
    # executor can still resolve them
    expected = tbl.read()
    assert tbl.run_compaction() is not None
    assert_same(tbl.read(), expected)


def test_cross_process_handles_share_plans(spark, tmp_path):
    # scheduler and executor are DIFFERENT Table handles (the deployment shape:
    # a cron job schedules, a standalone compactor executes)
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 88.0, "san_francisco")]))
    plan = tbl.schedule_compaction()
    executor = _reopen(spark, tbl)
    assert [i.instant for i in executor.pending_compactions()] == [plan]
    expected = tbl.read()
    assert executor.run_compaction() is not None
    assert_same(_reopen(spark, tbl).read(), expected)


def test_sql_schedule_execute_faces(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.sql(
        "CREATE TABLE t (ts BIGINT, uuid STRING, fare DOUBLE) USING HUDI "
        "TBLPROPERTIES (type = 'mor', primaryKey = 'uuid', preCombineField = 'ts')"
    )
    e.sql("INSERT INTO t VALUES (1, 'a', 10.0), (2, 'b', 20.0)")
    e.sql("INSERT INTO t VALUES (3, 'a', 30.0)")
    e.sql("CALL run_compaction('t', 'schedule')")
    pend = e.sql("CALL show_compaction('t')").collect()
    assert len(pend) == 1 and pend[0]["n_log_files"] >= 1
    e.sql("INSERT INTO t VALUES (4, 'b', 40.0)")
    e.sql("CALL run_compaction('t', 'execute')")
    assert e.sql("CALL show_compaction('t')").collect() == []
    rows = {r["uuid"]: r["fare"] for r in e.sql("SELECT uuid, fare FROM t").collect()}
    assert rows == {"a": 30.0, "b": 40.0}


def test_late_remover_rejected_at_publish(spark, tmp_path):
    """A remover whose instant id PREDATES the publisher's snapshot must still
    conflict: removal overlap is checked against every completed instant, not
    just ids after `since` — two publishes removing the same file is always a
    lost update (both replacement row sets would go live)."""
    import pytest

    from hudi_examples_spark.table.core import ConcurrentWriteConflict, Instant, new_instant

    tbl = make_table(spark, tmp_path)
    tbl.insert(trips_df(spark))
    files, latest = tbl.timeline.live_files()
    victim = sorted(files)[0]
    # first rewrite of `victim` publishes fine (id > its snapshot)
    tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 1.0, "san_francisco")]))
    files2, latest2 = tbl.timeline.live_files()
    if victim in files2:  # upsert didn't touch it — replace it directly
        tbl.timeline.write(
            Instant(new_instant(), "replacecommit", [], [victim], {"operation": "test"})
        )
        _, latest2 = tbl.timeline.live_files()
    # a late publisher (snapshot CURRENT — `since` is after the remover)
    # trying to remove the same file must be rejected, not silently published
    with pytest.raises(ConcurrentWriteConflict, match="already rewrote"):
        tbl._publish_occ(
            Instant(new_instant(), "replacecommit", [], [victim], {"operation": "late"}),
            since=latest2,
            partitions=None,
            occ_scope="files",
        )


def test_bounded_io_compaction_strategy(spark, tmp_path):
    """LogFileSizeBased + BoundedIO: a budget that fits only the heaviest
    file group plans exactly that group; uncompacted logs stay live and
    reads are unchanged; the next schedule picks up the remainder."""
    import os

    from pyspark.sql import functions as F

    from hudi_examples_spark.table import Table, TableConfig

    t = Table.create(
        spark,
        str(tmp_path / "bio"),
        "k BIGINT, val DOUBLE, seg STRING, v INT",
        TableConfig(record_key=["k"], precombine="v", partition_by=["seg"], table_type="mor"),
    )

    def batch(lo, hi, seg, v):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            (F.col("id") * 1.0).alias("val"),
            F.lit(seg).alias("seg"),
            F.lit(v).alias("v"),
        )

    t.insert(batch(0, 200, "s0", 1).unionAll(batch(200, 400, "s1", 1)))
    # heavy log churn in s0, one light log in s1
    for v in (2, 3, 4):
        Table(spark, t.base).upsert(batch(0, 200, "s0", v))
    Table(spark, t.base).upsert(batch(200, 220, "s1", 2))

    t2 = Table(spark, t.base)
    files, _ = t2.timeline.live_files()
    logs = [r for r, (_, a) in files.items() if a == "deltacommit"]
    s0_bytes = sum(
        os.path.getsize(os.path.join(t2.base, r))
        for r in files
        if r.startswith("seg=s0")
    )
    plan_inst = t2.schedule_compaction(max_io_bytes=int(s0_bytes * 1.2))
    assert plan_inst is not None
    plan = t2.pending_compactions()[0]
    planned_dirs = {os.path.dirname(r) for r in plan.meta["log_rels"]}
    assert planned_dirs == {"seg=s0"}
    before = sorted(map(tuple, t2.read().collect()))
    assert Table(spark, t.base).run_compaction() is not None
    t3 = Table(spark, t.base)
    assert sorted(map(tuple, t3.read().collect())) == before
    # s1's log is still live (not silently dropped by the partial plan)
    files3, _ = t3.timeline.live_files()
    assert any(
        a == "deltacommit" and r.startswith("seg=s1") for r, (_, a) in files3.items()
    )
    # the remainder compacts on the next unbounded schedule
    t3.schedule_compaction()
    assert Table(spark, t.base).run_compaction() is not None
    files4, _ = Table(spark, t.base).timeline.live_files()
    assert not any(a == "deltacommit" for _, a in files4.values())
    assert sorted(map(tuple, Table(spark, t.base).read().collect())) == before
