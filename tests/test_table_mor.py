"""MOR table semantics + table services (compaction/clustering/cleaning).

Parity: MOR base+log merge-on-read (``configs/mor_*.props:2``), compaction triggers
(``DeltaStreamerExample.scala:48-55``), consistent-hash clustering
(``consistent_hashing.sql:44-57``), cleaning (``DeltaStreamerExample.scala:46-47``).
"""

from __future__ import annotations

from tests.test_table_cow import ROWS, assert_same, make_table, trips_df


def test_mor_upsert_writes_logs_and_merges_on_read(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "rider-A", "driver-K", 88.0, "san_francisco")]))
    # log file written, base untouched
    files, _ = tbl.timeline.live_files()
    actions = {a for _, (_, a) in files.items()}
    assert "deltacommit" in actions and "commit" in actions
    # snapshot read merges latest-wins
    assert tbl.count() == 8
    assert tbl.read().filter("uuid='334e26e9'").collect()[0]["fare"] == 88.0
    # read-optimized view still shows pre-log state (base files only)
    assert tbl.read_optimized().filter("uuid='334e26e9'").collect()[0]["fare"] == 19.10


def test_mor_delete_tombstone(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    keys = spark.createDataFrame([("334e26e9",)], "uuid STRING")
    tbl.delete(keys)
    assert tbl.count() == 7
    assert tbl.read().filter("uuid='334e26e9'").count() == 0
    # tombstone lives in the log until compaction; base still has the row
    assert tbl.read_optimized().filter("uuid='334e26e9'").count() == 1


def test_mor_compaction_merges_and_preserves_view(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 88.0, "san_francisco")]))
    tbl.delete(spark.createDataFrame([("c8abbe79",)], "uuid STRING"))
    before = tbl.read()
    inst = tbl.compact()
    assert inst is not None
    after = tbl.read()
    assert_same(after, before)
    # all live files are base now; read_optimized == snapshot
    files, _ = tbl.timeline.live_files()
    assert all(a != "deltacommit" for _, (_, a) in files.items())
    assert_same(tbl.read_optimized(), after)


def test_should_compact_num_commits_trigger(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    for i in range(5):
        tbl.upsert(
            trips_df(spark, [(9999999999000 + i, "334e26e9", "r", "d", float(i), "san_francisco")])
        )
    assert tbl.should_compact(max_delta_commits=5)
    tbl.compact()
    assert not tbl.should_compact(max_delta_commits=5)


def test_mor_incremental_changes(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    first = tbl.insert(trips_df(spark))
    tbl.upsert(trips_df(spark, [(9999999999999, "e96c4396", "rider-C", "driver-M", 50.0, "san_francisco")]))
    changes = tbl.table_changes(start=first)
    assert {r["uuid"]: r["fare"] for r in changes.collect()} == {"e96c4396": 50.0}


def test_clustering_bucket_resize(spark, tmp_path):
    """consistent_hashing.sql:44-49: bucket count grows (1 → 4) via clustering."""
    tbl = make_table(spark, tmp_path, n_buckets=1)
    tbl.insert(trips_df(spark))
    before = tbl.read()
    inst = tbl.cluster(4)
    assert tbl.config.n_buckets == 4
    assert_same(tbl.read(), before)
    insts = {i.instant: i for i in tbl.timeline.completed_data_instants()}
    assert insts[inst].meta["numOutputFileGroups"] == 4


def test_clean_removes_unreferenced_files(spark, tmp_path):
    import os

    tbl = make_table(spark, tmp_path)
    tbl.insert(trips_df(spark))
    for i in range(4):
        tbl.upsert(
            trips_df(spark, [(9999999999000 + i, "334e26e9", "r", "d", float(i), "san_francisco")])
        )
    before = tbl.read()
    removed = tbl.clean(retain_commits=2)
    assert removed, "expected old file versions to be cleaned"
    for rel in removed:
        assert not os.path.exists(os.path.join(tbl.base, rel))
    assert_same(tbl.read(), before)  # current view unaffected


def test_upgrade_downgrade(spark, tmp_path):
    """DowngradeTable.scala:20-40: version migration validates direction."""
    import pytest

    tbl = make_table(spark, tmp_path)
    assert tbl.config.table_version == 6
    tbl.downgrade(5)
    assert tbl.config.table_version == 5
    with pytest.raises(ValueError):
        tbl.downgrade(6)
    tbl.upgrade(6)
    with pytest.raises(ValueError):
        tbl.upgrade(5)


def test_mor_time_travel(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    first = tbl.insert(trips_df(spark))
    tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 70.0, "san_francisco")]))
    assert tbl.read(as_of=first).filter("uuid='334e26e9'").collect()[0]["fare"] == 19.10
    assert tbl.read().filter("uuid='334e26e9'").collect()[0]["fare"] == 70.0


def test_savepoint_pins_clean_and_restores(spark, tmp_path):
    """Hudi savepoint: pinned snapshot survives clean; restore rewinds to it."""
    tbl = make_table(spark, tmp_path)
    tbl.insert(trips_df(spark))
    sp = tbl.savepoint()
    for i in range(4):
        tbl.upsert(
            trips_df(spark, [(9999999999000 + i, "334e26e9", "r", "d", float(i), "san_francisco")])
        )
    removed = tbl.clean(retain_commits=2)
    # files live as of the savepoint must survive the clean
    pinned = set(tbl.timeline.live_files(sp)[0].keys())
    assert not (pinned & set(removed)), "clean deleted savepointed files"
    assert tbl.read(as_of=sp).filter("uuid='334e26e9'").collect()[0]["fare"] == 19.10
    rolled = tbl.restore_to_savepoint(sp)
    assert len(rolled) == 4
    assert tbl.read().filter("uuid='334e26e9'").collect()[0]["fare"] == 19.10
    tbl.release_savepoint(sp)
    assert sp not in tbl.savepoints()


def test_should_compact_time_trigger(spark, tmp_path):
    """NUM_OR_TIME: a single old deltacommit triggers on age even below the
    commit-count threshold."""
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 1.0, "san_francisco")]))
    assert not tbl.should_compact(max_delta_commits=5)
    assert not tbl.should_compact(max_delta_commits=5, max_delta_seconds=3600)
    assert tbl.should_compact(max_delta_commits=5, max_delta_seconds=0.0)
