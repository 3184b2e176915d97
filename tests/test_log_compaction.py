"""Log compaction (Hudi 1.0 ``hoodie.log.compaction.enable``): stitch many
small MOR log files into one consolidated log per partition — NO base files
written. The exactness contract: the output keeps every row that could still
win a future merge (all alive versions newer than the key's own tombstone
epoch, with original commit instants and the partial-columns marker) plus the
max-epoch tombstone, so row- and column-level resolution over
(base ∪ consolidated log ∪ any later logs) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_examples_spark.sql import Engine
from tests.test_table_cow import assert_same, make_table, trips_df


def _log_count(tbl):
    files, _ = tbl.timeline.live_files()
    return sum(1 for _, (_, a) in files.items() if a == "deltacommit")


def _base_rels(tbl):
    files, _ = tbl.timeline.live_files()
    return sorted(r for r, (_, a) in files.items() if a != "deltacommit")


def test_consolidates_without_changing_snapshot(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    base_before = _base_rels(tbl)
    for i in range(5):  # five tiny log commits against one partition's keys
        tbl.upsert(
            trips_df(spark, [(2000 + i, "334e26e9", f"r{i}", "d", 10.0 + i, "san_francisco")])
        )
    expected = tbl.read()
    n_logs = _log_count(tbl)
    assert n_logs >= 5
    out = tbl.compact_logs(min_logs_per_partition=3)
    assert out is not None
    assert _log_count(tbl) < n_logs
    assert _base_rels(tbl) == base_before  # no base rewrite — the whole point
    assert_same(tbl.read(), expected)
    # consolidated state still resolves under a later FULL compaction
    assert tbl.compact() is not None
    assert_same(tbl.read(), expected)


def test_tombstone_epoch_preserved(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    # kill one key, resurrect another: the epochs must survive consolidation
    tbl.delete(spark.createDataFrame([("334e26e9",)], "uuid STRING"))
    tbl.delete(spark.createDataFrame([("c8abbe79",)], "uuid STRING"))
    tbl.upsert(trips_df(spark, [(9999999999999, "c8abbe79", "r", "d", 77.0, "san_francisco")]))
    tbl.upsert(trips_df(spark, [(9999999999999, "e96c4396", "r", "d", 88.0, "sao_paulo")]))
    expected = tbl.read()
    assert tbl.compact_logs(min_logs_per_partition=1) is not None
    got = tbl.read()
    assert_same(got, expected)
    assert got.filter("uuid='334e26e9'").count() == 0  # still dead
    assert got.filter("uuid='c8abbe79'").collect()[0]["fare"] == 77.0  # resurrected
    # dominated rows actually dropped: the dead key contributes ONE tombstone
    # row, the resurrected key one tombstone + one alive version
    files, _ = tbl.timeline.live_files()
    logs = [r for r, (_, a) in files.items() if a == "deltacommit"]
    rows = tbl._read_files(logs, with_deleted=True)
    assert rows.filter(F.col("_hoodie_record_key") == "334e26e9").count() == 1
    assert rows.filter(F.col("_hoodie_record_key") == "c8abbe79").count() == 2
    # and full compaction afterwards still agrees
    assert tbl.compact() is not None
    assert_same(tbl.read(), expected)


def test_partial_update_logs_survive(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "rX", "dX", 99.0, "san_francisco")]))
    # column-level partial rows (fare only) on top
    tbl.update_partial(
        spark.createDataFrame(
            [("334e26e9", 123.0, 9999999999999 + 1)], "uuid STRING, fare DOUBLE, ts LONG"
        )
    )
    tbl.update_partial(
        spark.createDataFrame(
            [("e96c4396", 45.0, 9999999999999)], "uuid STRING, fare DOUBLE, ts LONG"
        )
    )
    expected = tbl.read()
    assert tbl.compact_logs(min_logs_per_partition=1) is not None
    assert_same(tbl.read(), expected)
    r = tbl.read().filter("uuid='334e26e9'").collect()[0]
    assert r["fare"] == 123.0 and r["rider"] == "rX"  # column merge intact
    assert tbl.compact() is not None
    assert_same(tbl.read(), expected)


def test_threshold_spares_quiet_partitions(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    for i in range(4):
        tbl.upsert(trips_df(spark, [(3000 + i, "334e26e9", "r", "d", float(i), "san_francisco")]))
    tbl.upsert(trips_df(spark, [(3000, "e96c4396", "r", "d", 1.0, "sao_paulo")]))
    files, _ = tbl.timeline.live_files()
    quiet = sorted(
        r for r, (_, a) in files.items() if a == "deltacommit" and "sao_paulo" in r
    )
    assert tbl.compact_logs(min_logs_per_partition=4) is not None
    files2, _ = tbl.timeline.live_files()
    still = sorted(
        r for r, (_, a) in files2.items() if a == "deltacommit" and "sao_paulo" in r
    )
    assert still == quiet  # below threshold — untouched


def test_run_services_triggers_log_compaction(spark, tmp_path):
    tbl = make_table(spark, tmp_path, table_type="mor")
    tbl.insert(trips_df(spark))
    for i in range(3):
        tbl.upsert(trips_df(spark, [(4000 + i, "334e26e9", "r", "d", float(i), "san_francisco")]))
    expected = tbl.read()
    # full compaction gated high, log compaction low: only the stitcher runs
    report = tbl.run_services(compact_after=100, log_compact_after=2)
    assert report.get("compacted") is None
    assert report.get("logs_compacted") is not None
    assert_same(tbl.read(), expected)


def test_sql_frontdoor(spark, tmp_path):
    eng = Engine(spark, warehouse=str(tmp_path / "wh"))
    eng.sql(
        "CREATE TABLE lc (ts BIGINT, uuid STRING, fare DOUBLE) USING HUDI "
        "OPTIONS (primaryKey = 'uuid', preCombineField = 'ts', type = 'mor')"
    )
    eng.sql("INSERT INTO lc VALUES (1, 'a', 1.0), (1, 'b', 2.0)")
    for i in range(4):
        eng.sql(f"UPDATE lc SET fare = {10.0 + i} WHERE uuid = 'a'")
    tbl = eng.table("lc")
    n = _log_count(tbl)
    assert n >= 4
    eng.sql("CALL run_log_compaction('lc', 2)")
    assert _log_count(eng.table("lc")) < n
    rows = {r["uuid"]: r["fare"] for r in eng.sql("SELECT uuid, fare FROM lc").collect()}
    assert rows == {"a": 13.0, "b": 2.0}
