"""run_services: Hudi's async table services as one policy-driven pass.

One call per maintenance cadence must: heal partials, compact pending logs
(resolving partial-update chains), clean unreferenced versions, compact
bloated secondary indexes, and archive the timeline — while never changing
query results. The test drives a table through churn that makes every
service fire and hash-compares the snapshot before/after.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_examples_spark.table import Table, TableConfig

SCHEMA = "id STRING, cat STRING, v BIGINT, ts BIGINT"


def _df(spark, lo, hi, ts=1):
    rows = [(f"k{i:04d}", f"c{i % 5}", i, ts) for i in range(lo, hi)]
    return spark.createDataFrame(rows, SCHEMA)


def test_run_services_full_pass(spark, tmp_path):
    tbl = Table.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        TableConfig(record_key=["id"], precombine="ts", table_type="mor"),
    )
    tbl.insert(_df(spark, 0, 300))
    tbl.create_secondary_index("cat")
    # churn: enough delta commits to trip the compaction trigger, enough
    # index appends to trip the bloat ratio, enough instants to archive
    for ts in range(2, 10):
        tbl.upsert(_df(spark, 0, 300, ts=ts))
    tbl.update_partial(
        spark.createDataFrame([("k0001", "hot", 99)], "id STRING, cat STRING, ts BIGINT")
    )
    before = sorted(map(tuple, tbl.read().collect()))

    # clean_retain=1: only the post-compaction snapshot is retained, so the
    # superseded log files become physically deletable in this same pass
    report = tbl.run_services(
        compact_after=3, clean_retain=1, archive_retain=3, index_bloat_ratio=2.0
    )

    assert report["compacted"] is not None  # logs (incl the partial) resolved
    assert report["cleaned"]  # superseded versions physically deleted
    assert report["indexes_rebuilt"] == ["cat"]  # 9x append bloat compacted
    assert report["archived"] > 0
    assert sorted(map(tuple, tbl.read().collect())) == before  # results unchanged
    # the rebuilt index still serves lookups, including the partial's value
    assert [r["id"] for r in tbl.lookup("cat", "hot").collect()] == ["k0001"]
    files, _ = tbl.timeline.live_files()
    assert not any(a == "deltacommit" for _, a in files.values())  # fully compacted


def test_run_services_noop_on_quiet_table(spark, tmp_path):
    tbl = Table.create(
        spark, str(tmp_path / "q"), SCHEMA, TableConfig(record_key=["id"], precombine="ts")
    )
    tbl.insert(_df(spark, 0, 50))
    report = tbl.run_services()
    assert report["healed"] == [] and report["cleaned"] == []
    assert report["indexes_rebuilt"] == [] and report["archived"] == 0
    assert tbl.read().count() == 50
