"""hudi_metadata() TVF: the metadata-table partitions must agree with the
table's own state — files ≡ the live manifest, partitions' row counts ≡ the
snapshot, column_stats ≡ the footer sidecars, record_index ≡ the key set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hudi_examples_spark.table import Table, TableConfig

SCHEMA = "k BIGINT, val DOUBLE, seg STRING, v INT"


def _batch(spark, b, lo=0, hi=200):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5 + b).alias("val"),
        F.concat(F.lit("s"), F.col("id") % 3).alias("seg"),
        F.lit(b + 1).alias("v"),
    )


@pytest.fixture()
def tbl(spark, tmp_path):
    t = Table.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        TableConfig(
            record_key=["k"],
            precombine="v",
            partition_by=["seg"],
            stats_cols=["val"],
            bloom_index=True,
        ),
    )
    t.insert(_batch(spark, 0))
    return t


def test_files_partition_matches_manifest(tbl):
    live, _ = tbl.timeline.live_files()
    rows = tbl.metadata("files").collect()
    assert {r["file_name"] for r in rows} == set(live)
    for r in rows:
        inst, action = live[r["file_name"]]
        assert (r["instant"], r["action"]) == (inst, action)
        assert r["file_size_bytes"] > 0 and r["num_rows"] >= 0
    # total footer rows == snapshot count (COW, no logs: exact)
    assert sum(r["num_rows"] for r in rows) == tbl.read().count()


def test_files_reflects_rewrites(tbl, spark):
    before = {r["file_name"] for r in tbl.metadata("files").collect()}
    tbl.upsert(_batch(spark, 1, 0, 50))
    after = {r["file_name"] for r in tbl.metadata("files").collect()}
    live, _ = tbl.timeline.live_files()
    assert after == set(live)
    assert after != before  # the rewrite replaced at least one file


def test_partitions_rollup(tbl):
    per = {r["partition"]: r for r in tbl.metadata("partitions").collect()}
    assert set(per) == {"seg=s0", "seg=s1", "seg=s2"}
    counts = {
        f"seg={r['seg']}": r["n"]
        for r in tbl.read().groupBy("seg").agg(F.count("*").alias("n")).collect()
    }
    for p, r in per.items():
        assert r["num_rows"] == counts[p]
        assert r["n_files"] >= 1 and r["total_bytes"] > 0


def test_column_stats_matches_sidecars_and_data(tbl):
    rows = tbl.metadata("column_stats").collect()
    stats = tbl._load_file_stats()
    live, _ = tbl.timeline.live_files()
    got = {(r["file_name"], r["col_name"]): (r["min_value"], r["max_value"]) for r in rows}
    expect = {
        (rel, col): (str(mm[0]), str(mm[1]))
        for rel in live
        if rel in stats
        for col, mm in stats[rel].items()
    }
    assert got == expect
    # val stats must bound the actual data
    val_rows = [r for r in rows if r["col_name"] == "val"]
    assert val_rows
    data_min, data_max = tbl.read().agg(F.min("val"), F.max("val")).first()
    assert min(float(r["min_value"]) for r in val_rows) == data_min
    assert max(float(r["max_value"]) for r in val_rows) == data_max


def test_partition_stats_partition(tbl):
    rows = tbl.metadata("partition_stats").collect()
    pstats = tbl._load_partition_stats()
    got = {(r["partition"], r["col_name"]): (r["min_value"], r["max_value"]) for r in rows}
    expect = {
        (p, col): (str(mm[0]), str(mm[1]))
        for p, per_col in pstats.items()
        for col, mm in per_col.items()
    }
    assert got == expect and got
    # the per-partition val envelope must bound that partition's actual data
    for r in rows:
        if r["col_name"] != "val":
            continue
        seg = r["partition"].split("=", 1)[1]
        lo, hi = tbl.read().filter(F.col("seg") == seg).agg(F.min("val"), F.max("val")).first()
        assert float(r["min_value"]) <= lo and float(r["max_value"]) >= hi


def test_bloom_filters_partition(tbl):
    rows = tbl.metadata("bloom_filters").collect()
    live, _ = tbl.timeline.live_files()
    assert {r["file_name"] for r in rows} == set(tbl._load_blooms()) & set(live)
    assert rows and all(r["num_bits"] > 0 and r["num_hashes"] > 0 for r in rows)


def test_record_index_partition(tbl, spark):
    with pytest.raises(ValueError, match="record-level"):
        tbl.metadata("record_index")
    tbl.create_record_index()
    tbl.upsert(_batch(spark, 2, 0, 30))
    idx = tbl.metadata("record_index")
    keys = {r["record_key"] for r in idx.select("record_key").distinct().collect()}
    assert keys == {str(k) for k in range(200)}
    live, _ = tbl.timeline.live_files()
    assert {r["file_name"] for r in idx.collect()} <= set(live)


def test_timeline_partition(tbl, spark):
    tbl.upsert(_batch(spark, 1, 0, 30))
    rows = tbl.metadata("timeline").collect()
    insts = tbl.timeline.instants()
    assert len(rows) == len(insts)
    assert [r["instant"] for r in rows] == sorted(i.instant for i in insts)
    ops = {r["operation"] for r in rows}
    assert "upsert" in ops
    assert all(r["n_files_added"] >= 0 for r in rows)


def test_unknown_partition_rejected(tbl):
    with pytest.raises(ValueError, match="unknown metadata partition"):
        tbl.metadata("nope")


def test_sql_tvf_front_door(tbl, spark, tmp_path):
    from hudi_examples_spark.sql import Engine

    s = Engine(spark, str(tmp_path / "wh"))
    s.register("t", tbl)
    n_files = s.sql("SELECT count(*) AS n FROM hudi_metadata('t', 'files')").first()["n"]
    assert n_files == len(tbl.timeline.live_files()[0])
    rows = s.sql(
        "SELECT partition, num_rows FROM hudi_metadata('t', 'partitions') "
        "ORDER BY partition"
    ).collect()
    assert [r["partition"] for r in rows] == ["seg=s0", "seg=s1", "seg=s2"]
