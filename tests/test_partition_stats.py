"""Partition-stats index (Hudi 1.0 PARTITION_STATS): partition-granularity
data skipping that decides before any per-file stats are consulted.

The 100 TB story: a date-partitioned table filtered on a partition-correlated
column (event timestamps, monotone ids) should answer the pruning question
from O(partitions) metadata, not O(files). We assert (a) envelopes are
recorded per partition and widen monotonically, (b) the partition gate
engages and scan == read().filter() always, (c) deletes leave bounds
stale-wide but results exact, (d) MOR log overlap re-adds partition-pruned
base files (pruning is never lossy), (e) unpartitioned tables skip the index
entirely.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_examples_spark.table import Table, TableConfig

SCHEMA = "k BIGINT, v BIGINT, band STRING, seq INT"


def _df(spark, lo, hi, seq=1):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 100).alias("v"),
            F.concat(F.lit("b"), F.floor((F.col("id") % 100) / 20).cast("string")).alias(
                "band"
            ),
            F.lit(seq).alias("seq"),
        )
    )


def _rows(df):
    return sorted(map(tuple, df.select("k", "v", "band").collect()))


def _make(spark, tmp_path, **cfg):
    base = str(tmp_path / "t")
    defaults = dict(partition_by=["band"], stats_cols=["v"])
    defaults.update(cfg)
    return Table.create(spark, base, SCHEMA, TableConfig(**defaults))


def test_partition_envelopes_recorded_and_widen(spark, tmp_path):
    tbl = _make(spark, tmp_path)
    tbl.insert(_df(spark, 0, 50).repartition(2))
    ps = tbl._load_partition_stats()
    # ids 0..49 → v 0..49 → bands b0 (v 0-19) and b1 (v 20-39), b2 (v 40-49)
    assert set(ps) == {"band=b0", "band=b1", "band=b2"}
    assert ps["band=b0"]["v"] == [0, 19]
    assert ps["band=b2"]["v"] == [40, 49]
    Table(spark, tbl.base).insert(_df(spark, 50, 100).repartition(2))
    ps2 = Table(spark, tbl.base)._load_partition_stats()
    assert ps2["band=b2"]["v"] == [40, 59]  # widened by the second commit
    assert set(ps2) == {"band=b0", "band=b1", "band=b2", "band=b3", "band=b4"}


def test_partition_gate_engages_and_results_exact(spark, tmp_path):
    tbl = _make(spark, tmp_path)
    tbl.insert(_df(spark, 0, 300).repartition(4))
    t2 = Table(spark, tbl.base)
    got = t2.scan([("v", ">=", 0), ("v", "<=", 9)])
    ev = t2.last_scan_partitions
    assert ev is not None and ev["total"] == 5 and ev["kept"] == 1
    want = t2.read().filter("v >= 0 AND v <= 9")
    assert _rows(got) == _rows(want)
    # file-level accounting stays consistent with the partition gate
    assert t2.last_scan["scanned"] < t2.last_scan["total"]


def test_delete_leaves_bounds_stale_wide_but_exact(spark, tmp_path):
    tbl = _make(spark, tmp_path)
    tbl.insert(_df(spark, 0, 200).repartition(3))
    t2 = Table(spark, tbl.base)
    t2.delete_where("v <= 19")  # empties band b0's rows
    t3 = Table(spark, tbl.base)
    got = t3.scan([("v", "<=", 25)])
    # b0's envelope still exists (stale-wide) — the gate may keep it, but the
    # result must be exactly the surviving rows
    assert _rows(got) == _rows(t3.read().filter("v <= 25"))
    assert all(r["v"] > 19 for r in got.collect())


def test_mor_log_overlap_readds_partition_pruned_base(spark, tmp_path):
    tbl = _make(spark, tmp_path, table_type="mor", record_key=["k"], precombine="seq")
    tbl.insert(_df(spark, 0, 100).repartition(2))
    # log rows UPDATE keys living in band b4 (v 80..99) without compaction
    t2 = Table(spark, tbl.base)
    t2.upsert(_df(spark, 80, 100, seq=2).withColumn("v", F.col("v") - 75))
    # scan for the UPDATED v range: the stale base rows' partition (b4) fails
    # the partition gate on v, but its keys live in the logs — the log-overlap
    # re-add must bring those base files back so precombine resolves correctly
    t3 = Table(spark, tbl.base)
    got = t3.scan([("v", ">=", 5), ("v", "<=", 24)])
    want = t3.read().filter("v >= 5 AND v <= 24")
    assert _rows(got) == _rows(want)
    assert {r["seq"] for r in got.collect() if r["k"] >= 80} == {2}


def test_clean_folds_sidecars_to_one_baseline(spark, tmp_path):
    import os

    tbl = _make(spark, tmp_path)
    tbl.insert(_df(spark, 0, 50).repartition(2))
    Table(spark, tbl.base).insert(_df(spark, 50, 100).repartition(2))
    t2 = Table(spark, tbl.base)
    before = t2._load_partition_stats()
    d = os.path.join(tbl.base, Table.PARTITION_STATS_DIR)
    assert len([f for f in os.listdir(d) if f.endswith(".json")]) == 2
    t2.clean(retain_commits=1)
    after_files = [f for f in os.listdir(d) if f.endswith(".json")]
    assert after_files == ["0baseline.json"]
    t3 = Table(spark, tbl.base)
    assert t3._load_partition_stats() == before  # fold loses nothing
    # envelopes keep widening through the baseline on later commits
    t3.insert(_df(spark, 100, 120).repartition(1))
    ps = Table(spark, tbl.base)._load_partition_stats()
    assert ps["band=b0"]["v"] == [0, 19]
    got = Table(spark, tbl.base).scan([("v", "<=", 9)])
    assert _rows(got) == _rows(Table(spark, tbl.base).read().filter("v <= 9"))


def test_statless_file_tombstones_the_partition_envelope(spark, tmp_path):
    # a file whose footer contributed NO bounds for the stats column (stats-
    # less row group, truncated binary stats) must tombstone the partition's
    # envelope for that column — otherwise the gate could prune a partition
    # whose unseen file holds matching rows. Simulated at the sidecar API:
    # commit two files into one partition, one of them without 'v' bounds.
    tbl = _make(spark, tmp_path)
    tbl.insert(_df(spark, 0, 20).repartition(1))  # band b0 only, envelope [0,19]
    assert tbl._load_partition_stats()["band=b0"]["v"] == [0, 19]
    tbl._write_partition_stats(
        "99999999999999999999",
        {"band=b0/full.parquet": {"v": [100, 120]}, "band=b0/statless.parquet": {}},
        ["band=b0/full.parquet", "band=b0/statless.parquet"],
    )
    ps = Table(spark, tbl.base)._load_partition_stats()
    assert "v" not in ps.get("band=b0", {})  # tombstone: gate keeps the partition
    # and the gate indeed keeps it: scan for values outside the old envelope
    t2 = Table(spark, tbl.base)
    t2.scan([("v", ">=", 500)]).count()
    ev = t2.last_scan_partitions
    assert ev is not None and ev["kept"] == ev["total"]
    # clean's baseline fold must carry the tombstone forward, not resurrect
    # the stale [0,19] envelope
    t2.clean(retain_commits=1)
    assert "v" not in Table(spark, tbl.base)._load_partition_stats().get("band=b0", {})


def test_reaggregation_for_same_instant_keeps_tombstones(spark, tmp_path):
    tbl = _make(spark, tmp_path)
    tbl.insert(_df(spark, 0, 20).repartition(1))
    inst = "88888888888888888888"
    tbl._write_partition_stats(
        inst, {"band=b0/a.parquet": {"v": [0, 5]}, "band=b0/b.parquet": {}},
        ["band=b0/a.parquet", "band=b0/b.parquet"],
    )
    # bootstrap's _merge_stats path re-aggregates the SAME instant from a
    # merged sidecar that now has bounds for b.parquet — the first pass's
    # tombstone must win
    tbl._write_partition_stats(
        inst, {"band=b0/a.parquet": {"v": [0, 5]}, "band=b0/b.parquet": {"v": [7, 9]}}
    )
    assert "v" not in Table(spark, tbl.base)._load_partition_stats().get("band=b0", {})


def test_all_statless_commit_still_tombstones(spark, tmp_path):
    # a commit where EVERY file failed to produce stats (stats == {}) must
    # still tombstone its partitions — the early-return shortcut would leave
    # the old envelope authoritative over files it never saw
    tbl = _make(spark, tmp_path)
    tbl.insert(_df(spark, 0, 20).repartition(1))
    assert tbl._load_partition_stats()["band=b0"]["v"] == [0, 19]
    tbl._write_partition_stats("97979797979797979797", {}, ["band=b0/ghost.parquet"])
    assert "v" not in Table(spark, tbl.base)._load_partition_stats().get("band=b0", {})


def test_preindex_files_block_partition_pruning(spark, tmp_path):
    import os
    import shutil

    # simulate a table whose FIRST commits predate the partition-stats index:
    # build, then delete the sidecar dir — the files stay, their envelopes
    # are gone, and crucially so is their coverage record
    tbl = _make(spark, tmp_path)
    tbl.insert(_df(spark, 0, 100).repartition(2))  # 5 bands, v spans 0..99
    shutil.rmtree(os.path.join(tbl.base, Table.PARTITION_STATS_DIR))
    # post-index commit adds NARROW envelopes to every band (v maps shifted
    # into 100..199 via +100 on the same ids)
    t2 = Table(spark, tbl.base)
    t2.insert(
        _df(spark, 0, 100).repartition(1).withColumn("v", F.lit(150).cast("bigint"))
    )
    # scan for values only the PRE-index files hold: their partitions carry
    # uncovered files, so the gate must keep them and return every row
    t3 = Table(spark, tbl.base)
    got = t3.scan([("v", "<=", 9)])
    want = t3.read().filter("v <= 9")
    assert _rows(got) == _rows(want) and got.count() == 10
    ev = t3.last_scan_partitions
    assert ev is not None and ev["kept"] == ev["total"]  # nothing pruned


def test_unpartitioned_table_skips_partition_index(spark, tmp_path):
    base = str(tmp_path / "t")
    tbl = Table.create(spark, base, SCHEMA, TableConfig(stats_cols=["v"]))
    tbl.insert(_df(spark, 0, 100).repartition(2))
    t2 = Table(spark, base)
    got = t2.scan([("v", "<=", 9)])
    assert t2.last_scan_partitions is None
    assert tbl._load_partition_stats() == {}
    assert _rows(got) == _rows(t2.read().filter("v <= 9"))
