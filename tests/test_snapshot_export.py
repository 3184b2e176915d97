"""Snapshot exporter (HoodieSnapshotExporter analogue): hudi-mode O(files)
clone (hardlinks + re-synthesized timeline, fully queryable) and parquet-mode
plain rewrite; as-of consistency; MOR log routing and bootstrap alignment
survive the clone."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hudi_examples_spark.table import Table, TableConfig

SCHEMA = "k BIGINT, val DOUBLE, seg STRING, v INT"


def _batch(spark, b, n=100):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0 + b).alias("val"),
        F.concat(F.lit("s"), F.col("id") % 2).alias("seg"),
        F.lit(b + 1).alias("v"),
    )


def _inodes(root):
    out = set()
    for r, _d, fns in os.walk(root):
        for fn in fns:
            if fn.endswith(".parquet"):
                out.add(os.stat(os.path.join(r, fn)).st_ino)
    return out


def test_hudi_mode_clone_is_queryable_and_zero_copy(spark, tmp_path):
    t = Table.create(
        spark, str(tmp_path / "src"), SCHEMA,
        TableConfig(record_key=["k"], precombine="v", partition_by=["seg"]),
    )
    t.insert(_batch(spark, 0))
    t.upsert(_batch(spark, 1, n=30))
    dest = str(tmp_path / "clone")
    n = t.export_snapshot(dest)
    assert n == len(t.timeline.live_files()[0])
    clone = Table(spark, dest)
    assert sorted(map(tuple, clone.read().collect())) == sorted(
        map(tuple, t.read().collect())
    )
    # hardlinked: same inodes, zero data bytes copied
    src_ino = _inodes(t.base)
    assert _inodes(dest) <= src_ino and _inodes(dest)
    # the clone is independently writable; the source never changes
    before_src = sorted(map(tuple, t.read().collect()))
    clone.upsert(_batch(spark, 9, n=5))
    assert sorted(map(tuple, Table(spark, t.base).read().collect())) == before_src
    assert Table(spark, dest).read().filter("v = 10").count() == 5


def test_mor_clone_keeps_log_routing(spark, tmp_path):
    t = Table.create(
        spark, str(tmp_path / "m"), SCHEMA,
        TableConfig(record_key=["k"], precombine="v", partition_by=["seg"], table_type="mor"),
    )
    t.insert(_batch(spark, 0))
    Table(spark, t.base).upsert(_batch(spark, 1, n=40))  # log commit
    Table(spark, t.base).delete(spark.createDataFrame([(0,), (1,)], "k BIGINT"))
    src_rows = sorted(map(tuple, Table(spark, t.base).read().collect()))
    dest = str(tmp_path / "mclone")
    Table(spark, t.base).export_snapshot(dest)
    clone = Table(spark, dest)
    files, _ = clone.timeline.live_files()
    assert {a for _, a in files.values()} == {"commit", "deltacommit"}
    assert sorted(map(tuple, clone.read().collect())) == src_rows
    # the clone compacts on its own
    clone.compact()
    assert sorted(map(tuple, Table(spark, dest).read().collect())) == src_rows


def test_as_of_export_and_parquet_mode(spark, tmp_path):
    t = Table.create(
        spark, str(tmp_path / "a"), SCHEMA,
        TableConfig(record_key=["k"], precombine="v", partition_by=["seg"]),
    )
    t.insert(_batch(spark, 0))
    mid = t.latest_instant()
    t.upsert(_batch(spark, 5, n=60))
    dest = str(tmp_path / "asof")
    t.export_snapshot(dest, as_of=mid)
    clone = Table(spark, dest)
    assert sorted(map(tuple, clone.read().collect())) == sorted(
        map(tuple, t.read(as_of=mid).collect())
    )
    pq = str(tmp_path / "pq")
    t.export_snapshot(pq, mode="parquet")
    got = spark.read.parquet(pq)
    assert sorted(got.columns) == sorted(t.read().columns)
    assert sorted(map(tuple, got.select(*t.read().columns).collect())) == sorted(
        map(tuple, t.read().collect())
    )


def test_bootstrap_table_clone_keeps_synthesis(spark, tmp_path):
    src_df = _batch(spark, 0)
    src = str(tmp_path / "rawsrc")
    src_df.write.partitionBy("seg").parquet(src)
    t = Table.bootstrap(
        spark, str(tmp_path / "bt"), src,
        TableConfig(record_key=["k"], precombine="v", partition_by=["seg"]),
        schema=SCHEMA,
    )
    t.upsert(_batch(spark, 3, n=20))
    dest = str(tmp_path / "btclone")
    Table(spark, t.base).export_snapshot(dest)
    clone = Table(spark, dest)
    assert clone.config.bootstrap_instant == t.config.bootstrap_instant
    assert sorted(map(tuple, clone.read().collect())) == sorted(
        map(tuple, Table(spark, t.base).read().collect())
    )


def test_export_guards(spark, tmp_path):
    import pytest

    t = Table.create(
        spark, str(tmp_path / "g"), SCHEMA,
        TableConfig(record_key=["k"], precombine="v", partition_by=["seg"]),
    )
    t.insert(_batch(spark, 0))
    dest = str(tmp_path / "gclone")
    t.export_snapshot(dest)
    with pytest.raises(ValueError, match="already holds a table"):
        t.export_snapshot(dest)
    with pytest.raises(ValueError, match="hudi|parquet"):
        t.export_snapshot(str(tmp_path / "x"), mode="csv")


def test_sql_call_export_snapshot(spark, tmp_path):
    from hudi_examples_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql(
        "CREATE TABLE ex (k BIGINT, val DOUBLE, seg STRING, v INT) USING hudi "
        "PARTITIONED BY (seg) TBLPROPERTIES (primaryKey = 'k', preCombineField = 'v')"
    )
    eng.sql("INSERT INTO ex VALUES (1, 1.0, 's0', 1), (2, 2.0, 's1', 1)")
    dest = str(tmp_path / "sqlclone")
    eng.sql(f"CALL export_snapshot('ex', '{dest}')")
    clone = Table(spark, dest)
    assert clone.read().count() == 2
    pq = str(tmp_path / "sqlpq")
    eng.sql(f"CALL export_snapshot('ex', '{pq}', 'parquet')")
    assert spark.read.parquet(pq).count() == 2


def test_validate_reports_health_and_damage(spark, tmp_path):
    t = Table.create(
        spark, str(tmp_path / "v"), SCHEMA,
        TableConfig(record_key=["k"], precombine="v", partition_by=["seg"]),
    )
    t.insert(_batch(spark, 0))
    t.upsert(_batch(spark, 1, n=20))
    rep = {r["check"]: (r["status"], r["detail"]) for r in t.validate().collect()}
    assert all(s == "ok" for s, _ in rep.values()), rep
    assert set(rep) >= {
        "manifest_files_exist",
        "no_orphan_files",
        "timeline_unique_ids",
        "timeline_completion_stamps",
        "index_meta_coherent",
    }
    # damage 1: delete a live file → manifest check fails
    files, _ = t.timeline.live_files()
    victim = sorted(files)[0]
    os.remove(os.path.join(t.base, victim))
    rep2 = {r["check"]: r["status"] for r in Table(spark, t.base).validate().collect()}
    assert rep2["manifest_files_exist"] == "fail"
    # damage 2: plant an orphan parquet → orphan check fails
    with open(os.path.join(t.base, "seg=s0", "zzz_orphan.parquet"), "wb") as f:
        f.write(b"x")
    rep3 = {r["check"]: r["status"] for r in Table(spark, t.base).validate().collect()}
    assert rep3["no_orphan_files"] == "fail"


def test_sql_call_validate(spark, tmp_path):
    from hudi_examples_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql(
        "CREATE TABLE vt (k BIGINT, val DOUBLE, seg STRING, v INT) USING hudi "
        "PARTITIONED BY (seg) TBLPROPERTIES (primaryKey = 'k', preCombineField = 'v')"
    )
    eng.sql("INSERT INTO vt VALUES (1, 1.0, 's0', 1)")
    rows = eng.sql("CALL validate('vt')").collect()
    assert rows and all(r["status"] == "ok" for r in rows)
