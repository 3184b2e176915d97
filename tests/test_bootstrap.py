"""Bootstrap: onboard existing parquet as a keyed table (Hudi bootstrap).

METADATA_ONLY: the source files enter the table byte-identical (hardlinked on
one filesystem — zero copies) with no ``_hoodie_*`` columns; the read funnel
synthesizes the meta columns and a key-column-pruned pyarrow pass records
per-file key ranges (Hudi's skeleton-generation cost, no Spark job). The
tests pin: exact content parity with the source, zero-rewrite onboarding
(inode identity), meta synthesis, every downstream path over bootstrap files
(upsert/delete/time-travel/incremental/MOR merge/compaction/record index/
secondary index), key-range pruning of sorted sources, the full-record mode,
and the empty-table + partition-layout guards.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hudi_examples_spark.table import Table, TableConfig
from hudi_examples_spark.table.core import (
    META_COMMIT,
    META_KEY,
    META_PARTITION,
)

SCHEMA = "k BIGINT, seg STRING, val DOUBLE, v INT"


def _src_df(spark, n=300):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("seg"),
        (F.col("id") * 2.0).alias("val"),
        F.lit(1).alias("v"),
    )


@pytest.fixture()
def src(spark, tmp_path):
    p = str(tmp_path / "src")
    _src_df(spark).write.partitionBy("seg").parquet(p)
    return p


def _boot(spark, tmp_path, src, name="t", **cfg):
    conf = TableConfig(
        record_key=["k"], precombine="v", partition_by=["seg"], **cfg
    )
    return Table.bootstrap(spark, str(tmp_path / name), src, conf, schema=SCHEMA)


def _parquet_inodes(root):
    out = {}
    for r, _d, fns in os.walk(root):
        for fn in fns:
            if fn.endswith(".parquet"):
                p = os.path.join(r, fn)
                out[p] = os.stat(p).st_ino
    return out


def test_metadata_only_content_parity(spark, tmp_path, src):
    tbl = _boot(spark, tmp_path, src)
    got = {tuple(r) for r in tbl.read().collect()}
    want = {tuple(r) for r in _src_df(spark).collect()}
    assert got == want


def test_metadata_only_is_zero_rewrite(spark, tmp_path, src):
    """Same filesystem ⇒ every table data file is a HARDLINK of a source file
    (same inode): onboarding moved zero data bytes."""
    src_inodes = set(_parquet_inodes(src).values())
    tbl = _boot(spark, tmp_path, src)
    data = {
        p: ino
        for p, ino in _parquet_inodes(tbl.base).items()
        if "_timeline" not in p and "_stats" not in p
    }
    assert data and set(data.values()) <= src_inodes
    inst = tbl.timeline.completed_data_instants()[0]
    assert inst.meta["operation"] == "bootstrap"
    assert inst.meta["files_linked"] == len(data)


def test_meta_column_synthesis(spark, tmp_path, src):
    tbl = _boot(spark, tmp_path, src)
    bi = tbl.config.bootstrap_instant
    assert bi and bi == tbl.timeline.completed_data_instants()[0].instant
    m = tbl.read(with_meta=True)
    assert m.filter(F.col(META_COMMIT) != bi).count() == 0
    row = m.filter("k = 7").collect()[0]
    assert row[META_KEY] == "7" and row[META_PARTITION] == "seg=1"


def test_upsert_and_delete_over_bootstrap(spark, tmp_path, src):
    tbl = _boot(spark, tmp_path, src)
    up = spark.range(0, 20).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("seg"),
        F.lit(-5.0).alias("val"),
        F.lit(2).alias("v"),
    )
    tbl.upsert(up)
    r = tbl.read()
    assert r.count() == 300 and r.filter("val = -5.0").count() == 20
    tbl.delete_where("k >= 290")
    assert tbl.count() == 290


def test_time_travel_and_incremental(spark, tmp_path, src):
    tbl = _boot(spark, tmp_path, src)
    bi = tbl.config.bootstrap_instant
    up = spark.createDataFrame([(0, "0", 111.0, 2)], SCHEMA)
    second = tbl.upsert(up)
    asof = tbl.read(as_of=bi)
    assert asof.count() == 300 and asof.filter("val = 111.0").count() == 0
    # the bootstrap commit IS an incremental begin-point
    inc = tbl.table_changes(start=bi)
    assert inc.filter("val = 111.0").count() == 1
    assert second > bi


def test_mor_bootstrap_log_merge_and_compaction(spark, tmp_path, src):
    tbl = _boot(spark, tmp_path, src, table_type="mor")
    up = spark.range(0, 25).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("seg"),
        F.lit(-9.0).alias("val"),
        F.lit(2).alias("v"),
    )
    tbl.upsert(up)  # log append over bootstrap base files
    assert tbl.read().filter("val = -9.0").count() == 25
    tbl.compact()
    assert tbl.read().count() == 300
    assert tbl.read().filter("val = -9.0").count() == 25


def test_record_index_over_bootstrap_files(spark, tmp_path, src):
    """The record index builds from the read funnel, so bootstrap files'
    synthesized keys index exactly like native ones."""
    tbl = _boot(spark, tmp_path, src)
    tbl.create_record_index()
    hit = tbl.lookup_key("42")
    assert hit.count() == 1 and hit.collect()[0]["k"] == 42


def test_secondary_index_over_bootstrap_files(spark, tmp_path, src):
    tbl = _boot(spark, tmp_path, src)
    tbl.create_secondary_index("val")
    assert tbl.lookup("val", 84.0).collect()[0]["k"] == 42


def test_key_range_sidecars_prune_sorted_source(spark, tmp_path):
    """A key-sorted source gets disjoint per-file STRING key ranges from the
    pyarrow pass — a keyed write then prunes to the true holder files."""
    src = str(tmp_path / "sorted_src")
    # zero-padded string keys sort lexicographically == numerically
    (
        spark.range(0, 400)
        .select(
            F.format_string("k%04d", F.col("id")).alias("k"),
            (F.col("id") * 1.0).alias("val"),
            F.lit(1).alias("v"),
        )
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
        .write.parquet(src)
    )
    tbl = Table.bootstrap(
        spark,
        str(tmp_path / "t"),
        src,
        TableConfig(record_key=["k"], precombine="v"),
        schema="k STRING, val DOUBLE, v INT",
    )
    stats = tbl._load_file_stats()
    ranges = [v[META_KEY] for v in stats.values() if META_KEY in v]
    assert len(ranges) == 4
    up = spark.createDataFrame([("k0007", -1.0, 2)], "k STRING, val DOUBLE, v INT")
    tbl.upsert(up)
    assert tbl.last_key_prune["candidates"] == 1
    assert tbl.read().filter("val = -1.0").count() == 1


def test_unpruned_key_types_never_lose_updates(spark, tmp_path):
    """DOUBLE keys get no range sidecar (pyarrow/Spark string forms differ) —
    the files are simply never pruned, and the upsert stays correct."""
    src = str(tmp_path / "dsrc")
    spark.range(0, 50).select(
        (F.col("id") * 1.0).alias("k"), F.lit(1).alias("v")
    ).write.parquet(src)
    tbl = Table.bootstrap(
        spark,
        str(tmp_path / "t"),
        src,
        TableConfig(record_key=["k"], precombine="v"),
        schema="k DOUBLE, v INT",
    )
    assert not any(
        META_KEY in v for v in tbl._load_file_stats().values()
    )
    tbl.upsert(spark.createDataFrame([(7.0, 2)], "k DOUBLE, v INT"))
    assert tbl.read().filter("k = 7.0 and v = 2").count() == 1


def test_full_record_materializes_meta(spark, tmp_path, src):
    tbl = Table.bootstrap(
        spark,
        str(tmp_path / "fr"),
        src,
        TableConfig(record_key=["k"], precombine="v", partition_by=["seg"]),
        schema=SCHEMA,
        mode="full_record",
    )
    assert tbl.config.bootstrap_instant is None
    m = tbl.read(with_meta=True)
    assert m.filter(F.col(META_KEY).isNull()).count() == 0
    got = {tuple(r) for r in tbl.read().collect()}
    assert got == {tuple(r) for r in _src_df(spark).collect()}


def test_bootstrap_requires_declared_partitions(spark, tmp_path, src):
    with pytest.raises(ValueError, match="partition"):
        Table.bootstrap(
            spark,
            str(tmp_path / "bad"),
            src,
            TableConfig(record_key=["k"], precombine="v"),  # no partition_by
            schema=SCHEMA,
        )


def test_bootstrap_rejects_existing_table(spark, tmp_path, src):
    _boot(spark, tmp_path, src, name="t1")
    with pytest.raises(ValueError, match="already exists"):
        _boot(spark, tmp_path, src, name="t1")


def test_copy_mode_when_link_disabled(spark, tmp_path, src):
    src_inodes = set(_parquet_inodes(src).values())
    tbl = Table.bootstrap(
        spark,
        str(tmp_path / "t"),
        src,
        TableConfig(record_key=["k"], precombine="v", partition_by=["seg"]),
        schema=SCHEMA,
        link=False,
    )
    data_inodes = {
        ino
        for p, ino in _parquet_inodes(tbl.base).items()
        if "_timeline" not in p and "_stats" not in p
    }
    assert data_inodes and not (data_inodes & src_inodes)
    assert tbl.timeline.completed_data_instants()[0].meta["files_linked"] == 0
    assert tbl.count() == 300


def test_version_gate_and_bootstrap_floor(spark, tmp_path, src):
    """bootstrap_instant is load-bearing config: bootstrap stamps the
    table_version floor, and a table from a NEWER engine is refused outright
    instead of being misread."""
    import json

    from hudi_examples_spark.table.core import (
        BOOTSTRAP_TABLE_VERSION,
        PROPS_FILE,
        SUPPORTED_TABLE_VERSION,
    )

    tbl = _boot(spark, tmp_path, src)
    assert tbl.config.table_version >= BOOTSTRAP_TABLE_VERSION
    # reopened handle still synthesizes (props round-trip)
    assert Table(spark, tbl.base).config.bootstrap_instant == tbl.config.bootstrap_instant
    # a future-version table is refused
    p = os.path.join(tbl.base, PROPS_FILE)
    with open(p) as f:
        d = json.load(f)
    d["config"]["table_version"] = SUPPORTED_TABLE_VERSION + 1
    with open(p, "w") as f:
        json.dump(d, f)
    with pytest.raises(ValueError, match="newer than this engine supports"):
        Table(spark, tbl.base)


def test_composite_key_with_partition_component(spark, tmp_path):
    """Composite record key where one component IS the partition column: the
    pyarrow pass joins the file column with the dir-constant component, and
    synthesis/upserts resolve the same concatenated key."""
    src = str(tmp_path / "csrc")
    (
        spark.range(0, 120)
        .select(
            (F.col("id") % 4).cast("int").alias("region"),
            F.format_string("u%03d", F.col("id")).alias("uid"),
            F.lit(1).alias("v"),
        )
        .repartition("region")
        .write.partitionBy("region")
        .parquet(src)
    )
    tbl = Table.bootstrap(
        spark,
        str(tmp_path / "t"),
        src,
        TableConfig(record_key=["region", "uid"], precombine="v", partition_by=["region"]),
        schema="region INT, uid STRING, v INT",
    )
    stats = tbl._load_file_stats()
    ranges = [v[META_KEY] for v in stats.values() if META_KEY in v]
    assert ranges and all(":" in lo for lo, _hi in ranges)
    m = tbl.read(with_meta=True).filter("uid = 'u007'").collect()[0]
    assert m[META_KEY] == "3:u007"  # 7 % 4 = 3
    tbl.upsert(
        spark.createDataFrame([(3, "u007", 2)], "region INT, uid STRING, v INT")
    )
    assert tbl.read().filter("v = 2").count() == 1
    assert tbl.count() == 120


def test_lost_bootstrap_race_never_persists_props(spark, tmp_path, src, monkeypatch):
    """A bootstrap that loses the empty-table race must leave NO durable
    trace: props saved before the locked precondition used to point
    bootstrap_instant at a never-published instant, and a racing pair could
    last-writer-win _save_props over the real winner (advisor, round 5).
    The durable save now happens under the publish lock, after the
    precondition passes — a loser reverts cleanly."""
    from hudi_examples_spark.table.core import ConcurrentWriteConflict
    from hudi_examples_spark.table.core import Table as T

    orig = T._publish_occ
    raced = {"done": False}

    def racing_publish(self, inst, *a, **kw):
        if inst.meta.get("operation") == "bootstrap" and not raced["done"]:
            raced["done"] = True
            # the TOCTOU window: a first writer lands between create() and
            # the bootstrap publish
            T(spark, self.base).insert(_src_df(spark, 10))
        return orig(self, inst, *a, **kw)

    monkeypatch.setattr(T, "_publish_occ", racing_publish)
    base = str(tmp_path / "raced")
    with pytest.raises(ConcurrentWriteConflict, match="empty table"):
        Table.bootstrap(
            spark,
            base,
            src,
            TableConfig(record_key=["k"], precombine="v", partition_by=["seg"]),
            schema=SCHEMA,
        )
    # durable props carry no bootstrap flag and the racing write is intact
    fresh = Table(spark, base)
    assert fresh.config.bootstrap_instant is None
    assert fresh.count() == 10
