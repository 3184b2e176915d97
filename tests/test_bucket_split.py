"""Consistent-hash bucket routing + incremental split.

Parity: Hudi's CONSISTENT_HASHING bucket engine resizing 1→8 under a split
threshold (``consistent_hashing.sql:44-57``, ``FindBucketNumber.java:47-53``,
``clusteringjob.properties:2-14``) — the point being that a split rewrites
ONLY the split bucket's file group, unlike modulo doubling which remaps every
key in the table.
"""

from __future__ import annotations

import os

import pytest

from hudi_examples_spark.table import Table, TableConfig
from hudi_examples_spark.table.core import BUCKET_COL, BUCKET_RING
from hudi_examples_spark.table.hashing import spark_xxhash64

SCHEMA = "k STRING, v DOUBLE, ts LONG"


def df(spark, ids, ts=1, v=1.0):
    return spark.createDataFrame([(f"key-{i:05d}", v, ts) for i in ids], SCHEMA)


def make(spark, tmp_path, **cfg):
    defaults = dict(
        record_key=["k"], precombine="ts", table_type="cow", bucket_ranges=[0]
    )
    defaults.update(cfg)
    return Table.create(spark, str(tmp_path / "t"), SCHEMA, TableConfig(**defaults))


def bucket_of(tbl, key: str) -> str:
    import bisect

    h = spark_xxhash64([(key, "string")]) % BUCKET_RING
    bs = sorted(tbl.config.bucket_ranges)
    return str(bs[bisect.bisect_right(bs, h) - 1])


def live_bucket_dirs(tbl):
    files, _ = tbl.timeline.live_files()
    return {tbl._partition_of_relpath(r).get(BUCKET_COL) for r in files}


def test_split_rewrites_only_the_split_bucket(spark, tmp_path):
    tbl = make(spark, tmp_path)
    tbl.insert(df(spark, range(200)))
    before = sorted(map(str, tbl.read().collect()))
    files0, _ = tbl.timeline.live_files()
    inst = tbl.split_bucket(0)
    rc = next(i for i in tbl.timeline.completed_data_instants() if i.instant == inst)
    # everything removed was in bucket 0; nothing outside it was touched
    assert set(rc.files_removed) == set(files0)
    assert tbl.config.bucket_ranges == [0, BUCKET_RING // 2]
    assert live_bucket_dirs(tbl) == {"0", str(BUCKET_RING // 2)}
    assert sorted(map(str, tbl.read().collect())) == before

    # split one child: the OTHER child's files stay by manifest reference
    files1, _ = tbl.timeline.live_files()
    untouched = {r for r in files1 if tbl._partition_of_relpath(r)[BUCKET_COL] == "0"}
    inst2 = tbl.split_bucket(BUCKET_RING // 2)
    rc2 = next(i for i in tbl.timeline.completed_data_instants() if i.instant == inst2)
    assert untouched.isdisjoint(rc2.files_removed)
    assert tbl.config.bucket_ranges == [0, BUCKET_RING // 2, BUCKET_RING * 3 // 4]
    assert sorted(map(str, tbl.read().collect())) == before


def test_rows_route_to_their_ring_bucket_and_point_read_prunes(spark, tmp_path):
    tbl = make(spark, tmp_path)
    tbl.insert(df(spark, range(100)))
    tbl.split_bucket(0)
    tbl.split_bucket(0)  # ranges: 0, RING/4, RING/2
    # every live file's rows belong to its directory's range
    files, _ = tbl.timeline.live_files()
    for r in sorted(files):
        b = tbl._partition_of_relpath(r)[BUCKET_COL]
        rows = spark.read.parquet(os.path.join(tbl.base, r)).select("k").collect()
        assert rows, r
        for row in rows:
            assert bucket_of(tbl, row["k"]) == b, (r, row["k"])
    # upserts after the split route through the new ranges too
    tbl.upsert(df(spark, [7], ts=9, v=42.0))
    got = tbl.read_point(k="key-00007").collect()
    assert len(got) == 1 and got[0]["v"] == 42.0
    # and the point read pruned to one bucket's files
    assert len(live_bucket_dirs(tbl)) == 3


def test_split_refuses_pending_logs_then_compact_allows(spark, tmp_path):
    tbl = make(spark, tmp_path, table_type="mor")
    tbl.insert(df(spark, range(50)))
    tbl.upsert(df(spark, range(5), ts=2, v=2.0))  # log file in bucket 0
    with pytest.raises(ValueError, match="pending log"):
        tbl.split_bucket(0)
    tbl.compact()
    inst = tbl.split_bucket(0)
    assert inst is not None
    assert tbl.read().filter("v=2.0").count() == 5


def test_maybe_split_picks_only_the_overflowing_bucket(spark, tmp_path):
    tbl = make(spark, tmp_path)
    tbl.insert(df(spark, range(300)))
    tbl.split_bucket(0)
    sizes_before = live_bucket_dirs(tbl)
    # tiny threshold: the largest bucket splits, exactly one new boundary
    inst = tbl.maybe_split_buckets(split_threshold_bytes=1, max_buckets=8)
    assert inst is not None
    assert len(tbl.config.bucket_ranges) == 3
    # max_buckets bound respected
    assert tbl.maybe_split_buckets(split_threshold_bytes=1, max_buckets=3) is None
    assert sizes_before <= live_bucket_dirs(tbl)


def test_convert_modulo_table_to_ranges(spark, tmp_path):
    tbl = make(spark, tmp_path, bucket_ranges=None, n_buckets=4)
    tbl.insert(df(spark, range(80)))
    before = sorted(map(str, tbl.read().collect()))
    tbl.convert_to_ranges(4)
    assert tbl.config.bucket_ranges == [i * BUCKET_RING // 4 for i in range(4)]
    assert tbl.config.n_buckets is None
    assert sorted(map(str, tbl.read().collect())) == before
    # incremental growth now available
    tbl.split_bucket(0)
    assert sorted(map(str, tbl.read().collect())) == before
    hit = tbl.read_point(k="key-00042")
    assert hit.count() == 1


def test_point_read_falls_back_for_unhashable_key_types(spark, tmp_path):
    """A DECIMAL record key isn't covered by the driver-side hasher — the
    point read must fall back to the JVM hash, not fail."""
    from decimal import Decimal

    from hudi_examples_spark.table import Table, TableConfig

    tbl = Table.create(
        spark,
        str(tmp_path / "dec"),
        "k DECIMAL(10,2), v DOUBLE, ts LONG",
        TableConfig(record_key=["k"], precombine="ts", n_buckets=4),
    )
    rows = [(Decimal(f"{i}.25"), float(i), 1) for i in range(40)]
    tbl.insert(spark.createDataFrame(rows, tbl.schema))
    got = tbl.read_point(k=Decimal("7.25")).collect()
    assert len(got) == 1 and got[0]["v"] == 7.0
