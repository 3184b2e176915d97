"""Optimistic concurrency control: conflicting concurrent COW rewrites must be
rejected at publish; disjoint-partition writers and append-only writers commit
freely; a rejected writer retries cleanly from a fresh snapshot.

The interleave is deterministic: we hook the first writer's file-write stage to
sneak a second writer's commit in between its snapshot and its publish.
"""

from __future__ import annotations

import pytest

from hudi_examples_spark.table import ConcurrentWriteConflict, Table, TableConfig

SCHEMA = "ts BIGINT, uuid STRING, val DOUBLE, part STRING"


def make(spark, path):
    return Table.create(
        spark,
        str(path / "t"),
        SCHEMA,
        TableConfig(record_key=["uuid"], precombine="ts", partition_by=["part"]),
    )


def df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _interleave(writer_a: Table, action_during_write):
    """Run ``action_during_write()`` after writer A snapshots + writes files,
    right before A publishes — i.e. inside A's commit window."""
    orig = writer_a._write_files

    def hooked(df_, instant, *args, **kwargs):
        rels = orig(df_, instant, *args, **kwargs)
        if not hooked.fired:
            hooked.fired = True
            action_during_write()
        return rels

    hooked.fired = False
    writer_a._write_files = hooked
    return writer_a


def test_same_partition_conflict_rejected(spark, tmp_path):
    a = make(spark, tmp_path)
    a.insert(df(spark, [(1, "k1", 1.0, "pa"), (1, "k2", 1.0, "pb")]))
    b = Table(spark, a.base)
    _interleave(a, lambda: b.upsert(df(spark, [(2, "k1", 99.0, "pa")])))
    with pytest.raises(ConcurrentWriteConflict):
        a.upsert(df(spark, [(3, "k1", 50.0, "pa")]))
    # loser's files are unreferenced; b's write is intact
    assert {(r["uuid"], r["val"]) for r in a.read().collect()} == {("k1", 99.0), ("k2", 1.0)}
    # retry from a fresh snapshot wins (ts=3 > ts=2)
    a.upsert(df(spark, [(3, "k1", 50.0, "pa")]))
    assert {(r["uuid"], r["val"]) for r in a.read().collect()} == {("k1", 50.0), ("k2", 1.0)}


def test_disjoint_partitions_both_commit(spark, tmp_path):
    a = make(spark, tmp_path)
    a.insert(df(spark, [(1, "k1", 1.0, "pa"), (1, "k2", 1.0, "pb")]))
    b = Table(spark, a.base)
    _interleave(a, lambda: b.upsert(df(spark, [(2, "k2", 22.0, "pb")])))
    a.upsert(df(spark, [(2, "k1", 11.0, "pa")]))  # different partition: no conflict
    assert {(r["uuid"], r["val"]) for r in a.read().collect()} == {("k1", 11.0), ("k2", 22.0)}


def test_mor_log_appends_never_conflict(spark, tmp_path):
    t = Table.create(
        spark,
        str(tmp_path / "m"),
        SCHEMA,
        TableConfig(record_key=["uuid"], precombine="ts", partition_by=["part"], table_type="mor"),
    )
    t.insert(df(spark, [(1, "k1", 1.0, "pa")]))
    b = Table(spark, t.base)
    _interleave(t, lambda: b.upsert(df(spark, [(2, "k1", 2.0, "pa")])))
    t.upsert(df(spark, [(3, "k1", 3.0, "pa")]))  # concurrent same-key logs: both land
    assert [(r["uuid"], r["val"]) for r in t.read().collect()] == [("k1", 3.0)]
    insts = t.timeline.completed_data_instants()
    assert sum(1 for i in insts if i.action == "deltacommit") == 2


def test_overwrite_conflicts_with_any_concurrent_commit(spark, tmp_path):
    a = make(spark, tmp_path)
    a.insert(df(spark, [(1, "k1", 1.0, "pa")]))
    b = Table(spark, a.base)
    _interleave(a, lambda: b.upsert(df(spark, [(2, "k9", 9.0, "pb")])))
    with pytest.raises(ConcurrentWriteConflict):
        a.insert_overwrite(df(spark, [(5, "k5", 5.0, "pa")]))  # full replace racing b
    # b's concurrent write survived the rejected overwrite
    assert {r["uuid"] for r in a.read().collect()} == {"k1", "k9"}


def test_concurrent_writers_keep_secondary_index_complete(spark, tmp_path):
    """Two writers committing to disjoint partitions both append their index
    entries (the index dir is append-only parquet — concurrent part files
    can't clobber each other), so lookups see BOTH commits' mappings without
    any rebuild."""
    a = make(spark, tmp_path)
    a.insert(df(spark, [(1, "k1", 1.0, "pa"), (1, "k2", 1.0, "pb")]))
    a.create_secondary_index("val")
    b = Table(spark, a.base)
    _interleave(a, lambda: b.upsert(df(spark, [(2, "k2", 22.0, "pb")])))
    a.upsert(df(spark, [(2, "k1", 11.0, "pa")]))
    got_a = {r["uuid"] for r in a.lookup("val", 11.0).collect()}
    got_b = {r["uuid"] for r in a.lookup("val", 22.0).collect()}
    assert got_a == {"k1"} and got_b == {"k2"}
    # stale pre-update entries are superset-only: filtered by the predicate
    assert a.lookup("val", 1.0).count() == 0
