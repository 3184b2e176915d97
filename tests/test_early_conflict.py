"""Marker-based early conflict detection (Hudi
``hoodie.write.concurrency.early.conflict.detection.enable``): a COW writer
must fail fast — before the merge job — when an in-flight writer's marker
overlaps its footprint, with publish OCC untouched as the correctness gate.
Tie-break is deterministic (lower instant proceeds), stale markers are
ignored and swept by heal, and writers always clean their own markers."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from hudi_examples_spark.table import Table, TableConfig
from hudi_examples_spark.table.core import ConcurrentWriteConflict

SCHEMA = "k BIGINT, val DOUBLE, seg STRING, v INT"
LOW = "0" * 17  # sorts below every real instant
HIGH = "9" * 17


def _batch(spark, b, lo=0, hi=120):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0 + b).alias("val"),
        F.concat(F.lit("s"), F.col("id") % 2).alias("seg"),
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
            early_conflict_detection=True,
        ),
    )
    t.insert(_batch(spark, 0))
    return t


def _plant(tbl, instant, partitions, rels=(), age=0.0):
    d = os.path.join(tbl.base, Table.MARKERS_DIR, instant)
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "plan.json")
    with open(p, "w") as f:
        json.dump({"rels": sorted(rels), "partitions": partitions}, f)
    if age:
        t = time.time() - age
        os.utime(p, (t, t))
        os.utime(d, (t, t))
    return d


def test_overlapping_inflight_marker_aborts_before_write(tbl, spark):
    _plant(tbl, LOW, ["seg=s0"])
    n_instants = len(tbl.timeline.instants())
    live_before = set(tbl.timeline.live_files()[0])
    with pytest.raises(ConcurrentWriteConflict, match="early conflict"):
        tbl.upsert(_batch(spark, 1, 0, 10))  # touches seg=s0 and seg=s1
    # nothing committed, no files went live, and our own marker is gone
    assert len(tbl.timeline.instants()) == n_instants
    assert set(tbl.timeline.live_files()[0]) == live_before
    left = os.listdir(os.path.join(tbl.base, Table.MARKERS_DIR))
    assert left == [LOW]


def test_disjoint_partitions_proceed(tbl, spark):
    _plant(tbl, LOW, ["seg=OTHER"])
    tbl.upsert(_batch(spark, 1, 0, 10))
    assert tbl.read().filter("v = 2").count() == 10


def test_stale_marker_ignored(tbl, spark):
    _plant(tbl, LOW, ["seg=s0"], age=tbl.LOCK_TTL_SECONDS + 5)
    tbl.upsert(_batch(spark, 1, 0, 10))
    assert tbl.read().filter("v = 2").count() == 10


def test_later_writer_yields_lower_proceeds(tbl, spark):
    # an in-flight marker with a HIGHER instant: that writer is the one
    # that must abort — our (lower) write goes through
    _plant(tbl, HIGH, ["seg=s0", "seg=s1"])
    tbl.upsert(_batch(spark, 1, 0, 10))
    assert tbl.read().filter("v = 2").count() == 10


def test_own_marker_removed_after_publish(tbl, spark):
    tbl.upsert(_batch(spark, 1, 0, 10))
    root = os.path.join(tbl.base, Table.MARKERS_DIR)
    assert not os.path.isdir(root) or os.listdir(root) == []


def test_unpartitioned_footprint_conflicts_with_any_marker(spark, tmp_path):
    t = Table.create(
        spark,
        str(tmp_path / "u"),
        "k BIGINT, val DOUBLE, v INT",
        TableConfig(record_key=["k"], precombine="v", early_conflict_detection=True),
    )
    t.insert(spark.range(50).select("id").selectExpr("id AS k", "id * 1.0 AS val", "1 AS v"))
    _plant(t, LOW, None)
    with pytest.raises(ConcurrentWriteConflict, match="early conflict"):
        t.upsert(spark.createDataFrame([(1, 9.0, 2)], "k BIGINT, val DOUBLE, v INT"))


def test_heal_sweeps_dead_markers_only(tbl, spark):
    fresh = _plant(tbl, LOW, ["seg=s0"])
    dead = _plant(tbl, "1" + "0" * 16, ["seg=s0"], age=tbl.LOCK_TTL_SECONDS + 5)
    tbl.heal(min_age_seconds=1.0)
    assert os.path.isdir(fresh)  # younger than the TTL floor: kept
    assert not os.path.isdir(dead)


def test_flag_off_ignores_markers(spark, tmp_path):
    t = Table.create(
        spark,
        str(tmp_path / "off"),
        SCHEMA,
        TableConfig(record_key=["k"], precombine="v", partition_by=["seg"]),
    )
    t.insert(_batch(spark, 0))
    _plant(t, LOW, ["seg=s0", "seg=s1"])
    t.upsert(_batch(spark, 1, 0, 10))  # no early detection: publish OCC only
    assert t.read().filter("v = 2").count() == 10
