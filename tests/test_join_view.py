"""Incremental join-view maintenance: consistency under updates, join-key
moves, deletes on either side; restart safety from persisted offsets."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hudi_examples_spark.streaming.join_view import (
    IncrementalJoinView,
    join_view_matches_sources,
)
from hudi_examples_spark.table import Table, TableConfig


@pytest.fixture()
def setup(spark, tmp_path):
    left = Table.create(
        spark,
        os.path.join(tmp_path, "left"),
        "id BIGINT, grp STRING, val DOUBLE, v INT",
        TableConfig(record_key=["id"], precombine="v", partition_by=["grp"]),
    )
    right = Table.create(
        spark,
        os.path.join(tmp_path, "right"),
        "grp STRING, label STRING",
        TableConfig(record_key=["grp"]),
    )
    view = IncrementalJoinView(
        left, right, os.path.join(tmp_path, "view"), "grp", ["id", "val"], ["label"]
    )
    rows = [(i, "ab"[i % 2], float(i), 1) for i in range(20)]
    left.insert(spark.createDataFrame(rows, left.data_cols))
    right.insert(spark.createDataFrame([("a", "A"), ("b", "B")], right.data_cols))
    view.refresh()
    return left, right, view


def assert_consistent(view):
    want = join_view_matches_sources(view)
    got = view.dst.read().select(*view.dst.data_cols)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_bootstrap_and_updates_both_sides(spark, setup):
    left, right, view = setup
    assert_consistent(view)
    # left update + insert, right label change
    left.upsert(
        spark.createDataFrame([(3, "b", 300.0, 2), (99, "a", 99.0, 1)], left.data_cols)
    )
    right.upsert(spark.createDataFrame([("a", "A2")], right.data_cols))
    assert view.refresh() is True
    assert_consistent(view)
    # row 3 moved from grp 'b'... (3 % 2 == 1 => was 'b'), stays 'b' here; check A2 propagated
    labels = {r["label"] for r in view.dst.read().where(F.col("grp") == "a").collect()}
    assert labels == {"A2"}


def test_join_key_move_repairs_both_slices(spark, setup):
    left, right, view = setup
    # move id=4 from grp 'a' to 'b' (partition move through the global index)
    left.upsert(spark.createDataFrame([(4, "b", 4.0, 2)], left.data_cols))
    view.refresh()
    assert_consistent(view)
    rows = view.dst.read().where(F.col("id") == 4).collect()
    assert len(rows) == 1 and rows[0]["grp"] == "b" and rows[0]["label"] == "B"


def test_deletes_and_dangling_dim(spark, setup):
    left, right, view = setup
    left.delete_where("id % 4 = 0")
    view.refresh()
    assert_consistent(view)
    # deleting a dim row drops its whole slice from the view (inner join)
    right.delete_where("grp = 'a'")
    view.refresh()
    assert_consistent(view)
    assert view.dst.read().where(F.col("grp") == "a").count() == 0


def test_legacy_begin_id_offsets_migrate_to_completion(spark, setup, tmp_path):
    """ADVICE r9 #1/#3: a view table written by the pre-migration consumer
    carries begin-id ``src_offsets``; recovery maps each side to its source
    instant's completion stamp — never a silent 0.0 restart that would
    re-apply all history onto the existing view rows."""
    from tests.test_rollup import _forge_legacy_offset_meta

    left, right, view = setup
    _forge_legacy_offset_meta(
        view.dst,
        {"src_offsets": {"left": left.latest_instant(), "right": right.latest_instant()}},
    )
    view2 = IncrementalJoinView(
        left, right, os.path.join(tmp_path, "view"), "grp", ["id", "val"], ["label"]
    )
    assert (view2._off_l, view2._off_r) == (view._off_l, view._off_r)
    assert view2.refresh() is False  # nothing advanced, nothing re-applied
    assert_consistent(view2)
    left.upsert(spark.createDataFrame([(3, "b", 300.0, 2)], left.data_cols))
    assert view2.refresh() is True
    assert_consistent(view2)
    # a never-consumed side stays at origin ("0" maps to 0.0, not a lookup)
    _forge_legacy_offset_meta(
        view2.dst, {"src_offsets": {"left": left.latest_instant(), "right": "0"}}
    )
    view3 = IncrementalJoinView(
        left, right, os.path.join(tmp_path, "view"), "grp", ["id", "val"], ["label"]
    )
    assert view3._off_r == 0.0 and view3._off_l == view2._off_l


def test_refresh_noop_and_restart_offsets(spark, setup, tmp_path):
    left, right, view = setup
    assert view.refresh() is False  # nothing advanced
    left.upsert(spark.createDataFrame([(7, "b", 700.0, 2)], left.data_cols))
    # a NEW instance (fresh process analogue) must resume from the durable
    # offsets, fold exactly the new window, and agree with batch recompute
    view2 = IncrementalJoinView(
        left, right, os.path.join(tmp_path, "view"), "grp", ["id", "val"], ["label"]
    )
    assert (view2._off_l, view2._off_r) == (view._off_l, view._off_r)
    assert view2.refresh() is True
    assert_consistent(view2)
    assert view2.dst.read().where(F.col("id") == 7).collect()[0]["val"] == 700.0
