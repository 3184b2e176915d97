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
