"""RANGE/interval window frames — planted boundary semantics."""

from __future__ import annotations

import datetime
import glob
import shutil

from hudi_examples_spark.operators.relational_ext import w_interval_frames


def _write_orders(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [
            (k, ck, "O", price, datetime.datetime(1995, 1, 1) + datetime.timedelta(days=d), "1-URGENT")
            for k, ck, price, d in rows
        ],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "ord"))
    shutil.copy(
        glob.glob(str(tmp_path / "ord" / "*.parquet"))[0],
        str(tmp_path / "orders.parquet"),
    )
    return str(tmp_path)


def test_range_frame_is_inclusive_at_exactly_30_days(spark, tmp_path):
    # customer 50 (selected by the % 50 == 0 slice): three orders at day 0,
    # day 30 (inclusive boundary — IN frame), day 61 (outside any frame)
    sf = _write_orders(
        spark,
        tmp_path,
        [(1, 50, 100.0, 0), (2, 50, 10.0, 30), (3, 50, 1.0, 61)],
    )
    rows = {r["orderkey"]: r for r in w_interval_frames(spark, sf).collect()}
    assert rows[1]["rev_30d"] == 100.0 and rows[1]["n_30d"] == 1
    # day-30 order sees the day-0 order: exactly 30 days back is INCLUSIVE
    assert rows[2]["rev_30d"] == 110.0 and rows[2]["n_30d"] == 2
    # day-61 order is 31 days past day 30: frame holds only itself
    assert rows[3]["rev_30d"] == 1.0 and rows[3]["n_30d"] == 1


def test_range_frame_includes_same_date_peers_rows_frame_does_not(spark, tmp_path):
    # two orders on the SAME date: the RANGE frame includes both for both
    # rows (peers), while the ROWS frame is positional
    sf = _write_orders(
        spark,
        tmp_path,
        [(1, 50, 5.0, 10), (2, 50, 7.0, 10)],
    )
    rows = {r["orderkey"]: r for r in w_interval_frames(spark, sf).collect()}
    assert rows[1]["rev_30d"] == 12.0 and rows[2]["rev_30d"] == 12.0
    assert rows[1]["sum_last3"] == 5.0  # ROWS: only itself (first by orderkey)
    assert rows[2]["sum_last3"] == 12.0


def test_non_selected_customers_are_excluded(spark, tmp_path):
    sf = _write_orders(spark, tmp_path, [(1, 50, 5.0, 0), (2, 51, 9.0, 0)])
    got = {r["custkey"] for r in w_interval_frames(spark, sf).collect()}
    assert got == {50}
