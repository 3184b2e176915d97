"""Bucketed co-located joins: bucketBy at write time ⇒ exchange-free joins.

The 100 TB rationale: a fact table joined on the same key every hour should be
written join-ready (pre-shuffled into buckets) once, not re-shuffled per query.
These tests prove the engine's bucketed write produces plans with NO exchange
on either join side, and that results are identical to the plain shuffled join.
"""

from __future__ import annotations

import re

import pytest

from hudi_examples_spark.plans.inspect import explain_str
from hudi_examples_spark.sources.readers import load_sf_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucket_wh")
    orders = load_sf_table(spark, SF_SMALL, "orders")
    lineitem = load_sf_table(spark, SF_SMALL, "lineitem")
    (
        orders.write.format("parquet")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "orders_b"))  # external: keep files in tmp
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.format("parquet")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "lineitem_b"))
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    # disable auto-broadcast: at test scale orders fits a broadcast, which would
    # trivially avoid the exchange; the point is the shuffle-free SortMergeJoin
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lineitem_b.join(orders_b, lineitem_b.l_orderkey == orders_b.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        text = explain_str(joined, "formatted")
        assert "SortMergeJoin" in text
        assert not re.findall(r"Exchange hashpartitioning|\(\d+\) Exchange", text), (
            "bucketed join on the bucket key must not shuffle either side"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_shuffled_join(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    bucketed = (
        lineitem_b.join(orders_b, lineitem_b.l_orderkey == orders_b.o_orderkey)
        .groupBy("o_orderstatus")
        .count()
    )
    orders = load_sf_table(spark, SF_SMALL, "orders")
    lineitem = load_sf_table(spark, SF_SMALL, "lineitem")
    plain = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .count()
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_groupby_reuses_bucketing(spark, bucketed_tables):
    """Aggregation keyed on the bucket column also skips the exchange."""
    _, lineitem_b = bucketed_tables
    agg = lineitem_b.groupBy("l_orderkey").count()
    text = explain_str(agg, "formatted")
    assert "Exchange hashpartitioning" not in text
