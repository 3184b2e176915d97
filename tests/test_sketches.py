"""Error-bound tests for the sketch profile (approx distinct / quantiles).

The spec output is oracle-certifiable as of r4: it emits exact columns plus
`within_bounds` booleans asserting each sketch landed inside its published
error bound (the DuckDB oracle emits literal TRUEs).  These tests pin (a) the
booleans are all true and the exact columns match an exact recomputation, and
(b) a tighter direct error-bound check on the raw sketch aggregates than the
spec's gate encodes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_examples_spark.operators.relational_ext import a_sketch_profile
from hudi_examples_spark.sources.readers import load_sf_table as t
from tests.conftest import SF_MED


def test_sketch_profile_production_form_is_sketch_only(spark):
    out = a_sketch_profile(spark, SF_MED)
    assert out.columns == [
        "o_orderpriority",
        "approx_customers",
        "p50_price",
        "p95_price",
        "n_orders",
    ]
    assert out.count() == 5


def test_sketch_profile_bounds_and_exact_columns(spark):
    rows = {
        r["o_orderpriority"]: r
        for r in a_sketch_profile(spark, SF_MED, oracle_mode=True).collect()
    }
    exact = {
        r["o_orderpriority"]: r
        for r in t(spark, SF_MED, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("customers"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for prio, a in rows.items():
        e = exact[prio]
        assert a["exact_customers"] == e["customers"]
        assert a["n_orders"] == e["n"]
        assert a["customers_within_bounds"] is True
        assert a["p50_rank_ok"] is True
        assert a["p95_rank_ok"] is True


def test_raw_sketches_within_tight_error_bounds(spark):
    """Direct bound check on the sketch aggregates themselves (tighter than
    the spec's 3-sigma / ±1% rank gate)."""
    o = t(spark, SF_MED, "orders")
    approx = {
        r["o_orderpriority"]: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
            F.percentile_approx("o_totalprice", [0.5, 0.95], 10000).alias("price_q"),
        )
        .collect()
    }
    exact = {
        r["o_orderpriority"]: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("customers"),
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        )
        .collect()
    }
    for prio, a in approx.items():
        e = exact[prio]
        # HLL++ at rsd=0.02: allow 3 sigma
        assert abs(a["approx_customers"] - e["customers"]) <= 0.06 * e["customers"]
        # percentile_approx accuracy 10000 => rank error ~ n/10000; translate
        # to a loose 2% value tolerance on this smooth distribution
        assert abs(a["price_q"][0] - e["p50"]) <= 0.02 * e["p50"]
        assert abs(a["price_q"][1] - e["p95"]) <= 0.02 * e["p95"]


def test_sketch_profile_deterministic(spark):
    a = a_sketch_profile(spark, SF_MED).collect()
    b = a_sketch_profile(spark, SF_MED).collect()
    assert a == b
