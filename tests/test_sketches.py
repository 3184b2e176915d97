"""Error-bound tests for the sketch profile (approx distinct / quantiles).

The spec is rows-only (DuckDB's approx algorithms differ from Spark's HLL++ /
KLL-style percentile_approx), so correctness is pinned here against the exact
answers at a tolerance derived from the sketch parameters.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_examples_spark.operators.relational_ext import a_sketch_profile
from hudi_examples_spark.sources.readers import load_sf_table as t
from tests.conftest import SF_MED


def test_sketch_profile_within_error_bounds(spark):
    approx = {r["o_orderpriority"]: r for r in a_sketch_profile(spark, SF_MED).collect()}
    exact = {
        r["o_orderpriority"]: r
        for r in t(spark, SF_MED, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("customers"),
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for prio, a in approx.items():
        e = exact[prio]
        # HLL++ at rsd=0.02: allow 3 sigma
        assert abs(a["approx_customers"] - e["customers"]) <= 0.06 * e["customers"]
        # percentile_approx accuracy 10000 => rank error ~ n/10000; translate
        # to a loose 2% value tolerance on this smooth distribution
        assert abs(a["p50_price"] - e["p50"]) <= 0.02 * e["p50"]
        assert abs(a["p95_price"] - e["p95"]) <= 0.02 * e["p95"]
        assert a["n_orders"] == e["n"]


def test_sketch_profile_deterministic(spark):
    a = a_sketch_profile(spark, SF_MED).collect()
    b = a_sketch_profile(spark, SF_MED).collect()
    assert a == b
