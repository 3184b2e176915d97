"""Plan-quality gates: pushdown/pruning/broadcast properties asserted, not eyeballed.

These encode the 100 TB discipline: a scan that reads all columns for a 2-column
projection, or a dim join that shuffles instead of broadcasting, fails here long
before it fails on a cluster.
"""

from __future__ import annotations

from hudi_examples_spark.operators.relational import (
    p_filter_projection,
    q1_pricing_summary,
    q5_local_supplier_volume,
    q6_revenue_forecast,
)
from hudi_examples_spark.plans.inspect import scan_profile
from hudi_examples_spark.plans.io_report import commit_activity_df, io_profile
from tests.conftest import SF_SMALL
from tests.test_table_cow import make_table, trips_df


def test_q6_filters_pushed_to_scan(spark):
    prof = scan_profile(q6_revenue_forecast(spark, SF_SMALL))
    assert prof.pushed_filters, "q6 predicates must reach the parquet scan"
    joined = " ".join(prof.pushed_filters)
    assert "l_shipdate" in joined and "l_quantity" in joined and "l_discount" in joined


def test_q6_reads_only_needed_columns(spark):
    prof = scan_profile(q6_revenue_forecast(spark, SF_SMALL))
    schema = prof.read_schemas[0]
    assert "l_extendedprice" in schema and "l_discount" in schema
    # 16-column lineitem must NOT be fully read for a 4-column query
    assert "l_comment" not in schema and "l_orderkey" not in schema and "l_partkey" not in schema


def test_q1_column_pruning(spark):
    prof = scan_profile(q1_pricing_summary(spark, SF_SMALL))
    schema = prof.read_schemas[0]
    assert "l_partkey" not in schema and "l_suppkey" not in schema


def test_q5_broadcasts_small_dims(spark):
    prof = scan_profile(q5_local_supplier_volume(spark, SF_SMALL))
    assert prof.n_broadcast_joins >= 3, (
        f"supplier/nation/region must broadcast, got {prof.n_broadcast_joins} BHJ"
    )


def test_projection_filter_pushdown(spark):
    prof = scan_profile(p_filter_projection(spark, SF_SMALL))
    assert any("o_totalprice" in f for f in prof.pushed_filters)
    assert "o_orderdate" not in prof.read_schemas[0]


def test_table_read_partition_prunes(spark, tmp_path):
    """Engine snapshot + partition filter ⇒ Spark prunes hive partitions."""
    tbl = make_table(spark, tmp_path)
    tbl.insert(trips_df(spark))
    df = tbl.read().filter("city = 'chennai'")
    assert df.count() == 2
    prof = scan_profile(df)
    assert any("city" in f for f in prof.partition_filters), (
        f"expected hive partition pruning on city, got {prof.partition_filters}"
    )


def test_io_profile_manifest_vs_naive(spark, tmp_path):
    """Metadata-table parity: planning cost is O(instants), not O(directories)."""
    tbl = make_table(spark, tmp_path)
    tbl.insert(trips_df(spark))
    tbl.upsert(trips_df(spark, [(9999999999999, "334e26e9", "r", "d", 5.0, "san_francisco")]))
    prof = io_profile(tbl)
    assert prof["manifest_total_planning_calls"] == 2 + prof["timeline_instants"]
    assert prof["live_files"] >= 3
    rep = commit_activity_df(spark, tbl).collect()
    assert len(rep) == 2 and rep[1]["files_removed"] >= 1


def test_q2_broadcasts_dims_single_window_shuffle(spark):
    """Q2's argmin window must not add shuffles beyond the partkey agg chain;
    nation/region/part dims must broadcast."""
    from hudi_examples_spark.operators.relational_tpch3 import q2_min_cost_supplier

    prof = scan_profile(q2_min_cost_supplier(spark, SF_SMALL))
    assert prof.n_broadcast_joins >= 3
    assert prof.n_sortmerge_joins == 0, "no fact-fact shuffle join in q2"


def test_asof_join_single_user_shuffle(spark):
    """The as-of join is one union + one window: exactly one hashpartitioning
    exchange on user_id (plus the final sort's range exchange)."""
    from hudi_examples_spark.operators.relational_tpch3 import j_asof_join
    from hudi_examples_spark.plans.inspect import explain_str

    text = explain_str(j_asof_join(spark, SF_SMALL), "formatted")
    import re

    hash_ex = re.findall(r"hashpartitioning\(([^)]*)\)", text)
    assert hash_ex, "expected a hashpartitioning exchange for the window"
    assert len(hash_ex) <= 2, f"as-of join must stay a one-shuffle window plan, got {hash_ex}"
    assert all("user_id" in h for h in hash_ex)


def test_dedup_embed_ann_no_cartesian(spark):
    """The LSH candidate join must be a hash/sort-merge equi-join on bucket —
    a nested-loop product here would explode at scale."""
    from hudi_examples_spark.operators.llm_pipeline2 import dedup_embed_ann
    from hudi_examples_spark.plans.inspect import explain_str

    text = explain_str(dedup_embed_ann(spark, SF_SMALL), "formatted")
    assert "BroadcastNestedLoopJoin" not in text and "CartesianProduct" not in text


def test_fp_winnowing_single_doc_shuffle(spark):
    """Winnowing = posexplode + window on doc_id: one hashpartitioning exchange."""
    from hudi_examples_spark.operators.llm_pipeline2 import fp_winnowing
    from hudi_examples_spark.plans.inspect import explain_str

    text = explain_str(fp_winnowing(spark, SF_SMALL), "formatted")
    import re

    hash_ex = [h for h in re.findall(r"hashpartitioning\(([^)]*)\)", text) if "doc_id" in h]
    assert len(hash_ex) >= 1, "window must partition by doc_id"
    # the window sort and the distinct-fp aggregation must reuse that one
    # doc_id exchange — no second hashpartitioning on a different key
    others = [h for h in re.findall(r"hashpartitioning\(([^)]*)\)", text) if "doc_id" not in h]
    assert not others, f"unexpected extra shuffle keys: {others}"


def test_metadata_on_off_ab_equivalence_and_cost(spark, tmp_path):
    """The reference's hoodie.metadata.enable A/B, reproducible: after
    compaction + clean(retain 1) both planners see the same data, and the
    manifest side's planning calls don't scale with directory count."""
    from hudi_examples_spark.plans.io_report import io_ab, listing_read
    from tests.test_scale_paths import load_df, make

    tbl = make(spark, tmp_path, table_type="mor")
    tbl.insert(load_df(spark, range(6), range(30)))
    tbl.upsert(load_df(spark, range(6), range(5), ts=2, v=9.0))
    tbl.compact()
    tbl.clean(retain_commits=1)
    tbl.heal()  # drop pre-clean leftovers so the listing sees only live files
    a = sorted(map(str, tbl.read().collect()))
    b = sorted(map(str, listing_read(tbl).collect()))
    assert a == b
    ab = io_ab(tbl)
    # 6 hive partitions + base dir: the listing pays per-directory; the
    # manifest pays per-instant regardless of layout fanout
    assert ab["metadata_off_planning_calls"] >= 7
    assert ab["metadata_on_planning_calls"] < 30
