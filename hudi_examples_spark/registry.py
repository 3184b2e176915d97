"""Assembles the full query registry for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

from hudi_examples_spark.operators.spec import QuerySpec


def all_specs() -> list[QuerySpec]:
    from hudi_examples_spark.operators import (
        llm_pipeline,
        llm_pipeline2,
        llm_pipeline3,
        llm_pipeline4,
        llm_pipeline5,
        llm_pipeline6,
        multimodal,
        relational,
        relational_ext,
        relational_tpch3,
        scale_ops,
        streaming_gate,
    )

    # Order matters: the driver's correctness gate samples a prefix of this
    # list, so the engine-defining specs (table DML lifecycle, LLM data
    # pipeline) go first, followed by the core relational battery, with the
    # TPC-H extension battery last (it is the most redundantly covered).
    specs: list[QuerySpec] = []
    try:
        from hudi_examples_spark.operators import table_dml

        specs.extend(table_dml.SPECS)
    except ImportError:
        pass  # table layer not built yet in this round
    specs.extend(llm_pipeline.SPECS)
    specs.extend(llm_pipeline2.SPECS)
    specs.extend(llm_pipeline3.SPECS)
    specs.extend(llm_pipeline4.SPECS)
    specs.extend(llm_pipeline5.SPECS)
    specs.extend(llm_pipeline6.SPECS)
    specs.extend(scale_ops.SPECS)
    specs.extend(streaming_gate.SPECS)
    specs.extend(multimodal.SPECS)
    specs.extend(relational.SPECS)
    specs.extend(relational_ext.SPECS)
    specs.extend(relational_tpch3.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in registry"
    # Prefix rotation (round 4): the driver gate samples a 50-query prefix.
    # This round's prefix = the two formerly-red rows now fixed
    # (fn_array_battery stringified its array column; a_sketch_profile gained a
    # within-bounds oracle), the new reference-schedule spec
    # (tbl_batch_schedule), all 42 queries whose latest green driver row dates
    # from round 1 (oldest evidence), 1 round-2-evidence refresh, and the four
    # r4 debut ops — exactly 50. The 12 tbl_* lifecycle specs and the r3-green
    # LLM battery rotate out (fresh r3 evidence). NOTE the steady-state
    # arithmetic: with >100 registered queries and 50 driver rows per round,
    # the achievable max evidence age is ceil(N/50) rounds; rotation
    # prioritizes (1) debut ops, (2) oldest evidence.
    r4_prefix = [
        # new + fixed
        "tbl_batch_schedule",
        "fn_array_battery",
        "a_sketch_profile",
        # r1-evidence (oldest): core relational battery
        "p_json_extract",
        "p_range_predicate",
        "p_arithmetic_projection",
        "a_count_star",
        "a_group_count_sort",
        "a_topk_two_keys",
        "a_interval_counts",
        "w_latest_per_key",
        "j_merge_full_outer",
        "j_delete_anti",
        "j_semi_join",
        "j_bucket_assignment",
        "e_except_diff",
        "e_intersect",
        "e_union_dedup",
        "fn_scalar_battery",
        "fn_timestamp_derivation",
        "fn_regexp_extract",
        # r1-evidence: TPC-H battery + window/sessionization + CSV surface
        "q4_order_priority",
        "q7_nation_volume",
        "q14_promo_revenue",
        "q18_large_orders",
        "q19_bracket_revenue",
        "w_running_totals",
        "w_sessionization",
        "s_csv_roundtrip",
        "q2_min_cost_supplier",
        "q8_market_share",
        "q9_product_profit",
        "q11_important_stock",
        "q12_priority_shipping",
        "q13_customer_distribution",
        "q15_top_supplier",
        "q16_supplier_part_types",
        "q17_small_quantity_revenue",
        # r4 debut: SemDeDup cluster-scoped embedding dedup (took
        # q20_excess_suppliers's refresh slot; it stays sweep-covered)
        "dedup_semantic",
        "q21_sole_supplier_orders",
        "q22_idle_customers",
        "a_rollup_revenue",
        "a_cube_order_mix",
        # r4 debut: MOR partial-update payloads (took a_pivot_event_types's
        # refresh slot; it stays sweep-covered)
        "tbl_partial_update",
        # r4 debut: secondary-index point lookup (took a_percentile_values's
        # refresh slot — debut ops outrank refreshes; it stays sweep-covered)
        "tbl_secondary_lookup",
        # r4 debut: BLOOM index + file-group-scoped COW rewrite (took the slot
        # of the mm_frame_sample early refresh — debut ops outrank refreshes)
        "tbl_bloom_upsert",
        # new r4 ops — certify under the driver in their debut round
        "stream_corpus_ingest",
        "dedup_keep_best",
        "text_unigram_lm_score",
        "pipe_curriculum_order",
    ]
    assert len(r4_prefix) == 50 and len(set(r4_prefix)) == 50, "prefix must be 50 unique names"
    by_name = {s.name: s for s in specs}
    missing = [n for n in r4_prefix if n not in by_name]
    assert not missing, f"prefix names not in registry: {missing}"
    prefix_set = set(r4_prefix)
    specs = [by_name[n] for n in r4_prefix] + [s for s in specs if s.name not in prefix_set]
    return specs


def queries_dict():
    return {s.name: s.fn for s in all_specs()}


def oracles_dict():
    return {s.name: s.oracle.strip() for s in all_specs() if s.oracle}
