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
        llm_pipeline7,
        llm_pipeline8,
        llm_pipeline9,
        llm_pipeline10,
        llm_pipeline11,
        multimodal,
        multimodal_pairs,
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
    specs.extend(llm_pipeline7.SPECS)
    specs.extend(llm_pipeline8.SPECS)
    specs.extend(llm_pipeline9.SPECS)
    specs.extend(llm_pipeline10.SPECS)
    specs.extend(llm_pipeline11.SPECS)
    specs.extend(scale_ops.SPECS)
    specs.extend(streaming_gate.SPECS)
    specs.extend(multimodal.SPECS)
    specs.extend(multimodal_pairs.SPECS)
    specs.extend(relational.SPECS)
    specs.extend(relational_ext.SPECS)
    specs.extend(relational_tpch3.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in registry"
    # Prefix rotation (round 9): the driver gate samples a 50-query prefix.
    # Policy (steady state): (1) debut ops with no driver row yet, (2)
    # oldest-evidence refreshes. CORRECTNESS_r08.json came back 50/50 green,
    # so the union ledger at the r9 cut reads: 50 rows evidenced r8, 50 r6,
    # 50 r5, and the 18 r4-aged waiters r8's comment promised would rotate
    # FIRST this round. Seating (audit trail): 4 round-9 debuts
    # (mm_caption_align, mm_pair_curation, mm_pair_keep_best — the paired
    # image-text curation family — and dedup_sketch_calibration, the
    # measured MinHash-vs-exact error report), then the 18 r4 waiters (TPC-H battery q4/q7/q8/q9/q11/q12/
    # q13/q15/q16/q17/q18/q19/q21/q22 + e_intersect/e_union_dedup/
    # a_cube_order_mix/a_group_count_sort), then the 28 oldest r5-aged rows
    # in registry order (the 18 table-DML lifecycle rows + 10 LLM-pipeline
    # rows through pipe_dsir_affinity). The 4 debuts displace 4 of the
    # promised 32 r5 refreshes; the 22 r5 rows still aged r5 after this
    # round (sim_pq_topk ... a_percentile_values) rotate at r10 together
    # with the 28 oldest r6 rows, r11 finishes the r6/r8 tail —
    # max driver-evidence age stays ≤3 from r9 on, ≤2 from r11.
    # Registry size at HEAD: 172; `python tests/run_parity.py` sweeps all
    # of it.
    r9_prefix = [
        # round-9 debuts
        "mm_caption_align",
        "mm_pair_curation",
        "mm_pair_keep_best",
        "dedup_sketch_calibration",
        # r4-aged waiters (named in the r8 prefix comment, seated now)
        "q4_order_priority",
        "q7_nation_volume",
        "q8_market_share",
        "q9_product_profit",
        "q11_important_stock",
        "q12_priority_shipping",
        "q13_customer_distribution",
        "q15_top_supplier",
        "q16_supplier_part_types",
        "q17_small_quantity_revenue",
        "q18_large_orders",
        "q19_bracket_revenue",
        "q21_sole_supplier_orders",
        "q22_idle_customers",
        "e_intersect",
        "e_union_dedup",
        "a_cube_order_mix",
        "a_group_count_sort",
        # oldest r5-aged refreshes: the table-DML lifecycle battery
        "tbl_upsert_cow",
        "tbl_upsert_mor",
        "tbl_merge_mixed",
        "tbl_time_travel",
        "tbl_incremental",
        "tbl_cdc_query",
        "tbl_zorder_prune",
        "tbl_rollup_incremental",
        "tbl_savepoint_restore",
        "tbl_schema_evolution",
        "tbl_run_services",
        "tbl_async_compaction",
        "tbl_log_compaction",
        "tbl_async_clustering",
        "tbl_record_index",
        "tbl_metadata_tvf",
        "tbl_partition_lifecycle",
        "tbl_bootstrap",
        # oldest r5-aged refreshes: LLM-pipeline rows in registry order
        "dedup_minhash_lsh",
        "pipe_stratified_sample",
        "pipe_dataset_mixture",
        "text_tfidf_topterms",
        "pipe_doc_chunks",
        "corpus_report",
        "dedup_bloom_prefilter",
        "text_bm25_topk",
        "sim_rrf_fusion",
        "pipe_dsir_affinity",
    ]
    assert len(r9_prefix) == 50 and len(set(r9_prefix)) == 50, "prefix must be 50 unique names"
    by_name = {s.name: s for s in specs}
    missing = [n for n in r9_prefix if n not in by_name]
    assert not missing, f"prefix names not in registry: {missing}"
    prefix_set = set(r9_prefix)
    specs = [by_name[n] for n in r9_prefix] + [s for s in specs if s.name not in prefix_set]
    return specs


def queries_dict():
    """{name: fn} over the full registry — the dict ``__spark_entry__.queries()``
    returns to the driver. DO NOT REMOVE: nothing inside ``tests/`` or ``bench.py``
    calls this (they use ``all_specs()``), but the driver's correctness gate does,
    via ``__spark_entry__.py``. Deleting it in r7 (commit a1f0478) zeroed an entire
    round of driver evidence; ``tests/test_driver_contract.py`` now pins it.
    """
    return {s.name: s.fn for s in all_specs()}


def oracles_dict():
    """{name: sql} for every SQL-expressible query — ``__spark_entry__.oracle_sql()``.
    Specs with ``oracle=None`` are omitted (driver falls back to a rows-only check).
    DO NOT REMOVE — see ``queries_dict``.
    """
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
