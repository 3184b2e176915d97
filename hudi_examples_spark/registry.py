"""Assembles the full query registry for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

from hudi_examples_spark.operators.spec import QuerySpec


def all_specs() -> list[QuerySpec]:
    from hudi_examples_spark.operators import (
        domain_curation,
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
    specs.extend(domain_curation.SPECS)
    specs.extend(scale_ops.SPECS)
    specs.extend(streaming_gate.SPECS)
    specs.extend(multimodal.SPECS)
    specs.extend(multimodal_pairs.SPECS)
    specs.extend(relational.SPECS)
    specs.extend(relational_ext.SPECS)
    specs.extend(relational_tpch3.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in registry"
    # Prefix rotation (round 10): the driver gate samples a 50-query prefix.
    # Policy (steady state): (1) debut ops with no driver row yet, (2)
    # oldest-evidence refreshes, in registry order. CORRECTNESS_r09.json came
    # back 50/50 green, so the union ledger at the r10 cut reads: 50 rows
    # evidenced r9, 50 r8, 50 r6, and 22 rows whose newest evidence is r5 —
    # 5 rounds old at this cut counting exclusively (the r9 comment said
    # "age ≤3", which was off by one; the LEDGER is the authority and this
    # rotation retires its oldest rows regardless of how they're counted).
    # Seating (audit trail): 4 round-10 debuts (the URL/domain curation
    # family — dom_host_stats / dom_blocklist_filter / dom_cap_per_domain /
    # dedup_url_canonical), then ALL 22 r5-aged rows exactly as the r9
    # comment named them (sim_pq_topk ... a_percentile_values, incl.
    # q1/q3/q5/q6/q10, tok_bpe_merges, emb_kmeans_lloyd), then the 24
    # oldest r6-aged rows in registry order (table-DML tail through
    # lang_detect_ngram). The 4 debuts displace 4 of the promised 28 r6
    # refreshes; the 26 r6 rows still aged r6 after this round
    # (pipe_training_corpus ... fn_explode_unnest) rotate at r11 with the
    # oldest r8 rows — after r11 every row's newest evidence is ≤3 rounds
    # old (exclusive counting) and the steady-state rotation period is 3-4
    # rounds for a 176-query registry at 50 rows/round.
    # `python tests/run_parity.py` sweeps all of it every round regardless.
    r10_prefix = [
        # round-10 debuts: URL/domain-level curation (RefinedWeb §3.1 shape)
        "dom_host_stats",
        "dom_blocklist_filter",
        "dom_cap_per_domain",
        "dedup_url_canonical",
        # the 22 r5-aged rows (named in the r9 prefix comment, seated now)
        "sim_pq_topk",
        "dedup_substring_spans",
        "dedup_substring_removal",
        "tok_bpe_merges",
        "emb_kmeans_lloyd",
        "pipe_length_buckets",
        "pipe_span_corruption",
        "a_salted_distinct_users",
        "j_salted_skew_join",
        "stream_dedup_ingest",
        "mm_frame_sample",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q6_revenue_forecast",
        "q10_returned_items",
        "p_filter_projection",
        "p_case_when",
        "p_like_filter",
        "q20_excess_suppliers",
        "a_pivot_event_types",
        "a_percentile_values",
        # the 24 oldest r6-aged rows in registry order
        "tbl_upsert_mor_compacted",
        "tbl_delete_where",
        "tbl_cdc_rollback",
        "tbl_scan_pruned",
        "tbl_join_view_incremental",
        "tbl_batch_schedule",
        "tbl_bloom_upsert",
        "tbl_secondary_lookup",
        "tbl_partial_update",
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "text_stats",
        "lang_distribution",
        "doc_fingerprints",
        "sim_brute_topk",
        "sim_knn_join",
        "sim_ann_lsh",
        "sim_ivf_topk",
        "emb_label_centroids",
        "dedup_embed_cosine",
        "dedup_embed_ann",
        "fp_winnowing",
        "lang_detect_ngram",
    ]
    assert len(r10_prefix) == 50 and len(set(r10_prefix)) == 50, "prefix must be 50 unique names"
    by_name = {s.name: s for s in specs}
    missing = [n for n in r10_prefix if n not in by_name]
    assert not missing, f"prefix names not in registry: {missing}"
    prefix_set = set(r10_prefix)
    specs = [by_name[n] for n in r10_prefix] + [s for s in specs if s.name not in prefix_set]
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
