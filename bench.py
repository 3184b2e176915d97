"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Materialization uses the noop sink (full execution, no driver collect) so timings
reflect distributed execution cost, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hudi_examples_spark import registry
from hudi_examples_spark.session import get_spark

#: Headline queries: the flagship TPC-H-style set + the heaviest LLM-pipeline ops.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "w_latest_per_key",
    "a_topk_two_keys",
    "j_merge_full_outer",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_stats",
    "sim_knn_join",
    "tbl_upsert_cow",  # table-layer write path (insert + upsert + snapshot read)
    "tbl_upsert_mor",
    "q2_min_cost_supplier",  # window argmin over broadcast dim chain
    "j_asof_join",  # temporal as-of join (one-shuffle window form)
    "fp_winnowing",  # rolling-window fingerprints over documents
    "dedup_embed_cosine",  # exact all-pairs embedding near-dup ranking
    "tbl_cdc_query",  # CDC images lifecycle (write + snapshot-diff read)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hudi-examples-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {s.name: s for s in registry.all_specs()}

    # Warm cluster discipline: run every headline query once at the smallest sf so
    # whole-stage-codegen compilation (Janino caches by generated source) and the
    # parquet reader paths are hot; the timed runs then measure execution, not JIT.
    warm_sf = "/root/testdata/sf0.001"
    for name in HEADLINE:
        spec = specs.get(name)
        if spec is not None:
            try:
                spec.fn(spark, warm_sf).write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    # Timed passes, min per query: the shared host shows 2-4x wall-clock
    # noise between runs; the min reports the machine's actual capability.
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    timings: dict[str, float] = {}
    for _pass in range(n_passes):
        for name in HEADLINE:
            spec = specs.get(name)
            if spec is None:
                continue
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, el), el)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
