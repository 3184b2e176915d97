"""Mechanical plan lint over the FULL registry (VERDICT r9 "Next round" #1).

The 100 TB plan-shape claims — no unpartitioned data-scale window, no
cartesian product, no unbounded broadcast-nested-loop build side — used to
live in prose (PLANS.md plan-shape notes). These tests make them mechanical:
every registry spec's physical plan is walked, and a regression (say, an
orderBy-only ranking window over corpus-scale rows) fails the suite even
though every sf0.01 oracle would still pass.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_examples_spark.plans.lint import lint_plan, lint_registry
from tests.conftest import SF_SMALL

#: Specs allowed to carry an `unbounded-bnlj-build` finding, with the
#: boundedness proof the lint cannot derive mechanically. ONLY the
#: fixed-query-set ANN family qualifies: each broadcasts a query side
#: selected by a point/range filter on the unique vec_id key (1-5 rows by
#: construction) and crossed against the corpus — the canonical
#: "broadcast the query side" design. Windows and cartesians are NEVER
#: allowlisted.
BNLJ_ALLOWED = {
    "sim_brute_topk": "query side = vec_id = 0 point filter (1 row)",
    "sim_knn_join": "query side = vec_id < 5 filter (5 rows)",
    "sim_ivf_topk": "query side = fixed vec_id set crossed vs probe lists + centroids",
    "sim_rrf_fusion": "query side = fixed vec_id set (lexical+vector fusion)",
    "sim_range_search": "query side = fixed vec_id set, radius predicate",
}


def test_lint_catches_unpartitioned_window_over_raw_rows(spark):
    """Deliberately-broken fixture: the exact regression class the lint
    exists for — a global ranking window over corpus-scale rows."""
    docs = spark.read.parquet(SF_SMALL + "/documents.parquet")
    broken = docs.withColumn("rk", F.row_number().over(Window.orderBy("doc_id")))
    kinds = [v.kind for v in lint_plan(broken)]
    assert kinds == ["unbounded-global-window"]


def test_lint_passes_window_over_aggregated_metadata(spark):
    """The sanctioned shape: a global window is fine AFTER an aggregation
    reduced the input to bounded metadata (count-of-counts, salt offsets)."""
    docs = spark.read.parquet(SF_SMALL + "/documents.parquet")
    per_lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    ranked = per_lang.withColumn("rk", F.row_number().over(Window.orderBy(F.desc("n"))))
    assert lint_plan(ranked) == []


def test_lint_catches_scan_by_scan_cross_join(spark):
    docs = spark.read.parquet(SF_SMALL + "/documents.parquet")
    crossed = docs.alias("a").crossJoin(docs.alias("b"))
    kinds = {v.kind for v in lint_plan(crossed)}
    # small inputs plan as BNLJ, big ones as CartesianProduct — both flagged
    assert kinds & {"cartesian", "unbounded-bnlj-build"}


def test_lint_accepts_small_literal_range_build(spark):
    """A salt fan-out (crossJoin with spark.range(n_salts)) is bounded by a
    literal — the lint proves it from RangeExec.numElements, no allowlist."""
    docs = spark.read.parquet(SF_SMALL + "/documents.parquet")
    salted = docs.crossJoin(F.broadcast(spark.range(8).withColumnRenamed("id", "salt")))
    assert lint_plan(salted) == []


def test_bench_lifecycle_op_plans_lint_clean(spark):
    """The bench fixtures' MEASURED op reads (index point lookups, pruned
    CDC, zorder/pstats scans) are the plans the artifact's evidence blobs
    describe — they must clear the same lint as the registry."""
    from hudi_examples_spark.operators.table_dml import bench_phases

    bad = {}
    for name, (build, op) in bench_phases().items():
        df = op(spark, SF_SMALL, build(spark, SF_SMALL))
        v = lint_plan(df)
        if v:
            bad[name] = [str(x) for x in v]
    assert not bad, f"bench op-plan violations: {bad}"


def test_full_registry_plan_lint(spark):
    """Walk every registry spec's physical plan. Any unpartitioned window
    without a reducing subtree, any cartesian product, and any
    non-allowlisted unbounded BNLJ build fails the build."""
    bad = lint_registry(spark, SF_SMALL)
    unexplained = {}
    for name, violations in bad.items():
        kinds = {v.kind for v in violations}
        if name in BNLJ_ALLOWED and kinds == {"unbounded-bnlj-build"}:
            continue  # documented fixed-query-set broadcast (see BNLJ_ALLOWED)
        unexplained[name] = [str(v) for v in violations]
    assert not unexplained, f"plan-shape violations outside the allowlist: {unexplained}"
    # the allowlist may not rot: every entry must still be a real finding,
    # or it silently grows stale and masks future regressions
    stale = [n for n in BNLJ_ALLOWED if n not in bad]
    assert not stale, f"allowlist entries no longer flagged — remove them: {stale}"
