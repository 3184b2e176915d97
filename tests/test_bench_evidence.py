"""Bench pruning-evidence gate (VERDICT r9 "Next round" #5).

``BENCH_r{N}.json`` carries per-fixture pruning evidence (cdc_pruned_files,
index_lookup_files, zorder_prune, ...). Until round 10 those dicts were only
*recorded* — a silent prune-regression (index stops engaging, CDC falls back
to full diff) would still produce a healthy-looking artifact, just slower.
This test runs every evidence-emitting lifecycle fixture through the SAME
extractors bench.py uses (``bench.EVIDENCE_EXTRACTORS`` — one definition,
no drift) and asserts each dict is non-degenerate: something was pruned,
something was scanned, totals are consistent. The fixtures build their own
file layouts, so the prune ratios are layout-driven and hold at sf0.001
exactly as they do in the sf0.1 bench artifact.
"""

from __future__ import annotations

import pytest

import bench
from hudi_examples_spark.operators.table_dml import bench_phases
from tests.conftest import SF_SMALL

#: {extras key: assertion} — the non-degeneracy contract per evidence blob.
CHECKS = {
    "cdc_pruned_files": lambda e: 1 <= e["candidates"] < e["total"],
    "cluster_incremental": lambda e: 1 <= e["partitions_rewritten"] < e["partitions_total"],
    "index_lookup_files": lambda e: e["scanned"] >= 1
    and e["pruned"] >= 1
    and e["scanned"] + e["pruned"] == e["total"],
    "record_lookup_files": lambda e: 1 <= e["scanned"] < e["total"],
    "zorder_prune": lambda e: 1 <= e["dim1_scanned"] < e["total_files"]
    and 1 <= e["dim2_scanned"] < e["total_files"],
    "bootstrap_onboard": lambda e: e["n_files"] >= 1
    and e["files_linked"] == e["n_files"],
    "partition_stats_prune": lambda e: 1 <= e["partitions"]["kept"] < e["partitions"]["total"]
    and e["files"]["scanned"] >= 1
    and e["files"]["scanned"] + e["files"]["pruned"] == e["files"]["total"],
    "expression_index_files": lambda e: e["scanned"] >= 1
    and e["pruned"] >= 1
    and e["scanned"] + e["pruned"] == e["total"],
}


@pytest.mark.parametrize("name", sorted(bench.EVIDENCE_EXTRACTORS))
def test_bench_evidence_non_degenerate(spark, name):
    key, extract = bench.EVIDENCE_EXTRACTORS[name]
    build, op = bench_phases()[name]
    state = build(spark, SF_SMALL)
    op(spark, SF_SMALL, state).collect()  # evidence is recorded by the op read
    evidence = extract(state)
    assert evidence, f"{name}: evidence dict is empty — the pruning path did not report"
    assert CHECKS[key](evidence), f"{name}: degenerate evidence {evidence}"


def test_every_extractor_has_a_check():
    """A new evidence blob must ship with its non-degeneracy contract."""
    assert {k for k, _ in bench.EVIDENCE_EXTRACTORS.values()} == set(CHECKS)
