"""Differential parity: every registered query vs its DuckDB oracle at sf0.001.

This replicates the driver's t2 correctness gate locally (the driver runs sf0.01;
tests use sf0.001 for speed — run tests/run_parity.py for the sf0.01 sweep).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.harness import duckdb_con, compare


def _specs():
    from hudi_examples_spark import registry

    return [s for s in registry.all_specs()]


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_query_matches_oracle(spark, spec):
    sdf = spec.fn(spark, SF_SMALL)
    if spec.oracle is None:
        assert sdf.count() >= 0  # rows-only contract: runs and has stable schema
        return
    con = duckdb_con(SF_SMALL)
    opdf = con.execute(spec.oracle).fetchdf()
    res = compare(spec.name, sdf, opdf)
    assert res.ok, f"{spec.name}: rows={res.row_count} issues={res.issues}"
