"""Pin the driver contract at the module boundary.

Round 7's defining failure: commit a1f0478 deleted ``registry.queries_dict`` /
``registry.oracles_dict`` while sweeping dead code, ``__spark_entry__.queries()``
started raising ``AttributeError``, and the driver's correctness gate recorded
ZERO queries for the round — while 645 in-repo tests stayed green, because
nothing under ``tests/`` imported ``__spark_entry__`` the way the driver does.

This test loads ``/root/repo/__spark_entry__.py`` exactly as the driver does —
``importlib.util.spec_from_file_location`` in a SUBPROCESS whose SparkSession is
a plain ``builder.master("local[4]").getOrCreate()`` with none of
``session.get_spark``'s configs — then asserts the three contract functions
work end-to-end. The subprocess matters: an in-process "plain" session would
silently reuse the test suite's configured JVM singleton.

Reference discipline mirrored: the reference verifies outside-in through its
public entry points (spark/scripts/compatibility_test_main.sh:3-15 greps the
driver's stdout) rather than trusting unit tests of the internals.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_DRIVER_SIM = r"""
import importlib.util
import json
import sys

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)

spec = importlib.util.spec_from_file_location("__spark_entry__", sys.argv[1])
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

entry_rows = mod.entry(spark).collect()
queries = mod.queries()
oracles = mod.oracle_sql()

# Run the first seated query end-to-end too: the gate's first row must not
# only exist, it must execute under the plain session.
first_name = next(iter(queries))
first_rows = queries[first_name](spark, "/root/testdata/sf0.001").count()

print(
    "CONTRACT "
    + json.dumps(
        {
            "entry_rows": len(entry_rows),
            "entry_cols": sorted(entry_rows[0].asDict().keys()) if entry_rows else [],
            "n_queries": len(queries),
            "n_oracles": len(oracles),
            "first_50": list(queries)[:50],
            "first_query": first_name,
            "first_query_rows": first_rows,
            "oracle_values_are_sql": all(
                isinstance(v, str) and v.strip() for v in oracles.values()
            ),
            "oracle_keys_subset": sorted(set(oracles) - set(queries)),
        }
    )
)
"""


def _run_driver_sim() -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER_SIM, str(REPO / "__spark_entry__.py")],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, (
        f"driver simulation failed (rc={proc.returncode})\n"
        f"stdout tail: {proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}"
    )
    for line in proc.stdout.splitlines():
        if line.startswith("CONTRACT "):
            return json.loads(line[len("CONTRACT ") :])
    raise AssertionError(f"no CONTRACT line in driver sim stdout: {proc.stdout[-2000:]}")


def test_driver_contract_module_boundary():
    report = _run_driver_sim()

    # entry(): flagship query returns rows with a stable schema.
    assert report["entry_rows"] > 0
    assert report["entry_cols"], "entry() returned a schema-less result"

    # queries()/oracle_sql(): full registry exposed, oracles keyed into queries.
    from hudi_examples_spark import registry

    specs = registry.all_specs()
    n_with_oracle = sum(1 for s in specs if s.oracle is not None)
    assert report["n_queries"] == len(specs)
    assert report["n_oracles"] == n_with_oracle
    assert report["oracle_keys_subset"] == [], "oracle_sql() has keys not in queries()"
    assert report["oracle_values_are_sql"]

    # The gate samples a 50-query prefix: it must be exactly the intended cut.
    assert report["first_50"] == [s.name for s in specs[:50]]
    assert len(set(report["first_50"])) == 50

    # And the first seated query actually executes under the plain session.
    assert report["first_query"] == specs[0].name
    assert report["first_query_rows"] >= 0


def test_registry_shims_exist():
    """Cheap in-process guard (runs even when the subprocess test is slow-skipped):
    the two shims __spark_entry__ consumes must exist and agree with all_specs()."""
    from hudi_examples_spark import registry

    q = registry.queries_dict()
    o = registry.oracles_dict()
    specs = registry.all_specs()
    assert list(q) == [s.name for s in specs]
    assert set(o) == {s.name for s in specs if s.oracle is not None}
    assert all(callable(f) for f in q.values())
