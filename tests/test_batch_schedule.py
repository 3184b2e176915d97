"""The reference's compatibility workload: 5 batches x (1000 inserts + 100 updates +
10 deletes) with expected counts 990 / 1980 / 2980 / 3970 / 4960 between batches
(``compatibility_test.sh:68-70,101,139,169,181,186,194,212``), plus the rollback
fault-injection step (delete latest commit ⇒ table heals to pre-batch count).

The schedule itself lives in ``operators/table_dml.py`` (as of r4 it is also a
driver-gated QuerySpec, ``tbl_batch_schedule``); these tests exercise the COW and
MOR+compaction variants and the standalone rollback fault injection.
"""

from __future__ import annotations

from hudi_examples_spark.operators.table_dml import (
    BATCH_EXPECTED,
    BATCH_SCHEMA,
    batch_delete_keys,
    batch_insert_df,
    batch_update_df,
    run_batch_schedule,
)
from hudi_examples_spark.table import Table, TableConfig


def _make(spark, path, table_type):
    return Table.create(
        spark,
        str(path),
        BATCH_SCHEMA,
        TableConfig(
            record_key=["uuid"], precombine="ts", partition_by=["part"], table_type=table_type
        ),
    )


def test_batch_schedule_counts_cow(spark, tmp_path):
    tbl = _make(spark, tmp_path / "cow", "cow")
    assert run_batch_schedule(spark, tbl) == BATCH_EXPECTED


def test_batch_schedule_counts_mor_with_compaction(spark, tmp_path):
    tbl = _make(spark, tmp_path / "mor", "mor")
    assert run_batch_schedule(spark, tbl, compact_every=4) == BATCH_EXPECTED


def test_rollback_fault_injection_restores_count(spark, tmp_path):
    """compatibility_test.sh:155-186: roll back the latest commit, count restored."""
    tbl = _make(spark, tmp_path / "rb", "cow")
    tbl.insert(batch_insert_df(spark, 0))
    tbl.upsert(batch_update_df(spark, 1))
    tbl.delete(batch_delete_keys(spark, 1))
    assert tbl.count() == 990
    tbl.upsert(batch_insert_df(spark, 1))  # the "failed" batch
    assert tbl.count() == 1990
    tbl.rollback()
    assert tbl.count() == 990
