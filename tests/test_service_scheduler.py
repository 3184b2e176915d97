"""In-process async table services (``ServiceScheduler``): the daemon-thread
half of Hudi's service story (DeltaStreamer ``--continuous`` runs compaction
async next to ingest — ``DeltaStreamerExample.scala:52-65``). The
cross-process cadence is proven in test_services_soak.py; here we prove the
in-process cadence: services fire on schedule WHILE the same session writes,
the final state equals a no-services sequential replay, compaction actually
happened, and a failing pass is recorded — never raised into the writer.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from hudi_examples_spark.table import ServiceScheduler, Table, TableConfig

SCHEMA = "k BIGINT, val DOUBLE, seg STRING, v INT"
CFG = dict(
    record_key=["k"],
    precombine="v",
    partition_by=["seg"],
    table_type="mor",
    bloom_index=True,
)
N = 600


def _batch(spark, b: int):
    return spark.range(N).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5 + b).alias("val"),
        F.concat(F.lit("s"), F.col("id") % 3).alias("seg"),
        F.lit(b + 1).alias("v"),
    )


def test_scheduler_services_run_alongside_writes(spark, tmp_path):
    tbl = Table.create(spark, str(tmp_path / "t"), SCHEMA, TableConfig(**CFG))
    tbl.insert(_batch(spark, 0))

    sched = ServiceScheduler(
        spark, tbl.base, interval_seconds=0.5, compact_after=2, clean_retain=5
    )
    with sched:
        for b in range(1, 6):
            Table(spark, tbl.base).upsert(_batch(spark, b))
            time.sleep(0.4)
    assert sched.errors == []
    assert len(sched.reports) >= 1

    # compaction fired via the cadence (run_services reports it, and the
    # timeline carries the resulting commit instants)
    compactions = [r for r in sched.reports if r.get("compacted")]
    actions = [i.action for i in Table(spark, tbl.base).timeline.completed_data_instants()]
    assert compactions and "commit" in actions

    # final state identical to a sequential no-services replay
    seq = Table.create(spark, str(tmp_path / "seq"), SCHEMA, TableConfig(**CFG))
    for b in range(6):
        seq.upsert(_batch(spark, b))
    got = sorted(map(tuple, Table(spark, tbl.base).read().collect()))
    want = sorted(map(tuple, seq.read().collect()))
    assert len(got) == N and got == want


def test_scheduler_lifecycle_and_run_once(spark, tmp_path):
    tbl = Table.create(spark, str(tmp_path / "t"), SCHEMA, TableConfig(**CFG))
    tbl.insert(_batch(spark, 0))
    sched = ServiceScheduler(spark, tbl.base, interval_seconds=3600)

    # run_once is the deterministic entry point — full report, no thread
    report = sched.run_once()
    assert report is not None and set(report) >= {"healed", "cleaned", "archived"}

    # start/stop is idempotent and double-start is refused
    sched.start()
    try:
        sched.start()
        raise AssertionError("second start() must raise")
    except RuntimeError:
        pass
    reports = sched.stop()
    assert reports == sched.stop() == sched.reports  # idempotent stop


def test_scheduler_records_failures_instead_of_raising(spark, tmp_path, monkeypatch):
    tbl = Table.create(spark, str(tmp_path / "t"), SCHEMA, TableConfig(**CFG))
    tbl.insert(_batch(spark, 0))

    def boom(self, **kw):
        raise RuntimeError("synthetic service failure")

    monkeypatch.setattr(Table, "run_services", boom)
    sched = ServiceScheduler(spark, tbl.base, interval_seconds=0.1, max_passes=2)
    sched.start()
    time.sleep(0.6)
    reports = sched.stop()
    assert reports == []
    assert len(sched.errors) >= 1
    assert all(isinstance(e, RuntimeError) for e in sched.errors)
