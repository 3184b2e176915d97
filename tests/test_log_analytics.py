"""Access-log analytics pipeline (Code.py parity) on synthetic S3-style log lines."""

from __future__ import annotations

import os

from hudi_examples_spark.operators.log_analytics import (
    calls_by_type,
    calls_per_interval,
    parse_access_logs,
    run_pipeline,
    top_paths,
)

CALL_TYPES = ["REST.GET.OBJECT", "REST.PUT.OBJECT", "REST.HEAD.OBJECT", "REST.GET.BUCKET"]


def write_logs(path: str, n: int = 200) -> None:
    """Deterministic S3-access-log-ish lines; field positions match Code.py's
    split-index expectations (call_type at split idx 7, key at 8)."""
    with open(path, "w") as f:
        for i in range(n):
            ct = CALL_TYPES[i % 4]
            day = 1 + (i % 3)
            hour = i % 24
            key = f"warehouse/hudi_tbl/part-{i % 7}.parquet"
            status = 200 if i % 10 else 404
            line = (
                f"owner bucket1 [{day:02d}/Feb/2024:{hour:02d}:00:38 +0000] 1.2.3.4 "
                f'requester req{i} {ct} {key} "GET /{key} HTTP/1.1" {status} - 512 1024 12 8'
            )
            f.write(line + "\n")


def test_parse_and_reports(spark, tmp_path):
    logs = str(tmp_path / "access.log")
    write_logs(logs)
    parsed = parse_access_logs(spark.read.text(logs))
    assert parsed.count() == 200
    row = parsed.orderBy("timestamp").limit(1).collect()[0]
    assert row["timestamp"] is not None and row["call_type"] in CALL_TYPES

    by_type = calls_by_type(parsed).collect()
    assert len(by_type) == 4 and all(r["count"] == 50 for r in by_type)

    tp = top_paths(parsed, k=5).collect()
    assert len(tp) == 5 and tp[0]["count"] >= tp[-1]["count"]

    per_hour = calls_per_interval(parsed, "hour").collect()
    assert sum(r["call_count"] for r in per_hour) == 200
    parsed.unpersist()


def test_table_name_filter(spark, tmp_path):
    logs = str(tmp_path / "access2.log")
    write_logs(logs)
    parsed = parse_access_logs(spark.read.text(logs), table_name="hudi_tbl")
    assert parsed.count() == 200
    none = parse_access_logs(spark.read.text(logs), table_name="other_tbl")
    assert none.count() == 0
    parsed.unpersist()
    none.unpersist()


def test_run_pipeline_writes_artifacts(spark, tmp_path):
    logs = str(tmp_path / "access3.log")
    write_logs(logs)
    out = run_pipeline(spark, logs, str(tmp_path / "report"))
    assert os.path.exists(out)
    produced = os.listdir(str(tmp_path / "report"))
    assert produced, "report artifacts must exist"
