"""S3-access-log analytics pipeline — parity with ``glue/S3 Calls benchmarking
Code.py`` (the reference's pure-Catalyst consumer lifecycle).

Stages mirrored 1:1 (citations per function):
- text scan of log lines (S4, ``Code.py:53``)
- bracketed-timestamp extraction → ``to_timestamp(.., "dd/MMM/yyyy:HH:mm:ss Z")``
  (``Code.py:45-49,55``) — done with builtin ``regexp_extract`` instead of the
  reference's row-at-a-time Python UDF (U1's latent bug: a ``StringType`` UDF
  returning a Python list — we deliberately do NOT replicate that)
- split()-indexed field derivations + CASE WHEN on call type (``Code.py:56-57``)
- LIKE filter on table name + ``.cache()`` before fan-out (``Code.py:58-59``)
- report 1: calls by type, desc (``Code.py:64``)
- report 2: top-100 (type, path) (``Code.py:73``)
- report 3: per-interval counts (``Code.py:108-120``) — as one grouped agg, not a
  driver loop of filtered scans
- report sink (S9 excel) → :func:`write_report` (xlsx if openpyxl exists, else CSV)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LOG_TS_FORMAT = "dd/MMM/yyyy:HH:mm:ss Z"


def parse_access_logs(lines: DataFrame, table_name: str | None = None) -> DataFrame:
    """value:string log lines → typed (timestamp, call_type, path, status, bytes).

    Line shape (AWS S3 server-access-log-ish, what Code.py:53-58 parses):
    ``owner bucket [06/Feb/2024:00:00:38 +0000] ip requester reqid REST.GET.OBJECT
    key "GET /key HTTP/1.1" 200 ...``
    """
    df = lines.select(
        F.col("value"),
        F.regexp_extract("value", r"\[(.*?)\]", 1).alias("ts_raw"),
    ).select(
        "value",
        F.to_timestamp(F.col("ts_raw"), LOG_TS_FORMAT).alias("timestamp"),
        F.split(F.col("value"), " ").alias("parts"),
    )
    df = df.select(
        "value",
        "timestamp",
        F.element_at("parts", 8).alias("call_type"),
        F.element_at("parts", 9).alias("key"),
        F.expr(
            "case when element_at(parts, 8) like 'REST.GET%' then element_at(parts, 12) "
            "else element_at(parts, 11) end"
        ).alias("status"),
        F.length("value").alias("line_len"),
    )
    if table_name:
        df = df.filter(F.col("value").like(f"%{table_name}%"))
    return df.cache()


def calls_by_type(parsed: DataFrame) -> DataFrame:
    """Report 1 (``Code.py:64``)."""
    return (
        parsed.groupBy("call_type")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), "call_type")
    )


def top_paths(parsed: DataFrame, k: int = 100) -> DataFrame:
    """Report 2 (``Code.py:73``)."""
    return (
        parsed.groupBy("call_type", "key")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), "call_type", "key")
        .limit(k)
    )


def calls_per_interval(parsed: DataFrame, interval: str = "hour") -> DataFrame:
    """Report 3 (``Code.py:108-120``): the reference loops commit windows issuing a
    filtered count per window — O(windows) scans; one grouped agg on the truncated
    timestamp is the scalable equivalent (one scan, one shuffle)."""
    return (
        parsed.groupBy(F.date_trunc(interval, "timestamp").alias("window_start"))
        .agg(F.count(F.lit(1)).alias("call_count"))
        .orderBy("window_start")
    )


def write_report(reports: dict[str, DataFrame], out_dir: str) -> str:
    """S9 Excel sink (``Code.py:65-69,74-78,116-120`` writes sheets/cells via the
    crealytics excel datasource). Honest mapping: bounded report DataFrames →
    pandas → one xlsx with a sheet per report when openpyxl is available, else one
    CSV per report. Returns the artifact path."""
    os.makedirs(out_dir, exist_ok=True)
    pdfs = {name: df.toPandas() for name, df in reports.items()}
    try:
        import openpyxl  # noqa: F401

        import pandas as pd

        path = os.path.join(out_dir, "report.xlsx")
        with pd.ExcelWriter(path, engine="openpyxl") as xl:
            for name, pdf in pdfs.items():
                pdf.to_excel(xl, sheet_name=name[:31], index=False)
        return path
    except ImportError:
        for name, pdf in pdfs.items():
            pdf.to_csv(os.path.join(out_dir, f"{name}.csv"), index=False)
        return out_dir


def run_pipeline(spark: SparkSession, logs_path: str, out_dir: str, table_name: str | None = None) -> str:
    """E(analytics) lifecycle end-to-end: scan → parse → cache → 3 reports → sink."""
    parsed = parse_access_logs(spark.read.text(logs_path), table_name)
    artifact = write_report(
        {
            "call_type": calls_by_type(parsed),
            "top_paths": top_paths(parsed),
            "per_interval": calls_per_interval(parsed),
        },
        out_dir,
    )
    parsed.unpersist()
    return artifact
