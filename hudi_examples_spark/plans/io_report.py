"""Planning-IO accounting: the S3-call benchmark re-expressed.

The reference's Glue job counts S3 calls by type from access logs and reports
per-call-type and per-commit tables (``Code.py:63-78,108-120``); the thing being
proven is that a metadata/manifest table avoids LIST storms (``hoodie.metadata.enable``,
``configs/*.props:1``). Our engine is manifest-driven by construction — this module
makes that measurable: it counts the filesystem calls a snapshot read needs with the
manifest vs what a naive recursive listing would cost.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from hudi_examples_spark.table import Table


def io_profile(table: Table) -> dict[str, int]:
    """Filesystem-call profile for planning one snapshot read.

    manifest path: 1 props open + 1 timeline list + one open per instant file.
    naive path: one LIST per directory in the tree (what S3 charges for) + the same
    data-file opens.
    """
    insts = table.timeline.instants()
    files, _ = table.timeline.live_files()
    n_dirs = sum(1 for _ in os.walk(table.base))
    return {
        "manifest_props_open": 1,
        "manifest_timeline_list": 1,
        "manifest_instant_opens": len(insts),
        "manifest_total_planning_calls": 2 + len(insts),
        "naive_recursive_list_calls": n_dirs,
        "data_file_opens": len(files),
        "live_files": len(files),
        "timeline_instants": len(insts),
    }


def io_report_df(spark: SparkSession, table: Table) -> DataFrame:
    """call_type/count report shaped like the reference's Excel output
    (``Code.py:64``: groupBy(call_type).count orderBy desc)."""
    prof = io_profile(table)
    rows = [(k, v) for k, v in prof.items()]
    return (
        spark.createDataFrame(rows, "call_type STRING, count BIGINT")
        .orderBy("count", ascending=False)
    )


def listing_read(table: Table) -> DataFrame:
    """The ``hoodie.metadata.enable=false`` side of the reference's A/B: plan a
    snapshot read by RECURSIVE DIRECTORY LISTING instead of the manifest —
    walk the tree (one LIST per directory, what S3 bills for), take every
    parquet file found. Semantically valid only when no superseded file
    versions remain on disk (fresh bulk load, or post-compaction + clean with
    retain 1) — which is exactly why the manifest side exists; ``io_ab`` pairs
    this with the call counts so the Glue-benchmark story is reproducible as a
    true A/B."""
    rels = []
    for root, dirs, fns in os.walk(table.base):
        dirs[:] = [d for d in dirs if d not in ("_timeline", ".staging", "_stats")]
        for fn in fns:
            if fn.endswith(".parquet"):
                rels.append(os.path.relpath(os.path.join(root, fn), table.base))
    return table._read_files(sorted(rels), with_deleted=False).drop(
        "_hoodie_commit_time", "_hoodie_record_key", "_hoodie_partition_path"
    )


def io_ab(table: Table) -> dict[str, int]:
    """Manifest vs listing planning cost for ONE snapshot read, side by side
    (the reference's S3-call benchmark as a reproducible A/B instead of a
    40-DPU Glue job)."""
    prof = io_profile(table)
    return {
        "metadata_on_planning_calls": prof["manifest_total_planning_calls"],
        "metadata_off_planning_calls": prof["naive_recursive_list_calls"],
        "data_file_opens": prof["data_file_opens"],
    }


def commit_activity_df(spark: SparkSession, table: Table) -> DataFrame:
    """Per-commit files/rows report (``Code.py:108-120``'s per-commit call counts,
    computed from timeline metadata instead of N filtered scans)."""
    rows = [
        (i.instant, i.action, len(i.files_added), len(i.files_removed))
        for i in table.timeline.completed_data_instants()
    ]
    return spark.createDataFrame(
        rows, "commit STRING, action STRING, files_added INT, files_removed INT"
    )
