"""Explain-string capture + physical-plan profiling.

The 100 TB discipline: every operator should show (a) filters pushed to the parquet
scan, (b) a pruned ReadSchema, (c) broadcast joins for small dims, (d) wide
WholeStageCodegen spans. These helpers make those properties assertable in tests
instead of eyeballed.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@dataclass
class ScanProfile:
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    n_scans: int = 0
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_shuffles: int = 0
    codegen_spans: int = 0


def scan_profile(df: DataFrame) -> ScanProfile:
    """Parse the formatted plan into the properties we assert on."""
    text = explain_str(df, "formatted")
    prof = ScanProfile()
    prof.pushed_filters = [
        m.strip() for m in re.findall(r"PushedFilters:\s*\[(.*?)\]", text) if m.strip()
    ]
    prof.partition_filters = [
        m.strip() for m in re.findall(r"PartitionFilters:\s*\[(.*?)\]", text) if m.strip()
    ]
    prof.read_schemas = re.findall(r"ReadSchema:\s*(\S+)", text)
    prof.n_scans = len(re.findall(r"Scan parquet", text))
    prof.n_broadcast_joins = len(re.findall(r"BroadcastHashJoin", text))
    prof.n_sortmerge_joins = len(re.findall(r"SortMergeJoin", text))
    # formatted mode: each operator appears once as "(N) Exchange" in the
    # details section; codegen membership shows as "[codegen id : N]"
    prof.n_shuffles = len(re.findall(r"\(\d+\) Exchange\b", text))
    prof.codegen_spans = len(set(re.findall(r"codegen id : (\d+)", text)))
    return prof
