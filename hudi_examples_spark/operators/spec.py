"""QuerySpec: one named query with its Spark implementation and DuckDB oracle."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """A named query for the driver's differential harness.

    ``fn(spark, sf_dir)`` returns a DataFrame; ``oracle`` is the equivalent ANSI SQL
    DuckDB runs over the same parquet tables (None → driver does a rows-only check).
    Column names/aliases MUST match between the two — the harness sorts columns by
    name before value-hashing.
    """

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ids: str = ""  # e.g. "P1,P6" — which SURVEY.md §2 rows this covers
