"""Local replica of the driver's differential harness.

Runs each registered query on Spark and its oracle on DuckDB over the same parquet
tables, then compares row count, column names, and values (exact and with float
tolerance) after sorting columns by name and rows by all columns — the same
order-insensitive shape the driver hashes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from hudi_examples_spark.sources.readers import SF_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # An in-memory DuckDB cannot spill without a temp_directory: a token-
    # scale oracle (20M-row windowed string_agg at the synthesized sf10)
    # then ABORTS the whole process with a C++ bad_alloc instead of going
    # out-of-core. Give it a spill dir and a bounded in-RAM budget so big
    # oracles get slower, never fatal — the Spark side under test is
    # unaffected.
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET memory_limit='24GB'")
    for name in SF_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(pd.notnull(df), None)
    key = df.apply(lambda row: tuple(repr(v) for v in row), axis=1)
    return df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True) if len(df) else df


@dataclass
class CompareResult:
    name: str
    ok: bool
    row_count: tuple[int, int]
    issues: list[str] = field(default_factory=list)


def _values_equal(a, b, tol: float) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    return repr(a) == repr(b)


def _driver_hashable(df: pd.DataFrame) -> list[str]:
    """Columns the DRIVER's canonicalizer would choke on. The driver sorts rows
    with pandas ``sort_values`` (Categorical factorize), which raises
    ``TypeError: unhashable type`` on list/dict/ndarray cells — exactly how
    ``fn_array_battery`` burned a red row for three rounds while this harness's
    repr-based sort sailed past it. Flagging here makes the local sweep strictly
    stronger than the driver gate, not weaker."""
    bad = []
    for col in df.columns:
        if df[col].dtype == object and len(df):
            v = df[col].iloc[0]
            if isinstance(v, (list, dict, set)) or type(v).__name__ == "ndarray":
                bad.append(col)
    return bad


def compare(name: str, spark_df, oracle_pdf: pd.DataFrame, tol: float = 1e-9) -> CompareResult:
    spdf = spark_df.toPandas()
    issues: list[str] = []
    unhashable = _driver_hashable(spdf)
    if unhashable:
        issues.append(
            f"driver-unhashable column(s) {unhashable}: stringify (array_join) before registering"
        )
        return CompareResult(name, False, (len(spdf), len(oracle_pdf)), issues)
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        issues.append(f"columns differ: spark={sorted(spdf.columns)} duck={sorted(oracle_pdf.columns)}")
        return CompareResult(name, False, (len(spdf), len(oracle_pdf)), issues)
    a, b = _normalize(spdf), _normalize(oracle_pdf)
    if len(a) != len(b):
        issues.append(f"row count {len(a)} vs {len(b)}")
        return CompareResult(name, False, (len(a), len(b)), issues)
    n_exact_mismatch = 0
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if repr(x) != repr(y):
                n_exact_mismatch += 1
                if not _values_equal(x, y, tol):
                    issues.append(f"col {col} row {i}: spark={x!r} duck={y!r}")
                    if len(issues) > 5:
                        return CompareResult(name, False, (len(a), len(b)), issues)
    if n_exact_mismatch:
        issues.append(f"NOTE {n_exact_mismatch} value(s) differ bitwise but match within tol")
    ok = not any(not i.startswith("NOTE") for i in issues)
    return CompareResult(name, ok, (len(a), len(b)), issues)


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> list[CompareResult]:
    from hudi_examples_spark import registry

    con = duckdb_con(sf_dir)
    results = []
    for spec in registry.all_specs():
        if only and spec.name not in only:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = sdf.count()
                results.append(CompareResult(spec.name, True, (n, -1), ["rows-only check"]))
                continue
            opdf = con.execute(spec.oracle).fetchdf()
            results.append(compare(spec.name, sdf, opdf))
        except Exception as exc:  # noqa: BLE001
            results.append(CompareResult(spec.name, False, (-1, -1), [f"EXC {type(exc).__name__}: {exc}"]))
            if (
                "OutOfMemory" in type(exc).__name__
                or "bad allocation" in str(exc)  # MSVC wording
                or "bad_alloc" in str(exc)  # libstdc++ wording on this host
            ):
                # a blown oracle can leave the connection's buffer pool
                # poisoned — later queries then fail on tiny allocations;
                # start fresh so one heavy oracle doesn't cascade
                try:
                    con.close()
                except Exception:  # noqa: BLE001
                    pass
                con = duckdb_con(sf_dir)
    return results
