"""Batch readers (SURVEY.md §2.1 S2-S6, S13).

Reference parity:
- S2 parquet scan        — ``spark/src/main/scala/com/hudi/spark/TestAutomationUtils.scala:60-63``
- S3 json-from-strings   — ``TestAutomationUtils.scala:31,37,44``
- S4 text scan           — ``glue/S3 Calls benchmarking Code.py:53``
- S5 csv external table  — ``glue/S3 Calls Benchmarking Datagen.py:39-72``
- S6 catalog table read  — ``glue/S3 Calls Benchmarking Job.py:116-122``

All of these are 1-liners over builtin readers on purpose: builtin scans keep predicate
pushdown, column pruning, and the vectorized parquet reader (visible as ``PushedFilters``
/ ``ReadSchema`` in ``.explain``), which is the 100 TB-scale requirement.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

#: Canonical driver test tables (TESTDATA.md).
SF_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: inferred parquet schemas by path — schema inference is a Spark job reading
#: footers; the sf fixtures are immutable, so every load after the first can
#: pass the schema explicitly and plan with zero jobs (the same reason the
#: table layer always reads with its DECLARED schema, table/core.py)
_SCHEMA_CACHE: dict[str, object] = {}


def _read_parquet_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    sch = _SCHEMA_CACHE.get(path)
    if sch is not None:
        return spark.read.schema(sch).parquet(path)
    df = spark.read.parquet(path)
    _SCHEMA_CACHE[path] = df.schema
    return df


def load_sf_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table from an sf directory (S2).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4's vectorized reader
    rejects outright; we read it as nanos-since-epoch LONG (legacy conf, safe to set
    per-session at runtime) and truncate to a proper TimestampType column — the same
    micros DuckDB's ns→µs display uses, so differential results stay aligned.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_parquet_cached_schema(spark, f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return _read_parquet_cached_schema(spark, f"{sf_dir}/{name}.parquet")


def register_sf_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every sf table as a temp view so ``spark.sql`` can be used (S6)."""
    for name in SF_TABLES:
        load_sf_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_json_records(spark: SparkSession, records: Iterable[str], partitions: int = 2) -> DataFrame:
    """Schema-inferred DataFrame from JSON strings (S3).

    Mirrors ``spark.read.json(sc.parallelize(inserts, n))`` in
    ``TestAutomationUtils.scala:31``. Only for small driver-side record batches
    (test datagen); real ingestion goes through file/Kafka sources.
    """
    rdd = spark.sparkContext.parallelize(list(records), partitions)
    return spark.read.json(rdd)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Raw text-line scan (S4), one ``value`` column."""
    return spark.read.text(path)


def read_orc(spark: SparkSession, path: str, schema_ddl: str | None = None) -> DataFrame:
    """ORC scan (Spark-native columnar alternative to parquet; same pushdown/
    pruning machinery). Declared schema skips footer inference when given."""
    reader = spark.read
    if schema_ddl:
        reader = reader.schema(schema_ddl)
    return reader.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — requires the external ``spark-avro`` module, which this
    container does not ship (environment-blocked, like the live Kafka broker);
    raises with a clear message rather than a Spark classpath error."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:  # AnalysisException: Failed to find data source
        raise ImportError(
            "avro support needs the spark-avro package on the classpath "
            "(not shipped in this environment)"
        ) from e


def read_csv_ddl(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    sep: str = "|",
    header: bool = False,
    date_format: str | None = None,
    timestamp_format: str | None = None,
    empty_value: str | None = None,
) -> DataFrame:
    """CSV with explicit DDL schema + the option surface used by the reference's
    external-table DDL (S5, ``Datagen.py:39-72``): sep/header/emptyValue/date+ts formats.
    """
    reader = spark.read.schema(schema_ddl).option("sep", sep).option("header", str(header).lower())
    if date_format:
        reader = reader.option("dateFormat", date_format)
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    if empty_value is not None:
        reader = reader.option("emptyValue", empty_value)
    return reader.csv(path)
