"""Kafka JSON source (S10/T5) — parity with ``DeltaStreamerExample.scala:15,24,36-38``
(JsonKafkaSource, auto.offset.reset, group.id) and ``Kafka2HudiPipeline.java:55-58,88-98``.

The sandbox has no Kafka broker or connector jar, so this module only *builds* the
reader (construction is lazy; ``.load()`` is where Spark would resolve the connector).
The file-based JSON surrogate below has the identical downstream contract and is what
tests exercise — swapping surrogate → kafka changes one line of pipeline code.

For the broker-side SEMANTICS (partitioned append log, per-partition offsets,
consumer groups, auto.offset.reset, at-least-once redelivery) see
``streaming/topic.py:FileTopic`` — those behaviors are protocol-independent
and fully tested in tests/test_topic.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_json_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema_ddl: str,
    starting_offsets: str = "latest",
    group_id: str | None = None,
) -> DataFrame:
    """readStream over a Kafka topic of JSON records → typed columns."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if group_id:
        reader = reader.option("kafka.group.id", group_id)
    raw = reader.load()
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema_ddl).alias("r")
    ).select("r.*")


def file_json_source(spark: SparkSession, path: str, schema_ddl: str) -> DataFrame:
    """Drop-in surrogate: a directory of JSON-lines files (same downstream schema)."""
    return spark.readStream.schema(schema_ddl).json(path)
