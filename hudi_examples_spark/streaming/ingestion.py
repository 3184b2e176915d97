"""Continuous ingestion orchestrator — the DeltaStreamer lifecycle (E3).

Parity with ``spark/src/main/scala/com/hudi/spark/DeltaStreamerExample.scala``:
- pluggable source (Kafka JSON / files / incremental table) — :15, :24
- external schema from an Avro ``.avsc`` file (FilebasedSchemaProvider) — :14,22-23
- upsert with source-ordering (precombine) field — :16,27,31,41
- async-ish table services: compaction every N delta commits (:48-55), cleaning
  with retained commits (:46-47)
- optional pre-commit validator (:58-59)
- ``--continuous`` loop (:61)
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    BinaryType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from hudi_examples_spark.streaming.sinks import make_batch_handler
from hudi_examples_spark.table import Table

_AVRO_PRIMITIVES: dict[str, DataType] = {
    "string": StringType(),
    "long": LongType(),
    "int": IntegerType(),
    "double": DoubleType(),
    "float": FloatType(),
    "boolean": BooleanType(),
    "bytes": BinaryType(),
}


def schema_from_avsc(path: str) -> StructType:
    """FilebasedSchemaProvider: Avro record schema file → Spark StructType.

    Supports the primitive types + nullable unions (``["null", T]``) that the
    reference's source/target avsc pair uses.
    """
    with open(path) as f:
        avsc = json.load(f)
    if avsc.get("type") != "record":
        raise ValueError("expected an Avro record schema")
    fields = []
    for fld in avsc["fields"]:
        ftype = fld["type"]
        nullable = False
        if isinstance(ftype, list):
            nullable = "null" in ftype
            ftype = next(t for t in ftype if t != "null")
        if not isinstance(ftype, str) or ftype not in _AVRO_PRIMITIVES:
            raise ValueError(f"unsupported avro type for field {fld['name']}: {ftype}")
        fields.append(StructField(fld["name"], _AVRO_PRIMITIVES[ftype], nullable))
    return StructType(fields)


class DeltaStreamer:
    """Pull-based ingestion loop: ``source()`` → validate → upsert → services."""

    def __init__(
        self,
        table: Table,
        source: Callable[[], DataFrame | None],
        schema: StructType | None = None,
        compact_every: int | None = 5,
        clean_retain: int | None = 10,
        validator: Callable[[DataFrame], None] | None = None,
        op_col: str | None = None,
        sink_name: str = "deltastreamer",
    ):
        self.table = table
        self.source = source
        self.schema = schema
        self.clean_retain = clean_retain
        self._handler = make_batch_handler(
            table,
            sink_name=sink_name,
            op_col=op_col,
            compact_every=compact_every,
            pre_commit_validator=validator,
        )
        self._batch_id = 0

    def run_once(self) -> bool:
        """One poll/apply cycle; returns whether a batch was ingested."""
        batch = self.source()
        if batch is None:
            return False
        if self.schema is not None:
            cols = [f.name for f in self.schema.fields]
            batch = batch.select(*cols)
            for f in self.schema.fields:
                batch = batch.withColumn(f.name, batch[f.name].cast(f.dataType))
        self._handler(batch, self._batch_id)
        self._batch_id += 1
        if self.clean_retain:
            self.table.clean(retain_commits=self.clean_retain)
        return True

    def run_continuous(self, max_batches: int, poll_interval_s: float = 0.0) -> int:
        """--continuous mode, bounded for determinism; returns batches ingested."""
        n = 0
        for _ in range(max_batches):
            if self.run_once():
                n += 1
            elif poll_interval_s:
                time.sleep(poll_interval_s)
        return n
