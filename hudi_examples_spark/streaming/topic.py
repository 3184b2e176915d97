"""File-backed topic with Kafka consumer-group semantics (S10/T5 surrogate).

The sandbox has no Kafka broker, but the *semantics* the reference pipelines
depend on — partitioned append log, per-partition monotonic offsets, consumer
groups with committed offsets, ``auto.offset.reset`` earliest/latest,
at-least-once redelivery until commit — are all protocol-independent. This
module implements them over partitioned parquet batches so those behaviors are
real and tested; swapping in a live broker changes the transport, not the
pipeline code (see ``kafka_json_source`` for the one-line real-Kafka reader).

Parity targets: ``DeltaStreamerExample.scala:15,24,36-38`` (JsonKafkaSource,
``auto.offset.reset``, ``group.id``) and
``Kafka2HudiPipeline.java:55-58,88-98`` (FlinkKafkaConsumer group offsets).

Layout::

    topic/
      _meta.json                 # partitions, batch manifest with offset ranges
      _groups/<group_id>.json    # committed offsets per consumer group
      batch=00000001/partition=N/part-*.parquet

Scale stance: offsets are assigned at produce time with a row_number window
partitioned by topic-partition (one keyed exchange over the batch, never the
topic); consume() prunes to batches whose offset RANGE overlaps the group's
committed position — a manifest lookup, not a directory listing — so a
caught-up consumer reads only new batches regardless of topic history length
(the same manifest-over-LIST design as the table layer's timeline).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

META = "_meta.json"
GROUPS_DIR = "_groups"


class FileTopic:
    """One append-only topic rooted at ``base``."""

    def __init__(self, spark: SparkSession, base: str, schema_ddl: str, n_partitions: int = 4):
        self.spark = spark
        self.base = base
        self.schema_ddl = schema_ddl
        meta_path = os.path.join(base, META)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.meta = json.load(f)
        else:
            os.makedirs(base, exist_ok=True)
            self.meta = {"n_partitions": n_partitions, "next_seq": 1, "ends": {}, "batches": []}
            self._save()

    #: produce-lock expiry (a producer that died mid-batch)
    LOCK_TTL_SECONDS = 600.0

    def _save(self) -> None:
        tmp = os.path.join(self.base, f".{META}.tmp")
        with open(tmp, "w") as f:
            json.dump(self.meta, f, indent=1)
        os.replace(tmp, os.path.join(self.base, META))

    def _reload(self) -> None:
        meta_path = os.path.join(self.base, META)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.meta = json.load(f)

    @property
    def n_partitions(self) -> int:
        return int(self.meta["n_partitions"])

    # ------------------------------------------------------------- producer

    def produce(self, df: DataFrame, key_col: str | None = None) -> dict[int, int]:
        """Append a batch. Records are routed to partitions by hash(key) —
        same key, same partition, preserving per-key order like Kafka — or
        round-robin-by-hash of all columns when no key is given. Returns the
        new end offsets. Offsets are dense per partition across batches.

        Multi-producer-safe: the whole read-modify-write of ``_meta.json``
        (next_seq/ends) plus the batch write runs under the table layer's
        expiry lock — without it two concurrent producers could read the same
        next_seq, both pass the errorifexists check, interleave writes into
        one batch dir, and the last ``_save`` would drop the other's
        ends/batches entries."""
        from hudi_examples_spark.table.core import _acquire_lock, _release_lock

        lock = os.path.join(self.base, ".produce.lock")
        fd = _acquire_lock(lock, self.LOCK_TTL_SECONDS, 30.0)
        try:
            self._reload()  # adopt any concurrent producer's seq/ends advance
            return self._produce_locked(df, key_col)
        finally:
            _release_lock(fd, lock)

    def _produce_locked(self, df: DataFrame, key_col: str | None = None) -> dict[int, int]:
        n = self.n_partitions
        if key_col is not None:
            part = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n))
        else:
            part = F.pmod(F.xxhash64(*[F.col(c).cast("string") for c in df.columns]), F.lit(n))
        seq = int(self.meta["next_seq"])
        bases = {int(p): int(e) for p, e in self.meta["ends"].items()}
        base_expr = F.coalesce(
            *[
                F.when(F.col("partition") == p, F.lit(e))
                for p, e in sorted(bases.items())
            ],
            F.lit(0),
        ) if bases else F.lit(0)
        w = Window.partitionBy("partition").orderBy(F.monotonically_increasing_id())
        stamped = (
            df.withColumn("partition", part.cast("int"))
            .withColumn("__rn", F.row_number().over(w))
            .withColumn("offset", (base_expr + F.col("__rn") - 1).cast("bigint"))
            .drop("__rn")
        )
        out_dir = os.path.join(self.base, f"batch={seq:08d}")
        stamped.write.mode("errorifexists").partitionBy("partition").parquet(out_dir)
        # count from the files just WRITTEN, not by re-executing the input
        # plan: a nondeterministic input (sample(), rand()-derived values)
        # would otherwise produce counts that disagree with the stamped
        # offsets, corrupting the manifest ranges — and even deterministic
        # inputs would pay a full second source scan
        counts = {
            int(r["partition"]): int(r["c"])
            for r in self.spark.read.parquet(out_dir)
            .groupBy("partition")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        ranges = {}
        for p, c in counts.items():
            start = bases.get(p, 0)
            ranges[str(p)] = [start, start + c]
            self.meta["ends"][str(p)] = start + c
        self.meta["batches"].append({"seq": seq, "ranges": ranges})
        self.meta["next_seq"] = seq + 1
        self._save()
        return {int(p): e for p, e in self.meta["ends"].items()}

    # ------------------------------------------------------------- consumer

    def end_offsets(self) -> dict[int, int]:
        return {int(p): int(e) for p, e in self.meta["ends"].items()}

    def _group_path(self, group_id: str) -> str:
        return os.path.join(self.base, GROUPS_DIR, f"{group_id}.json")

    def committed(self, group_id: str) -> dict[int, int] | None:
        p = self._group_path(group_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return {int(k): int(v) for k, v in json.load(f).items()}

    def consume(
        self, group_id: str, auto_offset_reset: str = "earliest"
    ) -> tuple[DataFrame, dict[int, int]]:
        """Records past the group's committed offsets, plus the end-offset
        snapshot to pass to :meth:`commit` once processed (at-least-once:
        an uncommitted consume redelivers). A new group starts at 0
        (``earliest``) or at the current end (``latest``)."""
        start = self.committed(group_id)
        if start is None:
            start = {} if auto_offset_reset == "earliest" else self.end_offsets()
        end = self.end_offsets()
        # manifest pruning: only batches with any partition range past the
        # group's position are read at all
        paths = [
            os.path.join(self.base, f"batch={b['seq']:08d}")
            for b in self.meta["batches"]
            if any(r[1] > start.get(int(p), 0) for p, r in b["ranges"].items())
        ]
        # fixed column order on BOTH paths (parquet appends the partition dir
        # column last, the empty literal schema doesn't — positional callers
        # would otherwise see offset/partition transposed)
        from pyspark.sql.types import StructType

        cols = [f.name for f in StructType.fromDDL(self.schema_ddl).fields] + [
            "partition",
            "offset",
        ]
        if not paths:
            empty = self.spark.createDataFrame(
                [], f"{self.schema_ddl}, partition INT, offset BIGINT"
            )
            return empty.select(*cols), end
        df = self.spark.read.option("basePath", self.base).parquet(*paths)
        if start:
            pos = self.spark.createDataFrame(
                [(p, o) for p, o in start.items()], "partition INT, __committed BIGINT"
            )
            df = (
                df.join(F.broadcast(pos), "partition", "left_outer")
                .filter(F.col("offset") >= F.coalesce("__committed", F.lit(0)))
                .drop("__committed")
            )
        return df.select(*cols), end

    def commit(self, group_id: str, offsets: dict[int, int]) -> None:
        os.makedirs(os.path.join(self.base, GROUPS_DIR), exist_ok=True)
        p = self._group_path(group_id)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump({str(k): int(v) for k, v in offsets.items()}, f)
        os.replace(tmp, p)
