"""hudi_examples_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference repo ``ad1happy2go/hudi-examples``.

The reference demonstrates lakehouse-style mutable keyed tables (upsert / merge /
delete / time travel / incremental reads / table services) on Spark+Flink via Apache
Hudi. This package re-creates those *semantics* Spark-first:

- ``hudi_examples_spark.session``   — tuned SparkSession factory
- ``hudi_examples_spark.operators`` — relational operator battery (SURVEY.md §2)
- ``hudi_examples_spark.table``     — native keyed/partitioned/multi-version table
  layer ("lakeview" format: partitioned parquet + JSON timeline) giving
  upsert/merge/delete/time-travel/incremental/CDC/compaction/clustering/rollback
- ``hudi_examples_spark.functions`` — scalar/text/vector function library
- ``hudi_examples_spark.streaming`` — Structured Streaming ingestion + incremental source
- ``hudi_examples_spark.plans``     — plan inspection / IO-counting utilities

Everything here is built only on the public PySpark 4.x API.
"""

from hudi_examples_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
