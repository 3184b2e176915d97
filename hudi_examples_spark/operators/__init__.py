"""Operator battery keyed to SURVEY.md §2 inventory IDs.

- :mod:`hudi_examples_spark.operators.relational` — scans/filters/projections/joins/
  aggregations/windows/set-ops/scalar functions (P*, A*, O*, E*, J* as plain queries).
- :mod:`hudi_examples_spark.operators.llm_pipeline` — LLM-training-data operators
  (dedup, similarity search, text analysis) over ``documents``/``embeddings``.
- :mod:`hudi_examples_spark.operators.table_dml` — differential queries that exercise
  the keyed-table layer (upsert/merge/delete/time-travel/incremental; M*).

Each module exposes ``SPECS: list[QuerySpec]``; the driver contract in
``__spark_entry__.py`` is assembled from these.
"""

from hudi_examples_spark.operators.spec import QuerySpec

__all__ = ["QuerySpec"]
