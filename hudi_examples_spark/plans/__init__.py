"""Plan inspection + planning-IO accounting.

- :mod:`hudi_examples_spark.plans.inspect` — explain-string capture and assertions
  (pushed filters, pruned read schema, broadcast joins, codegen spans).
- :mod:`hudi_examples_spark.plans.io_report` — filesystem-call profile of
  manifest-driven reads vs naive listing (the reference's S3-call benchmark,
  ``glue/S3 Calls benchmarking Code.py``, re-expressed for a local engine).
"""

from hudi_examples_spark.plans.inspect import explain_str, scan_profile
from hudi_examples_spark.plans.io_report import io_profile, io_report_df

__all__ = ["explain_str", "scan_profile", "io_profile", "io_report_df"]
