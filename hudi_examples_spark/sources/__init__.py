"""Source/sink surface (SURVEY.md §2.1).

Plain-format scans (S2 parquet, S3 json-from-strings, S4 text, S5 csv-with-DDL,
S6 catalog table, S13 createDataFrame) are thin wrappers over builtin Spark readers —
see :mod:`hudi_examples_spark.sources.readers`. The keyed-table source/sink (S1/S7)
lives in :mod:`hudi_examples_spark.table`.
"""

from hudi_examples_spark.sources.readers import (
    load_sf_table,
    read_csv_ddl,
    read_json_records,
    read_text,
)

__all__ = ["load_sf_table", "read_csv_ddl", "read_json_records", "read_text"]
