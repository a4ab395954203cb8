"""Data sources/sinks: parquet, CSV, JSON (+ partitioned writes).

Reference: datafusion/datasource-{parquet,csv,json,avro} and COPY TO
(datafusion/sqllogictest/test_files/copy.slt).  Spark-native: the
DataFrameReader/Writer API already implements scan pruning, pushdown,
schema inference and partitioned layout; these helpers pin the options
we consider engine defaults.
"""

from datafusion_spark.sources.io import copy_to, read_csv, read_json, read_parquet

__all__ = ["read_csv", "read_json", "read_parquet", "copy_to"]
