"""Reader/writer helpers (DataFusion's datasource + COPY TO surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan: pushdown + pruning on by session config."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV scan.  An explicit schema skips the inference pass — at 100 TB
    inference means reading the data twice, so callers should pass one."""
    reader = spark.read.option("header", header).option("sep", delimiter)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """NDJSON scan (DataFusion's JSON source is line-delimited too)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def copy_to(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """COPY <query> TO <path> — partitioned writes lay out hive-style
    directories so downstream scans get partition pruning for free."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", True)
    getattr(writer, fmt)(path)
