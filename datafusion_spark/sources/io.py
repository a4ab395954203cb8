"""Reader/writer helpers (DataFusion's datasource + COPY TO surface).

Formats: parquet, CSV, NDJSON (native Spark datasources) plus Arrow IPC
(reference: datafusion/datasource-arrow/) implemented with ``mapInArrow``
— the decode/encode runs distributed on executors, Arrow-batch at a time,
never materializing a table on the driver.  Avro (datafusion-datasource-
avro) needs the spark-avro connector jar, absent in this offline image →
gated behind ``avro_available``.
"""

from __future__ import annotations

import glob
import os

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
    options: dict[str, str] | None = None,
) -> None:
    """COPY <query> TO <path> — partitioned writes lay out hive-style
    directories so downstream scans get partition pruning for free.
    ``options`` passes format options (e.g. compression codec) through,
    mirroring DataFusion's COPY ... OPTIONS (...) clause."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", True)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    getattr(writer, fmt)(path)


def copy_to_arrow_ipc(df: DataFrame, path: str) -> None:
    """COPY TO Arrow IPC: one ``.arrow`` file per partition, written by the
    executors via ``mapInArrow`` (zero-copy from Spark's internal Arrow
    batches).  On a cluster ``path`` must be shared storage; partitions
    should be sized ~128 MB upstream (repartition) for well-sized files."""
    os.makedirs(path, exist_ok=True)
    for old in glob.glob(os.path.join(path, "*.arrow")):
        os.remove(old)

    def write_partition(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        writer = sink = None
        for batch in batches:
            if writer is None:
                sink = pa.OSFile(os.path.join(path, f"part-{pid:05d}.arrow"), "wb")
                writer = pa.ipc.new_file(sink, batch.schema)
            writer.write_batch(batch)
        if writer is not None:
            writer.close()
            sink.close()
        return iter([])

    # schema of the (empty) output stream; count() just triggers execution
    df.mapInArrow(write_partition, schema="ok int").count()


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Arrow IPC scan: schema from the first file's footer (driver-side
    metadata read), then distributed decode — binaryFile rows → mapInArrow
    yields the embedded record batches executor-side."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import from_arrow_schema

    files = sorted(glob.glob(os.path.join(path, "*.arrow")))
    if not files:
        raise FileNotFoundError(f"no .arrow files under {path}")
    arrow_schema = pa.ipc.open_file(files[0]).schema
    spark_schema = from_arrow_schema(arrow_schema)

    bin_df = spark.read.format("binaryFile").load(os.path.join(path, "*.arrow"))

    def decode(batches):
        import pyarrow as pa

        for b in batches:
            for buf in b.column(b.schema.get_field_index("content")):
                reader = pa.ipc.open_file(pa.BufferReader(buf.as_py()))
                for i in range(reader.num_record_batches):
                    yield reader.get_batch(i)

    return bin_df.select("content").mapInArrow(decode, schema=spark_schema)


def avro_available(spark: SparkSession) -> bool:
    """True iff the spark-avro connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.avro.AvroFileFormat")
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    if not avro_available(spark):
        raise NotImplementedError(
            "spark-avro connector jar not present in this offline image; "
            "add org.apache.spark:spark-avro_2.13 to spark.jars.packages"
        )
    return spark.read.format("avro").load(path)

def compact_files(
    spark: "SparkSession", src: str, dst: str, target_file_mb: int = 128
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~target_file_mb files (the maintenance job every long-lived 100 TB
    table needs — streaming sinks and per-partition writers accumulate
    small files, and scan/listing overhead grows linearly with file
    count).  Sizing uses the on-disk byte total, so the output file count
    tracks data volume, not the input's fragmentation.

    Returns the number of output files written."""
    import math

    total = 0
    for root, _dirs, files in os.walk(src):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    spark.read.parquet(src).repartition(n).write.mode("overwrite").parquet(dst)
    return n
